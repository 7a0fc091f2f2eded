package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media (image/audio/video) as opaque BINARY
  * columns with typed metadata, plus a feature-extraction stage.
  *
  * The Spark-side plumbing is real — schema, batch shape, partition-local
  * decode loop via mapPartitions on a typed Dataset — and the codec is
  * pluggable. For the formats the standard JDK decodes, the decode is
  * REAL: [[ImageIoDecoder]] (PNG/JPEG/GIF/BMP via javax.imageio, header
  * read only — no pixel decode on the metadata path), [[resizeImage]]
  * (Graphics2D re-render), and [[probeAudio]] (WAV/AIFF/AU via
  * javax.sound.sampled). [[StubDecoder]] remains the clearly-marked
  * deterministic fake for formats beyond the JDK (webp, video codecs —
  * no native libs in this container); swapping in an ffmpeg-style bridge
  * changes one binding and nothing in the pipeline.
  */
object Multimodal {

  // ImageIO's stream cache defaults to DISK-backed: every decode of an
  // in-memory payload creates (and deletes) a temp file before reading
  // a single pixel — pure syscall overhead per image, multiplied by
  // billions of rows at corpus scale. All payloads here are byte
  // arrays already in memory, so use the memory-backed cache.
  // NOTE this mutates JVM-GLOBAL ImageIO state (documented in README):
  // an embedding application sharing the JVM sees the memory cache too.
  // Called from every decode entry point (not the object initializer)
  // so it reliably takes effect on executors regardless of which class
  // touched ImageIO first; idempotent and thread-safe (a volatile
  // boolean write in ImageIO).
  private[operators] def useMemoryCache(): Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** One media item: opaque payload + source metadata. */
  case class MediaRow(media_id: Long, payload: Array[Byte], kind: String,
      source: String)

  /** Extracted features (what a real image/audio decode would yield). */
  case class MediaFeatures(media_id: Long, n_bytes: Long, format: String,
      width: Int, height: Int, digest: String)

  /** Decoder contract: payload bytes → features. Implementations MUST be
    * deterministic and serializable (runs inside executor tasks), and
    * MUST tolerate a NULL payload (a corrupt/absent media cell must
    * never kill a 100-TB scan). */
  trait Decoder extends Serializable {
    def decode(id: Long, payload: Array[Byte]): MediaFeatures
  }

  /** Shared MD5-hex digest (one definition — it appears on every decode
    * hot path); null-safe: a NULL payload digests as empty bytes. */
  private[operators] def md5Hex(bytes: Array[Byte]): String = {
    val b = if (bytes == null) Array.emptyByteArray else bytes
    java.security.MessageDigest.getInstance("MD5")
      .digest(b).map("%02x".format(_)).mkString
  }

  /** STUB — stands in for a real media codec (none available in this
    * container). Deterministic: format from the first byte, fake
    * dimensions from byte statistics, md5 digest of the payload. */
  object StubDecoder extends Decoder {
    override def decode(id: Long, payload0: Array[Byte]): MediaFeatures = {
      val payload =
        if (payload0 == null) Array.emptyByteArray else payload0
      val first = if (payload.nonEmpty) payload(0) & 0xFF else 0
      val fmt = if (first % 3 == 0) "png" else if (first % 3 == 1) "jpeg"
        else "webp"
      MediaFeatures(id, payload.length.toLong, fmt,
        16 * (1 + first % 64), 16 * (1 + (payload.length % 64)),
        md5Hex(payload))
    }
  }

  /** REAL image decode via the JDK's javax.imageio (PNG/JPEG/GIF/BMP —
    * the registered readers of a stock JVM). Reads ONLY the header for
    * dimensions/format (reader.getWidth(0) does not decode pixels), so
    * the metadata path stays cheap at corpus scale; undecodable payloads
    * degrade to format "unknown" with -1 dimensions instead of failing
    * the task — a corrupt image must not kill a 100-TB scan. */
  object ImageIoDecoder extends Decoder {
    override def decode(id: Long, payload0: Array[Byte]): MediaFeatures = {
      useMemoryCache()
      val payload =
        if (payload0 == null) Array.emptyByteArray else payload0
      val md = md5Hex(payload)
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (readers.hasNext) {
          val r = readers.next()
          try {
            r.setInput(iis)
            MediaFeatures(id, payload.length.toLong,
              r.getFormatName.toLowerCase, r.getWidth(0), r.getHeight(0), md)
          } catch {
            // NonFatal, not just IOException: imageio throws
            // IllegalArgument/IndexOutOfBounds/NegativeArraySize on
            // pathological header fields of fuzzed/truncated files, and
            // any of those would kill the task after retries
            case scala.util.control.NonFatal(_) =>
              MediaFeatures(id, payload.length.toLong, "unknown", -1, -1, md)
          } finally r.dispose()
        } else MediaFeatures(id, payload.length.toLong, "unknown", -1, -1, md)
      } finally if (iis != null) iis.close()
    }
  }

  /** REAL image resize via Graphics2D (headless-safe): decode, re-render
    * at (w, h) with bilinear interpolation, re-encode as PNG. Returns an
    * empty array for undecodable payloads (same no-task-kill contract as
    * [[ImageIoDecoder]]). Runs inside executor tasks — pure JDK, no
    * native state. */
  def resizeImage(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0, "target dimensions must be positive")
    useMemoryCache()
    // full pixel decode — even more RuntimeException surface than the
    // header path; NonFatal keeps a corrupt payload from killing the task
    val img = try javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return Array.empty
    val out = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  /** Audio stream metadata (what a WAV/AIFF/AU header carries). */
  case class AudioMeta(media_id: Long, format: String, sample_rate: Double,
      channels: Int, frames: Long, seconds: Double)

  /** REAL audio probe via javax.sound.sampled (WAV/AIFF/AU — the JDK's
    * built-in parsers): container format, sample rate, channel count,
    * frame count and duration from the header. Unsupported/corrupt
    * payloads → format "unknown" row, never a task failure. */
  def probeAudio(id: Long, payload: Array[Byte]): AudioMeta =
    try {
      // ONE header parse: AudioFileFormat already carries the container
      // type, the AudioFormat, and the frame length — the previous
      // getAudioInputStream + getAudioFileFormat pair parsed the same
      // header twice per row on the hot mapPartitions path
      val ff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(payload))
      val f = ff.getFormat
      // AU headers conventionally use 0xFFFFFFFF for unknown data size:
      // getFrameLength then returns NOT_SPECIFIED (-1). Clamp to 0 so
      // duration aggregates never go negative.
      val frames = math.max(ff.getFrameLength.toLong, 0L)
      AudioMeta(id, ff.getType.getExtension, f.getSampleRate.toDouble,
        f.getChannels, frames,
        if (f.getFrameRate > 0) frames / f.getFrameRate.toDouble else 0.0)
    } catch {
      case scala.util.control.NonFatal(_) =>
        AudioMeta(id, "unknown", 0.0, 0, 0L, 0.0)
    }

  /** Partition-local audio metadata extraction (same mapPartitions shape
    * as [[extractFeatures]] — no shuffle). */
  def probeAudioFeatures(media: DataFrame): Dataset[AudioMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, p) => probeAudio(id, p) } }
  }

  /** Build a media table from the documents fixture: the text payload
    * plays the role of undecoded media bytes. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast(BinaryType).as("payload"),
      lit("image").as("kind"),
      col("source"))

  /** Partition-local feature extraction: typed Dataset + mapPartitions so
    * a real decoder could amortize per-partition init (model load, native
    * lib handle); no shuffle — runs wherever the payload partitions live. */
  def extractFeatures(media: DataFrame, decoder: Decoder = StubDecoder)
      : Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, p) => decoder.decode(id, p) } }
  }

  /** One sampled video frame: parent id, frame index, the frame's byte
    * slice (STUB: a real decoder would emit decoded image tensors), and a
    * per-frame digest. */
  case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte],
      frame_digest: String)

  /** Frame sampling: explode each payload into ~`frames` evenly spaced
    * frame rows (1 row → N rows via flatMap; the real-codec version swaps
    * the byte-slicing stub for an ffmpeg-style keyframe reader). Output
    * row count scales with frames-per-doc, so the stage repartitions
    * afterwards at real scale — left to the caller, who knows the target
    * parallelism. */
  def sampleFrames(media: DataFrame, frames: Int = 4): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .flatMap { case (id, p0) =>
        val p = if (p0 == null) Array.emptyByteArray else p0
        val n = math.max(1, math.min(frames, math.max(p.length, 1)))
        val step = math.max(1, p.length / n)
        (0 until n).map { i =>
          val start = i * step
          val slice = p.slice(start, math.min(start + step, p.length))
          Frame(id, i, slice, md5Hex(slice))
        }
      }
  }

  /** Resize stub: deterministic downsample of the payload bytes to
    * `targetBytes` by stride sampling (stands in for image resize). */
  def resizeStub(payload: Array[Byte], targetBytes: Int): Array[Byte] = {
    if (payload.length <= targetBytes) payload
    else {
      val stride = payload.length.toDouble / targetBytes
      Array.tabulate(targetBytes)(i => payload((i * stride).toInt))
    }
  }

  /** 64-bit difference hash (dHash) — the standard perceptual image
    * fingerprint for web-scale image dedup (the pHash family; see
    * Krawetz's "Kind of Like That" writeup and the LAION/DataComp
    * pipelines): FULL pixel decode, Graphics2D bilinear re-render to a
    * 9×8 grayscale grid, bit (r, c) = [px(r,c) < px(r,c+1)] over the 8
    * horizontal neighbor pairs of each of the 8 rows. Robust to
    * re-encoding (PNG↔JPEG), resizing, and small local edits — those
    * flip few bits — while unrelated images land ~32 bits apart (each
    * comparison is a fair coin). None for undecodable payloads (the
    * no-task-kill contract). Pure JDK software raster: deterministic
    * within a JVM, and the SAME pixels for the same image bytes
    * regardless of source format. */
  def dhash64(payload: Array[Byte]): Option[Long] = {
    useMemoryCache()
    val img = try javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(
        if (payload == null) Array.emptyByteArray else payload))
    catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return None
    val gray = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val g = gray.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, 9, 8, null)
    } finally g.dispose()
    val raster = gray.getRaster
    var bits = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (raster.getSample(c, r, 0) < raster.getSample(c + 1, r, 0))
          bits |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    Some(bits)
  }

  /** Per-image perceptual hashes: (id, sig LONG) via the partition-local
    * decode loop (same mapPartitions shape as [[extractFeatures]] — the
    * decode runs wherever the payloads live, nothing shuffles).
    * Undecodable payloads DROP — a corrupt image can near-match nothing;
    * audit the drop rate upstream via [[extractFeatures]]'s
    * format = "unknown" rows if it matters. */
  def imageHashes(media: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        dhash64(p).map(h => (id, h)) })
      .toDF("id", "sig")
  }

  /** Image near-dup pairs — dHash + the shared 64-bit Hamming blocking
    * ([[Dedup.hammingNearDups64]]: chunk-pigeonhole recall, capped
    * degenerate buckets, exact post-join verify). The 100-TB shape:
    * ONE scan-local pixel decode per image, then only 8-byte signatures
    * ride the pair shuffle — image bytes never leave their partitions.
    * maxHamming defaults looser than text SimHash (6 vs 3): re-encode /
    * resize perturbations are pixel-level, not token-level. That loose
    * threshold makes single-chunk blocks only 9 bits wide, and image
    * corpora cluster (shared template regions → shared chunks):
    * measured at the 30× rehearsal, 68% of single-chunk rows landed in
    * capped-and-dropped buckets — so this path blocks on chunk PAIRS
    * (cleanChunks = 2: ~65k-value keys, recall guaranteed by the
    * two-clean-chunks pigeonhole, only genuine near-dup mass can
    * saturate a bucket).
    * @return (id_a, id_b, dist) */
  def imageNearDups(media: DataFrame, maxHamming: Int = 6,
      idCol: String = "media_id", payloadCol: String = "payload",
      maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame =
    Dedup.hammingNearDups64(imageHashes(media, idCol, payloadCol),
      maxHamming, maxBucket, cleanChunks = 2)

  /** [[imageNearDups]] against a PERSISTED corpus fingerprint table —
    * the production ingest shape: real pipelines decode each image ONCE,
    * persist its 8-byte dHash ([[imageHashes]] is the artifact), and
    * every later delta batch decodes only its own payloads and probes
    * the stored signatures ([[Dedup.hammingNearDups64Incremental]]:
    * delta-touching pairs only, corpus-internal pairs never emitted).
    * Per-batch cost is delta decode + a signature-only blocking join —
    * independent of corpus size up to bucket collision mass — vs the
    * batch path's full-corpus re-decode per run. After reporting,
    * append the delta's hashes to the artifact for the next batch.
    * @return (id_a, id_b, dist) with at least one delta member */
  def imageNearDupsIncremental(corpusSig: DataFrame, deltaMedia: DataFrame,
      maxHamming: Int = 6, idCol: String = "media_id",
      payloadCol: String = "payload",
      maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame =
    Dedup.hammingNearDups64Incremental(corpusSig,
      imageHashes(deltaMedia, idCol, payloadCol),
      maxHamming, maxBucket, cleanChunks = 2)

  /** REAL synthetic image corpus from the documents fixture: each doc's
    * text renders as an 8×8 grid of 4×4-px word-keyed color cells
    * (cell i colored by a hash of the i-th word), encoded through the
    * real javax.imageio codec (`format` = png/jpg/bmp/gif) — genuinely
    * decodable payloads whose VISUAL similarity tracks text similarity:
    * near-dup documents differing in a few words render images differing
    * in a few cells, so their dHashes land within a small Hamming
    * distance and the fixture's planted near-dup structure carries
    * through the real decode path. Deterministic: MurmurHash3 word
    * colors + the JDK software rasterizer. */
  def syntheticImages(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", format: String = "png"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol), col(textCol)).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        (id, renderTextImage(text, format)) })
      .toDF("media_id", "payload")
  }

  /** 64-bit energy-envelope audio fingerprint — the audio twin of
    * [[dhash64]]: REAL PCM decode via javax.sound.sampled (WAV/AIFF/AU;
    * non-PCM encodings the JDK can convert, e.g. μ-law, are converted),
    * channels averaged to mono, the signal split into 65 equal windows,
    * bit i = [RMS(window i) < RMS(window i+1)]. Invariant to uniform
    * volume scaling (every RMS scales by the same factor, so the
    * comparisons are unchanged) and to lossless container re-encoding
    * (WAV↔AIFF carry the same PCM); near-identical signals differing in
    * a short segment flip few bits, unrelated signals land ~32 apart.
    * None for undecodable payloads (the no-task-kill contract). */
  def audioFingerprint64(payload: Array[Byte]): Option[Long] = {
    val samples = try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(
          if (payload == null) Array.emptyByteArray else payload))
      try {
        val src = in.getFormat
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels,
          src.getChannels * 2, src.getSampleRate, false)
        val pcm =
          if (src.matches(target)) in
          else javax.sound.sampled.AudioSystem
            .getAudioInputStream(target, in)
        try {
          val bytes = pcm.readAllBytes()
          val ch = math.max(target.getChannels, 1)
          val n = bytes.length / (2 * ch)
          val out = new Array[Double](n)
          var i = 0
          while (i < n) {
            var acc = 0.0
            var c = 0
            while (c < ch) {
              val o = (i * ch + c) * 2
              acc += ((bytes(o) & 0xFF) | (bytes(o + 1) << 8)).toShort
              c += 1
            }
            out(i) = acc / ch
            i += 1
          }
          out
        } finally pcm.close()
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => null }
    if (samples == null || samples.length < 65) return None
    val rms = new Array[Double](65)
    var w = 0
    while (w < 65) {
      val lo = w * samples.length / 65
      val hi = (w + 1) * samples.length / 65
      var acc = 0.0
      var i = lo
      while (i < hi) { acc += samples(i) * samples(i); i += 1 }
      rms(w) = acc / math.max(hi - lo, 1)
      w += 1
    }
    var bits = 0L
    var b = 0
    while (b < 64) {
      if (rms(b) < rms(b + 1)) bits |= 1L << b
      b += 1
    }
    Some(bits)
  }

  /** Per-clip audio fingerprints: (id, sig LONG), partition-local decode
    * (same shape as [[imageHashes]]); undecodable / sub-65-sample
    * payloads drop. */
  def audioHashes(media: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        audioFingerprint64(p).map(h => (id, h)) })
      .toDF("id", "sig")
  }

  /** Audio near-dup pairs — envelope fingerprint + the shared 64-bit
    * Hamming blocking ([[Dedup.hammingNearDups64]]). Scan-local PCM
    * decode; only 8-byte signatures shuffle. Chunk-PAIR blocking
    * (cleanChunks = 2) for the same reason as [[imageNearDups]]: the
    * loose threshold makes single chunks 9 bits wide, too dense for
    * clusterable envelope fingerprints. @return (id_a, id_b, dist) */
  def audioNearDups(media: DataFrame, maxHamming: Int = 6,
      idCol: String = "media_id", payloadCol: String = "payload",
      maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame =
    Dedup.hammingNearDups64(audioHashes(media, idCol, payloadCol),
      maxHamming, maxBucket, cleanChunks = 2)

  /** [[audioNearDups]] against a persisted [[audioHashes]] artifact —
    * same decode-once ingest shape as [[imageNearDupsIncremental]]:
    * only the delta's PCM is decoded per batch; the corpus rides as
    * 8-byte fingerprints. @return (id_a, id_b, dist), delta-touching */
  def audioNearDupsIncremental(corpusSig: DataFrame, deltaMedia: DataFrame,
      maxHamming: Int = 6, idCol: String = "media_id",
      payloadCol: String = "payload",
      maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame =
    Dedup.hammingNearDups64Incremental(corpusSig,
      audioHashes(deltaMedia, idCol, payloadCol),
      maxHamming, maxBucket, cleanChunks = 2)

  /** REAL synthetic audio corpus from the documents fixture: each doc's
    * text renders as a tone sequence — word i contributes 100 samples of
    * a 1 kHz sine at an amplitude keyed by the word's hash — written
    * through the real javax.sound WAV encoder. Near-dup documents render
    * near-identical energy envelopes, so the fixture's planted near-dup
    * structure carries through the real audio codec path, exactly like
    * [[syntheticImages]] does for images. */
  def syntheticAudio(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol), col(textCol)).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        (id, renderTextAudio(text)) })
      .toDF("media_id", "payload")
  }

  /** Rendering rule shared by [[syntheticAudio]] and its tests: 65
    * word-keyed tone segments (so the 65 fingerprint windows align
    * roughly one-per-word), 16-bit mono 8 kHz WAV. */
  private[graft] def renderTextAudio(text0: String): Array[Byte] = {
    val text = if (text0 == null) "" else text0
    val words = text.toLowerCase.trim.split("\\s+")
    val perWord = 100
    val pcm = new Array[Byte](65 * perWord * 2)
    var i = 0
    while (i < 65) {
      val w = if (i < words.length) words(i) else ""
      val h = scala.util.hashing.MurmurHash3.stringHash(w)
      val amp = 1000.0 + (math.abs(h.toLong) % 100000).toDouble * 0.3
      var j = 0
      while (j < perWord) {
        val t = (i * perWord + j).toDouble
        val s = (amp * math.sin(2 * math.Pi * t / 8.0)).toInt.toShort
        pcm((i * perWord + j) * 2) = (s & 0xFF).toByte
        pcm((i * perWord + j) * 2 + 1) = (s >> 8).toByte
        j += 1
      }
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, (65 * perWord).toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Rendering rule shared by [[syntheticImages]] and its tests. */
  private[graft] def renderTextImage(text0: String,
      format: String = "png"): Array[Byte] = {
    useMemoryCache()
    val text = if (text0 == null) "" else text0
    val words = text.toLowerCase.trim.split("\\s+")
    val img = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < 64) {
      val w = if (i < words.length) words(i) else ""
      val rgb = scala.util.hashing.MurmurHash3.stringHash(w) & 0xFFFFFF
      val x0 = (i % 8) * 4
      val y0 = (i / 8) * 4
      var d = 0
      while (d < 16) {
        img.setRGB(x0 + d % 4, y0 + d / 4, rgb)
        d += 1
      }
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(img, format, bos))
      throw new IllegalArgumentException(
        s"no JDK image writer for format '$format'")
    bos.toByteArray
  }
}
