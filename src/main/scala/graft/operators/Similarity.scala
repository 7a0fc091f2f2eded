package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Baseline: brute-force cosine top-k — a single scan + TakeOrderedAndProject
  * (per-partition top-k, driver merge), which is the right shape even at
  * scale when k is small. Scale path: sign-random-projection LSH bucketing
  * so only one bucket (plus optional neighbor probes) is scanned per query.
  *
  * All arithmetic is double-precision column expressions (codegen'd; no
  * UDFs), left-fold order so results are deterministic.
  */
object Similarity {

  /** Dot product of two array<float|double> columns, computed in double
    * with sequential left-fold (deterministic). Composed-builtins REFERENCE
    * form — higher-order expressions run interpreted, so hot paths use the
    * fused [[graft.functions.CosineSim]] kernel (bit-identical fold). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0).cast(DoubleType), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast(DoubleType) * x.cast(DoubleType)),
      lit(0.0).cast(DoubleType), (acc, v) => acc + v))

  /** Cosine similarity via the fused single-pass kernel: same per-index
    * accumulation order as dot/norm above, so bit-identical — but one
    * codegen'd static call instead of three interpreted HOF folds. */
  def cosine(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)

  /** Hybrid sparse+dense retrieval via Reciprocal Rank Fusion (Cormack,
    * Clarke, Büttcher, "Reciprocal rank fusion outperforms Condorcet and
    * individual rank learning methods", SIGIR 2009): fuse a BM25 keyword
    * branch and an embedding-cosine branch by
    * score(d) = Σ_branch 1/(c + rank_branch(d)), c = 60 — rank-based, so
    * no score calibration between branches and exactly reproducible
    * (integer ranks, two fixed-order double additions).
    *
    * Shape at scale: each branch is its own bounded top-`poolSize`
    * (BM25's query-filtered aggregate / cosine's TakeOrderedAndProject);
    * the rank windows and the fusion join then run over ≤ poolSize rows
    * per branch — a single-task tail no matter the corpus size. */
  def hybridTopK(docs: DataFrame, textCol: String, docIdCol: String,
      emb: DataFrame, vecCol: String, vecIdCol: String,
      query: Seq[String], queryVecId: Long, k: Int = 10,
      poolSize: Int = 100, c: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sparse = TextAnalysis.bm25TopK(docs, textCol, docIdCol, query,
        k = poolSize)
      .select(col("doc"), row_number()
        .over(Window.orderBy(col("bm25").desc, col("doc"))).as("r_sparse"))
    val dense = cosineTopK(emb, vecCol, vecIdCol, queryVecId, poolSize)
      .select(col(vecIdCol).as("doc"), row_number()
        .over(Window.orderBy(col("sim").desc, col(vecIdCol))).as("r_dense"))
    sparse.join(dense, Seq("doc"), "full_outer")
      .select(col("doc"),
        (coalesce(lit(1.0) / (lit(c) + col("r_sparse")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("r_dense")), lit(0.0)))
          .as("rrf"))
      .orderBy(col("rrf").desc, col("doc"))
      .limit(k)
  }

  /** Maximal Marginal Relevance diversified selection (Carbonell &
    * Goldstein, SIGIR 1998) over a retrieval pool: greedily pick k items
    * maximizing λ·rel(d) − (1−λ)·max_{s∈selected} cos(d, s) — the
    * standard way to turn a redundant top-N (near-duplicate hits ranked
    * adjacent) into a diverse training/eval subset.
    *
    * MMR is inherently sequential (each pick changes the next
    * marginal), so it runs on a BOUNDED pool: the input must already be
    * a top-`maxPool` retrieval result ([[cosineTopK]], [[hybridTopK]],
    * [[graft.operators.TextAnalysis.bm25TopK]]); the pool is collected
    * to the driver (hard-capped at `maxPool`, same bounded-collect
    * pattern as the IVF/PQ training samples) and the O(pool²·dim) greedy
    * runs there. At 100 TB the corpus-sized work is the retrieval that
    * BUILT the pool — this tail is constant-sized by construction; a
    * pool larger than the cap fails loudly rather than silently
    * truncating the selection. Ties break on id for determinism. */
  def mmrSelect(pool: DataFrame, idCol: String, relCol: String,
      vecCol: String, k: Int, lambda: Double = 0.7,
      maxPool: Int = 10000): DataFrame = {
    require(lambda >= 0 && lambda <= 1, s"lambda in [0,1], got $lambda")
    // the silent cast(LongType) below turns a string/decimal id into
    // NULL and dies with an opaque NPE at collect — state the integral
    // contract up front like knnJoin's aggregate does at analysis time
    pool.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
      case other => throw new IllegalArgumentException(
        s"mmrSelect id column $idCol must be integral " +
          s"(TINYINT..BIGINT), got ${other.catalogString}")
    }
    val spark = pool.sparkSession
    import spark.implicits._
    val rows = pool.select(col(idCol).cast(LongType),
        col(relCol).cast(DoubleType), col(vecCol))
      .limit(maxPool + 1).collect()
    require(rows.length <= maxPool,
      s"mmrSelect pool exceeds maxPool=$maxPool — MMR is a bounded-pool " +
        "tail stage; shrink the retrieval pool or raise maxPool")
    val ids = rows.map(_.getLong(0))
    val rel = rows.map(_.getDouble(1))
    val vecs = rows.map(_.getSeq[Any](2).map {
      case f: Float => f.toDouble
      case d: Double => d
    }.toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      val d = math.sqrt(na) * math.sqrt(nb)
      if (d == 0) 0.0 else dp / d
    }
    val n = rows.length
    val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
    // max cos vs selected so far; -inf start (NOT 0) — clamping at 0
    // would erase the diversity BONUS for candidates anti-similar to
    // everything selected (Carbonell-Goldstein subtracts the true max
    // cosine, negative or not). Every selection updates all entries, so
    // the sentinel never reaches a score.
    val maxSim = Array.fill(n)(Double.NegativeInfinity)
    val taken = new Array[Boolean](n)
    var exhausted = false
    while (!exhausted && selected.length < math.min(k, n)) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        if (!taken(i)) {
          val s =
            if (selected.isEmpty) rel(i) // first pick is pure relevance
            else lambda * rel(i) - (1 - lambda) * maxSim(i)
          if (s > bestScore || (s == bestScore && best >= 0 &&
              ids(i) < ids(best))) {
            best = i; bestScore = s
          }
        }
        i += 1
      }
      // every remaining candidate scored NaN (NaN relevance or NaN
      // vector components propagate through the comparisons as false):
      // stop with what's selected instead of indexing taken(-1)
      if (best < 0) exhausted = true
      else {
      taken(best) = true
      selected += best
      var j = 0
      while (j < n) {
        if (!taken(j)) {
          val c = cos(vecs(j), vecs(best))
          if (c > maxSim(j)) maxSim(j) = c
        }
        j += 1
      }
      }
    }
    selected.zipWithIndex
      .map { case (i, r) => (ids(i), r + 1, rel(i)) }.toSeq
      .toDF("id", "mmr_rank", "rel")
  }

  /** Brute-force cosine top-k against a query vector taken from the table
    * itself (queryId row). Tie-break on id for determinism. */
  def cosineTopK(emb: DataFrame, vecCol: String, idCol: String,
      queryId: Long, k: Int): DataFrame = {
    graft.functions.GraftFunctions.registerKernels(emb.sparkSession)
    val q = emb.where(col(idCol) === queryId)
      .select(col(vecCol).as("qv"))
    emb.crossJoin(broadcast(q))
      .select(col(idCol), cosine(col(vecCol), col("qv")).as("sim"))
      // Spark sorts NaN ABOVE every real double, so a zero-vector row
      // (cosine 0/0 = NaN) would occupy the #1 slot of every top-k,
      // displacing a true neighbor — same rule as knnJoin's heap
      .where(!isnan(col("sim")))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Driver-side vector extraction that accepts float or double element
    * types (both are legal embedding columns for the fused kernels). */
  private def toDoubles(xs: Seq[Any]): Array[Double] =
    xs.map {
      case f: java.lang.Float => f.toDouble
      case d: java.lang.Double => d.doubleValue
      case other => throw new IllegalArgumentException(
        s"embedding elements must be float or double, got $other")
    }.toArray

  /** Deterministic pseudo-random hyperplanes for sign-LSH (fixed seed). */
  private[graft] def hyperplanes(dim: Int, m: Int): Seq[Seq[Double]] = {
    val rng = new java.util.Random(0x9E3779B9L)
    Seq.fill(m)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-random-projection bucket id (m-bit) for each vector: bit i =
    * sign(v · h_i). Vectors in the same bucket are likely similar. Fused
    * kernel (one pass per plane) — the composed per-plane dot form runs
    * interpreted; same fold order, same signs, same buckets. */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    call_function("lsh_bucket", vec,
      typedlit(planes.flatten), lit(planes.head.size))

  /** ANN top-k: restrict the scan to the query's LSH bucket plus all
    * buckets at Hamming distance 1 (multi-probe — recovers most of the
    * recall sign-LSH loses at bucket boundaries), then exact cosine within
    * the probed set. Scan cost ~ (mBits+1)/2^mBits of the table.
    *
    * `probeAll` probes every 2^mBits bucket — the exact regime (the
    * recall-calibration mode practitioners run to bound an index's
    * loss): the result must equal brute-force cosine top-k EXACTLY,
    * which puts the LSH plumbing — every vector hashed into exactly one
    * bucket, the probe join losing and duplicating nothing — under the
    * DuckDB oracle (`q_ann_lsh_exact`), the same trick `q_ann_ivf_exact`
    * plays on the IVF path. */
  def annTopK(emb: DataFrame, vecCol: String, idCol: String,
      queryId: Long, k: Int, dim: Int = 64, mBits: Int = 4,
      probeAll: Boolean = false): DataFrame = {
    graft.functions.GraftFunctions.registerKernels(emb.sparkSession)
    val planes = hyperplanes(dim, mBits)
    val bucketed = emb.withColumn("bucket", lshBucket(col(vecCol), planes))
    val probeBuckets: Seq[Column] =
      if (probeAll) (0 until (1 << mBits)).map(b => lit(b.toLong))
      else col("bucket") +:
        (0 until mBits).map(i =>
          col("bucket").bitwiseXOR(shiftleft(lit(1L), i)))
    // query row exploded into its probe buckets
    val probes = bucketed.where(col(idCol) === queryId)
      .select(col(vecCol).as("qv"),
        explode(array(probeBuckets: _*)).as("bucket"))
    bucketed.join(broadcast(probes), "bucket")
      .select(col(idCol), cosine(col(vecCol), col("qv")).as("sim"))
      .where(!isnan(col("sim"))) // NaN sorts above every real sim
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** IVF (inverted-file) ANN: a k-means coarse quantizer partitions the
    * corpus into `nlist` cells; a query scans only its `nprobe` nearest
    * cells with exact cosine. The scale path beside sign-LSH: cells adapt
    * to the data distribution, so recall at equal scan fraction is higher
    * on clustered corpora. Centroids are trained once (deterministic
    * seed) and broadcast; the assignment pass is one scan + one narrow
    * shuffle-free projection per row.
    *
    * Returns (cells, assigned): the centroid table (cell, centroid) and
    * the corpus with its cell id — callers reuse `assigned` across
    * queries via [[ivfTopK]]. */
  def ivfIndex(emb: DataFrame, vecCol: String, idCol: String,
      nlist: Int = 16, trainSample: Int = 2048): (Array[(Int, Array[Double])],
      DataFrame) = {
    graft.functions.GraftFunctions.registerKernels(emb.sparkSession)
    // IVF quantizers train on a bounded driver-side sample (FAISS-style):
    // at corpus scale the distributed work is the ASSIGNMENT scan, not the
    // training — a cluster k-means over all rows buys nothing for a coarse
    // quantizer and costs a multi-job iteration loop. The sample is the
    // top-N by id hash (a seeded pseudo-random, deterministic spread via
    // per-partition top-k merge) — a bare limit() would take a partition-
    // order prefix, which is biased when the corpus is clustered by id.
    val sample = emb
      .select(col(vecCol))
      .orderBy(xxhash64(col(idCol)))
      .limit(trainSample)
      .collect()
      .map(r => unitOf(toDoubles(r.getSeq[Any](0))))
    require(sample.length >= nlist, s"need >= $nlist training vectors")
    val dim = sample.head.length
    // the SHARED lloyd: deterministic stride init + 5 local iterations
    // (a coarse quantizer doesn't need convergence; empty cells keep
    // their centroid). Training runs on UNIT-normalized vectors and the
    // centroids renormalize to unit length: every consumer of these
    // cells pairs/scores by COSINE, and with |c| = 1 the assignment
    // kernel's L2 argmin over a RAW corpus vector (|v|² − 2v·c + 1) is
    // monotone in v·c — i.e. the cosine argmax — so cosine-identical
    // vectors of different norms land in the same cell (raw-L2 cells
    // split them, the norm-skew recall hole).
    val centroids = lloyd(sample, nlist, iters = 5).map(unitOf)
    // assignment: one distributed scan with the fused argmin kernel
    val flat = centroids.flatten.toSeq
    val assigned = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      call_function("ivf_cell", col(vecCol), typedlit(flat), lit(dim))
        .as("cell"))
    (centroids.zipWithIndex.map { case (c, i) => (i, c) }, assigned)
  }

  /** Append a DELTA of vectors to an EXISTING IVF index without
    * re-clustering: the delta is assigned to the nearest FROZEN
    * centroid by the same fused kernel (one delta-sized scan) and the
    * caller unions it with the persisted cell table — the standard ANN
    * ingest path (an index rebuild per batch is O(corpus); this is
    * O(delta)). The frozen quantizer means recall drifts only if the
    * delta's distribution shifts away from the training corpus —
    * re-train + rebuild on drift, the ANN analog of the MV
    * rebuild-on-dim-change contract. Exactness is provable in the
    * nprobe = nlist regime: probing every cell makes search over
    * persisted ∪ appended identical to brute force over the full
    * corpus, which is the oracle `q_ann_ivf_incremental` runs under.
    * @return (id, v, cell) rows, schema-identical to [[ivfIndex]]'s
    *         assignment output */
  def ivfAppend(centroids: Array[(Int, Array[Double])],
      deltaEmb: DataFrame, vecCol: String, idCol: String): DataFrame = {
    graft.functions.GraftFunctions.registerKernels(deltaEmb.sparkSession)
    val dim = centroids.head._2.length
    val flat = centroids.sortBy(_._1).flatMap(_._2).toSeq
    deltaEmb.select(col(idCol).as("id"), col(vecCol).as("v"),
      call_function("ivf_cell", col(vecCol), typedlit(flat), lit(dim))
        .as("cell"))
  }

  /** ANN top-k over an IVF index: pick the query's `nprobe` nearest cells
    * (tiny driver-side centroid compare), scan only those cells with
    * exact cosine. Scan cost ~ nprobe/nlist of the table. */
  def ivfTopK(centroids: Array[(Int, Array[Double])], assigned: DataFrame,
      queryId: Long, k: Int, nprobe: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.registerKernels(assigned.sparkSession)
    val qv = toDoubles(assigned.where(col("id") === queryId)
      .select(col("v")).head().getSeq[Any](0))
    // probe ranking uses the SAME metric as cell assignment (L2 on the
    // raw vectors — the ivf_cell kernel): ranking cells by cosine here
    // can skip the query's own L2-assigned cell on a norm-skewed
    // corpus, losing its true neighbors entirely (ivfPqTopK documents
    // and applies the same rule)
    def l2sq(c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < c.length) { val d = c(i) - qv(i); s += d * d; i += 1 }
      s
    }
    val probeCells = centroids.sortBy { case (_, c) => l2sq(c) }
      .take(nprobe).map(_._1)
    val qvCol = array(qv.map(lit): _*)
    assigned.where(col("cell").isin(probeCells.map(Integer.valueOf): _*))
      .select(col("id"), cosine(col("v"), qvCol).as("sim"))
      .where(!isnan(col("sim"))) // NaN sorts above every real sim
      .orderBy(col("sim").desc, col("id").asc)
      .limit(k)
  }

  /** Symmetric int8 quantization of an embedding column — the storage
    * path at corpus scale (4× smaller than float32). Per-vector scale =
    * maxabs/127; q_i = floor(x_i/scale + 0.5), explicit half-up so the
    * rule is engine-portable. One scan, two fused kernels, no shuffle;
    * all-zero vectors quantize to zeros. */
  def quantizeInt8(emb: DataFrame, vecCol: String, idCol: String): DataFrame = {
    graft.functions.GraftFunctions.registerKernels(emb.sparkSession)
    emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("scale", call_function("vec_maxabs", col("v")) / 127.0)
      .select(col("id"), col("scale"),
        call_function("int8_quantize", col("v"), col("scale")).as("q"))
  }

  /** Cosine top-k over the int8-QUANTIZED corpus ([[quantizeInt8]]
    * output): the storage-path search. Symmetric per-vector scales cancel
    * out of the cosine, so the int8 codes alone carry the angle — the
    * scan reads the 4×-smaller code column and never reconstructs floats
    * (one integer-ALU kernel per pair, same TakeOrderedAndProject shape
    * as [[cosineTopK]]). Ranking error is bounded by quantization
    * (≤ ~1/127 per element). */
  def int8CosineTopK(quant: DataFrame, codeCol: String, idCol: String,
      queryId: Long, k: Int): DataFrame = {
    graft.functions.GraftFunctions.registerKernels(quant.sparkSession)
    val q = quant.where(col(idCol) === queryId)
      .select(col(codeCol).as("qc"))
    quant.crossJoin(broadcast(q))
      .select(col(idCol),
        call_function("int8_cosine", col(codeCol), col("qc")).as("sim"))
      // int8_cosine returns NaN on length-mismatched codes, and Spark
      // sorts NaN ABOVE every real double — without this guard (which
      // every other top-k path here carries) one malformed row would
      // occupy the #1 slot of every query
      .where(!isnan(col("sim")))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Product-quantization index (Jégou et al. 2011): the embedding
    * storage path beyond int8 — d float32 dims become `m` bytes
    * (d=64, m=8 → 32×), and search never reconstructs floats. Codebook
    * training is per-subspace k-means on the SAME bounded hash-ordered
    * driver sample as [[ivfIndex]] (the distributed work at corpus
    * scale is the encode scan, not training); encoding is one fused
    * kernel pass (normalization inside — ADC inner products then
    * approximate cosine), no shuffle.
    *
    * Returns (flatCodebook [m][ks][dsub] row-major, (id, code) frame).
    * dim must divide into `m` equal subspaces; `ks` <= 256 centroids
    * per subspace (one byte each). */
  def pqIndex(emb: DataFrame, vecCol: String, idCol: String,
      m: Int = 8, ks: Int = 256, trainSample: Int = 2048)
      : (Array[Double], DataFrame) = {
    require(ks >= 2 && ks <= 256, s"ks must be 2..256, got $ks")
    graft.functions.GraftFunctions.registerKernels(emb.sparkSession)
    val sample = emb
      .select(col(vecCol))
      .orderBy(xxhash64(col(idCol)))
      .limit(trainSample)
      .collect()
      .map(r => toDoubles(r.getSeq[Any](0)))
    require(sample.length >= ks, s"need >= $ks training vectors")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    // unit-normalize the training set — the encode kernel normalizes
    // each corpus vector the same way, so codebook and codes agree
    val normed = sample.map(unitOf)
    val book = new Array[Double](m * ks * dsub)
    var j = 0
    while (j < m) {
      val sub = normed.map(v =>
        java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      // the SHARED lloyd (stride init, fixed budget, empty cells keep
      // their centroid) — this loop was a verbatim inline copy; one
      // implementation keeps the three quantizers from drifting apart
      val cents = lloyd(sub, ks, iters = 8)
      var c = 0
      while (c < ks) {
        System.arraycopy(cents(c), 0, book, (j * ks + c) * dsub, dsub)
        c += 1
      }
      j += 1
    }
    // encode excludes zero/NaN-norm vectors: the exact path drops them
    // via its isnan(sim) filter, but under PQ a zero vector would
    // encode against the centroid nearest the origin and earn a FINITE
    // phantom ADC score that isnan can't catch, displacing true
    // neighbors from the top-k
    (book, pqEncodeWith(book, emb, vecCol, idCol, m, ks))
  }

  /** Approximate cosine top-k over the PQ-coded corpus: the per-query
    * lookup table (m*ks inner products — microseconds on the driver)
    * broadcasts as a literal, and the scan reads ONLY the m-byte code
    * column, scoring each row with one table-lookup sum (ADC). Same
    * TakeOrderedAndProject shape as the exact and int8 paths; ranking
    * error is the quantization error of the codebook. */
  def pqTopK(book: Array[Double], coded: DataFrame, emb: DataFrame,
      vecCol: String, idCol: String, queryId: Long, k: Int,
      m: Int = 8, ks: Int = 256): DataFrame = {
    graft.functions.GraftFunctions.registerKernels(coded.sparkSession)
    val raw = toDoubles(emb.where(col(idCol) === queryId)
      .select(col(vecCol)).head().getSeq[Any](0))
    val n = math.sqrt(raw.map(x => x * x).sum)
    // a zero-norm query has no cosine neighbors (the exact path returns
    // the empty set via its NaN filter); fail loudly rather than rank
    // the corpus by an all-zero lookup table's id order
    require(n > 0, s"pqTopK: query $queryId has zero-norm vector — " +
      "cosine is undefined; no neighbors exist")
    val qv = raw.map(_ / n)
    val dsub = qv.length / m
    val lut = new Array[Double](m * ks)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ks) {
        var dp = 0.0; var i = 0
        while (i < dsub) {
          dp += qv(j * dsub + i) * book((j * ks + c) * dsub + i); i += 1
        }
        lut(j * ks + c) = dp
        c += 1
      }
      j += 1
    }
    coded.select(col("id"),
        call_function("pq_adc", col("code"), typedlit(lut.toSeq)).as("sim"))
      .orderBy(col("sim").desc, col("id").asc)
      .limit(k)
  }

  // deterministic Lloyd: stride init from the (already shuffled by id
  // hash) sample, fixed iteration budget, empty cells keep their
  // centroid — the same discipline as ivfIndex/pqIndex, factored for
  // the combined index
  /** Unit-normalize (zero vectors pass through) — shared by every
    * trainer that works in the cosine geometry. */
  private def unitOf(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n > 0) v.map(_ / n) else v
  }

  private def lloyd(vs: Array[Array[Double]], k: Int,
      iters: Int): Array[Array[Double]] = {
    val dim = vs.head.length
    var cents = Array.tabulate(k)(c =>
      vs((c.toLong * vs.length / k).toInt).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      vs.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0; var i = 0
          while (i < dim) {
            val diff = v(i) - cents(c)(i); d += diff * diff; i += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      cents = Array.tabulate(k)(c =>
        if (counts(c) == 0) cents(c) else sums(c).map(_ / counts(c)))
    }
    cents
  }

  private def nearestOf(v: Array[Double],
      cents: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var d = 0.0; var i = 0
      while (i < v.length) {
        val diff = v(i) - cents(c)(i); d += diff * diff; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** IVF-PQ combined index (FAISS IndexIVFPQ; Jégou et al. 2011 §IV):
    * coarse IVF cells over unit vectors + PQ codes over the RESIDUAL
    * v/|v| − centroid. Residual coding is what makes PQ accurate at
    * billion scale — residual magnitudes are a fraction of the vector's,
    * so the same ks spends its precision on a much smaller space.
    *
    * Training is the bounded driver-side sample (hash-ordered — the
    * IVF/PQ pattern); the distributed work is ONE encode scan through
    * the fused `ivfpq_encode` kernel (assignment + residual + code per
    * row in one pass). Storage per row: 4-byte cell + m-byte code —
    * with m=8 a 64-dim float corpus compresses 32×, and a search reads
    * only the probed cells' (cell, code) columns.
    *
    * Returns (flatCentroids [nlist*dim], flatBook [m*ks*dsub], coded
    * (id, cell, code)). Persist `coded` partitioned by cell (as
    * [[saveIvfIndex]] does) for listing-time cell pruning. */
  def ivfPqIndex(emb: DataFrame, vecCol: String, idCol: String,
      nlist: Int = 16, m: Int = 8, ks: Int = 64, trainSample: Int = 2048)
      : (Array[Double], Array[Double], DataFrame) = {
    require(ks >= 2 && ks <= 256, s"ks must be 2..256, got $ks")
    graft.functions.GraftFunctions.registerKernels(emb.sparkSession)
    val sample = emb
      .select(col(vecCol))
      .orderBy(xxhash64(col(idCol)))
      .limit(trainSample)
      .collect()
      .map(r => toDoubles(r.getSeq[Any](0)))
    require(sample.length >= math.max(nlist, ks),
      s"need >= max(nlist=$nlist, ks=$ks) training vectors")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    val normed = sample.map(unitOf)
    val cents = lloyd(normed, nlist, 5)
    // fine codebooks train on the residuals the encode kernel will see
    val residuals = normed.map { v =>
      val c = cents(nearestOf(v, cents))
      Array.tabulate(v.length)(i => v(i) - c(i))
    }
    val book = new Array[Double](m * ks * dsub)
    var j = 0
    while (j < m) {
      val sub = residuals.map(v =>
        java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      val bc = lloyd(sub, ks, 8)
      var c = 0
      while (c < ks) {
        System.arraycopy(bc(c), 0, book, (j * ks + c) * dsub, dsub)
        c += 1
      }
      j += 1
    }
    val flatCents = cents.flatten
    (flatCents, book, ivfPqEncodeWith(flatCents, book, emb, vecCol, idCol, m))
  }

  /** Encode NEW embeddings against an EXISTING IVF-PQ index (frozen
    * centroids + codebook, so old and new codes stay ADC-comparable —
    * the incremental-append path, like [[pqEncodeWith]]). Zero-norm
    * vectors are excluded for the same reason as [[pqIndex]]: they
    * would earn a finite phantom ADC score a NaN filter can't catch. */
  def ivfPqEncodeWith(flatCents: Array[Double], book: Array[Double],
      emb: DataFrame, vecCol: String, idCol: String,
      m: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.registerKernels(emb.sparkSession)
    val n2 = aggregate(col(vecCol), lit(0.0d),
      (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType))
    emb.where(n2 > 0).select(col(idCol).as("id"),
        call_function("ivfpq_encode", col(vecCol),
          typedlit(flatCents.toSeq), typedlit(book.toSeq), lit(m))
          .as("s"))
      .select(col("id"), col("s.cell").as("cell"), col("s.code").as("code"))
  }

  /** ANN top-k over an IVF-PQ index: probe the query's `nprobe` nearest
    * cells, score ONLY their code column by ADC. The lookup table is
    * cell-independent (dot(q, resid_recon) = Σ_j dot(q_subj, book_jc)),
    * so one m*ks literal serves every probed cell; the per-cell term
    * dot(q, centroid) joins in as a tiny cell→double map literal. Scan
    * cost ~ nprobe/nlist of the CODE column only. */
  def ivfPqTopK(flatCents: Array[Double], book: Array[Double],
      coded: DataFrame, emb: DataFrame, vecCol: String, idCol: String,
      queryId: Long, k: Int, nprobe: Int = 4, m: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.registerKernels(coded.sparkSession)
    val raw = toDoubles(emb.where(col(idCol) === queryId)
      .select(col(vecCol)).head().getSeq[Any](0))
    val n = math.sqrt(raw.map(x => x * x).sum)
    require(n > 0, s"ivfPqTopK: query $queryId has zero-norm vector — " +
      "cosine is undefined; no neighbors exist")
    val qv = raw.map(_ / n)
    val dim = qv.length
    val nlist = flatCents.length / dim
    val ks = book.length / dim
    val dsub = dim / m
    val cents = Array.tabulate(nlist)(c =>
      java.util.Arrays.copyOfRange(flatCents, c * dim, (c + 1) * dim))
    // probe ranking uses the SAME metric as assignment (L2 in unit space)
    val probed = (0 until nlist)
      .sortBy { c =>
        var d = 0.0; var i = 0
        while (i < dim) {
          val diff = qv(i) - cents(c)(i); d += diff * diff; i += 1
        }
        d
      }
      .take(nprobe)
    val qdotc = probed.map { c =>
      var dp = 0.0; var i = 0
      while (i < dim) { dp += qv(i) * cents(c)(i); i += 1 }
      c -> dp
    }.toMap
    val lut = new Array[Double](m * ks)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ks) {
        var dp = 0.0; var i = 0
        while (i < dsub) {
          dp += qv(j * dsub + i) * book((j * ks + c) * dsub + i); i += 1
        }
        lut(j * ks + c) = dp
        c += 1
      }
      j += 1
    }
    coded
      .where(col("cell").isin(probed.map(Integer.valueOf): _*))
      .select(col("id"),
        (element_at(typedlit(qdotc), col("cell")) +
          call_function("pq_adc", col("code"), typedlit(lut.toSeq)))
          .as("sim"))
      .orderBy(col("sim").desc, col("id").asc)
      .limit(k)
  }

  /** Two-stage IVF-PQ search (FAISS refine step): ADC ranks a
    * `shortlist` from the probed cells' code column, then EXACT cosine
    * re-ranks only those rows from the float table. The expensive scan
    * stays code-only; the float reads are a k-row broadcast semi-join —
    * so the result carries true cosine scores (top-k exact whenever the
    * true neighbors survive the shortlist) at ~the ADC scan's cost. */
  def ivfPqTopKRefined(flatCents: Array[Double], book: Array[Double],
      coded: DataFrame, emb: DataFrame, vecCol: String, idCol: String,
      queryId: Long, k: Int, nprobe: Int = 4, m: Int = 8,
      shortlist: Int = 100): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must cover k=$k")
    val short = ivfPqTopK(flatCents, book, coded, emb, vecCol, idCol,
      queryId, shortlist, nprobe, m)
    val qv = toDoubles(emb.where(col(idCol) === queryId)
      .select(col(vecCol)).head().getSeq[Any](0))
    val qvCol = array(qv.map(lit): _*)
    // qualify BOTH sides: when the caller's id column is itself named
    // "id" (the common case) a bare col("id") is ambiguous between the
    // two join inputs and analysis fails with AMBIGUOUS_REFERENCE
    val shortIds = short.select(col("id").as("__short_id"))
    emb.join(broadcast(shortIds),
        emb(idCol) === shortIds("__short_id"), "left_semi")
      .select(col(idCol).as("id"), cosine(col(vecCol), qvCol).as("sim"))
      .where(!isnan(col("sim")))
      .orderBy(col("sim").desc, col("id").asc)
      .limit(k)
  }

  /** Persist an IVF-PQ index: codes partitioned by cell (listing-time
    * cell pruning for nprobe searches, like [[saveIvfIndex]]) + one
    * meta row (centroids, codebook, m). Append new corpus batches with
    * [[ivfPqEncodeWith]] against the loaded meta +
    * `.write.mode(Append).partitionBy("cell")` under `path`/cells. */
  def saveIvfPqIndex(path: String, flatCents: Array[Double],
      book: Array[Double], coded: DataFrame, m: Int): Unit = {
    val spark = coded.sparkSession
    import spark.implicits._
    coded.write.mode(SaveMode.Overwrite)
      .partitionBy("cell").parquet(path + "/cells")
    Seq((flatCents.toSeq, book.toSeq, m)).toDF("cents", "book", "m")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(path + "/meta")
  }

  /** Load an IVF-PQ index saved by [[saveIvfPqIndex]]:
    * (flatCents, book, m, coded). Codes load lazily; a search's cell
    * filter prunes unprobed cells' files at listing time. */
  def loadIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): (Array[Double], Array[Double], Int, DataFrame) = {
    val meta = spark.read.parquet(path + "/meta").head()
    (meta.getSeq[Double](meta.fieldIndex("cents")).toArray,
      meta.getSeq[Double](meta.fieldIndex("book")).toArray,
      meta.getInt(meta.fieldIndex("m")),
      spark.read.parquet(path + "/cells")
        .select(col("id"), col("cell"), col("code")))
  }

  /** Persist an IVF index: the assigned corpus as parquet under
    * `path`/cells PARTITIONED BY cell — an nprobe search filters on
    * cell, so partition pruning skips every unprobed cell's files at
    * listing time (the on-disk analog of scanning one inverted list) —
    * and the centroids under `path`/meta. Overwrites. */
  def saveIvfIndex(path: String,
      centroids: Array[(Int, Array[Double])], assigned: DataFrame): Unit = {
    val spark = assigned.sparkSession
    import spark.implicits._
    assigned.write.mode(SaveMode.Overwrite)
      .partitionBy("cell").parquet(path + "/cells")
    centroids.toSeq.map { case (i, c) => (i, c.toSeq) }
      .toDF("cell", "centroid")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(path + "/meta")
    // drift baseline: the training corpus's mean squared distance to
    // its cells, read back by [[appendIvfIndex]]'s re-train signal.
    // Computed from the JUST-WRITTEN cells (not `assigned` — its plan
    // may be expensive), one save-time scan.
    val b = meanCellDist(centroids, spark.read.parquet(path + "/cells")
      .select(col("id"), col("v"), col("cell")))
    Seq(b).toDF("mean_dist").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(driftPath(path))
  }

  /** Load an IVF index saved by [[saveIvfIndex]]: (centroids,
    * assigned). Search the result with [[ivfTopK]] — its cell filter
    * becomes a partition-pruning predicate on the cell directories. */
  def loadIvfIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): (Array[(Int, Array[Double])], DataFrame) = {
    val cents = spark.read.parquet(path + "/meta").collect()
      .map(r => r.getInt(r.fieldIndex("cell")) ->
        r.getSeq[Double](r.fieldIndex("centroid")).toArray)
      .sortBy(_._1)
    (cents, spark.read.parquet(path + "/cells"))
  }

  /** Mean squared L2 distance to the assigned (unit) centroid over an
    * assignment table — the per-corpus "how well do the cells fit"
    * statistic the drift signal compares. |v−c|² = v·v − 2 v·c + 1. */
  private def meanCellDist(cents: Array[(Int, Array[Double])],
      assigned: DataFrame): Double = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val cdf = broadcast(cents.toSeq.map { case (i, c) => (i, c.toSeq) }
      .toDF("cell", "__cent"))
    val r = assigned.join(cdf, "cell")
      .agg(avg(dot(col("v"), col("v")) -
        lit(2.0) * dot(col("v"), col("__cent")) + lit(1.0))).head()
    if (r.isNullAt(0)) 0.0 else r.getDouble(0)
  }

  private def driftPath(path: String) = path + "/drift"

  private def readDriftBaseline(
      spark: org.apache.spark.sql.SparkSession, path: String)
      : Option[Double] = scala.util.Try(
    spark.read.parquet(driftPath(path)).head().getDouble(0)).toOption

  /** Append a delta batch INTO a persisted IVF index ([[saveIvfIndex]]
    * layout): frozen-centroid assignment (O(delta), one scan — no
    * re-clustering, no corpus read for the data path), written straight
    * into the `cells/cell=<i>` partition dirs, so subsequent searches
    * see one index — not index-plus-loose-fragments the caller must
    * union ([[ivfAppend]] returns rows and leaves the bookkeeping to
    * the caller; repeated ingest batches through THAT shape accumulate
    * outside the persisted index).
    *
    * Drift signal (the re-train trigger the frozen-quantizer contract
    * names): returns the ratio of the DELTA's mean squared distance to
    * its assigned centroids over the index's persisted baseline (the
    * corpus-at-save statistic under `drift/`; a legacy save without one
    * gets it backfilled from the persisted cells — one corpus scan,
    * once). A ratio near 1 means the delta looks like the training
    * corpus; past `driftWarnRatio` the append still lands (it is
    * CORRECT — every vector is in its nearest frozen cell) but logs a
    * loud warning: recall at fixed nprobe degrades when the data moves
    * away from the centroids, and the fix is re-train + rebuild.
    *
    * `dedupeIds = true` makes the append IDEMPOTENT: delta ids already
    * present in the index are dropped before the write (an anti-join
    * against ONLY the delta's own cells — partition pruning keeps the
    * probe touched-cells-sized, so the append stays O(delta + touched
    * cells), never O(corpus)). That is what makes a REPLAYED ingest
    * batch safe ([[graft.streaming.EventStreams.maintainIvfIndex]]
    * turns it on): a blind re-append would double every replayed
    * vector in its cell. Caveat: dedupe is by ID — a re-sent id
    * carrying a DIFFERENT vector is treated as a replay and IGNORED
    * (an index has no in-place update; delete + rebuild or re-id to
    * mutate a vector). NULL-celled ids (empty index edge) never match
    * the anti-join and append normally.
    *
    * Single-writer, like every persisted-artifact mutator here. Many
    * small appends accumulate files per cell dir —
    * [[compactIvfIndex]] rewrites one file per cell. */
  def appendIvfIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, deltaEmb: DataFrame, vecCol: String, idCol: String,
      driftWarnRatio: Double = 1.5, dedupeIds: Boolean = false): Double = {
    import spark.implicits._
    val (cents, persisted) = loadIvfIndex(spark, path)
    val baseline = readDriftBaseline(spark, path).getOrElse {
      val b = meanCellDist(cents,
        persisted.select(col("id"), col("v"), col("cell")))
      Seq(b).toDF("mean_dist").coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(driftPath(path))
      b
    }
    val assignedDelta = ivfAppend(cents, deltaEmb, vecCol, idCol)
    val delta = (if (!dedupeIds) assignedDelta else {
      // prune to the delta's own cells FIRST (driver-collected cell
      // set: bounded by nlist) so the existing-id probe reads only the
      // touched `cell=` partition dirs
      val touched = assignedDelta.select(col("cell")).distinct()
        .collect().map(_.getInt(0)).toSeq
      val existing = persisted
        .where(col("cell").isInCollection(touched))
        .select(col("id"))
      assignedDelta.join(existing, Seq("id"), "left_anti")
    }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val deltaMean = meanCellDist(cents, delta)
      delta.write.mode(SaveMode.Append).partitionBy("cell")
        .parquet(path + "/cells")
      val ratio = if (baseline <= 0.0) 1.0 else deltaMean / baseline
      if (ratio > driftWarnRatio)
        java.lang.System.err.println(
          f"[graft] IVF DRIFT at $path: delta mean cell distance " +
            f"$deltaMean%.4f vs baseline $baseline%.4f " +
            f"(${ratio}%.2fx > ${driftWarnRatio}%.2fx) — recall at " +
            "fixed nprobe degrades; re-train + rebuild the index")
      ratio
    } finally delta.unpersist()
  }

  /** Rewrite the persisted cell table to ONE file per cell (repartition
    * on the cell id before the partitioned write — the same
    * one-file-per-bucket discipline as
    * [[graft.operators.Materialize]]'s state write): appended batches
    * each leave a file per touched cell, and a long-ingesting index
    * degrades every probe into a many-small-files listing. Same caller
    * contract as compactState: run when no concurrent reader/writer of
    * the index remains (the swap is delete-then-rename).
    * Centroids and the drift baseline are untouched. */
  def compactIvfIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val cellsDir = new org.apache.hadoop.fs.Path(path + "/cells")
    val tmp = new org.apache.hadoop.fs.Path(
      path + s"/cells_c${System.nanoTime()}")
    spark.read.parquet(cellsDir.toString)
      .repartition(col("cell"))
      .write.partitionBy("cell").parquet(tmp.toString)
    val fs = cellsDir.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(cellsDir, true)
    if (!fs.rename(tmp, cellsDir))
      throw new java.io.IOException(
        s"compactIvfIndex($path): cannot move compacted cells into place")
  }

  /** Persist a PQ index: the coded corpus as parquet under
    * `path`/codes and the codebook + params as a single-row parquet
    * under `path`/meta. At corpus scale the index is built ONCE and
    * searched by many jobs — persistence turns the encode scan into a
    * one-time cost (the FAISS on-disk index pattern). Overwrites — so
    * `coded` must NOT read from `path` itself (Spark rejects
    * overwriting an input path); to grow a saved index use
    * [[appendPqIndex]], which appends files without reading. */
  def savePqIndex(path: String, book: Array[Double], coded: DataFrame,
      m: Int, ks: Int): Unit = {
    val spark = coded.sparkSession
    import spark.implicits._
    coded.write.mode(SaveMode.Overwrite).parquet(path + "/codes")
    Seq((book.toSeq, m, ks)).toDF("book", "m", "ks")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(path + "/meta")
  }

  /** Load a PQ index saved by [[savePqIndex]]:
    * (book, m, ks, coded). The meta read is one tiny file; codes load
    * lazily as a normal parquet scan (pruned/pushed like any table). */
  def loadPqIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): (Array[Double], Int, Int, DataFrame) = {
    val meta = spark.read.parquet(path + "/meta").head()
    (meta.getSeq[Double](meta.fieldIndex("book")).toArray,
      meta.getInt(meta.fieldIndex("m")),
      meta.getInt(meta.fieldIndex("ks")),
      spark.read.parquet(path + "/codes"))
  }

  /** Append new codes to a saved index IN PLACE: parquet Append adds
    * files under `path`/codes without reading the existing ones, so
    * (unlike loadPqIndex + union + savePqIndex back to the same path,
    * which overwrites an input path) growing the index is safe and
    * touches only the new data. Encode the appendix with
    * [[pqEncodeWith]] against the SAVED codebook. */
  def appendPqIndex(path: String, coded: DataFrame): Unit =
    coded.write.mode(SaveMode.Append).parquet(path + "/codes")

  /** Encode NEW embeddings against an EXISTING codebook (incremental
    * index append — no retrain; the codebook is frozen so old and new
    * codes stay comparable under the same ADC tables). Same zero/NaN
    * norm exclusion as [[pqIndex]]. */
  def pqEncodeWith(book: Array[Double], emb: DataFrame, vecCol: String,
      idCol: String, m: Int = 8, ks: Int = 256): DataFrame = {
    graft.functions.GraftFunctions.registerKernels(emb.sparkSession)
    val n2 = aggregate(col(vecCol), lit(0.0d),
      (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType))
    emb.where(n2 > 0).select(col(idCol).as("id"),
      call_function("pq_encode", col(vecCol), typedlit(book.toSeq),
        lit(m), lit(ks)).as("code"))
  }

  /** Embedding-cosine near-duplicate pairs, exact bounded form (the
    * correctness baseline — O(n²); the scale path is [[knnJoin]]'s
    * LSH-bucketed self-join followed by the same threshold). */
  def cosineNearDupPairs(emb: DataFrame, vecCol: String, idCol: String,
      threshold: Double): DataFrame = {
    graft.functions.GraftFunctions.registerKernels(emb.sparkSession)
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine(col("v_a"), col("v_b")).as("sim"))
      .where(col("sim") >= threshold)
  }

  /** Batch k-NN self-join via LSH buckets: per-id top-k neighbors within
    * the same bucket (the all-pairs scale path — shuffle on bucket, no
    * full cross join).
    *
    * Degenerate-bucket guard (same contract as [[Dedup.DefaultMaxBucket]]):
    * the in-bucket self-join is quadratic per bucket, so one hot bucket —
    * near-identical boilerplate or zero vectors all landing on the same
    * sign pattern — goes O(n²) at corpus scale. Buckets above `maxBucket`
    * are dropped: their members are near-duplicates that exact/fingerprint
    * dedup already collapses, and their rows simply get no kNN edges
    * (they'd all be trivial sim≈1 pairs anyway). At 100× rows also raise
    * `mBits` ~ log2(n / targetBucketSize) so expected bucket population
    * stays constant.
    *
    * `idCol` must be integral (TINYINT..BIGINT — enforced at analysis
    * time by the bounded-heap aggregate; output ids are BIGINT). A NaN
    * similarity (zero vector) contributes no neighbor edge. */
  def knnJoin(emb: DataFrame, vecCol: String, idCol: String, k: Int,
      dim: Int = 64, mBits: Int = 8,
      maxBucket: Int = Dedup.DefaultMaxBucket,
      simBand: Option[(Double, Double)] = None): DataFrame = {
    graft.functions.GraftFunctions.registerKernels(emb.sparkSession)
    val planes = hyperplanes(dim, mBits)
    val b0 = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", lshBucket(col("v"), planes))
    // cap via aggregate+join, not a window: the partial count shrinks
    // map-side and the bucket exchange carries no per-bucket sort
    val small = b0.groupBy(col("bucket"))
      .agg(count(lit(1)).as("bn"))
      .where(col("bn") <= maxBucket)
      .select(col("bucket"))
    val b = b0.join(small, "bucket")
    val l = b.toDF("bucket", "id_a", "v_a")
    val r = b.toDF("bucket", "id_b", "v_b")
    // per-id top-k via the bounded-heap aggregate: the exchange carries
    // at most k neighbors per (id, map task) instead of every in-bucket
    // pair, and there is no per-id sort — same (score desc, id asc)
    // order the row_number window form had
    val pairs = l.join(r, "bucket").where(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine(col("v_a"), col("v_b")).as("sim"))
    // band filter BEFORE the heap (hard-negative mining): filtering the
    // top-k afterwards would lose candidates ranked below near-dups
    simBand.fold(pairs) { case (lo, hi) =>
      pairs.where(col("sim") >= lo && col("sim") < hi)
    }
      .groupBy(col("id_a"))
      .agg(call_function("top_scored_id", col("id_b"), col("sim"), lit(k))
        .as("top"))
      .select(col("id_a"), explode(col("top")).as("e"))
      .select(col("id_a"), col("e.id").as("id_b"), col("e.score").as("sim"))
  }

  /** Hard-negative mining for contrastive retrieval training (the
    * ANCE/DPR data-prep step, Xiong et al. 2021): per anchor, the k
    * most-similar candidates with cosine in [lo, hi) — similar enough
    * to be informative negatives, below the near-dup bar so latent
    * positives don't leak into the negative set. Exact bounded form
    * (cross join — the correctness baseline); the scale path is
    * [[hardNegativesLsh]]. Per-anchor top-k rides the bounded-heap
    * aggregate, not a window. */
  def hardNegatives(emb: DataFrame, vecCol: String, idCol: String,
      k: Int, lo: Double, hi: Double): DataFrame = {
    graft.functions.GraftFunctions.registerKernels(emb.sparkSession)
    val a = emb.select(col(idCol).as("anchor"), col(vecCol).as("v_a"))
    val b = emb.select(col(idCol).as("cand"), col(vecCol).as("v_b"))
    a.crossJoin(b).where(col("anchor") =!= col("cand"))
      .select(col("anchor"), col("cand"),
        cosine(col("v_a"), col("v_b")).as("sim"))
      .where(col("sim") >= lo && col("sim") < hi)
      .groupBy(col("anchor"))
      .agg(call_function("top_scored_id", col("cand"), col("sim"), lit(k))
        .as("top"))
      .select(col("anchor"), explode(col("top")).as("e"))
      .select(col("anchor"), col("e.id").as("negative"),
        col("e.score").as("sim"))
  }

  /** Scale path for [[hardNegatives]]: the LSH-bucketed [[knnJoin]]
    * with the band filter pushed BEFORE its per-anchor heap, so
    * negatives ranked below in-band near-dups still surface. Same
    * degenerate-bucket and mBits-scaling contract as knnJoin. */
  def hardNegativesLsh(emb: DataFrame, vecCol: String, idCol: String,
      k: Int, lo: Double, hi: Double, dim: Int = 64, mBits: Int = 8,
      maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame =
    knnJoin(emb, vecCol, idCol, k, dim, mBits, maxBucket,
        simBand = Some((lo, hi)))
      .toDF("anchor", "negative", "sim")

  /** SemDeDup-style semantic deduplication (Abbas et al., "SemDeDup:
    * Data-efficient learning at web-scale through semantic
    * deduplication", 2023): cluster embeddings with the coarse k-means
    * quantizer, find near-duplicate pairs only WITHIN each cluster, and
    * collapse the transitive groups — the cluster pass turns the O(n²)
    * all-pairs problem into nlist independent in-cell problems, which is
    * the published recipe for semantic dedup at corpus scale.
    *
    * Composition of existing scale paths: [[ivfIndex]] (bounded
    * driver-side training + one distributed assignment scan) → in-cell
    * self-join on the cell key (shuffle on cell, never a cross join) →
    * [[Dedup.connectedComponents]] (min-label propagation) → canonical
    * survivor = min id per group.
    *
    * Assignment is SOFT — each vector pairs within its TWO nearest cells
    * (`ivf_cells`, one fused pass): near-duplicates that straddle a
    * Voronoi boundary still share their runner-up cell, closing the
    * clustered approach's main recall hole for ~2× pair work. Cells
    * above `maxCell` are dropped from pairing (their rows keep
    * themselves — no edges), same degenerate-bucket contract as
    * [[knnJoin]]: a giant cell means near-identical boilerplate that
    * exact/fingerprint dedup already collapses, and at 100× rows `nlist`
    * scales with the corpus so expected cell population stays constant.
    *
    * @return (id, cluster_id, is_canonical): every input row, its
    *         semantic-group id (min reachable id), and whether it is the
    *         group's survivor
    */
  def semanticDedup(emb: DataFrame, vecCol: String, idCol: String,
      tau: Double, nlist: Int = 16, trainSample: Int = 2048,
      maxCell: Int = Dedup.DefaultMaxBucket): DataFrame = {
    val (cents, _) = ivfIndex(emb, vecCol, idCol, nlist, trainSample)
    val dim = cents.head._2.length
    val flat = cents.sortBy(_._1).flatMap(_._2).toSeq
    val soft = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      explode(call_function("ivf_cells",
        col(vecCol), typedlit(flat), lit(dim))).as("cell"))
    // cap via aggregate+join (map-side-combinable count, no per-cell
    // sort), same shape as knnJoin's bucket cap
    val smallCells = soft.groupBy(col("cell"))
      .agg(count(lit(1)).as("cn"))
      .where(col("cn") <= maxCell)
      .select(col("cell"))
    val capped = soft.join(smallCells, "cell")
      .select(col("id"), col("v"), col("cell"))
    val a = capped.toDF("id_a", "v_a", "cell")
    val b = capped.toDF("id_b", "v_b", "cell")
    val edges = a.join(b, "cell").where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine(col("v_a"), col("v_b")).as("sim"))
      .where(col("sim") >= tau)
      .select(col("id_a"), col("id_b"))
      .distinct() // a pair can share both probe cells
    val vertices = emb.select(col(idCol).as("id"))
    val clusters = Dedup.connectedComponents(vertices, edges)
    clusters.select(col("id"), col("cluster_id"),
      (col("id") === col("cluster_id")).as("is_canonical"))
  }
}
