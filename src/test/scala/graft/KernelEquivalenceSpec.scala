package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions
import graft.operators.{Similarity, TextAnalysis}

/** Property tests: every fused codegen kernel must be BIT-IDENTICAL (or
  * exactly boolean-equivalent) to the composed-builtins form it replaced
  * — the fusions are performance rewrites, never semantic ones. Seeded
  * random inputs run through BOTH forms as columns of one DataFrame and
  * every row must agree exactly (no tolerance).
  */
class KernelEquivalenceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = TestSpark.spark
    GraftFunctions.register(s)
    s
  }

  private val rng = new scala.util.Random(0xC0FFEE)
  private def randVec(n: Int): List[Float] =
    List.fill(n)((rng.nextFloat() - 0.5f) * 20f)
  private val vocab = Array("the", "and", "der", "und", "le", "data",
    "spark", "scan", "xylophone", "a", "abcdefghijklm", "", "que", "est")
  private def randWords(): List[String] =
    List.fill(rng.nextInt(12))(vocab(rng.nextInt(vocab.length)))

  test("cosine_sim == composed dot/norm fold, bit-exact; NaN on mismatch") {
    import spark.implicits._
    val cases = List.fill(200)((randVec(16), randVec(16)))
    val rows = cases.toDF("a", "b").select(
      call_function("cosine_sim", $"a", $"b").as("fused"),
      (Similarity.dot($"a", $"b") /
        (Similarity.norm($"a") * Similarity.norm($"b"))).as("composed"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"${r.getDouble(0)} != ${r.getDouble(1)}")
    }
    // length mismatch → NaN, never a plausible score
    assert(Seq((randVec(16), randVec(8))).toDF("a", "b")
      .select(call_function("cosine_sim", $"a", $"b"))
      .head().getDouble(0).isNaN)
    // zero-norm vector → NaN; here the fused kernel intentionally
    // DIVERGES from the composed form, which throws DIVIDE_BY_ZERO under
    // ANSI mode — a zero embedding must not kill a corpus-wide job
    assert(Seq((List.fill(16)(0f), randVec(16))).toDF("a", "b")
      .select(call_function("cosine_sim", $"a", $"b"))
      .head().getDouble(0).isNaN)
  }

  test("text_metrics == the four regexp_replace passes it replaced") {
    import spark.implicits._
    // real corpus text + adversarial edges: empty, whitespace-only,
    // unicode letters with/without case, digit/punct runs
    val corpus = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select($"text").as[String].collect().toList
    val edges = List("", " ", " \t\n\f\r ", "a", "A", "0129",
      ".,;:!?", "É é ß ñ Ñ Ω", "naïve café 3.14, v2!", "ab\ncd\t5?",
      "¡¿ --- ***", "x" * 500, "mixed 42 UPPER lower ..!",
      // one-to-many lowercase mapping: 'İ' (U+0130) lowers to i+U+0307,
      // one symbol under the regex on lower(text); and context-sensitive
      // final sigma — both forms are symbols either way
      "İstanbul İİ", "ΣΟΦΟΣ ΣΣ")
    val rows = (corpus ++ edges).map(Tuple1(_)).toDF("text").select(
      call_function("text_metrics", $"text").as("m"),
      length(regexp_replace($"text", "\\s+", "")).as("strip_len"),
      length(regexp_replace(lower($"text"), "[a-z0-9\\s]", ""))
        .as("symbol"),
      length(regexp_replace($"text", "[^0-9]", "")).as("digit"),
      length(regexp_replace($"text", "[^0-9.,;:!?]", "")).as("punct"))
      .collect()
    rows.foreach { r =>
      val m = r.getStruct(0)
      assert(m.getInt(0) == r.getInt(1), s"strip_len on row $r")
      assert(m.getInt(1) == r.getInt(2), s"symbol on row $r")
      assert(m.getInt(2) == r.getInt(3), s"digit on row $r")
      assert(m.getInt(3) == r.getInt(4), s"punct on row $r")
    }
    // null text → null struct, like length(regexp_replace(NULL))
    assert(List(Tuple1(null: String)).toDF("text")
      .select(call_function("text_metrics", $"text")).head().isNullAt(0))
  }

  test("stopword_hits == size(filter(isin)) for every language") {
    import spark.implicits._
    val df = List.fill(300)(Tuple1(randWords())).toDF("ws")
    for (lang <- Seq("en", "de", "fr", "es")) {
      val rows = df.select(
        TextAnalysis.stopwordHits($"ws", lang).as("fused"),
        size(filter($"ws", w =>
          w.isin(TextAnalysis.stopwordsFor(lang).map(lit): _*)))
          .as("composed")).collect()
      rows.foreach(r => assert(r.getInt(0) == r.getInt(1), s"$lang differs"))
    }
  }

  test("max_strlen reproduces exists/forall length predicates") {
    import spark.implicits._
    val df = List.fill(300)(Tuple1(randWords())).toDF("ws")
    val rows = df.select(
      (call_function("max_strlen", $"ws") > 6).as("fa"),
      exists($"ws", w => length(w) > 6).as("ha"),
      (call_function("max_strlen", $"ws") <= 12).as("fl"),
      forall($"ws", w => length(w) <= 12).as("hl")).collect()
    rows.foreach { r =>
      // empty arrays: exists → false, forall → true; max_strlen(empty)=0
      assert(r.getBoolean(0) == r.getBoolean(1), "exists differs")
      assert(r.getBoolean(2) == r.getBoolean(3), "forall differs")
    }
  }

  test("lsh_bucket == composed per-plane sign fold") {
    import spark.implicits._
    val planes = Similarity.hyperplanes(16, 4)
    val composed = planes.zipWithIndex.map { case (p, i) =>
      val arr = array(p.map(lit): _*)
      when(Similarity.dot($"v", arr) >= 0, shiftleft(lit(1L), i))
        .otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    val rows = List.fill(200)(Tuple1(randVec(16))).toDF("v")
      .select(Similarity.lshBucket($"v", planes).as("fused"),
        composed.as("composed")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("int8_quantize matches per-element floor(x/scale + 0.5)") {
    import spark.implicits._
    val cases = List.fill(200)(Tuple1(randVec(16))) :+
      Tuple1(List.fill(16)(0f)) // all-zero → scale 0 → zero bytes
    val rows = cases.toDF("v")
      .withColumn("scale", call_function("vec_maxabs", $"v") / 127.0)
      .select($"v", $"scale",
        call_function("int8_quantize", $"v", $"scale").as("q"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0)
      val scale = r.getDouble(1)
      val q = r.getAs[Array[Byte]](2)
      val expect = v.map(x =>
        if (scale > 0) math.floor(x.toDouble / scale + 0.5).toByte
        else 0.toByte)
      assert(q.toSeq == expect, s"quantization differs on $v")
      assert(scale == v.map(x => math.abs(x.toDouble)).max / 127.0)
    }
  }

  test("binary bit/byte kernels: wrap invariance and set/get roundtrips") {
    // concrete reference-anchored cases (hand-derived from PBinaryBase
    // semantics, NOT the implementation's formula) live in FunctionsSpec;
    // here: properties a wrong implementation would break — offset
    // translation by ±len is an identity, in-bounds offsets index
    // directly, and every set is observable at the same offset
    import graft.functions.BinaryBits._
    for (_ <- 0 until 500) {
      val bytes = Array.fill(1 + rng.nextInt(12))(rng.nextInt(256).toByte)
      val off = rng.nextInt(601) - 300
      val len = bytes.length
      assert(getByte(bytes, off) == getByte(bytes, off + len))
      assert(getByte(bytes, off) == getByte(bytes, off - len))
      assert(getBit(bytes, off) == getBit(bytes, off + len * 8))
      val in = rng.nextInt(len)
      assert(getByte(bytes, in) == bytes(in).toInt)
      assert(getBit(bytes, in * 8) == (bytes(in) & 1))
      // set then get roundtrips
      val v = rng.nextInt(256) - 128
      assert(getByte(setByte(bytes, off, v), off) == v.toByte.toInt)
      val bit = rng.nextInt(2)
      assert(getBit(setBit(bytes, off, bit), off) == bit)
    }
  }

  // fuzz alphabet for the text-cleanup kernels: letters, combining
  // marks (pre-NFC), zero-widths, NBSP, controls, whitespace, astral
  private val cleanAtoms: Array[String] = Array(
    "a", "B", "é", "é", "Ź", "İ", "ß", "π", "中", "😀",
    "\u200B", "\u200C", "\u200D", "\uFEFF", "\u00A0", "\u0000",
    "\u0007", "\u001F", "\u007F", " ", "  ", "\t", "\n", ".", "!",
    "?", "\"", "”", "{", "}", "javascript", "JavaScript",
    "lorem ipsum", "word", "two words")
  private def randText(maxAtoms: Int): String =
    List.fill(rng.nextInt(maxAtoms))(
      cleanAtoms(rng.nextInt(cleanAtoms.length))).mkString

  test("normalize_text == nfc + the regexp_replace chain it fused") {
    import spark.implicits._
    val nfc = udf((s: String) => java.text.Normalizer
      .normalize(s, java.text.Normalizer.Form.NFC))
    val cases = List.fill(400)(randText(24)) ++ List("", " ", "\n",
      "   \t ", "a\u200Bb", "x" * 300)
    val rows = cases.map(Tuple1(_)).toDF("t").select(
      call_function("normalize_text", $"t").as("fused"),
      trim(regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(nfc($"t"), "[\\u200B\\u200C\\u200D\\uFEFF]", ""),
            "\u00A0", " "),
          "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""),
        "[ \\t]+", " ")).as("composed"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"'${r.getString(0)}' != '${r.getString(1)}'")
    }
  }

  test("c4_line_stats == the composed HOF line-filter chain") {
    import spark.implicits._
    val lineAtoms = Array("This sentence has enough words.", "short.",
      "no terminal here", "needs JavaScript enabled please.",
      "  padded keeps going fine!  ", "Quoted line stays.”",
      "", "   ", "one two three?", "a b.", "{ lorem ipsum }",
      "Sentence number nine is fine.", "\ttabbed words exist here.")
    val cases = List.fill(300)(
      List.fill(rng.nextInt(8))(lineAtoms(rng.nextInt(lineAtoms.length)))
        .mkString("\n")) ++ List("", "\n\n", "x.")
    val rows = cases.map(Tuple1(_)).toDF("t")
      .withColumn("ls", expr(
        "filter(transform(split(t, '\n', -1), x -> trim(x)), " +
          "x -> length(x) > 0)"))
      .withColumn("kept", expr(
        "filter(ls, x -> x rlike '[.!?\"”]$' " +
          "and size(filter(split(x, '\\\\s+'), w -> length(w) > 0)) >= 3 " +
          "and not contains(lower(x), 'javascript'))"))
      .select(
        call_function("c4_line_stats", $"t").as("m"),
        array_join($"kept", "\n").as("clean"),
        size($"ls").as("n_lines"), size($"kept").as("n_kept"),
        length(regexp_replace(array_join($"kept", "\n"), "[^.!?]", ""))
          .as("n_sent"),
        lower($"t").contains("lorem ipsum").as("lorem"),
        ($"t".contains("{") || $"t".contains("}")).as("brace"))
      .collect()
    rows.foreach { r =>
      val m = r.getStruct(0)
      assert(m.getString(0) == r.getString(1), s"clean_text on $r")
      assert(m.getInt(1) == r.getInt(2), s"n_lines on $r")
      assert(m.getInt(2) == r.getInt(3), s"n_kept on $r")
      assert(m.getInt(3) == r.getInt(4), s"n_sentences on $r")
      assert(m.getBoolean(4) == r.getBoolean(5), s"has_lorem on $r")
      assert(m.getBoolean(5) == r.getBoolean(6), s"has_brace on $r")
    }
  }

  test("line_blocklist_filter == the closure udf it replaced, " +
      "bit-exact on corpus text + adversarial edges") {
    import spark.implicits._
    import graft.functions.{LineBlocklistFilter, LineBlocklistKernel}
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val corpus = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select($"text").as[String].collect().toList
    val texts = corpus ++ List("", "\n", "a\n\nb\n", "solo",
      "dup\ndup\nkeep", "tail\n")
    // blocked set: every line occurring >= 2 times across the inputs
    // (the boilerplate definition), hashed exactly like lineFreqTable
    def h(l: String): Long = {
      val b = l.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        b.length, 42L)
    }
    val blocked = texts.flatMap(_.split("\n", -1)).groupBy(identity)
      .collect { case (l, o) if o.size >= 2 => h(l) }.toArray
    val kernel = new LineBlocklistKernel(blocked, "\n")
    val set = blocked.toSet
    val rows = texts.toDF("t")
      .select(ColumnBridge.toColumn(LineBlocklistFilter(
        ColumnBridge.toExpression($"t"), kernel)).as("m"), $"t")
      .collect()
    rows.foreach { r =>
      val m = r.getStruct(0)
      val lines = r.getString(1).split("\n", -1)
      val kept = lines.filterNot(l => set.contains(h(l)))
      assert(m.getLong(0) == lines.length.toLong, s"n_lines on $r")
      assert(m.getLong(1) == kept.length.toLong, s"n_kept on $r")
      assert(m.getString(2) == kept.mkString("\n"), s"text_clean on $r")
    }
  }
}
