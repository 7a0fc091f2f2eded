package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Scan-local text cleanup kernels for corpus curation:
  *
  *  - [[NormalizeText]] — Unicode NFC + junk-character repair (the
  *    ftfy/CCNet-style normalization pass every web corpus gets before
  *    dedup/scoring; running it BEFORE fingerprinting makes visually
  *    identical docs hash-identical).
  *  - [[C4LineStats]] — the C4 line/document cleaning rules (Raffel et
  *    al. 2020, "Exploring the Limits of Transfer Learning", §2.2) as
  *    one fused pass per document.
  *
  * Both are single-scan kernels with no shuffle: at 100 TB the corpus
  * cleaning pass is pure map work, and the composed alternative (a
  * 5-deep regexp_replace chain / per-line higher-order filters) re-scans
  * every document once per rule. Codegen'd via a static kernel call, so
  * the scan stays inside one whole-stage span.
  */
object TextCleanKernel {

  private def isZeroWidth(cp: Int): Boolean =
    cp == 0x200B || cp == 0x200C || cp == 0x200D || cp == 0xFEFF

  private def isStrippedControl(cp: Int): Boolean =
    (cp < 0x20 && cp != '\n' && cp != '\t') || cp == 0x7F

  /** NFC-compose, then one output-building pass:
    *  1. zero-width chars (U+200B..200D, U+FEFF) dropped;
    *  2. NBSP (U+00A0) mapped to a plain space;
    *  3. control chars below 0x20 (except \n, \t) and DEL dropped;
    *  4. runs of [ \t] collapsed to a single space (newlines preserved —
    *     line structure survives for the line-level filters);
    *  5. leading/trailing spaces trimmed.
    * Exactly the composed chain `trim(regexp_replace(... nfc ...))` the
    * oracle runs — same rule order, one traversal. */
  def normalize(s: UTF8String): UTF8String = {
    val str = java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(str.length)
    var i = 0
    var pendingSpace = false
    while (i < str.length) {
      var cp = str.codePointAt(i)
      i += Character.charCount(cp)
      if (!isZeroWidth(cp) && !isStrippedControl(cp)) {
        if (cp == 0xA0) cp = ' '
        if (cp == ' ' || cp == '\t') pendingSpace = true
        else {
          // no leading space; a pending run flushes as ONE space
          if (pendingSpace && sb.length() > 0) sb.append(' ')
          pendingSpace = false
          sb.appendCodePoint(cp)
        }
      }
    }
    UTF8String.fromString(sb.toString) // trailing pending run never flushed
  }

  private val Lorem = "lorem ipsum"

  private def endsTerminal(line: String): Boolean = {
    if (line.isEmpty) return false
    val last = line.codePointBefore(line.length)
    last == '.' || last == '!' || last == '?' || last == '"' || last == 0x201D
  }

  private def wordCount(line: String): Int = {
    var n = 0
    var i = 0
    var inWord = false
    while (i < line.length) {
      val c = line.charAt(i)
      val ws = c == ' ' || c == '\t' || c == '\n' || c == 0x0B ||
        c == '\f' || c == '\r'
      if (!ws && !inWord) n += 1
      inWord = !ws
      i += 1
    }
    n
  }

  /** The published C4 rules, one pass over the document:
    *
    * line level (lines = '\n'-separated, space-trimmed):
    *  - keep only lines ending in a terminal punctuation mark
    *    (period / exclamation / question mark / end quote — §2.2 rule 1);
    *  - drop lines with fewer than 3 words (rule 2b);
    *  - drop lines containing the word "javascript" (rule 4);
    *
    * document level (flags — the caller applies the drop):
    *  - n_sentences: terminal marks [.!?] in the KEPT text ("discard any
    *    page with fewer than 5 sentences", rule 2a);
    *  - has_lorem: "lorem ipsum" anywhere in the ORIGINAL text (rule 5);
    *  - has_brace: '{' or '}' anywhere in the original (rule 6 — code).
    *
    * Returns struct(clean_text, n_lines, n_kept, n_sentences, has_lorem,
    * has_brace). The bad-words list (rule 3) is the existing
    * Aho-Corasick blocklist operator — pass the clean text on. */
  def c4Stats(s: UTF8String): InternalRow = {
    val str = s.toString
    val lower = str.toLowerCase(java.util.Locale.ROOT)
    val hasLorem = lower.contains(Lorem)
    val hasBrace = str.indexOf('{') >= 0 || str.indexOf('}') >= 0
    val sb = new java.lang.StringBuilder(str.length)
    var nLines = 0
    var nKept = 0
    var nSentences = 0
    var start = 0
    while (start <= str.length) {
      var end = str.indexOf('\n', start)
      if (end < 0) end = str.length
      // trim ASCII spaces only — the oracle's trim() default
      var a = start
      var b = end
      while (a < b && str.charAt(a) == ' ') a += 1
      while (b > a && str.charAt(b - 1) == ' ') b -= 1
      if (b > a) {
        nLines += 1
        val line = str.substring(a, b)
        // line.toLowerCase, not a slice of `lower`: one-to-many case
        // mappings (e.g. İ → i + U+0307) shift indices between the two
        if (endsTerminal(line) && wordCount(line) >= 3 &&
          !line.toLowerCase(java.util.Locale.ROOT).contains("javascript")) {
          nKept += 1
          if (sb.length() > 0) sb.append('\n')
          sb.append(line)
          var j = 0
          while (j < line.length) {
            val c = line.charAt(j)
            if (c == '.' || c == '!' || c == '?') nSentences += 1
            j += 1
          }
        }
      }
      start = end + 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(sb.toString),
      nLines, nKept, nSentences, hasLorem, hasBrace))
  }
}

/** Compression-ratio quality signal: deflated size / raw UTF-8 size.
  * Highly compressible text is repetitive boilerplate (the MassiveWeb/
  * RefinedWeb-family filter — a cheap, language-agnostic complement to
  * the explicit Gopher repetition counters); near-incompressible text
  * at the other extreme is often binary junk or gibberish. */
object DeflateKernel {
  // one Deflater per executor thread: the native zlib handle is
  // expensive to create and NOT thread-safe; reset() between rows
  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true) // raw deflate, default level
  }

  /** deflate(text).length / utf8(text).length, level 6 raw deflate.
    * Empty text → 1.0 (incompressible by convention). The absolute
    * value depends on the zlib build, so this is a RANKING signal
    * (rows-only driver check, ordering pinned in ScalaTest), not an
    * oracle-comparable quantity. */
  def ratio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var n = 0L
    while (!d.finished()) n += d.deflate(buf)
    n.toDouble / bytes.length
  }
}

/** DEFLATE_RATIO(string) → double (see [[DeflateKernel]]).
  * Null in → null out. */
case class DeflateRatio(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(
      s"deflate_ratio requires a STRING column, got " +
        child.dataType.catalogString)
  }

  override def nullSafeEval(a: Any): Any =
    DeflateKernel.ratio(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.DeflateKernel.ratio($a)")
  override protected def withNewChildInternal(c: Expression): DeflateRatio =
    copy(child = c)
  override def prettyName: String = "deflate_ratio"
}

/** Unicode-script composition of one document — the mixed-script spam
  * signal (e.g. Cyrillic homoglyphs inside Latin text, CJK keyword
  * stuffing) and a hard precondition check for language-ID. One pass;
  * the composed form is one regex scan per script class. */
object ScriptProfileKernel {
  import java.lang.Character.UnicodeScript

  /** Counts over NON-whitespace code points (Java \s = [ \t\n\x0B\f\r]):
    * Latin / Cyrillic / Han / Arabic script letters (UTS #24 script
    * property — the same classes RE2's \p{Latin} etc. match), ASCII
    * digits, and the total. Everything else (punctuation, other
    * scripts) is the remainder total - named - digits. */
  def profile(s: UTF8String): InternalRow = {
    val str = s.toString
    var i = 0
    var latin = 0; var cyr = 0; var han = 0; var arabic = 0
    var other = 0; var digit = 0; var total = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val ws = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
        cp == '\f' || cp == '\r'
      if (!ws) {
        total += 1
        if (cp >= '0' && cp <= '9') digit += 1
        else if (cp < 128) {
          // fast path: ASCII letters are LATIN, the rest COMMON
          if ((cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z'))
            latin += 1
        } else UnicodeScript.of(cp) match {
          case UnicodeScript.LATIN => latin += 1
          case UnicodeScript.CYRILLIC => cyr += 1
          case UnicodeScript.HAN => han += 1
          case UnicodeScript.ARABIC => arabic += 1
          // LETTERS of any other script (Greek, Hangul, Hebrew,
          // Devanagari, ...): without this bucket a document stuffed
          // with an unnamed script would read as pure dominant-script
          // text — invisible to the mixed flag it exists to trip
          case _ => if (Character.isLetter(cp)) other += 1
        }
      }
      i += Character.charCount(cp)
    }
    new GenericInternalRow(Array[Any](latin, cyr, han, arabic, other, digit, total))
  }
}

/** SCRIPT_PROFILE(string) → struct<latin:int, cyrillic:int, han:int,
  * arabic:int, other:int, digit:int, total:int> (see
  * [[ScriptProfileKernel]]; `other` = letters of any unnamed script).
  * Null in → null struct. */
case class ScriptProfile(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("latin", IntegerType, nullable = false),
    StructField("cyrillic", IntegerType, nullable = false),
    StructField("han", IntegerType, nullable = false),
    StructField("arabic", IntegerType, nullable = false),
    StructField("other", IntegerType, nullable = false),
    StructField("digit", IntegerType, nullable = false),
    StructField("total", IntegerType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(
      s"script_profile requires a STRING column, got " +
        child.dataType.catalogString)
  }

  override def nullSafeEval(a: Any): Any =
    ScriptProfileKernel.profile(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.ScriptProfileKernel.profile($a)")
  override protected def withNewChildInternal(c: Expression): ScriptProfile =
    copy(child = c)
  override def prettyName: String = "script_profile"
}

/** NORMALIZE_TEXT(string) → string: NFC + junk-char repair in one pass
  * (see [[TextCleanKernel.normalize]]). Null in → null out. */
case class NormalizeText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(
      s"normalize_text requires a STRING column, got " +
        child.dataType.catalogString)
  }

  override def nullSafeEval(a: Any): Any =
    TextCleanKernel.normalize(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.TextCleanKernel.normalize($a)")
  override protected def withNewChildInternal(c: Expression): NormalizeText =
    copy(child = c)
  override def prettyName: String = "normalize_text"
}

/** C4_LINE_STATS(string) → struct<clean_text:string, n_lines:int,
  * n_kept:int, n_sentences:int, has_lorem:boolean, has_brace:boolean>:
  * the C4 cleaning rules fused into one scan (see
  * [[TextCleanKernel.c4Stats]]). Null in → null struct. */
case class C4LineStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("n_lines", IntegerType, nullable = false),
    StructField("n_kept", IntegerType, nullable = false),
    StructField("n_sentences", IntegerType, nullable = false),
    StructField("has_lorem", BooleanType, nullable = false),
    StructField("has_brace", BooleanType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(
      s"c4_line_stats requires a STRING column, got " +
        child.dataType.catalogString)
  }

  override def nullSafeEval(a: Any): Any =
    TextCleanKernel.c4Stats(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.TextCleanKernel.c4Stats($a)")
  override protected def withNewChildInternal(c: Expression): C4LineStats =
    copy(child = c)
  override def prettyName: String = "c4_line_stats"
}

/** Immutable line-blocklist probe: drop lines whose XXH64 (seed 42, the
  * SAME hash [[graft.operators.Dedup]]'s `lineFreqTable` keys `lk` by)
  * sits in a blocked set. The set rides the kernel as a SORTED long
  * array probed by binary search — zero boxing, no per-row closure
  * state, serializable once per plan instead of once per task. Built
  * for [[graft.streaming.EventStreams.lineFilterStream]]'s bounded
  * boilerplate set; the batch path keeps its anti-join form. */
final class LineBlocklistKernel(hashes0: Array[Long], sep: String)
    extends Serializable {
  private val hashes: Array[Long] = {
    val h = hashes0.clone(); java.util.Arrays.sort(h); h
  }
  private val sepPat = java.util.regex.Pattern
    .compile(java.util.regex.Pattern.quote(sep))

  def filter(text: UTF8String): InternalRow = {
    // -1 limit keeps trailing empty lines, matching SQL split()
    val lines = sepPat.split(text.toString, -1)
    val kept = new java.lang.StringBuilder
    var nKept = 0L
    var i = 0
    while (i < lines.length) {
      val b = lines(i)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(b,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
          b.length, 42L)
      if (java.util.Arrays.binarySearch(hashes, h) < 0) {
        if (nKept > 0) kept.append(sep)
        kept.append(lines(i))
        nKept += 1L
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](lines.length.toLong, nKept,
      UTF8String.fromString(kept.toString)))
  }
}

/** LINE_BLOCKLIST_FILTER(text) → struct<n_lines:long, n_kept:long,
  * text_clean:string> over a plan-bound [[LineBlocklistKernel]]. The
  * codegen'd form keeps the streaming boilerplate filter inside the
  * whole-stage span — the Scala `udf` it replaced serialized a closure
  * per task and boxed every line. Null in → null struct. */
case class LineBlocklistFilter(child: Expression,
    kernel: LineBlocklistKernel) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_lines", LongType, nullable = false),
    StructField("n_kept", LongType, nullable = false),
    StructField("text_clean", StringType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(
      s"line_blocklist_filter requires a STRING column, got " +
        child.dataType.catalogString)
  }

  override def nullSafeEval(a: Any): Any =
    kernel.filter(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("lineBlocklistKernel", kernel,
      classOf[LineBlocklistKernel].getName)
    defineCodeGen(ctx, ev, a => s"$ref.filter($a)")
  }
  override protected def withNewChildInternal(c: Expression)
      : LineBlocklistFilter = copy(child = c)
  override def prettyName: String = "line_blocklist_filter"
}
