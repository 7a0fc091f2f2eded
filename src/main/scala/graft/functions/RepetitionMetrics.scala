package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Within-document repetition counters for the Gopher quality rules
  * (Rae et al. 2021, "Scaling Language Models: ... Gopher", App. A1.1):
  * documents dominated by repeated lines/paragraphs or by a few
  * repeated n-grams are boilerplate/spam and get filtered before
  * training. The counters here are the numerators/denominators of the
  * published thresholds (dup-line fraction, dup-line CHAR fraction,
  * same for paragraphs, top n-gram char fraction, duplicated n-gram
  * char fraction).
  *
  * Both kernels are one pass per document, scan-local, no shuffle —
  * the 100-TB shape is a pure map over the corpus (the cross-DOCUMENT
  * analog lives in [[graft.operators.Dedup.crossDocDupGrams]], which
  * needs the corpus-wide shuffle this deliberately avoids). A composed
  * Spark form would need one explode+groupBy per unit (lines,
  * paragraphs, 5 gram sizes = 7 shuffles of the whole corpus).
  *
  * All counts are in Unicode CODE POINTS (what both Spark `length()`
  * and the DuckDB oracle's `len()` count), so fractions computed from
  * these integers agree bit-for-bit across engines.
  */
object RepetitionMetricsKernel {

  /** Trimmed (ASCII space only — the semantics of both Spark and
    * DuckDB `trim`) [start, end) of s, or null if empty after trim. */
  private def trimmed(s: String, from: Int, until: Int): String = {
    var a = from
    var b = until
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    if (a == b) null else s.substring(a, b)
  }

  private def codePoints(s: String): Int = s.codePointCount(0, s.length)

  /** Histogram stats of one unit sequence: (n, nDistinct, chars,
    * distinctChars) where chars counts every occurrence and
    * distinctChars each distinct unit once. */
  private def unitStats(units: java.util.ArrayList[String]): Array[Long] = {
    val counts = new java.util.HashMap[String, Int]()
    var chars = 0L
    var i = 0
    while (i < units.size()) {
      val u = units.get(i)
      counts.merge(u, 1, Integer.sum)
      chars += codePoints(u)
      i += 1
    }
    var distinctChars = 0L
    val it = counts.keySet().iterator()
    while (it.hasNext) distinctChars += codePoints(it.next())
    Array(units.size().toLong, counts.size().toLong, chars, distinctChars)
  }

  /** Split s on the literal delimiter (no regex), trim each piece,
    * drop empties. */
  private def splitUnits(s: String, delim: String)
      : java.util.ArrayList[String] = {
    val out = new java.util.ArrayList[String]()
    var from = 0
    var idx = s.indexOf(delim, from)
    while (idx >= 0) {
      val t = trimmed(s, from, idx)
      if (t != null) out.add(t)
      from = idx + delim.length
      idx = s.indexOf(delim, from)
    }
    val t = trimmed(s, from, s.length)
    if (t != null) out.add(t)
    out
  }

  /** LINE_REPETITION(text): line/paragraph duplication counters over
    * the RAW text — lines split on \n, paragraphs on \n\n, each unit
    * space-trimmed, empty units dropped. dup_* counts occurrences
    * beyond each unit's first (so dup_lines/n_lines is the fraction of
    * lines that are repeats of an earlier one). */
  def lines(s: UTF8String): InternalRow = {
    val str = s.toString
    val l = unitStats(splitUnits(str, "\n"))
    val p = unitStats(splitUnits(str, "\n\n"))
    new GenericInternalRow(Array[Any](
      l(0), l(0) - l(1), l(2), l(2) - l(3),
      p(0), p(0) - p(1), p(2), p(2) - p(3)))
  }

  /** GRAM_REPETITION(words): n-gram repetition counters over an
    * ALREADY-TOKENIZED word array (split of lower(trim(text)) on \s+ —
    * tokenize once in the caller, not per gram size).
    *  - top{2,3,4}_chars: chars covered by the single most frequent
    *    n-gram = max over grams of count * gramChars, where gramChars =
    *    sum of word code points + (n-1) joining spaces (= len() of the
    *    space-joined gram string)
    *  - dup{5,10}_chars: sum of count * gramChars over grams occurring
    *    more than once (the standard sum-form approximation of
    *    Gopher's covered-character fraction — overlapping occurrences
    *    are counted per occurrence, so the fraction can exceed 1 on
    *    degenerate inputs; callers threshold it, they don't sum it) */
  def grams(words: ArrayData): InternalRow = {
    val nw = words.numElements()
    val ws = new Array[String](nw)
    val wlen = new Array[Int](nw)
    var i = 0
    while (i < nw) {
      // tokenizer output: split() never yields null elements
      val w = words.getUTF8String(i).toString
      ws(i) = w
      wlen(i) = codePoints(w)
      i += 1
    }
    val out = new Array[Any](5)
    var slot = 0
    var n = 2
    while (n <= 10) {
      if (n <= 4 || n == 5 || n == 10) {
        val counts = new java.util.HashMap[String, Array[Long]]()
        var start = 0
        val sb = new java.lang.StringBuilder()
        while (start + n <= nw) {
          sb.setLength(0)
          var chars = (n - 1).toLong
          var j = start
          while (j < start + n) {
            if (j > start) sb.append(' ')
            sb.append(ws(j))
            chars += wlen(j)
            j += 1
          }
          val st = counts.computeIfAbsent(sb.toString,
            _ => Array(0L, chars))
          st(0) += 1
          start += 1
        }
        var acc = 0L
        val it = counts.values().iterator()
        if (n <= 4) {
          while (it.hasNext) {
            val st = it.next()
            val covered = st(0) * st(1)
            if (covered > acc) acc = covered
          }
        } else {
          while (it.hasNext) {
            val st = it.next()
            if (st(0) > 1) acc += st(0) * st(1)
          }
        }
        out(slot) = acc
        slot += 1
      }
      n += 1
    }
    new GenericInternalRow(out)
  }
}

/** LINE_REPETITION(string) → struct of 8 BIGINT counters. Null text →
  * null struct. See [[RepetitionMetricsKernel.lines]]. */
case class LineRepetition(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_lines", LongType, nullable = false),
    StructField("dup_lines", LongType, nullable = false),
    StructField("line_chars", LongType, nullable = false),
    StructField("dup_line_chars", LongType, nullable = false),
    StructField("n_paras", LongType, nullable = false),
    StructField("dup_paras", LongType, nullable = false),
    StructField("para_chars", LongType, nullable = false),
    StructField("dup_para_chars", LongType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure("line_repetition requires a STRING column, " +
      s"got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any): Any =
    RepetitionMetricsKernel.lines(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.RepetitionMetricsKernel.lines($a)")
  override protected def withNewChildInternal(c: Expression): LineRepetition =
    copy(child = c)
  override def prettyName: String = "line_repetition"
}

/** GRAM_REPETITION(array<string>) → struct<top2_chars, top3_chars,
  * top4_chars, dup5_chars, dup10_chars: BIGINT>. Null array → null
  * struct. See [[RepetitionMetricsKernel.grams]]. */
case class GramRepetition(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("top2_chars", LongType, nullable = false),
    StructField("top3_chars", LongType, nullable = false),
    StructField("top4_chars", LongType, nullable = false),
    StructField("dup5_chars", LongType, nullable = false),
    StructField("dup10_chars", LongType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckSuccess
      case dt => TypeCheckFailure("gram_repetition requires an " +
        s"ARRAY<STRING> column, got ${dt.catalogString}")
    }
  }

  override def nullSafeEval(a: Any): Any =
    RepetitionMetricsKernel.grams(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.RepetitionMetricsKernel.grams($a)")
  override protected def withNewChildInternal(c: Expression): GramRepetition =
    copy(child = c)
  override def prettyName: String = "gram_repetition"
}
