package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused character-class counters for text quality scoring.
  *
  * The composed form is FOUR regexp_replace passes over every document
  * (strip-whitespace length, symbol count, digit count, punct count —
  * `TextAnalysis.qualityMetrics` + `subwordCountEstimate`), each a full
  * regex-engine scan that rebuilds the string just to take its length.
  * All four are single-character classes, so one code-point pass computes
  * every counter at once — no regex, no intermediate strings, 4× less
  * text traversal on the corpus scan.
  */
object TextMetricsKernel {

  /** One pass over the text, counting per Java-regex semantics:
    *  - stripLen: code points NOT in \s (= [ \t\n\x0B\f\r]) — the length
    *    of regexp_replace(text, "\\s+", "")
    *  - symbol: code points outside [a-z0-9\s] AFTER lowercasing — the
    *    length of regexp_replace(lower(text), "[a-z0-9\\s]", "")
    *  - digit: code points in [0-9] — length of
    *    regexp_replace(text, "[^0-9]", "") removed-complement
    *  - punct: code points in [0-9.,;:!?] — the subword-estimate extra
    */
  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
      cp == '\f' || cp == '\r'

  // symbol contribution of one ORIGINAL code point: count of the
  // code points its string-lowercase expands to that fall outside
  // [a-z0-9\s]. String.toLowerCase (not Character.toLowerCase) because
  // the composed form runs the regex over lower(text), and some
  // mappings are one-to-many — 'İ' (U+0130) lowers to 'i' + U+0307,
  // which the regex counts as ONE symbol (the combining dot), while a
  // per-code-point simple mapping would count zero.
  // Caveat: the ASCII fast path applies the ROOT A-Z mapping; on a JVM
  // whose DEFAULT locale lowercases ASCII differently (tr: 'I'->'ı'),
  // the composed regex form counts 'I' as a symbol while this kernel
  // does not. Run executors with a ROOT-compatible default locale (the
  // standard cluster posture) for bit parity.
  private def symbolCount(cp: Int): Int = {
    if (cp < 128) {
      val lc = if (cp >= 'A' && cp <= 'Z') cp + 32 else cp
      if ((lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9') || isWs(lc)) 0
      else 1
    } else {
      val lowered = new String(Character.toChars(cp)).toLowerCase
      var j = 0
      var n = 0
      while (j < lowered.length) {
        val l = lowered.codePointAt(j)
        if (!(l >= 'a' && l <= 'z') && !(l >= '0' && l <= '9') && !isWs(l))
          n += 1
        j += Character.charCount(l)
      }
      n
    }
  }

  def metrics(s: UTF8String): InternalRow = {
    val str = s.toString
    var i = 0
    var stripLen = 0; var symbol = 0; var digit = 0; var punct = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (!isWs(cp)) {
        stripLen += 1
        val isDigit = cp >= '0' && cp <= '9'
        symbol += symbolCount(cp)
        if (isDigit) { digit += 1; punct += 1 }
        else if (cp == '.' || cp == ',' || cp == ';' || cp == ':' ||
          cp == '!' || cp == '?') punct += 1
      }
      i += Character.charCount(cp)
    }
    new GenericInternalRow(Array[Any](stripLen, symbol, digit, punct))
  }
}

/** TEXT_METRICS(string) → struct<strip_len:int, symbol:int, digit:int,
  * punct:int>: the four character-class counters of one document in one
  * scan. Null text → null struct (matching length(regexp_replace(NULL))
  * in the composed form). */
case class TextMetrics(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("strip_len", IntegerType, nullable = false),
    StructField("symbol", IntegerType, nullable = false),
    StructField("digit", IntegerType, nullable = false),
    StructField("punct", IntegerType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(
      s"text_metrics requires a STRING column, got " +
        child.dataType.catalogString)
  }

  override def nullSafeEval(a: Any): Any =
    TextMetricsKernel.metrics(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.TextMetricsKernel.metrics($a)")
  override protected def withNewChildInternal(c: Expression): TextMetrics =
    copy(child = c)
  override def prettyName: String = "text_metrics"
}
