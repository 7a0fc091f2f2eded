package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Scalar gap-filler expressions for Phoenix functions Spark lacks exactly
  * (SURVEY.md §2.8 "custom" list). All are NULL-propagating scalar
  * expressions; hot-path-rare, so CodegenFallback is acceptable here.
  */

/** REGEXP_SUBSTR(str, pattern, offset) — returns the first match of pattern
  * searching from 1-based char offset; NULL when no match (reference:
  * phoenix-core-client .../expression/function/RegexpSubstrFunction.java).
  */
case class RegexpSubstr(str: Expression, pattern: Expression, offset: Expression)
    extends TernaryExpression with CodegenFallback {
  override def first: Expression = str
  override def second: Expression = pattern
  override def third: Expression = offset
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  @transient private var cachedPat: (String, java.util.regex.Pattern) = _
  private def compiled(p: String): java.util.regex.Pattern = {
    if (cachedPat == null || cachedPat._1 != p)
      cachedPat = (p, java.util.regex.Pattern.compile(p))
    cachedPat._2
  }

  override def nullSafeEval(s: Any, p: Any, o: Any): Any = {
    val text = s.asInstanceOf[UTF8String].toString
    // Reference mapping (RegexpSubstrFunction.java:149, JavaPattern.java:79):
    // positive offset is 1-based, zero is 0-based, negative counts back from
    // the end of the string; out-of-range → NULL.
    val raw = o.asInstanceOf[Int]
    var off = raw - (if (raw <= 0) 0 else 1)
    if (off < 0) off += text.length
    if (off < 0 || off >= text.length) return null
    val m = compiled(p.asInstanceOf[UTF8String].toString).matcher(text)
    if (m.find(off)) UTF8String.fromString(m.group()) else null
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): RegexpSubstr =
    copy(str = f, pattern = s, offset = t)
  override def prettyName: String = "regexp_substr"
}

/** TO_CHAR(timestamp, javaPattern) with Java SimpleDateFormat-style patterns
  * (Phoenix formats with Java patterns, not SQL ones — reference:
  * .../expression/function/ToCharFunction.java). Timestamps are UTC micros.
  */
case class ToChar(ts: Expression, fmt: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = ts
  override def right: Expression = fmt
  override def dataType: DataType = StringType

  @transient private var cachedFmt:
      (String, java.time.format.DateTimeFormatter) = _
  private def formatter(p: String): java.time.format.DateTimeFormatter = {
    if (cachedFmt == null || cachedFmt._1 != p)
      // locale PINNED: the default locale varies per JVM, and in a
      // cluster the driver and executors need not agree — 'MMM' must
      // render the same month name on every node (and match the
      // English names the reference deployments and the oracle emit)
      cachedFmt = (p, java.time.format.DateTimeFormatter
        .ofPattern(p, java.util.Locale.ENGLISH))
    cachedFmt._2
  }

  override def nullSafeEval(t: Any, f: Any): Any = {
    val micros = t.asInstanceOf[Long]
    val ldt = java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(micros, 1000000L),
      (Math.floorMod(micros, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC)
    UTF8String.fromString(formatter(f.asInstanceOf[UTF8String].toString)
      .format(ldt))
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ToChar = copy(ts = l, fmt = r)
  override def prettyName: String = "to_char"
}

/** TO_DATE / TO_TIMESTAMP(varchar, javaPattern) → timestamp, the inverse
  * of [[ToChar]] with the same Java-style patterns (reference:
  * .../expression/function/ToDateFunction.java:51 — Phoenix parses with
  * Java date formats, not SQL ones; DATE carries full time). Patterns
  * without time fields parse to midnight UTC; unparseable input → NULL
  * (matching Phoenix's IllegalDataException-on-read being the SQL NULL
  * path for bad rows is deliberately relaxed here: analytics over dirty
  * text wants NULL, and the strict path is a trivial wrapper). */
case class ToDateJava(str: Expression, fmt: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = str
  override def right: Expression = fmt
  override def dataType: DataType = TimestampType
  override def nullable: Boolean = true

  @transient private var cachedFmt:
      (String, java.time.format.DateTimeFormatter) = _
  private def formatter(p: String): java.time.format.DateTimeFormatter = {
    if (cachedFmt == null || cachedFmt._1 != p)
      cachedFmt = (p, new java.time.format.DateTimeFormatterBuilder()
        .appendPattern(p)
        .parseDefaulting(java.time.temporal.ChronoField.HOUR_OF_DAY, 0)
        .parseDefaulting(java.time.temporal.ChronoField.MINUTE_OF_HOUR, 0)
        .parseDefaulting(java.time.temporal.ChronoField.SECOND_OF_MINUTE, 0)
        .parseDefaulting(java.time.temporal.ChronoField.NANO_OF_SECOND, 0)
        // locale pinned for the same cluster-determinism reason as ToChar
        .toFormatter(java.util.Locale.ENGLISH))
    cachedFmt._2
  }

  override def nullSafeEval(s: Any, f: Any): Any = {
    try {
      val ldt = java.time.LocalDateTime.parse(
        s.asInstanceOf[UTF8String].toString,
        formatter(f.asInstanceOf[UTF8String].toString))
      val inst = ldt.toInstant(java.time.ZoneOffset.UTC)
      Math.addExact(Math.multiplyExact(inst.getEpochSecond, 1000000L),
        inst.getNano / 1000L)
    } catch {
      case _: java.time.format.DateTimeParseException => null
    }
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ToDateJava = copy(str = l, fmt = r)
  override def prettyName: String = "to_date_java"
}

/** TO_NUMBER(varchar[, format]) with Java DecimalFormat patterns
  * (reference: .../expression/function/ToNumberFunction.java — Phoenix
  * parses with Java patterns like '#,##0.00'). Returns DOUBLE; NULL on
  * unparseable input (Phoenix returns null, not an error). */
case class ToNumber(str: Expression, fmt: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = str
  override def right: Expression = fmt
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  @transient private var cachedFmt: (String, java.text.DecimalFormat) = _
  private def formatter(p: String): java.text.DecimalFormat = {
    if (cachedFmt == null || cachedFmt._1 != p)
      // symbols pinned to ROOT ('.' decimal, ',' grouping): the default
      // locale varies per JVM/node, and e.g. a German default would
      // silently swap separators mid-cluster
      cachedFmt = (p, new java.text.DecimalFormat(p,
        java.text.DecimalFormatSymbols.getInstance(java.util.Locale.ROOT)))
    cachedFmt._2
  }

  override def nullSafeEval(s: Any, f: Any): Any =
    try {
      val n = formatter(f.asInstanceOf[UTF8String].toString)
        .parse(s.asInstanceOf[UTF8String].toString.trim)
      java.lang.Double.valueOf(n.doubleValue())
    } catch { case _: java.text.ParseException => null }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ToNumber = copy(str = l, fmt = r)
  override def prettyName: String = "to_number"
}

/** TIMEZONE_OFFSET(tz, ts) → offset from UTC in minutes at that instant
  * (reference: .../expression/function/TimezoneOffsetFunction.java). */
case class TimezoneOffset(tz: Expression, ts: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = tz
  override def right: Expression = ts
  override def dataType: DataType = IntegerType

  override def nullSafeEval(z: Any, t: Any): Any = {
    val zone = java.time.ZoneId.of(z.asInstanceOf[UTF8String].toString)
    val instant = java.time.Instant.ofEpochSecond(
      Math.floorDiv(t.asInstanceOf[Long], 1000000L))
    java.lang.Integer.valueOf(
      zone.getRules.getOffset(instant).getTotalSeconds / 60)
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): TimezoneOffset = copy(tz = l, ts = r)
  override def prettyName: String = "timezone_offset"
}

/** Phoenix fractional-day date arithmetic: `date + 1.5` adds 1.5 days
  * (reference: .../expression/DateAddExpression.java — the numeric operand
  * is DAYS, fractions allowed). Result = ts + round(days*86400e6) micros.
  */
case class DatePlusDays(ts: Expression, days: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = ts
  override def right: Expression = days
  override def dataType: DataType = TimestampType
  override def nullSafeEval(t: Any, d: Any): Any =
    t.asInstanceOf[Long] +
      Math.round(d.asInstanceOf[Double] * 86400000000.0)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DatePlusDays = copy(ts = l, days = r)
  override def prettyName: String = "date_plus_days"
}

/** STRING_TO_ARRAY(str, delimiter[, nullString]) with Phoenix's exact
  * split semantics (reference: .../expression/function/
  * StringToArrayFunction.java + schema/types/PArrayDataType.stringToArray):
  * the delimiter is LITERAL (regex-quoted), trailing empty strings are
  * dropped (Java split limit 0 — Spark's `split` keeps them), an empty or
  * null delimiter splits into single characters, and elements equal to
  * nullString become NULL. Phoenix conflates empty varchar with NULL, so a
  * null/empty input string yields NULL and an empty nullString means "no
  * replacement". Evaluates children manually because the third argument
  * is usually the NULL literal (2-arg form).
  */
case class StringToArray(str: Expression, delim: Expression,
    nullStr: Expression) extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(str, delim, nullStr)
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val s = str.eval(input)
    if (s == null) return null
    val string = s.asInstanceOf[UTF8String].toString
    if (string.isEmpty) return null
    val d = delim.eval(input)
    val dstr = if (d == null) "" else d.asInstanceOf[UTF8String].toString
    val parts: Array[String] =
      if (dstr.nonEmpty)
        string.split(java.util.regex.Pattern.quote(dstr)) // limit 0
      else {
        // split by CODE POINT, not UTF-16 char: a per-char regex split
        // would cut supplementary characters (emoji, rare CJK) into
        // unpaired surrogate halves — invalid UTF-8 downstream
        val out = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < string.length) {
          val n = Character.charCount(string.codePointAt(i))
          out += string.substring(i, i + n)
          i += n
        }
        out.toArray
      }
    val ns = nullStr.eval(input) match {
      case null => null
      case u => val x = u.asInstanceOf[UTF8String].toString
        if (x.isEmpty) null else x
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      parts.map { p =>
        if (ns != null && p == ns) null else UTF8String.fromString(p)
      }.asInstanceOf[Array[Any]])
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): StringToArray =
    copy(str = c(0), delim = c(1), nullStr = c(2))
  override def prettyName: String = "string_to_array"
}

/** TO_CHAR(numeric, format) with Java DecimalFormat patterns — the
  * reference's TO_CHAR dispatches on argument type (ToCharFunction.java:
  * 66-78: PTimestamp → temporal formatter, PDecimal → FunctionArgumentType
  * .NUMERIC.getFormatter = java.text.DecimalFormat). [[ToChar]] covers the
  * temporal arm; this is the numeric arm. Decimals format from BigDecimal
  * so precision survives; other numerics go through double like the
  * reference's PDecimal coercion.
  */
case class NumberToChar(num: Expression, fmt: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = num
  override def right: Expression = fmt
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  @transient private var cachedFmt: (String, java.text.DecimalFormat) = _
  private def formatter(p: String): java.text.DecimalFormat = {
    if (cachedFmt == null || cachedFmt._1 != p)
      // symbols pinned to ROOT ('.' decimal, ',' grouping): the default
      // locale varies per JVM/node, and e.g. a German default would
      // silently swap separators mid-cluster
      cachedFmt = (p, new java.text.DecimalFormat(p,
        java.text.DecimalFormatSymbols.getInstance(java.util.Locale.ROOT)))
    cachedFmt._2
  }

  override def nullSafeEval(v: Any, f: Any): Any = {
    val value: Any = v match {
      case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
      case other => other
    }
    UTF8String.fromString(
      formatter(f.asInstanceOf[UTF8String].toString).format(value))
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): NumberToChar = copy(num = l, fmt = r)
  override def prettyName: String = "to_char"
}
