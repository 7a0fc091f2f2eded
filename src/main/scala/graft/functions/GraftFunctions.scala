package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.types._

/** Registers the Phoenix gap-filler functions into a session's function
  * registry so they are callable from SQL and via
  * `functions.call_function(name, cols...)`. Idempotent.
  *
  * Builders coerce argument types explicitly (Spark's AbstractDataType /
  * ImplicitCastInputTypes machinery is private[sql], so e.g. a SQL literal
  * `-0.5` arriving as DECIMAL must be cast to the expected input type here).
  */
/** User-defined scalar function contract for the SQL front-end's
  * `CREATE FUNCTION name(args) RETURNS type AS 'class' [USING JAR '...']`
  * (reference: PhoenixSQL.g create_function_node; UDFExpression.java
  * instantiates the named ScalarFunction implementation per tenant via a
  * DynamicClassLoader — here the class implements this trait and is
  * invoked through a Spark UDF carrying the declared return type).
  * Implementations need a public no-arg constructor; `args` arrive as
  * external Java/Scala values (String, java.lang.Long, ...). */
trait GraftScalarUdf extends Serializable {
  def eval(args: Seq[Any]): Any
}

object GraftFunctions {
  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)
  private def asInt(e: Expression): Expression =
    if (e.dataType == IntegerType) e else Cast(e, IntegerType)
  private def asDouble(e: Expression): Expression =
    if (e.dataType == DoubleType) e else Cast(e, DoubleType)
  private def asString(e: Expression): Expression =
    if (e.dataType == StringType) e else Cast(e, StringType)
  private def asTimestamp(e: Expression): Expression =
    if (e.dataType == TimestampType) e else Cast(e, TimestampType)

  // --- registry-proof builtins ------------------------------------
  // Spark 4's Column API resolves function NAMES through the session
  // registry, so a temp function shadows the builtin for DataFrame
  // code too — [[registerPhoenixDialect]] deliberately rebinds
  // md5/log/to_date/dayofweek/... to reference semantics for the SQL
  // front-end, and with by-name resolution that would silently flip
  // every digest-keyed dedup (BINARY md5), every ln() quality score
  // (LOG becomes log10, 2-arg args swap), and date bucketing in a
  // session that also instantiates PhoenixSql. Operators therefore go
  // through these direct-expression forms, immune to shadowing.

  private def exprOf(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graftbridge.ColumnBridge.toExpression(c)
  private def colOf(e: Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.toColumn(e)

  /** Builtin hex-string MD5, immune to registry shadowing. */
  def md5Hex(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    colOf(org.apache.spark.sql.catalyst.expressions.Md5(
      Cast(exprOf(c), BinaryType)))

  /** Builtin natural log, immune to registry shadowing. */
  def ln(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    colOf(org.apache.spark.sql.catalyst.expressions.Log(
      Cast(exprOf(c), DoubleType)))

  /** Builtin log_base(x) (Spark argument order), immune to shadowing. */
  def logBase(base: Double,
      c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    colOf(org.apache.spark.sql.catalyst.expressions.Logarithm(
      org.apache.spark.sql.catalyst.expressions.Literal(base),
      Cast(exprOf(c), DoubleType)))

  /** Builtin to_date (cast to DATE), immune to shadowing. */
  def toDateSpark(
      c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    colOf(Cast(exprOf(c), DateType))

  /** Builtin dayofweek (Sunday = 1), immune to shadowing. */
  def dayOfWeekSpark(
      c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    colOf(org.apache.spark.sql.catalyst.expressions.DayOfWeek(
      Cast(exprOf(c), DateType)))

  /** Graft-OWNED kernel names only — no Spark-builtin name is touched.
    * The operator layer registers THIS as a side effect: obtaining a
    * fused kernel must not change the semantics of any Spark-named SQL
    * function (trunc/round/encode/decode/to_char/...) for a session
    * that never opted into the Phoenix dialect. The dialect overloads
    * live in [[register]], called by the SQL front-end and the dialect
    * query battery. */
  def registerKernels(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "word_shingles",
      e => WordShingles(e(0), e(1).eval() match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"shingle size must be a foldable integer literal, got $other")
      }), "built-in")
    reg.createOrReplaceTempFunction(
      "sig_agreement", e => SigAgreement(e(0), e(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "jaccard_sim", e => JaccardSim(e(0), e(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "simhash64", e => SimHash64(e.head), "built-in")
    reg.createOrReplaceTempFunction(
      "cosine_sim", e => CosineSim(e(0), e(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "lsh_bucket", e => LshBucket(e(0), e(1), e(2)), "built-in")
    reg.createOrReplaceTempFunction(
      "ivf_cell", e => IvfCell(e(0), e(1), e(2)), "built-in")
    reg.createOrReplaceTempFunction(
      "ivf_cells", e => IvfCells(e(0), e(1), e(2)), "built-in")
    reg.createOrReplaceTempFunction(
      "z_value", e => ZValue(e(0), e(1), e(2), e(3)), "built-in")
    reg.createOrReplaceTempFunction(
      "z_str_bucket", e => StrBucket(e(0), e(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "pq_encode", e => PqEncode(e(0), e(1), e(2), e(3)), "built-in")
    reg.createOrReplaceTempFunction(
      "pq_adc", e => PqAdc(e(0), e(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "ivfpq_encode", e => IvfPqEncode(e(0), e(1), e(2), e(3)), "built-in")
    reg.createOrReplaceTempFunction(
      "vec_maxabs", e => VecMaxAbs(e.head), "built-in")
    reg.createOrReplaceTempFunction(
      "int8_quantize", e => Int8Quantize(e(0), e(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "int8_cosine", e => Int8Cosine(e(0), e(1)), "built-in")
    // max_strlen assumes containsNull=false arrays (tokenizer outputs);
    // see the MaxStrLen contract note for the null-element divergence
    // from exists/forall three-valued logic
    reg.createOrReplaceTempFunction(
      "max_strlen", e => MaxStrLen(e.head), "built-in")
    reg.createOrReplaceTempFunction(
      "text_metrics", e => TextMetrics(e.head), "built-in")
    reg.createOrReplaceTempFunction(
      "normalize_text", e => NormalizeText(e.head), "built-in")
    reg.createOrReplaceTempFunction(
      "c4_line_stats", e => C4LineStats(e.head), "built-in")
    reg.createOrReplaceTempFunction(
      "canonical_url", e => CanonicalUrl(e.head), "built-in")
    reg.createOrReplaceTempFunction(
      "script_profile", e => ScriptProfile(e.head), "built-in")
    reg.createOrReplaceTempFunction(
      "deflate_ratio", e => DeflateRatio(e.head), "built-in")
    reg.createOrReplaceTempFunction(
      "line_repetition", e => LineRepetition(e.head), "built-in")
    reg.createOrReplaceTempFunction(
      "bpe_tokens", e => BpeTokens(e(0), e(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "phrase_matches", e => PhraseMatches(e(0), e(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "gram_repetition", e => GramRepetition(e.head), "built-in")
    reg.createOrReplaceTempFunction(
      "get_byte", e => GetByteExpr(e(0), e(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "get_bit", e => GetBitExpr(e(0), e(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "set_byte", e => SetByteExpr(e(0), e(1), e(2)), "built-in")
    reg.createOrReplaceTempFunction(
      "set_bit", e => SetBitExpr(e(0), e(1), e(2)), "built-in")
    reg.createOrReplaceTempFunction(
      "stopword_hits",
      e => StopwordHits(e(0), e(1).eval() match {
        case a: org.apache.spark.sql.catalyst.util.ArrayData =>
          a.toSeq[org.apache.spark.unsafe.types.UTF8String](
            org.apache.spark.sql.types.StringType).map(_.toString)
        case other => throw new IllegalArgumentException(
          s"stopword list must be a foldable array literal, got $other")
      }), "built-in")
    reg.createOrReplaceTempFunction(
      "minhash_signature",
      e => MinHashSignature(e(0), e(1).eval() match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"numHashes must be a foldable integer literal, got $other")
      }), "built-in")
    reg.createOrReplaceTempFunction(
      "top_scored",
      e => TopScoredAgg(asString(e(0)), asDouble(e(1)), e(2))
        .toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction(
      "approx_top_terms",
      e => TopTermsAgg(asString(e(0)), e(1)).toAggregateExpression(),
      "built-in")
    // binary SpaceSaving state-column trio: the persistable /
    // re-mergeable spelling of approx_top_terms for maintained
    // heavy-hitter MVs (Materialize `topks`) and coarser rollups
    reg.createOrReplaceTempFunction(
      "top_terms_sketch",
      e => TopTermsSketchAgg(asString(e(0)), e(1)).toAggregateExpression(),
      "built-in")
    reg.createOrReplaceTempFunction(
      "top_terms_union_agg",
      e => TopTermsUnionAgg(e.head).toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction(
      "top_terms_entries", e => TopTermsEntries(e.head), "built-in")
    reg.createOrReplaceTempFunction(
      "top_scored_id",
      e => TopScoredIdAgg(e(0), asDouble(e(1)), e(2))
        .toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction(
      "bloom_build",
      e => BloomBuildAgg(e(0), e(1), e(2)).toAggregateExpression(),
      "built-in")
    reg.createOrReplaceTempFunction(
      "bloom_contains", e => BloomContainsExpr(e(0), e(1)), "built-in")
    // KMV / theta-style distinct sketches: the set-operation-capable
    // complement to approx_count_distinct (intersections, Jaccard)
    reg.createOrReplaceTempFunction(
      "kmv_sketch", e => KmvAgg(e(0), e(1)).toAggregateExpression(),
      "built-in")
    reg.createOrReplaceTempFunction(
      "kmv_estimate", e => KmvEstimate(e.head), "built-in")
    reg.createOrReplaceTempFunction(
      "kmv_union", e => KmvUnion(e(0), e(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "kmv_union_agg", e => KmvUnionAgg(e.head).toAggregateExpression(),
      "built-in")
    reg.createOrReplaceTempFunction(
      "kmv_intersect_estimate",
      e => KmvIntersectEstimate(e(0), e(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "kmv_jaccard", e => KmvJaccard(e(0), e(1)), "built-in")
  }

  def register(spark: SparkSession): Unit = {
    registerKernels(spark)
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "base62_encode", e => Base62Encode(asLong(e.head)), "built-in")
    reg.createOrReplaceTempFunction(
      "base62_decode", e => Base62Decode(asString(e.head)), "built-in")
    // Phoenix ENCODE(long,'BASE62') / DECODE(str,'HEX') share their names
    // with Spark's charset builtins — dispatch on the literal format so
    // reference SQL runs unmodified AND encode('x','UTF-8') keeps working
    // fixed-arity guard: a typo like encode(col) must fail with the
    // function name and expected count, not a raw
    // IndexOutOfBoundsException from e(1) inside the analyzer
    def arity(name: String, e: Seq[Expression], want: Int): Seq[Expression] = {
      if (e.length != want) throw new IllegalArgumentException(
        s"$name expects $want arguments, got ${e.length}")
      e
    }
    def fmtLit(e: Expression): Option[String] = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(
          s: org.apache.spark.unsafe.types.UTF8String, StringType) =>
        Some(s.toString.toUpperCase(java.util.Locale.ROOT))
      case _ => None
    }
    reg.createOrReplaceTempFunction(
      "encode", e0 => { val e = arity("encode", e0, 2); fmtLit(e(1)) match {
        case Some("BASE62") => Base62Encode(asLong(e(0)))
        case _ =>
          org.apache.spark.sql.catalyst.expressions.Encode(e(0), e(1))
      } }, "built-in")
    reg.createOrReplaceTempFunction(
      "decode", e0 => { val e = arity("decode", e0, 2); fmtLit(e(1)) match {
        case Some("HEX") => DecodeBinary(asString(e(0)), e(1))
        case _ =>
          org.apache.spark.sql.catalyst.expressions.StringDecode(e(0), e(1))
      } }, "built-in")
    // Phoenix ROUND/CEIL/FLOOR/TRUNC with a time-unit argument (reference
    // RoundDateExpression + Joda-field variants, optional fixed-unit
    // multiplier: ROUND(ts, 'MINUTE', 15)); non-unit arguments fall
    // through to Spark's numeric builtins with identical semantics, so
    // shadowing the names is safe. Phoenix numeric TRUNC parses to FLOOR
    // (reference TruncParseNode), date-format trunc stays Spark's.
    locally {
      import org.apache.spark.sql.catalyst.expressions._
      import org.apache.spark.sql.graftbridge.ColumnBridge.{
        toColumn => column, toExpression => expression}
      def unitLit(e: Expression): Option[String] = fmtLit(e)
        .filter(DateRound.Units.contains)
      def multOf(e: Seq[Expression]): Int =
        if (e.length < 3) 1
        else e(2) match {
          case Literal(i: Int, IntegerType) => i
          case other => throw new IllegalArgumentException(
            s"unit multiplier must be an integer literal, got $other")
        }
      def dateOr(e: Seq[Expression],
          date: (org.apache.spark.sql.Column, String, Int) =>
            org.apache.spark.sql.Column,
          num: Seq[Expression] => Expression): Expression =
        if (e.length >= 2 && unitLit(e(1)).isDefined)
          expression(date(column(e(0)), unitLit(e(1)).get, multOf(e)))
        else num(e)
      reg.createOrReplaceTempFunction("round",
        e => dateOr(e, DateRound.roundDate, e =>
          if (e.length >= 2) Round(e(0), e(1)) else Round(e(0), Literal(0))),
        "built-in")
      reg.createOrReplaceTempFunction("ceil",
        e => dateOr(e, DateRound.ceilDate, e =>
          if (e.length >= 2) RoundCeil(e(0), e(1)) else Ceil(e(0))),
        "built-in")
      reg.createOrReplaceTempFunction("floor",
        e => dateOr(e, DateRound.floorDate, e =>
          if (e.length >= 2) RoundFloor(e(0), e(1)) else Floor(e(0))),
        "built-in")
      reg.createOrReplaceTempFunction("trunc",
        e => {
          // 'WEEK'/'MONTH'/'YEAR' are ALSO native Spark trunc formats
          // (returning DATE). A DATE input keeps the native DateType
          // contract existing Spark callers rely on; a TIMESTAMP input
          // gets Phoenix's RoundDateExpression semantics (timestamp
          // boundary). Fixed-width units (DAY/HOUR/...) are not native
          // trunc formats, so they always take the Phoenix arm.
          // 1-arg forms (valid in the reference): numeric TRUNC
          // defaults the scale to 0; date/timestamp TRUNC defaults the
          // unit to DAY — without this the num lambda read e(1) on a
          // 1-element list and crashed plan building
          val ee =
            if (e.length >= 2) e
            else e(0).dataType match {
              case DateType | TimestampType => Seq(e(0), Literal("DAY"))
              case _ => Seq(e(0), Literal(0))
            }
          val nativeDateForm = ee(0).dataType == DateType &&
            unitLit(ee(1)).exists(Set("WEEK", "MONTH", "YEAR").contains)
          if (nativeDateForm) TruncDate(ee(0), ee(1))
          else dateOr(ee, DateRound.floorDate, e =>
            e(1) match {
              // date-format form ('MM', 'YYYY', …) = Spark's trunc
              case Literal(_: org.apache.spark.unsafe.types.UTF8String,
                  StringType) => TruncDate(e(0), e(1))
              case _ => RoundFloor(e(0), e(1)) // numeric TRUNC = FLOOR
            })
        },
        "built-in")
    }
    reg.createOrReplaceTempFunction(
      "regexp_substr",
      // offset is OPTIONAL in the reference (RegexpSubstrFunction
      // defaults to position 1) — the 2-arg form must not throw
      e => RegexpSubstr(asString(e(0)), asString(e(1)),
        if (e.length >= 3) asInt(e(2))
        else org.apache.spark.sql.catalyst.expressions.Literal(1)),
      "built-in")
    // TO_CHAR dispatches on argument type like the reference
    // (ToCharFunction.java:66-78): temporal → Java date patterns,
    // numeric → java.text.DecimalFormat patterns
    reg.createOrReplaceTempFunction(
      "to_char", e0 => { val e = arity("to_char", e0, 2); e(0).dataType match {
        case _: NumericType => NumberToChar(e(0), asString(e(1)))
        case _ => ToChar(asTimestamp(e(0)), asString(e(1)))
      } }, "built-in")
    reg.createOrReplaceTempFunction(
      "to_date_java",
      e => ToDateJava(asString(e(0)), asString(e(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "date_plus_days",
      e => DatePlusDays(asTimestamp(e(0)), asDouble(e(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "first_values",
      e => OrderedValuesAgg(asDouble(e(0)), asLong(e(1)), asInt(e(2)),
        last = false).toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction(
      "last_values",
      e => OrderedValuesAgg(asDouble(e(0)), asLong(e(1)), asInt(e(2)),
        last = true).toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction(
      "to_number", e0 => { val e = arity("to_number", e0, 2)
        ToNumber(asString(e(0)), asString(e(1))) }, "built-in")
    reg.createOrReplaceTempFunction(
      "timezone_offset",
      e => TimezoneOffset(asString(e(0)), asTimestamp(e(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "collation_key",
      e => CollationKey(asString(e(0)), asString(e(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "json_modify",
      e => JsonModify(asString(e(0)), asString(e(1)), asString(e(2))),
      "built-in")
    reg.createOrReplaceTempFunction(
      "json_query",
      e => JsonQuery(asString(e(0)), asString(e(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "json_exists",
      e => JsonExists(asString(e(0)), asString(e(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "json_value",
      e => JsonValue(asString(e(0)), asString(e(1))), "built-in")
    // Phoenix spellings for operations Spark has under other names, so
    // reference SQL runs unmodified: ARRAY_ELEM is 1-based exactly like
    // element_at; ARRAY_LENGTH = size; REGEXP_SPLIT = regex split
    reg.createOrReplaceTempFunction(
      "array_elem",
      e => org.apache.spark.sql.catalyst.expressions.ElementAt(e(0), e(1)),
      "built-in")
    reg.createOrReplaceTempFunction(
      "array_length",
      e => org.apache.spark.sql.catalyst.expressions.Size(e(0)),
      "built-in")
    reg.createOrReplaceTempFunction(
      "regexp_split",
      e => org.apache.spark.sql.catalyst.expressions.StringSplit(
        asString(e(0)), asString(e(1)),
        org.apache.spark.sql.catalyst.expressions.Literal(-1)),
      "built-in")
    reg.createOrReplaceTempFunction(
      "phoenix_decimal_div",
      e => PhoenixDecimalDivide(e(0), e(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "to_bson", e => ToBson(asString(e.head)), "built-in")
    reg.createOrReplaceTempFunction(
      "bson_value",
      e => BsonValue(e(0), asString(e(1)), asString(e(2))), "built-in")
    reg.createOrReplaceTempFunction(
      "bson_value_type",
      e => BsonValueType(e(0), asString(e(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "bson_condition_expression",
      e => BsonConditionExpr(e(0), asString(e(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "bson_update_expression",
      e => BsonUpdateExpr(e(0), asString(e(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "encode_binary",
      e => EncodeBinary(e(0), asString(e(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "decode_binary",
      e => DecodeBinary(asString(e(0)), asString(e(1))), "built-in")
    // Phoenix array/date spellings with NO Spark name collision:
    // STRING_TO_ARRAY (literal delimiter, trailing empties dropped —
    // StringToArrayFunction.java), ARRAY_TO_STRING (= array_join incl.
    // null-replacement semantics — ArrayToStringFunction.java /
    // PArrayDataType.arrayToString), ARRAY_FILL (= array_repeat,
    // ArrayFillFunction.java), WEEK (Joda weekOfWeekyear = ISO week =
    // Spark weekofyear, WeekFunction.java:60).
    locally {
      import org.apache.spark.sql.catalyst.expressions._
      reg.createOrReplaceTempFunction(
        "string_to_array",
        e => StringToArray(asString(e(0)), asString(e(1)),
          if (e.length >= 3) asString(e(2)) else Literal(null, StringType)),
        "built-in")
      reg.createOrReplaceTempFunction(
        "array_to_string", e => {
          val arr = e(0).dataType match {
            case ArrayType(StringType, _) => e(0)
            case ArrayType(_, cn) => Cast(e(0), ArrayType(StringType, cn))
            case _ => Cast(e(0), ArrayType(StringType, containsNull = true))
          }
          if (e.length >= 3) ArrayJoin(arr, asString(e(1)), Some(asString(e(2))))
          else ArrayJoin(arr, asString(e(1)), None)
        }, "built-in")
      reg.createOrReplaceTempFunction(
        "array_fill", e => ArrayRepeat(e(0), asInt(e(1))), "built-in")
      reg.createOrReplaceTempFunction(
        "week", e => WeekOfYear(Cast(e.head, DateType)), "built-in")
      // ARRAY_CAT = Spark concat over arrays (ArrayConcatFunction.java);
      // ARRAY_PREPEND takes (element, array) — the REVERSE of Spark's
      // array_prepend (ArrayPrependFunction.java:34-35) — dispatch on
      // which side is the array so both spellings work; ARRAY_APPEND and
      // ARRAY_REMOVE already match Spark's argument order.
      reg.createOrReplaceTempFunction(
        "array_cat", e => Concat(e), "built-in")
      reg.createOrReplaceTempFunction(
        "array_prepend", e => (e(0).dataType, e(1).dataType) match {
          case (_: ArrayType, _) => ArrayPrepend(e(0), e(1)) // Spark order
          case (_, _: ArrayType) => ArrayPrepend(e(1), e(0)) // Phoenix order
          case _ => ArrayPrepend(e(0), e(1))
        }, "built-in")
    }
  }

  /** Phoenix-dialect overrides for names Spark ALSO has but with
    * DIFFERENT semantics. Deliberately separate from [[register]] and
    * called only by the Phoenix SQL front-end ([[graft.sources.PhoenixSql]])
    * — operators and plain-Spark sessions must keep Spark's meanings:
    *
    *  - LOG(x[, base]) is log-base-N, default 10 (LogFunction.java:
    *    `Math.log(first)/Math.log(second)`, base defaults 1e1); Spark's
    *    `log(x)` is ln and two-arg takes the base FIRST.
    *  - DAYOFWEEK is Joda Monday=1..Sunday=7 (DayOfWeekFunction.java:66);
    *    Spark's is Sunday=1.
    *  - MD5 returns the 16 raw bytes (MD5Function → PBinary(16)); Spark's
    *    returns the hex string.
    *  - TO_DATE/TO_TIME/TO_TIMESTAMP parse with Java SimpleDateFormat-style
    *    patterns in GMT (ToDateFunction.java:51, DateUtil.java:55); the
    *    1-arg forms use the ISO parser, which Spark's timestamp cast
    *    matches. The optional third timezone argument is rejected loudly —
    *    wrap with convert_timezone() instead.
    *  - CURRENT_TIME() is the full server timestamp (PTime carries date,
    *    SURVEY §1.2); Spark 4's is the new TIME type.
    */
  def registerPhoenixDialect(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions._
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "log",
      e => if (e.length >= 2) Logarithm(asDouble(e(1)), asDouble(e(0)))
      else Logarithm(Literal(10.0), asDouble(e.head)), "built-in")
    reg.createOrReplaceTempFunction(
      "dayofweek",
      e => Add(WeekDay(Cast(e.head, DateType)), Literal(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "md5", e => Unhex(Md5(Cast(e.head, BinaryType))), "built-in")
    def toDateJ(e: Seq[Expression]): Expression = e.length match {
      case 1 => Cast(e.head, TimestampType)
      case 2 => ToDateJava(asString(e(0)), asString(e(1)))
      case _ => throw new IllegalArgumentException(
        "the TO_DATE/TO_TIME/TO_TIMESTAMP timezone argument is not " +
          "supported — parse in GMT and wrap with convert_timezone()")
    }
    reg.createOrReplaceTempFunction("to_date", toDateJ, "built-in")
    reg.createOrReplaceTempFunction("to_time", toDateJ, "built-in")
    reg.createOrReplaceTempFunction("to_timestamp", toDateJ, "built-in")
    reg.createOrReplaceTempFunction(
      "current_time", _ => CurrentTimestamp(), "built-in")
    // CURRENT_DATE() in Phoenix is the full server wall-clock (PDate
    // carries time — CurrentDateFunction.java; SURVEY §1.2 maps DATE to
    // TIMESTAMP), not midnight like Spark's
    reg.createOrReplaceTempFunction(
      "current_date", _ => CurrentTimestamp(), "built-in")
  }
}
