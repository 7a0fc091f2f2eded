package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.GraftFunctions

/** Scalar/aggregate function battery — SURVEY.md §2.8 + §2.4 gap-fillers.
  * Custom Catalyst expressions (base62, regexp_substr, to_char,
  * date_plus_days, first/last_values bounded-heap aggregates) are
  * registered per-session and invoked via call_function.
  */
object Functions {
  type Q = (SparkSession, String) => DataFrame

  private def dec(c: Column): Column = c.cast(DecimalType(28, 2))

  val queries: Map[String, Q] = Map(
    // §2.8 string functions (SUBSTR/INSTR/LENGTH/UPPER/LOWER/TRIM/LPAD/
    // REVERSE/MD5/|| — Phoenix SubstrFunction.java etc.)
    "q_string_funcs" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "part").select(
        $"p_partkey",
        substring($"p_name", 1, 5).as("sub5"),
        instr($"p_name", "e").as("pos_e"),
        length($"p_name").as("len"),
        octet_length($"p_name").as("olen"),
        upper($"p_name").as("up"),
        lower($"p_brand").as("lo"),
        trim(concat(lit("  "), $"p_name", lit("  "))).as("trimmed"),
        lpad($"p_brand", 12, "*").as("padded"),
        reverse($"p_name").as("rev"),
        graft.functions.GraftFunctions.md5Hex($"p_name").as("digest"),
        concat($"p_name", lit("|"), $"p_brand").as("joined"))
    },

    // §2.8 regex family (REGEXP_REPLACE/REGEXP_SUBSTR/REGEXP_LIKE/SPLIT).
    "q_regexp_funcs" -> { (s, dir) =>
      import s.implicits._
      GraftFunctions.register(s)
      Tables.t(s, dir, "documents")
        .filter($"text".rlike("data"))
        .select(
          $"doc_id",
          length(regexp_replace($"text", "[aeiou]", "")).as("devoweled_len"),
          nullif(regexp_extract($"text", "[a-z]{7,}", 0), lit(""))
            .as("first_long_word"),
          call_function("regexp_substr", $"text", lit("[a-z]{5}"), lit(3))
            .as("sub_from3"),
          size(split($"text", " ")).as("n_tok"),
          // REGEXP_SPLIT (RegexpSplitFunction): serialized — raw array
          // output would crash the driver's compare
          array_join(slice(split($"text", "a|e"), 1, 5), "|")
            .as("resplit5"))
    },

    // §2.8 date/time extract + format + Phoenix fractional-day arithmetic.
    "q_date_funcs" -> { (s, dir) =>
      import s.implicits._
      GraftFunctions.register(s)
      Tables.t(s, dir, "events").select(
        $"event_id",
        year($"ts").as("y"), quarter($"ts").as("q"), month($"ts").as("m"),
        dayofmonth($"ts").as("dom"),
        graft.functions.GraftFunctions.dayOfWeekSpark($"ts").as("dow"),
        dayofyear($"ts").as("doy"), weekofyear($"ts").as("woy"),
        hour($"ts").as("h"), minute($"ts").as("mi"), second($"ts").as("sec"),
        date_trunc("month", $"ts").as("mon_start"),
        date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("fmt"),
        call_function("to_char", $"ts", lit("yyyy/MM/dd HH:mm")).as("tochar"),
        ($"ts" + expr("INTERVAL 30 DAYS")).as("plus30d"),
        call_function("date_plus_days", $"ts", lit(1.5)).as("plus_1_5d"))
    },

    // §2.8 TO_DATE/TO_TIMESTAMP with Java patterns — the parse direction
    // of to_char (reference ToDateFunction.java:51). Round-trips through
    // to_char so string construction and parsing are both exercised;
    // date-only patterns land on midnight UTC; bad input → NULL.
    "q_to_date" -> { (s, dir) =>
      import s.implicits._
      GraftFunctions.register(s)
      Tables.t(s, dir, "events").select(
        $"event_id",
        call_function("to_date_java",
          call_function("to_char", $"ts", lit("yyyy/MM/dd HH:mm:ss")),
          lit("yyyy/MM/dd HH:mm:ss")).as("rt_sec"),
        call_function("to_date_java",
          call_function("to_char", $"ts", lit("yyyy-MM-dd")),
          lit("yyyy-MM-dd")).as("rt_day"),
        call_function("to_date_java", lit("not a date"),
          lit("yyyy-MM-dd")).as("bad"))
    },

    // §2.8 math functions (all exact-match vs DuckDB per cross-engine probe).
    "q_math_funcs" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "part").select(
        $"p_partkey",
        abs($"p_size" - 25).as("a"),
        sqrt($"p_size".cast(DoubleType)).as("sq"),
        round(cbrt($"p_size".cast(DoubleType)), 8).as("cb"),
        round(exp($"p_size" / lit(50.0)), 8).as("ex"),
        round(graft.functions.GraftFunctions.ln($"p_size" + lit(1.0)), 8)
          .as("ln_"),
        round(log10($"p_size".cast(DoubleType)), 8).as("l10"),
        pow($"p_size", 2).as("p2"),
        signum($"p_size" - 25).as("sg"),
        pmod($"p_size", lit(7)).as("md"),
        sin($"p_size".cast(DoubleType)).as("sn"),
        cos($"p_size".cast(DoubleType)).as("cs"),
        floor($"p_retailprice").as("fl"),
        ceil($"p_retailprice").as("ce"),
        round($"p_retailprice", 1).as("rd"),
        (floor($"p_retailprice" * 10) / 10).as("tr"))
    },

    // §2.4 statistical aggregates: STDDEV_POP/SAMP, exact PERCENTILE_CONT
    // (Phoenix BaseStddevAggregator, PercentileContAggregateFunction).
    "q_stats_agg" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "part")
        .groupBy($"p_brand")
        .agg(
          round(stddev_samp($"p_size"), 8).as("sd_samp"),
          round(stddev_pop($"p_size"), 8).as("sd_pop"),
          round(var_samp($"p_size"), 8).as("v_samp"),
          round(var_pop($"p_size"), 8).as("v_pop"),
          expr("percentile(p_size, 0.25)").as("p25"),
          expr("percentile(p_size, 0.5)").as("p50"),
          count(lit(1)).as("n"))
        .orderBy($"p_brand")
    },

    // §2.4 FIRST_VALUES/LAST_VALUES/NTH_VALUE ordered aggregates via the
    // bounded-heap TypedImperativeAggregate (O(k) memory per group).
    "q_first_values" -> { (s, dir) =>
      import s.implicits._
      GraftFunctions.register(s)
      // Array aggregates probed through scalar element projections — the
      // driver's compare can't sort array cells (r1 harness crash); the
      // full-array contract is pinned in FunctionsSpec.
      Tables.t(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .agg(
          call_function("first_values", $"o_totalprice", $"o_orderkey",
            lit(5)).as("first5"),
          call_function("last_values", $"o_totalprice", $"o_orderkey",
            lit(5)).as("last5"),
          try_element_at(call_function("first_values", $"o_totalprice",
            $"o_orderkey", lit(3)), lit(3)).as("nth3"),
          count(lit(1)).as("n"))
        // try_element_at: a group with fewer than 5 (or 3) rows must
        // yield NULL like the oracle's list[5] — plain element_at is an
        // INVALID_ARRAY_INDEX runtime error under Spark 4's default
        // ANSI mode
        .select($"o_orderpriority",
          try_element_at($"first5", lit(1)).as("f1"),
          try_element_at($"first5", lit(5)).as("f5"),
          size($"first5").as("f_len"),
          try_element_at($"last5", lit(1)).as("l1"),
          try_element_at($"last5", lit(5)).as("l5"),
          $"nth3", $"n")
        .orderBy($"o_orderpriority")
    },

    // §2.8 ENCODE/DECODE base-62 (custom Catalyst expression w/ codegen).
    "q_encode_b62" -> { (s, dir) =>
      import s.implicits._
      GraftFunctions.register(s)
      Tables.t(s, dir, "orders").select(
        $"o_orderkey",
        call_function("base62_encode", $"o_orderkey").as("b62"),
        call_function("base62_decode",
          call_function("base62_encode", $"o_orderkey")).as("roundtrip"))
    },

    // §2.8 BSON family (minimal): TO_BSON + BSON_VALUE with the
    // reference's dot/[n] field keys and typed returns. The oracle
    // round-trips events.props (JSON) through the BSON codec and compares
    // to direct JSON extraction — plus a nested constructed document.
    "q_bson_value" -> { (s, dir) =>
      import s.implicits._
      GraftFunctions.register(s)
      Tables.t(s, dir, "events")
        .withColumn("b", call_function("to_bson", $"props"))
        .withColumn("nested", call_function("to_bson",
          concat(lit("{\"a\":{\"xs\":[\""), $"event_type",
            lit("\",\"x\"],\"n\":"), $"event_id".cast(StringType),
            lit("}}"))))
        .select(
          $"event_id",
          call_function("bson_value", $"b", lit("k"), lit("VARCHAR"))
            .as("k_str"),
          call_function("bson_value", $"nested", lit("a.xs[0]"),
            lit("VARCHAR")).as("xs0"),
          call_function("bson_value", $"nested", lit("a.n"),
            lit("BIGINT")).as("n_long"),
          call_function("bson_value", $"nested", lit("a.missing"),
            lit("VARCHAR")).as("missing"),
          call_function("bson_value_type", $"nested", lit("a.xs"))
            .as("tp_arr"),
          call_function("bson_value_type", $"nested", lit("a.n"))
            .as("tp_num"),
          call_function("bson_value_type", $"nested", lit("a.xs[0]"))
            .as("tp_str"),
          call_function("bson_value_type", $"nested", lit("a.missing"))
            .as("tp_missing"))
    },

    // BSON_CONDITION_EXPRESSION — the reference's DynamoDB-style
    // condition grammar (SQL-style $EXPR/$VAL/$KEYS and document-style)
    // evaluated against a per-event document built from columns, so the
    // oracle can recompute every verdict in plain SQL.
    "q_bson_condition" -> { (s, dir) =>
      import s.implicits._
      GraftFunctions.register(s)
      def cond(b: org.apache.spark.sql.Column, json: String) =
        call_function("bson_condition_expression", b, lit(json))
      Tables.t(s, dir, "events")
        .withColumn("b", call_function("to_bson", concat(
          lit("""{"item":{"price":"""),
          get_json_object($"props", "$.k"),
          lit(""","tags":["""" ), $"event_type",
          lit("""","x"],"name":""""), $"event_type",
          lit(""""},"qty":"""), pmod($"event_id", lit(7)).cast(StringType),
          lit(""","colors":{"$set":["red","blue"]}}"""))))
        .select(
          $"event_id",
          cond($"b", """{"$EXPR": "item.price > :lo AND qty <= :hi",
            "$VAL": {":lo": 50, ":hi": 3}}""").as("c_gt"),
          cond($"b", """{"$EXPR": "begins_with(item.name, :p)",
            "$VAL": {":p": "cl"}}""").as("c_begins"),
          cond($"b", """{"$EXPR": "item.name IN (:a, :b)",
            "$VAL": {":a": "click", ":b": "view"}}""").as("c_in"),
          cond($"b", """{"$EXPR":
            "size(item.tags) = :two AND contains(item.tags, :t)",
            "$VAL": {":two": 2, ":t": "click"}}""").as("c_contains"),
          cond($"b", """{"$EXPR": "#p BETWEEN :lo AND :hi",
            "$VAL": {":lo": 20, ":hi": 60},
            "$KEYS": {"#p": "item.price"}}""").as("c_alias"),
          cond($"b", """{"qty": {"$gte": 5}}""").as("c_doc"),
          cond($"b", """{"$EXPR":
            "field_exists(colors) AND field_type(colors, :t) AND NOT field_not_exists(item)",
            "$VAL": {":t": "SS"}}""").as("c_type"))
    },

    // BSON_UPDATE_EXPRESSION — $SET (literal, path arithmetic,
    // $IF_NOT_EXISTS, array-index append), $UNSET, numeric/set $ADD,
    // $DELETE_FROM_SET; results re-extracted as typed scalars so the
    // oracle compares exact values.
    "q_bson_update" -> { (s, dir) =>
      import s.implicits._
      GraftFunctions.register(s)
      Tables.t(s, dir, "events")
        .withColumn("b", call_function("to_bson", concat(
          lit("""{"item":{"price":"""),
          get_json_object($"props", "$.k"),
          lit(""","tags":["""" ), $"event_type",
          lit("""","x"],"name":""""), $"event_type",
          lit(""""},"qty":"""), pmod($"event_id", lit(7)).cast(StringType),
          lit(""","colors":{"$set":["red","blue"]}}"""))))
        .withColumn("u", call_function("bson_update_expression", $"b",
          lit("""{"$SET": {
              "total": {"$ADD": ["item.price", "qty"]},
              "flag": {"$IF_NOT_EXISTS": {"flag": "new"}},
              "item.tags[9]": "z"},
            "$UNSET": {"item.name": null},
            "$ADD": {"qty": 10, "colors": {"$set": ["blue", "green"]}},
            "$DELETE_FROM_SET": {"colors": {"$set": ["red"]}}}""")))
        .select(
          $"event_id",
          call_function("bson_value", $"u", lit("total"), lit("BIGINT"))
            .as("total"),
          call_function("bson_value", $"u", lit("qty"), lit("BIGINT"))
            .as("qty2"),
          call_function("bson_value", $"u", lit("flag"), lit("VARCHAR"))
            .as("flag"),
          call_function("bson_value", $"u", lit("item.name"),
            lit("VARCHAR")).as("name_gone"),
          call_function("bson_value", $"u", lit("item.tags[2]"),
            lit("VARCHAR")).as("tag_appended"),
          call_function("bson_value", $"u", lit("colors.$set[0]"),
            lit("VARCHAR")).as("color0"),
          call_function("bson_value", $"u", lit("colors.$set[1]"),
            lit("VARCHAR")).as("color1"))
    },

    // §2.8 ENCODE_BINARY/DECODE_BINARY in the reference's three formats
    // (EncodeBinaryFunction.java: HEX lowercase, BASE64, HBASE escape).
    // The HBASE escape is exercised on raw md5 bytes (non-printables) via
    // a decode(encode(x)) == x roundtrip; hex/base64 compare directly.
    "q_encode_binary" -> { (s, dir) =>
      import s.implicits._
      GraftFunctions.register(s)
      val payload = unhex(graft.functions.GraftFunctions.md5Hex($"p_name")) // 16 raw bytes, non-printable
      Tables.t(s, dir, "part").select(
        $"p_partkey",
        call_function("encode_binary", $"p_name".cast(BinaryType),
          lit("HEX")).as("enc_hex"),
        call_function("encode_binary", $"p_name".cast(BinaryType),
          lit("BASE64")).as("enc_b64"),
        (call_function("decode_binary",
          call_function("encode_binary", payload, lit("HBASE")),
          lit("HBASE")) === payload).as("hbase_roundtrip"),
        call_function("decode_binary",
          call_function("encode_binary", $"p_name".cast(BinaryType),
            lit("BASE64")), lit("BASE64")).cast(StringType).as("b64_rt"))
    },

    // §2.8 CAST/COERCE — Phoenix CAST truncates double→int (java semantics);
    // DuckDB rounds, so the oracle mirrors with trunc().
    "q_cast_coerce" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "orders").select(
        $"o_orderkey",
        $"o_totalprice".cast(LongType).as("price_int"),
        // DECIMAL cast exercised, then widened back to DOUBLE for the wire
        // (driver string-compare: '1.50' vs '1.5' would false-fail).
        $"o_totalprice".cast(DecimalType(28, 2)).cast(DoubleType)
          .as("price_dec"),
        substring($"o_orderpriority", 1, 1).cast(IntegerType).as("prio_num"),
        $"o_custkey".cast(StringType).as("cust_str"),
        $"o_orderdate".cast(DateType).as("od_date"))
    },

    // §2.8 JSON family: JSON_VALUE (→ get_json_object), JSON_QUERY,
    // JSON_EXISTS, nested-path JSON_MODIFY. A nested document is built
    // from typed columns so the oracle can construct the expected strings
    // deterministically (jackson preserves key order + compact form).
    "q_json_funcs" -> { (s, dir) =>
      import s.implicits._
      GraftFunctions.register(s)
      Tables.t(s, dir, "events")
        .withColumn("j", concat(lit("{\"a\":{\"b\":"),
          $"event_id".cast(StringType),
          lit(",\"c\":[\""), $"event_type", lit("\",\"x\"]},\"d\":null}")))
        .select(
          $"event_id",
          get_json_object($"props", "$.k").as("k_str"),
          get_json_object($"props", "$.k").cast(IntegerType).as("k_int"),
          call_function("json_query", $"j", lit("$.a")).as("jq_obj"),
          call_function("json_query", $"j", lit("$.a.c")).as("jq_arr"),
          call_function("json_query", $"j", lit("$.a.c[0]")).as("jq_idx"),
          call_function("json_exists", $"j", lit("$.a.b")).as("je_hit"),
          call_function("json_exists", $"j", lit("$.a.z")).as("je_miss"),
          call_function("json_exists", $"j", lit("$.d")).as("je_null"),
          call_function("json_modify", $"j", lit("$.a.b"), lit("99"))
            .as("jm_replace"),
          call_function("json_modify", $"j", lit("$.a.z"), lit("\"w\""))
            .as("jm_insert"),
          // JSON_VALUE: scalar-only extract (containers and JSON null
          // come back NULL — reference JsonValueFunction.java:39-41)
          call_function("json_value", $"j", lit("$.a.b")).as("jv_num"),
          call_function("json_value", $"j", lit("$.a.c[1]")).as("jv_str"),
          call_function("json_value", $"j", lit("$.a")).as("jv_obj"),
          call_function("json_value", $"j", lit("$.d")).as("jv_null"))
    },

    // §2.8 array functions over a real ARRAY column (embeddings.embedding).
    // Array-typed outputs crash the driver's pandas compare (r1), and
    // float-array stringification is engine-specific — so each array op is
    // probed through scalar DOUBLE projections (full-array semantics are
    // pinned in ScalaTest). float→double casts are exact widenings, so
    // values are bit-identical across engines.
    "q_array_funcs" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "embeddings").select(
        $"vec_id",
        size($"embedding").as("sz"),
        element_at($"embedding", 1).cast(DoubleType).as("e1"), // 1-based ARRAY_ELEM
        // try_element_at: an embedding shorter than 3 must NULL, not
        // raise INVALID_ARRAY_INDEX under ANSI
        try_element_at(slice($"embedding", 1, 3), lit(3)).cast(DoubleType)
          .as("slice3_last"),
        array_max($"embedding").cast(DoubleType).as("mx"),
        array_min($"embedding").cast(DoubleType).as("mn"),
        element_at(reverse($"embedding"), 1).cast(DoubleType).as("rev1"))
    },

    // §2.8 array construction/manipulation from split text
    // (STRING_TO_ARRAY / ARRAY_TO_STRING / ARRAY_APPEND / ANY-style contains).
    "q_words_funcs" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "documents")
        .withColumn("w", split($"text", " "))
        .select(
          $"doc_id",
          size($"w").as("n_tok"),
          element_at($"w", 1).as("first_tok"),
          array_join(slice(array_sort($"w"), 1, 3), ",").as("top3"),
          array_contains($"w", "data").as("has_data"),
          size(array_remove($"w", "the")).as("n_no_the"),
          // ARRAY_APPEND / ARRAY_PREPEND / ARRAY_CAT / ARRAY_FILL
          array_join(array_append(slice($"w", 1, 2), lit("zz")), ",")
            .as("appended"),
          array_join(array_prepend(slice($"w", 1, 2), lit("aa")), ",")
            .as("prepended"),
          array_join(concat(slice($"w", 1, 2), slice($"w", 3, 1)), ",")
            .as("catted"),
          array_join(array_repeat(element_at($"w", 1), 3), ",")
            .as("filled"))
    },

    // §2.7-surplus ROLLUP (absent in Phoenix grammar; Spark/DuckDB both
    // support it — included as declared surplus capability).
    "q_rollup" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "lineitem")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"),
          round(sum(dec($"l_quantity")), 2).cast(DoubleType).as("qty"))
        .select(coalesce($"l_returnflag", lit("ALL")).as("rf"),
          coalesce($"l_linestatus", lit("ALL")).as("ls"), $"n", $"qty")
        .orderBy($"rf", $"ls")
    },

    // §2.4 PERCENTILE_DISC(p) WITHIN GROUP (ORDER BY c ASC|DESC) —
    // smallest value in the given order whose cume_dist >= p (reference:
    // PercentileDiscClientAggregator.java:…cum_dist >= p loop). Spark 4's
    // percentile_disc implements the same SQL-standard rule.
    "q_percentile_disc" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "part")
        .groupBy($"p_brand")
        .agg(
          expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY p_size)")
            .cast(DoubleType).as("pd25"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY p_size)")
            .cast(DoubleType).as("pd50"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY p_size)")
            .cast(DoubleType).as("pd90"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY p_size DESC)")
            .cast(DoubleType).as("pd50_desc"),
          count(lit(1)).as("n"))
        .orderBy($"p_brand")
    },

    // §2.4 PERCENT_RANK(v) WITHIN GROUP (ORDER BY c ASC|DESC) —
    // hypothetical rank of a literal in the ordered multiset (reference:
    // PercentRankClientAggregator.java: ASC accumulates counts while
    // colValue <= v, DESC while colValue > v; result = sum/total).
    "q_percent_rank" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .agg(
          (sum(when($"o_totalprice" <= 150000.0, 1).otherwise(0))
            .cast(DoubleType) / count(lit(1))).as("pr_asc"),
          (sum(when($"o_totalprice" > 150000.0, 1).otherwise(0))
            .cast(DoubleType) / count(lit(1))).as("pr_desc"),
          count(lit(1)).as("n"))
        .orderBy($"o_orderpriority")
    },

    // §2.7-surplus explicit GROUPING SETS with GROUPING() disambiguation
    // (ROLLUP's general form; Spark and DuckDB share the SQL semantics).
    "q_grouping_sets" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT coalesce(l_returnflag, 'ALL') AS rf,
               coalesce(l_linestatus, 'ALL') AS ls,
               grouping(l_returnflag) AS g_rf,
               grouping(l_linestatus) AS g_ls,
               count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                (l_returnflag, l_linestatus))
        ORDER BY rf, ls, g_rf, g_ls""")
    },

    // §2.5 window-function family (surplus vs Phoenix, which has no
    // window clause — SURVEY §2.5): ranking, offset, and frame aggregates
    // over a PK-ordered partition.
    // Time-RANGE window frame (the mode q_window_funcs's ROWS frames
    // don't cover): per-user rolling count/sum over the preceding hour.
    // Spark range frames need a numeric order key — epoch micros, with
    // the frame in micros; DuckDB orders by the timestamp directly with
    // an INTERVAL frame. Both are closed on both ends, so tied
    // timestamps are full peers in each engine.
    "q_rolling_range" -> { (s, dir) =>
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy(unix_micros($"ts"))
        .rangeBetween(-3600L * 1000000L, 0L)
      Tables.t(s, dir, "events")
        .where($"user_id" < 200)
        .select($"event_id", $"user_id", $"ts",
          count(lit(1)).over(w).as("n_1h"),
          round(sum(dec($"value")).over(w), 2).cast(DoubleType)
            .as("sum_1h"))
        .orderBy($"user_id", $"ts", $"event_id")
    },

    "q_window_funcs" -> { (s, dir) =>
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"o_orderpriority").orderBy($"o_orderkey")
      Tables.t(s, dir, "orders")
        .where($"o_orderkey" <= 2000L)
        .select(
          $"o_orderkey", $"o_orderpriority",
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"),
          lag($"o_orderkey", 1).over(w).as("prev_key"),
          lead($"o_orderkey", 1).over(w).as("next_key"),
          round(sum(dec($"o_totalprice")).over(
            w.rowsBetween(Long.MinValue, 0)), 2).cast(DoubleType)
            .as("running_total"),
          first($"o_orderkey").over(w).as("first_key"))
        .orderBy($"o_orderpriority", $"o_orderkey")
    },

    // §2.4 APPROX_COUNT_DISTINCT (HLL++). No oracle: DuckDB's HLL sketch
    // differs — correctness asserted in ScalaTest vs exact counts (±5%).
    "q_approx_distinct" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(approx_count_distinct($"l_partkey").as("apx_parts"),
          approx_count_distinct($"l_orderkey").as("apx_orders"))
        .orderBy($"l_returnflag")
    }
  )

  private val B62 =
    "'0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz'"

  val oracle: Map[String, String] = Map(
    "q_string_funcs" -> """
      SELECT p_partkey,
        substr(p_name, 1, 5) AS sub5,
        instr(p_name, 'e') AS pos_e,
        length(p_name) AS len,
        strlen(p_name) AS olen,
        upper(p_name) AS up,
        lower(p_brand) AS lo,
        trim(concat('  ', p_name, '  ')) AS trimmed,
        lpad(p_brand, 12, '*') AS padded,
        reverse(p_name) AS rev,
        md5(p_name) AS digest,
        concat(p_name, '|', p_brand) AS joined
      FROM part""",

    "q_regexp_funcs" -> """
      SELECT doc_id,
        length(regexp_replace(text, '[aeiou]', '', 'g')) AS devoweled_len,
        nullif(regexp_extract(text, '[a-z]{7,}'), '') AS first_long_word,
        nullif(regexp_extract(substr(text, 3), '[a-z]{5}'), '') AS sub_from3,
        len(string_split(text, ' ')) AS n_tok,
        array_to_string(string_split_regex(text, 'a|e')[1:5], '|')
          AS resplit5
      FROM documents WHERE regexp_matches(text, 'data')""",

    "q_date_funcs" -> """
      SELECT event_id,
        year(ts) AS y, quarter(ts) AS q, month(ts) AS m,
        dayofmonth(ts) AS dom, dayofweek(ts) + 1 AS dow,
        dayofyear(ts) AS doy, weekofyear(ts) AS woy,
        hour(ts) AS h, minute(ts) AS mi, second(ts) AS sec,
        CAST(date_trunc('month', ts) AS TIMESTAMP) AS mon_start,
        strftime(ts, '%Y-%m-%d %H:%M:%S') AS fmt,
        strftime(ts, '%Y/%m/%d %H:%M') AS tochar,
        ts + INTERVAL 30 DAY AS plus30d,
        ts + to_microseconds(129600000000) AS plus_1_5d
      FROM events""",

    "q_to_date" -> """
      SELECT event_id,
        CAST(date_trunc('second', ts) AS TIMESTAMP) AS rt_sec,
        CAST(date_trunc('day', ts) AS TIMESTAMP) AS rt_day,
        CAST(NULL AS TIMESTAMP) AS bad
      FROM events""",

    "q_math_funcs" -> """
      SELECT p_partkey,
        abs(p_size - 25) AS a,
        sqrt(CAST(p_size AS DOUBLE)) AS sq,
        round(cbrt(CAST(p_size AS DOUBLE)), 8) AS cb,
        round(exp(p_size / 50.0), 8) AS ex,
        round(ln(p_size + 1.0), 8) AS ln_,
        round(log10(CAST(p_size AS DOUBLE)), 8) AS l10,
        CAST(pow(p_size, 2) AS DOUBLE) AS p2,
        CAST(sign(p_size - 25) AS DOUBLE) AS sg,
        p_size % 7 AS md,
        sin(CAST(p_size AS DOUBLE)) AS sn,
        cos(CAST(p_size AS DOUBLE)) AS cs,
        CAST(floor(p_retailprice) AS BIGINT) AS fl,
        CAST(ceil(p_retailprice) AS BIGINT) AS ce,
        round(p_retailprice, 1) AS rd,
        floor(p_retailprice * 10) / 10 AS tr
      FROM part""",

    "q_stats_agg" -> """
      SELECT p_brand,
        round(stddev_samp(p_size), 8) AS sd_samp, round(stddev_pop(p_size), 8) AS sd_pop,
        round(var_samp(p_size), 8) AS v_samp, round(var_pop(p_size), 8) AS v_pop,
        quantile_cont(p_size, 0.25) AS p25,
        quantile_cont(p_size, 0.5) AS p50,
        count(*) AS n
      FROM part GROUP BY p_brand ORDER BY p_brand""",

    "q_first_values" -> """
      SELECT o_orderpriority,
        (list(o_totalprice ORDER BY o_orderkey ASC))[1] AS f1,
        (list(o_totalprice ORDER BY o_orderkey ASC))[5] AS f5,
        least(count(*), 5) AS f_len,
        (list(o_totalprice ORDER BY o_orderkey DESC))[1] AS l1,
        (list(o_totalprice ORDER BY o_orderkey DESC))[5] AS l5,
        (list(o_totalprice ORDER BY o_orderkey ASC))[3] AS nth3,
        count(*) AS n
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q_encode_b62" -> s"""
      SELECT o_orderkey,
        CASE WHEN o_orderkey = 0 THEN '0' ELSE ltrim(
          substr($B62, CAST((o_orderkey // 916132832) % 62 AS INT) + 1, 1) ||
          substr($B62, CAST((o_orderkey // 14776336) % 62 AS INT) + 1, 1) ||
          substr($B62, CAST((o_orderkey // 238328) % 62 AS INT) + 1, 1) ||
          substr($B62, CAST((o_orderkey // 3844) % 62 AS INT) + 1, 1) ||
          substr($B62, CAST((o_orderkey // 62) % 62 AS INT) + 1, 1) ||
          substr($B62, CAST(o_orderkey % 62 AS INT) + 1, 1), '0') END AS b62,
        o_orderkey AS roundtrip
      FROM orders""",

    "q_bson_value" -> """
      SELECT event_id,
        -- BSON_VALUE(..., 'VARCHAR') over a numeric node returns
        -- String.valueOf(doubleValue()) like the reference ('69.0' not
        -- '69'). NOTE: this DuckDB cast matches Java's Double.toString
        -- only on the fixture domain (|x| in [1e-3, 1e7)) — beyond it
        -- Java switches to scientific notation; the ENGINE follows the
        -- reference, the oracle covers the fixture.
        CAST(CAST(json_extract_string(props, '$.k') AS DOUBLE) AS VARCHAR)
          AS k_str,
        event_type AS xs0,
        event_id AS n_long,
        CAST(NULL AS VARCHAR) AS missing,
        'BSON' AS tp_arr,
        'INTEGER' AS tp_num,
        'VARCHAR' AS tp_str,
        'NULL' AS tp_missing
      FROM events""",

    "q_bson_condition" -> """
      SELECT event_id,
        (CAST(json_extract(props, '$.k') AS INTEGER) > 50
          AND event_id % 7 <= 3) AS c_gt,
        (event_type LIKE 'cl%') AS c_begins,
        (event_type IN ('click', 'view')) AS c_in,
        (event_type = 'click') AS c_contains,
        (CAST(json_extract(props, '$.k') AS INTEGER) BETWEEN 20 AND 60)
          AS c_alias,
        (event_id % 7 >= 5) AS c_doc,
        TRUE AS c_type
      FROM events""",

    "q_bson_update" -> """
      SELECT event_id,
        CAST(json_extract(props, '$.k') AS BIGINT) + (event_id % 7)
          AS total,
        (event_id % 7) + 10 AS qty2,
        'new' AS flag,
        CAST(NULL AS VARCHAR) AS name_gone,
        'z' AS tag_appended,
        'blue' AS color0,
        'green' AS color1
      FROM events""",

    "q_encode_binary" -> """
      SELECT p_partkey,
        lower(hex(encode(p_name))) AS enc_hex,
        to_base64(encode(p_name)) AS enc_b64,
        TRUE AS hbase_roundtrip,
        p_name AS b64_rt
      FROM part""",

    "q_cast_coerce" -> """
      SELECT o_orderkey,
        CAST(trunc(o_totalprice) AS BIGINT) AS price_int,
        CAST(CAST(o_totalprice AS DECIMAL(28,2)) AS DOUBLE) AS price_dec,
        CAST(substr(o_orderpriority, 1, 1) AS INT) AS prio_num,
        CAST(o_custkey AS VARCHAR) AS cust_str,
        CAST(o_orderdate AS DATE) AS od_date
      FROM orders""",

    "q_json_funcs" -> """
      WITH j AS (SELECT event_id, props, event_type,
        CAST(event_id AS VARCHAR) AS eid FROM events)
      SELECT event_id,
        json_extract_string(props, '$.k') AS k_str,
        CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
        '{"b":' || eid || ',"c":["' || event_type || '","x"]}' AS jq_obj,
        '["' || event_type || '","x"]' AS jq_arr,
        '"' || event_type || '"' AS jq_idx,
        TRUE AS je_hit,
        FALSE AS je_miss,
        TRUE AS je_null,
        '{"a":{"b":99,"c":["' || event_type || '","x"]},"d":null}'
          AS jm_replace,
        '{"a":{"b":' || eid || ',"c":["' || event_type ||
          '","x"],"z":"w"},"d":null}' AS jm_insert,
        eid AS jv_num,
        'x' AS jv_str,
        CAST(NULL AS VARCHAR) AS jv_obj,
        CAST(NULL AS VARCHAR) AS jv_null
      FROM j""",

    "q_array_funcs" -> """
      SELECT vec_id,
        len(embedding) AS sz,
        CAST(embedding[1] AS DOUBLE) AS e1,
        CAST((embedding[1:3])[3] AS DOUBLE) AS slice3_last,
        CAST(list_max(embedding) AS DOUBLE) AS mx,
        CAST(list_min(embedding) AS DOUBLE) AS mn,
        CAST(list_reverse(embedding)[1] AS DOUBLE) AS rev1
      FROM embeddings""",

    "q_words_funcs" -> """
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      SELECT doc_id,
        len(w) AS n_tok,
        w[1] AS first_tok,
        array_to_string(list_sort(w)[1:3], ',') AS top3,
        list_contains(w, 'data') AS has_data,
        len(list_filter(w, x -> x != 'the')) AS n_no_the,
        array_to_string(list_append(w[1:2], 'zz'), ',') AS appended,
        array_to_string(list_prepend('aa', w[1:2]), ',') AS prepended,
        array_to_string(list_concat(w[1:2], w[3:3]), ',') AS catted,
        array_to_string(list_transform(range(3), i -> w[1]), ',') AS filled
      FROM d""",

    "q_percentile_disc" -> """
      WITH cd AS (
        SELECT p_brand, p_size,
          cume_dist() OVER (PARTITION BY p_brand ORDER BY p_size) AS cda,
          cume_dist() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS cdd
        FROM part)
      SELECT p_brand,
        CAST(min(CASE WHEN cda >= 0.25 THEN p_size END) AS DOUBLE) AS pd25,
        CAST(min(CASE WHEN cda >= 0.5 THEN p_size END) AS DOUBLE) AS pd50,
        CAST(min(CASE WHEN cda >= 0.9 THEN p_size END) AS DOUBLE) AS pd90,
        CAST(max(CASE WHEN cdd >= 0.5 THEN p_size END) AS DOUBLE) AS pd50_desc,
        count(*) AS n
      FROM cd GROUP BY p_brand ORDER BY p_brand""",

    "q_percent_rank" -> """
      SELECT o_orderpriority,
        CAST(sum(CASE WHEN o_totalprice <= 150000.0 THEN 1 ELSE 0 END)
          AS DOUBLE) / count(*) AS pr_asc,
        CAST(sum(CASE WHEN o_totalprice > 150000.0 THEN 1 ELSE 0 END)
          AS DOUBLE) / count(*) AS pr_desc,
        count(*) AS n
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q_grouping_sets" -> """
      SELECT coalesce(l_returnflag, 'ALL') AS rf,
             coalesce(l_linestatus, 'ALL') AS ls,
             CAST(grouping(l_returnflag) AS TINYINT) AS g_rf,
             CAST(grouping(l_linestatus) AS TINYINT) AS g_ls,
             count(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                              (l_returnflag, l_linestatus))
      ORDER BY rf, ls, g_rf, g_ls""",

    "q_rolling_range" -> """
      SELECT event_id, user_id, ts,
        count(*) OVER w AS n_1h,
        CAST(round(sum(CAST(value AS DECIMAL(28,2))) OVER w, 2) AS DOUBLE)
          AS sum_1h
      FROM events WHERE user_id < 200
      WINDOW w AS (PARTITION BY user_id ORDER BY ts
        RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
      ORDER BY user_id, ts, event_id""",

    "q_window_funcs" -> """
      SELECT o_orderkey, o_orderpriority,
        row_number() OVER w AS rn,
        rank() OVER w AS rnk,
        dense_rank() OVER w AS drnk,
        ntile(4) OVER w AS quartile,
        lag(o_orderkey, 1) OVER w AS prev_key,
        lead(o_orderkey, 1) OVER w AS next_key,
        CAST(round(sum(CAST(o_totalprice AS DECIMAL(28,2))) OVER
          (PARTITION BY o_orderpriority ORDER BY o_orderkey
           ROWS UNBOUNDED PRECEDING), 2) AS DOUBLE) AS running_total,
        first_value(o_orderkey) OVER w AS first_key
      FROM orders WHERE o_orderkey <= 2000
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
      ORDER BY o_orderpriority, o_orderkey""",

    "q_rollup" -> """
      SELECT coalesce(l_returnflag, 'ALL') AS rf,
             coalesce(l_linestatus, 'ALL') AS ls,
             count(*) AS n,
             CAST(round(sum(CAST(l_quantity AS DECIMAL(28,2))), 2) AS DOUBLE) AS qty
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY rf, ls"""
  )
}
