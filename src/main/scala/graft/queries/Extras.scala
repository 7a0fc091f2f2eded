package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Second coverage batch: ILIKE, row-value-constructor IN lists, bit/byte
  * functions, SUB_BINARY, Phoenix date ROUND/CEIL/FLOOR-to-unit, and
  * ANY/ALL comparisons over arrays (SURVEY.md §2.2, §2.8). */
object Extras {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ILIKE (Phoenix LikeExpression with ILIKE flavor).
    "q_ilike" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "part")
        .filter($"p_name".ilike("%GIZ%"))
        .select($"p_partkey", $"p_name",
          $"p_type".ilike("%ECO%").as("is_eco"))
        .orderBy($"p_partkey")
    },

    // Row-value-constructor IN list — the composite-key skip-scan shape
    // (Phoenix InListExpression over RVCs).
    "q_rvc_in" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        WHERE (l_orderkey, l_linenumber) IN
          ((BIGINT(1),1),(BIGINT(42),3),(BIGINT(101),2),(BIGINT(555),1))
        ORDER BY l_orderkey, l_linenumber, l_quantity""")
    },

    // GET_BIT / bitwise ops (Phoenix GetBitFunction family).
    "q_bit_ops" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "orders").select(
        $"o_orderkey",
        ($"o_orderkey".bitwiseAND(255L)).as("low8"),
        ($"o_orderkey".bitwiseOR(16L)).as("or16"),
        ($"o_orderkey".bitwiseXOR(42L)).as("xor42"),
        shiftleft($"o_orderkey", 2).as("shl2"),
        shiftright($"o_orderkey", 3).as("shr3"),
        bit_count($"o_orderkey").as("nbits"),
        (shiftright($"o_orderkey", 5).bitwiseAND(1L)).as("bit5"))
    },

    // SUB_BINARY over a binary payload (Phoenix SubBinaryFunction). The
    // binary result is hex-serialized in the final projection — the
    // driver's compare can't sort/hash raw bytes (r1 harness crash).
    "q_sub_binary" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "part").select(
        $"p_partkey",
        hex(substring($"p_name".cast(BinaryType), 1, 3)).as("bin3_hex"),
        octet_length($"p_name".cast(BinaryType)).as("nbytes"))
    },

    // Phoenix ROUND/CEIL/FLOOR of dates to a unit (RoundDateExpression:
    // ROUND is half-up to the unit, CEIL is next boundary unless exact).
    "q_date_round" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "events").select(
        $"event_id",
        date_trunc("hour", $"ts").as("floor_h"),
        date_trunc("hour", $"ts" + expr("INTERVAL 30 MINUTES"))
          .as("round_h"),
        when(date_trunc("hour", $"ts") === $"ts", $"ts")
          .otherwise(date_trunc("hour", $"ts") + expr("INTERVAL 1 HOUR"))
          .as("ceil_h"),
        date_trunc("day", $"ts").as("floor_d"))
    },

    // Explicit sort-merge join (Phoenix SORT_MERGE strategy / hint —
    // JoinCompiler.getApplicableJoinStrategies).
    "q_join_sortmerge" -> { (s, dir) =>
      import s.implicits._
      val l = Tables.t(s, dir, "lineitem")
      val o = Tables.t(s, dir, "orders").hint("merge")
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"),
          round(sum($"l_quantity".cast(DecimalType(12, 2))), 2)
            .cast(DoubleType).as("qty"))
        .orderBy($"o_orderpriority")
    },

    // UNION ALL type reconciliation (Phoenix UnionCompiler): INT vs
    // BIGINT vs DOUBLE branches coerced to a common type.
    "q_union_types" -> { (s, dir) =>
      import s.implicits._
      val a = Tables.t(s, dir, "part")
        .select($"p_size".as("v"), lit("int").as("src"))         // int
      val b = Tables.t(s, dir, "orders").orderBy($"o_orderkey").limit(100)
        .select($"o_orderkey".as("v"), lit("long").as("src"))     // bigint
      val c = Tables.t(s, dir, "lineitem")
        .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
          $"l_extendedprice").limit(100)
        .select($"l_quantity".as("v"), lit("double").as("src"))   // double
      graft.operators.SetOps.unionAllReconciled(Seq(a, b, c))
        .orderBy($"src", $"v").limit(500)
    },

    // Sessionization: gap-based session windows per user (time-series
    // pipeline op; Spark session_window — the oracle derives the same
    // sessions via lag + cumulative-sum, semantics verified identical).
    "q_sessionize" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "events")
        .groupBy(session_window($"ts", "30 minutes"), $"user_id")
        .agg(count(lit(1)).as("n"),
          round(sum($"value".cast(DecimalType(12, 2))), 2)
            .cast(DoubleType).as("sum_value"))
        .select($"session_window.start".as("sess_start"),
          $"session_window.end".as("sess_end"),
          $"user_id", $"n", $"sum_value")
        .orderBy($"user_id", $"sess_start")
    },

    // ANY / ALL comparisons over arrays (Phoenix ArrayAnyComparisonNode /
    // ArrayAllComparisonNode) via exists/forall.
    "q_array_any_all" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "documents")
        .select($"doc_id", split(lower($"text"), "\\s+").as("ws"))
        .select(
          $"doc_id",
          exists($"ws", w => length(w) > 6).as("any_long"),
          forall($"ws", w => length(w) <= 12).as("all_le12"),
          exists($"ws", w => w === "data").as("any_data"))
        .orderBy($"doc_id")
    }
  )

  val oracle: Map[String, String] = Map(
    "q_ilike" -> """
      SELECT p_partkey, p_name, p_type ILIKE '%ECO%' AS is_eco
      FROM part WHERE p_name ILIKE '%GIZ%' ORDER BY p_partkey""",

    "q_rvc_in" -> """
      SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      WHERE (l_orderkey, l_linenumber) IN ((1,1),(42,3),(101,2),(555,1))
      ORDER BY l_orderkey, l_linenumber, l_quantity""",

    "q_bit_ops" -> """
      SELECT o_orderkey,
        o_orderkey & 255 AS low8,
        o_orderkey | 16 AS or16,
        xor(o_orderkey, 42) AS xor42,
        o_orderkey << 2 AS shl2,
        o_orderkey >> 3 AS shr3,
        CAST(bit_count(o_orderkey) AS INT) AS nbits,
        (o_orderkey >> 5) & 1 AS bit5
      FROM orders""",

    "q_sub_binary" -> """
      SELECT p_partkey, hex(encode(substr(p_name, 1, 3))) AS bin3_hex,
             octet_length(encode(p_name)) AS nbytes
      FROM part""",

    "q_date_round" -> """
      SELECT event_id,
        CAST(date_trunc('hour', ts) AS TIMESTAMP) AS floor_h,
        CAST(date_trunc('hour', ts + INTERVAL 30 MINUTE) AS TIMESTAMP)
          AS round_h,
        CASE WHEN CAST(date_trunc('hour', ts) AS TIMESTAMP) = ts THEN ts
             ELSE CAST(date_trunc('hour', ts) AS TIMESTAMP)
               + INTERVAL 1 HOUR END AS ceil_h,
        CAST(date_trunc('day', ts) AS TIMESTAMP) AS floor_d
      FROM events""",

    "q_join_sortmerge" -> """
      SELECT o_orderpriority, count(*) AS n,
             CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q_union_types" -> """
      SELECT * FROM (
        SELECT CAST(p_size AS DOUBLE) AS v, 'int' AS src FROM part
        UNION ALL
        SELECT CAST(o_orderkey AS DOUBLE) AS v, 'long' AS src FROM
          (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 100)
        UNION ALL
        SELECT l_quantity AS v, 'double' AS src FROM
          (SELECT l_quantity FROM lineitem ORDER BY l_orderkey, l_linenumber,
           l_partkey, l_suppkey, l_extendedprice LIMIT 100))
      ORDER BY src, v LIMIT 500""",

    "q_sessionize" -> """
      WITH m AS (SELECT user_id, ts, value,
          CASE WHEN lag(ts) OVER w IS NULL
               OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
               THEN 1 ELSE 0 END AS ns
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts
              ROWS UNBOUNDED PRECEDING) AS sid FROM m)
      SELECT min(ts) AS sess_start, max(ts) + INTERVAL 30 MINUTE AS sess_end,
             user_id, count(*) AS n,
             CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value
      FROM s GROUP BY user_id, sid ORDER BY user_id, sess_start""",

    "q_array_any_all" -> raw"""
      SELECT doc_id,
        len(list_filter(string_split_regex(lower(text), '\s+'),
          w -> length(w) > 6)) > 0 AS any_long,
        len(list_filter(string_split_regex(lower(text), '\s+'),
          w -> length(w) <= 12)) =
          len(string_split_regex(lower(text), '\s+')) AS all_le12,
        len(list_filter(string_split_regex(lower(text), '\s+'),
          w -> w = 'data')) > 0 AS any_data
      FROM documents ORDER BY doc_id"""
  )
}
