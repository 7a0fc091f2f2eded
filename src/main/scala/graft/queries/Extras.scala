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

    // GET_BYTE / GET_BIT / SET_BYTE / SET_BIT over BINARY (Phoenix
    // GetByteFunction family, PBinaryBase semantics: offsets wrap modulo
    // length, signed bytes, LSB-first bits). Binary outputs hex-serialized
    // for the driver compare.
    "q_byte_ops" -> { (s, dir) =>
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val bin = $"p_name".cast(BinaryType)
      Tables.t(s, dir, "part").select(
        $"p_partkey",
        call_function("get_byte", bin, lit(2)).as("b2"),
        call_function("get_byte", bin, lit(-1)).as("b_last"),
        call_function("get_bit", bin, lit(13)).as("bit13"),
        hex(call_function("set_byte", bin, lit(0), lit(65))).as("sb_hex"),
        hex(call_function("set_bit", bin, lit(3), lit(1))).as("st_hex"))
    },

    // CONVERT_TIMEZONE (Phoenix ConvertTimezoneFunction): shift a UTC
    // instant to a zone's wall-clock time, IANA rules on both engines.
    "q_convert_tz" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "events").select(
        $"event_id",
        convert_timezone(lit("UTC"), lit("America/New_York"), $"ts").as("ny"),
        convert_timezone(lit("UTC"), lit("Asia/Tokyo"), $"ts").as("tokyo"),
        convert_timezone(lit("UTC"), lit("Europe/Paris"), $"ts").as("paris"))
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

    // Phoenix ROUND/CEIL/FLOOR of dates to a unit — all units incl.
    // WEEK/MONTH/YEAR (RoundDateExpression half-up for fixed units;
    // Round{Week,Month,Year}Expression half-even calendar rounding).
    "q_date_round" -> { (s, dir) =>
      import s.implicits._
      import graft.functions.DateRound._
      Tables.t(s, dir, "events").select(
        $"event_id",
        floorDate($"ts", "HOUR").as("floor_h"),
        roundDate($"ts", "HOUR").as("round_h"),
        ceilDate($"ts", "HOUR").as("ceil_h"),
        roundDate($"ts", "MINUTE").as("round_min"),
        floorDate($"ts", "DAY").as("floor_d"),
        roundDate($"ts", "DAY").as("round_d"),
        ceilDate($"ts", "DAY").as("ceil_d"),
        floorDate($"ts", "WEEK").as("floor_w"),
        roundDate($"ts", "WEEK").as("round_w"),
        ceilDate($"ts", "WEEK").as("ceil_w"),
        floorDate($"ts", "MONTH").as("floor_mo"),
        roundDate($"ts", "MONTH").as("round_mo"),
        ceilDate($"ts", "MONTH").as("ceil_mo"),
        floorDate($"ts", "YEAR").as("floor_y"),
        roundDate($"ts", "YEAR").as("round_y"))
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
          round(sum($"l_quantity".cast(DecimalType(28, 2))), 2)
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

    // §2.7 INTERSECT / EXCEPT (surplus beyond Phoenix's UNION ALL —
    // declared set-op completeness; both are distinct-semantics).
    "q_intersect" -> { (s, dir) =>
      import s.implicits._
      val early = Tables.t(s, dir, "lineitem")
        .filter($"l_shipdate" < lit("1994-01-01").cast(TimestampType))
        .select($"l_orderkey")
      val flagged = Tables.t(s, dir, "lineitem")
        .filter($"l_returnflag" === "R").select($"l_orderkey")
      early.intersect(flagged).orderBy($"l_orderkey")
    },

    "q_except" -> { (s, dir) =>
      import s.implicits._
      val all = Tables.t(s, dir, "customer").select($"c_nationkey")
      val big = Tables.t(s, dir, "customer")
        .filter($"c_acctbal" > 9000.0).select($"c_nationkey")
      all.except(big).orderBy($"c_nationkey")
    },

    // Sessionization: gap-based session windows per user (time-series
    // pipeline op; Spark session_window — the oracle derives the same
    // sessions via lag + cumulative-sum, semantics verified identical).
    "q_sessionize" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "events")
        .groupBy(session_window($"ts", "30 minutes"), $"user_id")
        .agg(count(lit(1)).as("n"),
          round(sum($"value".cast(DecimalType(28, 2))), 2)
            .cast(DoubleType).as("sum_value"))
        .select($"session_window.start".as("sess_start"),
          $"session_window.end".as("sess_end"),
          $"user_id", $"n", $"sum_value")
        .orderBy($"user_id", $"sess_start")
    },

    // ANY / ALL comparisons over arrays (Phoenix ArrayAnyComparisonNode /
    // ArrayAllComparisonNode). exists/forall are interpreted HOFs, so the
    // length predicates fold through the fused max_strlen kernel
    // (exists(len>k) ⇔ max>k, forall(len<=k) ⇔ max<=k) and the equality
    // ANY is the codegen'd array_contains builtin — same semantics, whole
    // query stays inside whole-stage codegen.
    "q_array_any_all" -> { (s, dir) =>
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      Tables.t(s, dir, "documents")
        .select($"doc_id", split(lower($"text"), "\\s+").as("ws"))
        .select(
          $"doc_id",
          (call_function("max_strlen", $"ws") > 6).as("any_long"),
          (call_function("max_strlen", $"ws") <= 12).as("all_le12"),
          array_contains($"ws", "data").as("any_data"))
        .orderBy($"doc_id")
    },

    // Two-step funnel (click → later purchase) per user: conditional
    // min-aggregates + one keyed join — the sequence-analytics shape
    // that at scale is two partial+final aggs and a user-keyed join,
    // never a window over the whole event log.
    "q_funnel" -> { (s, dir) =>
      import s.implicits._
      val e = Tables.t(s, dir, "events")
      val fc = e.where($"event_type" === "click")
        .groupBy($"user_id").agg(min($"ts").as("first_click"))
      val conv = e.where($"event_type" === "purchase")
        .join(fc, "user_id")
        .where($"ts" >= $"first_click")
        .groupBy($"user_id").agg(min($"ts").as("first_purchase_after"))
      fc.join(conv, Seq("user_id"), "left")
        .select($"user_id", $"first_click", $"first_purchase_after",
          $"first_purchase_after".isNotNull.as("converted"))
        .orderBy($"user_id")
    },

    // As-of join (each click → the user's latest purchase at or before
    // it): union-merge shape — one exchange on the key, a running
    // last(ignoreNulls) window, NO join operator in the plan. The naive
    // inequality join would be a BroadcastNestedLoopJoin. Purchases are
    // pre-collapsed to one row per (user, ts) so the match is unique.
    "q_asof_join" -> { (s, dir) =>
      import s.implicits._
      val e = Tables.t(s, dir, "events")
      val clicks = e.where($"event_type" === "click")
        .select($"event_id", $"user_id", $"ts")
      val purchases = e.where($"event_type" === "purchase")
        .groupBy($"user_id", $"ts".as("p_ts"))
        .agg(max($"event_id").as("purchase_id"),
          max($"value").as("purchase_value"))
      graft.operators.Temporal.asofJoin(
          clicks, purchases, "user_id", "ts", "p_ts")
        .orderBy($"event_id")
    },

    // Bucketed as-of join: identical semantics to q_asof_join (same
    // oracle) through the hot-key-parallel variant — per-bucket closing
    // rows forward-fill across a (key, bucket) spine, so one
    // pathologically hot key spreads over #buckets window groups instead
    // of serializing into one task. 1-day buckets here.
    "q_asof_join_bucketed" -> { (s, dir) =>
      import s.implicits._
      val e = Tables.t(s, dir, "events")
      val clicks = e.where($"event_type" === "click")
        .select($"event_id", $"user_id", $"ts")
      val purchases = e.where($"event_type" === "purchase")
        .groupBy($"user_id", $"ts".as("p_ts"))
        .agg(max($"event_id").as("purchase_id"),
          max($"value").as("purchase_value"))
      graft.operators.Temporal.asofJoinBucketed(
          clicks, purchases, Seq("user_id"), "ts", "p_ts",
          bucketWidth = 86400L)
        .orderBy($"event_id")
    },

    // Range (interval containment) join: lineitem ship dates against
    // order-anchored validity windows. Bucketed-equi-join shape: the
    // time axis chunks into 7-day cells, intervals explode to covered
    // cells, points probe exactly one cell — an equi-shuffle instead of
    // the nested-loop plan the BETWEEN theta-join would get.
    "q_range_join" -> { (s, dir) =>
      import s.implicits._
      val iv = Tables.t(s, dir, "orders")
        .where(pmod($"o_orderkey", lit(97)) === 0)
        .select($"o_orderkey", $"o_orderdate".as("lo"),
          ($"o_orderdate" + expr(
            "make_interval(0, 0, 0, cast(o_orderkey % 20 + 1 as int))"))
            .as("hi"))
      val pt = Tables.t(s, dir, "lineitem")
        .where(pmod($"l_partkey", lit(17)) === 0)
        .select($"l_orderkey", $"l_linenumber", $"l_shipdate")
      graft.operators.Temporal.rangeJoin(
          pt, iv, "l_shipdate", "lo", "hi", bucketWidth = 7L * 86400)
        .orderBy($"l_orderkey", $"l_linenumber", $"o_orderkey")
    },

    // Z-order clustered layout (operators/Layout.zorderBy): write a
    // lineitem subset clustered on (l_partkey, l_suppkey), read it back,
    // aggregate — proves the layout path preserves content exactly (the
    // pruning property itself is pinned in ZOrderSpec, which measures
    // per-file min/max ranges on both z columns). Subset via pmod keeps
    // the write bounded in the bench battery.
    "q_zorder_scan" -> { (s, dir) =>
      import s.implicits._
      val li = Tables.t(s, dir, "lineitem")
        .where(pmod($"l_orderkey", lit(7)) === 0)
        .select($"l_orderkey", $"l_linenumber", $"l_partkey",
          $"l_suppkey", $"l_quantity")
      // one deterministic path PER PROCESS, not createTempDirectory:
      // the query runs in every verify/bench battery and a fresh dir
      // per call would accumulate unbounded parquet in /tmp; Overwrite
      // handles re-runs. The pid suffix keeps two concurrent harness
      // JVMs (Test fork + run fork) from racing one shared dir —
      // process A's Overwrite delete mid-way through process B's scan
      // was a nondeterministic FileNotFoundException.
      val out = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_zorder_scan_${ProcessHandle.current().pid()}").toString
      graft.operators.Layout.writeZOrdered(
        li, out, Seq("l_partkey", "l_suppkey"), numFiles = 8)
      s.read.parquet(out)
        .where($"l_suppkey" <= 20)
        .groupBy($"l_suppkey")
        .agg(count(lit(1)).as("n"),
          sum($"l_quantity".cast(DecimalType(28, 2)))
            .cast(DoubleType).as("qty"))
        .orderBy($"l_suppkey")
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

    "q_byte_ops" -> """
      SELECT p_partkey,
        ascii(substr(p_name, 3, 1)) AS b2,
        ascii(substr(p_name, length(p_name), 1)) AS b_last,
        (ascii(substr(p_name, 2, 1)) // 32) % 2 AS bit13,
        '41' || hex(encode(substr(p_name, 2))) AS sb_hex,
        upper(lpad(to_hex(ascii(substr(p_name, 1, 1)) | 8), 2, '0')) ||
          hex(encode(substr(p_name, 2))) AS st_hex
      FROM part""",

    "q_convert_tz" -> """
      SELECT event_id,
        timezone('America/New_York', timezone('UTC', CAST(ts AS TIMESTAMP)))
          AS ny,
        timezone('Asia/Tokyo', timezone('UTC', CAST(ts AS TIMESTAMP)))
          AS tokyo,
        timezone('Europe/Paris', timezone('UTC', CAST(ts AS TIMESTAMP)))
          AS paris
      FROM events""",

    "q_sub_binary" -> """
      SELECT p_partkey, hex(encode(substr(p_name, 1, 3))) AS bin3_hex,
             octet_length(encode(p_name)) AS nbytes
      FROM part""",

    "q_date_round" -> """
      WITH b AS (
        SELECT event_id, ts, epoch_us(ts) AS eus,
          CAST(date_trunc('week', ts) AS TIMESTAMP) AS lw,
          CAST(date_trunc('month', ts) AS TIMESTAMP) AS lmo,
          CAST(date_trunc('year', ts) AS TIMESTAMP) AS ly
        FROM events),
      b2 AS (
        SELECT *, lw + INTERVAL 7 DAY AS uw,
          lmo + INTERVAL 1 MONTH AS umo, ly + INTERVAL 1 YEAR AS uy
        FROM b)
      SELECT event_id,
        make_timestamp(eus - eus % 3600000000) AS floor_h,
        make_timestamp((eus + 1800000000) - (eus + 1800000000) % 3600000000)
          AS round_h,
        make_timestamp((eus + 3599999999) - (eus + 3599999999) % 3600000000)
          AS ceil_h,
        make_timestamp((eus + 30000000) - (eus + 30000000) % 60000000)
          AS round_min,
        make_timestamp(eus - eus % 86400000000) AS floor_d,
        make_timestamp((eus + 43200000000) - (eus + 43200000000) % 86400000000)
          AS round_d,
        make_timestamp((eus + 86399999999) - (eus + 86399999999) % 86400000000)
          AS ceil_d,
        lw AS floor_w,
        CASE WHEN eus - epoch_us(lw) < epoch_us(uw) - eus THEN lw
             WHEN eus - epoch_us(lw) > epoch_us(uw) - eus THEN uw
             WHEN weekofyear(lw) % 2 = 0 THEN lw ELSE uw END AS round_w,
        CASE WHEN lw = ts THEN ts ELSE uw END AS ceil_w,
        lmo AS floor_mo,
        CASE WHEN eus - epoch_us(lmo) < epoch_us(umo) - eus THEN lmo
             WHEN eus - epoch_us(lmo) > epoch_us(umo) - eus THEN umo
             WHEN month(lmo) % 2 = 0 THEN lmo ELSE umo END AS round_mo,
        CASE WHEN lmo = ts THEN ts ELSE umo END AS ceil_mo,
        ly AS floor_y,
        CASE WHEN eus - epoch_us(ly) < epoch_us(uy) - eus THEN ly
             WHEN eus - epoch_us(ly) > epoch_us(uy) - eus THEN uy
             WHEN year(ly) % 2 = 0 THEN ly ELSE uy END AS round_y
      FROM b2""",

    "q_join_sortmerge" -> """
      SELECT o_orderpriority, count(*) AS n,
             CAST(round(sum(CAST(l_quantity AS DECIMAL(28,2))), 2) AS DOUBLE) AS qty
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

    "q_intersect" -> """
      SELECT l_orderkey FROM lineitem
      WHERE l_shipdate < TIMESTAMP '1994-01-01'
      INTERSECT
      SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
      ORDER BY l_orderkey""",

    "q_except" -> """
      SELECT c_nationkey FROM customer
      EXCEPT
      SELECT c_nationkey FROM customer WHERE c_acctbal > 9000.0
      ORDER BY c_nationkey""",

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
             CAST(round(sum(CAST(value AS DECIMAL(28,2))), 2) AS DOUBLE) AS sum_value
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
      FROM documents ORDER BY doc_id""",

    "q_funnel" -> """
      WITH fc AS (SELECT user_id, min(ts) AS first_click FROM events
                  WHERE event_type = 'click' GROUP BY user_id),
      conv AS (SELECT e.user_id, min(e.ts) AS first_purchase_after
               FROM events e JOIN fc USING (user_id)
               WHERE e.event_type = 'purchase' AND e.ts >= fc.first_click
               GROUP BY e.user_id)
      SELECT fc.user_id, fc.first_click, conv.first_purchase_after,
             conv.first_purchase_after IS NOT NULL AS converted
      FROM fc LEFT JOIN conv USING (user_id)
      ORDER BY fc.user_id""",

    "q_asof_join" -> """
      WITH c AS (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'click'),
      p AS (SELECT user_id, ts AS p_ts, max(event_id) AS purchase_id,
                   max(value) AS purchase_value
            FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
      SELECT c.event_id, c.user_id, c.ts,
             p.p_ts, p.purchase_id, p.purchase_value
      FROM c ASOF LEFT JOIN p
        ON c.user_id = p.user_id AND c.ts >= p.p_ts
      ORDER BY c.event_id""",

    "q_asof_join_bucketed" -> """
      WITH c AS (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'click'),
      p AS (SELECT user_id, ts AS p_ts, max(event_id) AS purchase_id,
                   max(value) AS purchase_value
            FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
      SELECT c.event_id, c.user_id, c.ts,
             p.p_ts, p.purchase_id, p.purchase_value
      FROM c ASOF LEFT JOIN p
        ON c.user_id = p.user_id AND c.ts >= p.p_ts
      ORDER BY c.event_id""",

    "q_range_join" -> """
      WITH iv AS (SELECT o_orderkey, o_orderdate AS lo,
                    o_orderdate + ((o_orderkey % 20 + 1) * INTERVAL 1 DAY)
                      AS hi
                  FROM orders WHERE o_orderkey % 97 = 0),
      pt AS (SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
             WHERE l_partkey % 17 = 0)
      SELECT pt.l_orderkey, pt.l_linenumber, pt.l_shipdate,
             iv.o_orderkey, iv.lo, iv.hi
      FROM pt JOIN iv ON pt.l_shipdate BETWEEN iv.lo AND iv.hi
      ORDER BY pt.l_orderkey, pt.l_linenumber, iv.o_orderkey""",

    "q_zorder_scan" -> """
      SELECT l_suppkey, count(*) AS n,
        CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS qty
      FROM lineitem
      WHERE l_orderkey % 7 = 0 AND l_suppkey <= 20
      GROUP BY l_suppkey
      ORDER BY l_suppkey"""
  )
}
