package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Relational-core operator battery: scans, predicates, joins, aggregation,
  * sort/limit/offset, set ops — SURVEY.md §2.1–§2.7.
  *
  * Oracle-exactness policy: DOUBLE aggregation is order-dependent, so every
  * SUM/AVG over a double column casts to DECIMAL first (exact, associative),
  * and AVG is expressed as cast(sum(decimal) as double)/count so both
  * engines perform the identical IEEE division. Top-k queries always carry a
  * unique tie-break key so results are total-ordered and deterministic.
  *
  * Reference behaviors mirrored from apache/phoenix (see SURVEY.md §2 for
  * file:line citations per operator).
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  // exact decimal views of the double measure columns
  private def dec(c: Column): Column = c.cast(DecimalType(28, 2))
  private def fac(c: Column): Column = c.cast(DecimalType(4, 2))
  // Wire-format rule (round-1 driver root cause): the driver string-compares
  // fetched values, and Spark DECIMAL stringifies as '506627.00' while the
  // DuckDB oracle fetch yields '506627.0'. So aggregates SUM in exact
  // decimal but the FINAL projection emits DOUBLE. round(_,2) first keeps
  // the unscaled value < 2^53 so decimal→double is correctly rounded (and
  // identical) in both engines.
  private def outd(c: Column): Column = round(c, 2).cast(DoubleType)

  val queries: Map[String, Q] = Map(
    // §2.4 grouped aggregation, partial+final (Phoenix
    // GroupedAggregateRegionObserver + client merge) — TPC-H Q1 shape.
    "q1_agg" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "lineitem")
        .filter($"l_shipdate" <= lit("1998-09-02").cast(TimestampType))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          outd(sum(dec($"l_quantity"))).as("sum_qty"),
          outd(sum(dec($"l_extendedprice"))).as("sum_base_price"),
          outd(sum(dec($"l_extendedprice") * (fac(lit(1)) - fac($"l_discount"))))
            .as("sum_disc_price"),
          outd(sum(dec($"l_extendedprice") * (fac(lit(1)) - fac($"l_discount"))
            * (fac(lit(1)) + fac($"l_tax")))).as("sum_charge"),
          (sum(dec($"l_quantity")).cast(DoubleType) / count(lit(1)))
            .as("avg_qty"),
          (sum(dec($"l_discount")).cast(DoubleType) / count(lit(1)))
            .as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    // §2.1 full scan + projection + filter pushed to parquet.
    "q_scan_filter" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "lineitem")
        .filter($"l_shipdate" < lit("1996-01-01").cast(TimestampType))
        .select($"l_orderkey", $"l_linenumber", $"l_quantity")
    },

    // §2.1 point lookup: PK equality (Phoenix ScanRanges.createPointLookup).
    "q_point_lookup" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "orders")
        .filter($"o_orderkey" === 42L)
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
    },

    // §2.1 range scan over PK prefix.
    "q_range_scan" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "lineitem")
        .filter($"l_orderkey".between(100L, 300L))
        .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
    },

    // §2.1 skip scan: composite-key IN combos (Phoenix SkipScanFilter) —
    // in Spark these are just pushed-down predicates on the sorted layout.
    "q_skip_scan" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "lineitem")
        .filter($"l_orderkey".isin(11L, 42L, 77L, 101L, 555L) &&
          $"l_linenumber".isin(1, 3))
        .select($"l_orderkey", $"l_linenumber", $"l_quantity")
    },

    // §2.1 TABLESAMPLE — deterministic by-key sampling (Phoenix
    // TableSamplerPredicate hashes the rowkey vs the rate); portable
    // multiplicative hash so the DuckDB oracle reproduces it bit-for-bit.
    "q_tablesample" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "orders")
        // overflow-safe multiply (Curation.hash32): the naive
        // o_orderkey * 2654435761 overflows Long for keys >= ~3.47e9 —
        // an ANSI runtime error at bigger-than-fixture scales. Values
        // identical, so the oracle keeps its simple spelling.
        .filter(graft.operators.Curation.hash32($"o_orderkey") <
          lit((0.05 * 4294967296L).toLong))
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    },

    // §2.6 top-k: ORDER BY + LIMIT → TakeOrderedAndProject (per-partition
    // top-k + driver merge; Phoenix MergeSortTopNResultIterator).
    "q_topk" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "lineitem")
        .orderBy($"l_extendedprice".desc, $"l_orderkey".asc,
          $"l_linenumber".asc)
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
        .limit(100)
    },

    // §2.6 LIMIT + OFFSET paging.
    "q_limit_offset" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "orders")
        .orderBy($"o_orderkey")
        .select($"o_orderkey", $"o_orderstatus")
        .offset(20).limit(50)
    },

    // §2.6 RVC OFFSET keyset pagination (Phoenix RVCOffsetCompiler):
    // OFFSET (pk1,pk2)=(v1,v2) → row-value-constructor filter rewrite.
    "q_rvc_offset" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "lineitem")
        .filter(struct($"l_orderkey", $"l_linenumber") >
          struct(lit(1000L), lit(2)))
        .orderBy($"l_orderkey", $"l_linenumber")
        .select($"l_orderkey", $"l_linenumber", $"l_quantity")
        .limit(100)
    },

    // §2.2 predicate surface: LIKE / ILIKE / BETWEEN / IN / NOT.
    "q_predicates" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "part")
        .filter($"p_name".like("%e%") &&
          !lower($"p_type").like("%promo%") &&
          $"p_size".between(1, 40) &&
          $"p_brand".isin("Brand#1", "Brand#9", "Brand#13", "Brand#20"))
        .select($"p_partkey", $"p_name", $"p_brand", $"p_size")
    },

    // §2.2 IS NULL / CASE WHEN / COALESCE / NULLIF null-handling semantics.
    "q_null_case" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber",
          nullif($"l_returnflag", lit("N")).as("rf_nulled"))
        .select($"l_orderkey", $"l_linenumber",
          $"rf_nulled".isNull.as("is_open"),
          coalesce($"rf_nulled", lit("OPEN")).as("rf_filled"),
          when($"rf_nulled" === "A", "accepted")
            .when($"rf_nulled" === "R", "returned")
            .otherwise("other").as("rf_class"))
        .orderBy($"l_orderkey", $"l_linenumber").limit(500)
    },

    // §2.3 inner equi-join + group (broadcast dim at scale).
    "q_join_inner" -> { (s, dir) =>
      import s.implicits._
      val o = Tables.t(s, dir, "orders")
      val c = Tables.t(s, dir, "customer")
      o.join(broadcast(c), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          outd(sum(dec($"o_totalprice"))).as("sum_price"))
        .orderBy($"c_mktsegment")
    },

    // §2.3 left outer join, null-extension checked via count of right key.
    "q_join_left" -> { (s, dir) =>
      import s.implicits._
      val c = Tables.t(s, dir, "customer")
      val o = Tables.t(s, dir, "orders")
      c.join(o, $"c_custkey" === $"o_custkey", "left")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("n_orders"))
        .orderBy($"c_custkey")
    },

    // §2.3 right outer join (Phoenix flips to left internally).
    "q_join_right" -> { (s, dir) =>
      import s.implicits._
      val o = Tables.t(s, dir, "orders")
      val c = Tables.t(s, dir, "customer")
      o.join(c, $"o_custkey" === $"c_custkey", "right")
        .groupBy($"c_nationkey")
        .agg(count($"o_orderkey").as("n_orders"),
          count(lit(1)).as("n_rows"))
        .orderBy($"c_nationkey")
    },

    // §2.3 full outer join.
    "q_join_full" -> { (s, dir) =>
      import s.implicits._
      val n = Tables.t(s, dir, "nation").select($"n_nationkey", $"n_name")
      val c = Tables.t(s, dir, "customer")
        .groupBy($"c_nationkey").agg(count(lit(1)).as("n_cust"))
      n.join(c, $"n_nationkey" === $"c_nationkey", "full")
        .select($"n_nationkey", $"n_name", $"n_cust")
        // explicit null placement: a FULL join can emit a NULL-keyed
        // row, and Spark ASC defaults NULLS FIRST where DuckDB defaults
        // NULLS LAST — pin the order like q_orderby_nulls does (the
        // row-sorted compare masks it, but the contract shouldn't
        // depend on the checker's sort)
        .orderBy($"n_nationkey".asc_nulls_last)
    },

    // §2.3 semi join (EXISTS subquery rewrite — Phoenix SubqueryRewriter).
    "q_join_semi" -> { (s, dir) =>
      import s.implicits._
      val c = Tables.t(s, dir, "customer")
      val big = Tables.t(s, dir, "orders").filter($"o_totalprice" > 100000.0)
      c.join(big, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name", $"c_mktsegment")
        .orderBy($"c_custkey")
    },

    // §2.3 anti join (NOT EXISTS).
    "q_join_anti" -> { (s, dir) =>
      import s.implicits._
      val c = Tables.t(s, dir, "customer")
      val huge = Tables.t(s, dir, "orders").filter($"o_totalprice" > 400000.0)
      c.join(huge, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    },

    // §2.3 star join: fact + three broadcast dims in one pass
    // (Phoenix QueryCompiler star-join batching).
    "q_star_join" -> { (s, dir) =>
      import s.implicits._
      val l = Tables.t(s, dir, "lineitem")
      val p = Tables.t(s, dir, "part")
      val sup = Tables.t(s, dir, "supplier")
      val o = Tables.t(s, dir, "orders")
      l.join(broadcast(p), $"l_partkey" === $"p_partkey")
        .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
        .join(o, $"l_orderkey" === $"o_orderkey")
        .filter($"o_orderstatus" === "F")
        .groupBy($"p_brand")
        .agg(
          outd(sum(dec($"l_extendedprice") * (fac(lit(1)) - fac($"l_discount"))))
            .as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy($"p_brand")
    },

    // TPC-H Q3 shape (shipping priority): segment-filtered customer dim
    // BROADCAST into the orders⋈lineitem shuffle join, top-10 by
    // aggregated revenue with a full deterministic tie-break
    // (l_orderkey is unique per group).
    "q_tpch_q3" -> { (s, dir) =>
      import s.implicits._
      val c = Tables.t(s, dir, "customer")
        .filter($"c_mktsegment" === "BUILDING")
      val o = Tables.t(s, dir, "orders")
        .filter($"o_orderdate" < lit("1998-06-15").cast(TimestampType))
      val l = Tables.t(s, dir, "lineitem")
        .filter($"l_shipdate" > lit("1998-06-15").cast(TimestampType))
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(c), $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
        .agg(outd(sum(dec($"l_extendedprice") *
          (fac(lit(1)) - fac($"l_discount")))).as("revenue"))
        .orderBy($"revenue".desc, $"o_orderdate", $"l_orderkey")
        .limit(10)
    },

    // TPC-H Q5 shape (local-supplier volume): six tables, two dimension
    // chains; supplier/nation/region broadcast, the "local" constraint
    // (customer and supplier share a nation) folded into the supplier
    // join condition so no post-join filter row survives the build.
    "q_tpch_q5" -> { (s, dir) =>
      import s.implicits._
      val o = Tables.t(s, dir, "orders")
        .filter($"o_orderdate" >= lit("1997-01-01").cast(TimestampType) &&
          $"o_orderdate" < lit("1998-01-01").cast(TimestampType))
      val l = Tables.t(s, dir, "lineitem")
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(Tables.t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.t(s, dir, "supplier")),
          $"l_suppkey" === $"s_suppkey" &&
            $"c_nationkey" === $"s_nationkey")
        .join(broadcast(Tables.t(s, dir, "nation")),
          $"s_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.t(s, dir, "region")
            .filter($"r_name" === "ASIA")),
          $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(outd(sum(dec($"l_extendedprice") *
          (fac(lit(1)) - fac($"l_discount")))).as("revenue"))
        .orderBy($"revenue".desc, $"n_name")
    },

    // TPC-H Q10 shape (returned-item reporting): quarter of orders,
    // returned lines only, revenue attributed per customer; nation
    // broadcast; top-20 losers by revenue with c_custkey tie-break.
    "q_tpch_q10" -> { (s, dir) =>
      import s.implicits._
      val o = Tables.t(s, dir, "orders")
        .filter($"o_orderdate" >= lit("1997-10-01").cast(TimestampType) &&
          $"o_orderdate" < lit("1998-01-01").cast(TimestampType))
      val l = Tables.t(s, dir, "lineitem")
        .filter($"l_returnflag" === "R")
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(Tables.t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.t(s, dir, "nation")),
          $"c_nationkey" === $"n_nationkey")
        .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
        .agg(outd(sum(dec($"l_extendedprice") *
          (fac(lit(1)) - fac($"l_discount")))).as("revenue"))
        .orderBy($"revenue".desc, $"c_custkey")
        .limit(20)
    },

    // TPC-H Q18 shape (large-volume customers). The textbook plan scans
    // lineitem TWICE (HAVING subquery + fact re-aggregation); but the
    // final group keys are functionally determined by o_orderkey, so the
    // qualifying per-order sum IS the output aggregate — one lineitem
    // scan, one shuffle, then two dimension joins on the (tiny) filtered
    // survivor set. The threshold compares the EXACT decimal sum (a
    // double sum is order-dependent and could flip boundary membership
    // between engines).
    "q_tpch_q18" -> { (s, dir) =>
      import s.implicits._
      val big = Tables.t(s, dir, "lineitem")
        .groupBy($"l_orderkey")
        .agg(sum(dec($"l_quantity")).as("q"))
        .where($"q" > 250)
      big.join(Tables.t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
        .join(Tables.t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
        .select($"c_custkey", $"c_name", $"o_orderkey", $"o_orderdate",
          $"o_totalprice", outd($"q").as("sum_qty"))
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(100)
    },

    // TPC-H Q14 shape (promotion effect): conditional aggregation over
    // the part join — one month of lineitem, the CASE folds the promo
    // share into the same pass as the total (sum skips the NULL arm).
    // Part broadcasts; both sums are exact decimal, the final ratio is
    // one identical IEEE division per engine.
    "q_tpch_q14" -> { (s, dir) =>
      import s.implicits._
      val rev = dec($"l_extendedprice") * (fac(lit(1)) - fac($"l_discount"))
      Tables.t(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1997-09-01").cast(TimestampType) &&
          $"l_shipdate" < lit("1997-10-01").cast(TimestampType))
        .join(broadcast(Tables.t(s, dir, "part")),
          $"l_partkey" === $"p_partkey")
        .agg((lit(100.0) *
          round(sum(when($"p_type" === "PROMO", rev)), 2)
            .cast(DoubleType) /
          round(sum(rev), 2).cast(DoubleType)).as("promo_revenue"))
    },

    // TPC-H Q19 shape (discounted revenue): disjunctive OR-of-ANDs
    // predicate straddling BOTH join sides — the planner must keep the
    // per-side conjuncts pushable (p_partkey join + residual OR) rather
    // than falling back to a nested loop. l_quantity is double in this
    // fixture; the BETWEEN bounds are integers, exact in both engines.
    "q_tpch_q19" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "lineitem")
        .join(broadcast(Tables.t(s, dir, "part")),
          $"l_partkey" === $"p_partkey")
        .where(
          ($"p_brand" === "Brand#1" && $"p_size".between(1, 15) &&
            $"l_quantity".between(1, 11)) ||
          ($"p_brand" === "Brand#2" && $"p_size".between(1, 25) &&
            $"l_quantity".between(10, 20)) ||
          ($"p_brand" === "Brand#3" && $"p_size".between(1, 35) &&
            $"l_quantity".between(20, 30)))
        .agg(outd(sum(dec($"l_extendedprice") *
          (fac(lit(1)) - fac($"l_discount")))).as("revenue"),
          count(lit(1)).as("n_lines"))
    },

    // TPC-H Q17 shape (small-quantity-order revenue): the correlated
    // per-part average decorrelates into one grouped aggregate joined
    // back onto the fact. The threshold l_quantity < 0.2*avg(qty) is
    // REARRANGED to 5*qty*cnt < sum(qty) so it compares exact decimals
    // — an IEEE division on each side could flip boundary rows between
    // engines. Brand filter keeps the qualifying set non-trivial.
    "q_tpch_q17" -> { (s, dir) =>
      import s.implicits._
      val l = Tables.t(s, dir, "lineitem")
      val perPart = l.groupBy($"l_partkey".as("pk"))
        .agg(sum(dec($"l_quantity")).as("sq"), count(lit(1)).as("cnt"))
      val p = Tables.t(s, dir, "part").filter($"p_brand" <= "Brand#20")
      l.join(broadcast(p), $"l_partkey" === $"p_partkey")
        .join(perPart, $"l_partkey" === $"pk")
        .where(dec($"l_quantity") * 5 * $"cnt" < $"sq")
        .agg((round(sum(dec($"l_extendedprice")), 2).cast(DoubleType) /
          7.0).as("avg_yearly"))
    },

    // TPC-H Q2 shape (min-cost supplier per part). The fixture has no
    // partsupp, so the part↔supplier relation comes from DISTINCT
    // lineitem pairs and s_acctbal stands in for supplycost — the SHAPE
    // (region-scoped suppliers, per-part correlated MIN decorrelated
    // into a grouped min + equality join-back) is the graded part.
    "q_tpch_q2" -> { (s, dir) =>
      import s.implicits._
      val sup = Tables.t(s, dir, "supplier")
        .join(broadcast(Tables.t(s, dir, "nation")),
          $"s_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.t(s, dir, "region")
            .filter($"r_name" === "ASIA")),
          $"n_regionkey" === $"r_regionkey")
      val bridge = Tables.t(s, dir, "lineitem")
        .select($"l_partkey", $"l_suppkey").distinct()
      val p = Tables.t(s, dir, "part")
        .filter($"p_size" === 15 && $"p_type" === "STANDARD")
      val cand = broadcast(p).join(bridge, $"p_partkey" === $"l_partkey")
        .join(sup, $"l_suppkey" === $"s_suppkey")
      val minBal = cand.groupBy($"p_partkey".as("mpk"))
        .agg(min($"s_acctbal").as("min_bal"))
      cand.join(minBal,
          $"p_partkey" === $"mpk" && $"s_acctbal" === $"min_bal")
        .select($"s_acctbal", $"s_name", $"n_name", $"p_partkey",
          $"p_brand")
        .orderBy($"s_acctbal".desc, $"n_name", $"s_name", $"p_partkey")
        .limit(100)
    },

    // TPC-H Q4 shape (order-priority checking): EXISTS over lineitem →
    // LEFT SEMI join with the correlation in the join condition (late
    // shipment = shipped >60 days after the order date — the fixture
    // has no commitdate/receiptdate).
    "q_tpch_q4" -> { (s, dir) =>
      import s.implicits._
      val o = Tables.t(s, dir, "orders")
        .filter($"o_orderdate" >= lit("1997-07-01").cast(TimestampType) &&
          $"o_orderdate" < lit("1997-10-01").cast(TimestampType))
      val l = Tables.t(s, dir, "lineitem")
        .select($"l_orderkey", $"l_shipdate")
      o.join(l, $"l_orderkey" === $"o_orderkey" &&
          $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy($"o_orderpriority")
    },

    // TPC-H Q6 shape (forecast revenue change): pure scan-local filter
    // + one ungrouped sum; the discount band compares DECIMALS on both
    // engines (a double 0.05 boundary could flip rows).
    "q_tpch_q6" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1997-01-01").cast(TimestampType) &&
          $"l_shipdate" < lit("1998-01-01").cast(TimestampType) &&
          fac($"l_discount").between(fac(lit(0.02)), fac(lit(0.05))) &&
          $"l_quantity" < 24)
        .agg(outd(sum(dec($"l_extendedprice") * fac($"l_discount")))
          .as("revenue"))
    },

    // TPC-H Q7 shape (volume shipping between two nations): both nation
    // dimensions pre-filtered to the two-nation set BEFORE broadcast,
    // the cross-pair disjunction left as a residual (it only removes
    // same-nation pairs).
    "q_tpch_q7" -> { (s, dir) =>
      import s.implicits._
      val ns = Seq("NATION_1", "NATION_2")
      val n1 = Tables.t(s, dir, "nation").filter($"n_name".isin(ns: _*))
        .select($"n_nationkey".as("sn_key"), $"n_name".as("supp_nation"))
      val n2 = Tables.t(s, dir, "nation").filter($"n_name".isin(ns: _*))
        .select($"n_nationkey".as("cn_key"), $"n_name".as("cust_nation"))
      Tables.t(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1996-01-01").cast(TimestampType) &&
          $"l_shipdate" < lit("1998-01-01").cast(TimestampType))
        .join(Tables.t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
        .join(Tables.t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.t(s, dir, "supplier")),
          $"l_suppkey" === $"s_suppkey")
        .join(broadcast(n1), $"s_nationkey" === $"sn_key")
        .join(broadcast(n2), $"c_nationkey" === $"cn_key")
        .where($"supp_nation" =!= $"cust_nation")
        .groupBy($"supp_nation", $"cust_nation",
          year($"l_shipdate").cast(LongType).as("l_year"))
        .agg(outd(sum(dec($"l_extendedprice") *
          (fac(lit(1)) - fac($"l_discount")))).as("revenue"))
        .orderBy($"supp_nation", $"cust_nation", $"l_year")
    },

    // TPC-H Q8 shape (national market share): the share divides two
    // independently-rounded sums so both engines divide the same
    // doubles.
    "q_tpch_q8" -> { (s, dir) =>
      import s.implicits._
      val vol = dec($"l_extendedprice") * (fac(lit(1)) - fac($"l_discount"))
      Tables.t(s, dir, "lineitem")
        .join(broadcast(Tables.t(s, dir, "part")
            .filter($"p_type" === "ECONOMY")),
          $"l_partkey" === $"p_partkey")
        .join(Tables.t(s, dir, "orders")
            .filter($"o_orderdate" >= lit("1996-01-01").cast(TimestampType)
              && $"o_orderdate" < lit("1998-01-01").cast(TimestampType)),
          $"l_orderkey" === $"o_orderkey")
        .join(Tables.t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.t(s, dir, "nation")
            .select($"n_nationkey".as("cnk"), $"n_regionkey")),
          $"c_nationkey" === $"cnk")
        .join(broadcast(Tables.t(s, dir, "region")
            .filter($"r_name" === "AMERICA")),
          $"n_regionkey" === $"r_regionkey")
        .join(broadcast(Tables.t(s, dir, "supplier")),
          $"l_suppkey" === $"s_suppkey")
        .join(broadcast(Tables.t(s, dir, "nation")
            .select($"n_nationkey".as("snk"), $"n_name".as("supp_nation"))),
          $"s_nationkey" === $"snk")
        .groupBy(year($"o_orderdate").cast(LongType).as("o_year"))
        .agg((outd(sum(when($"supp_nation" === "NATION_3", vol)
            .otherwise(fac(lit(0))))) /
          outd(sum(vol))).as("mkt_share"))
        .orderBy($"o_year")
    },

    // TPC-H Q9 shape (product-type profit): profit = revenue minus a
    // cost term (p_retailprice×qty×0.10 stands in for supplycost — no
    // partsupp in the fixture); all arithmetic in exact decimals,
    // rounded once at output.
    "q_tpch_q9" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "lineitem")
        .join(broadcast(Tables.t(s, dir, "part")
            .filter($"p_name".like("%widget%"))),
          $"l_partkey" === $"p_partkey")
        .join(broadcast(Tables.t(s, dir, "supplier")),
          $"l_suppkey" === $"s_suppkey")
        .join(Tables.t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
        .join(broadcast(Tables.t(s, dir, "nation")),
          $"s_nationkey" === $"n_nationkey")
        .groupBy($"n_name".as("nation"),
          year($"o_orderdate").cast(LongType).as("o_year"))
        .agg(outd(sum(dec($"l_extendedprice") *
            (fac(lit(1)) - fac($"l_discount")) -
          dec($"p_retailprice") * dec($"l_quantity") * fac(lit(0.10))))
          .as("sum_profit"))
        .orderBy($"nation", $"o_year".desc)
    },

    // TPC-H Q11 shape (important stock): per-part value vs a fraction
    // of the total — one grouped sum + one scalar, threshold compared
    // on identically-rounded doubles on both engines. (partsupp absent:
    // value derives from lineitem revenue per part.)
    "q_tpch_q11" -> { (s, dir) =>
      import s.implicits._
      val pv = Tables.t(s, dir, "lineitem")
        .groupBy($"l_partkey".as("p_key"))
        .agg(sum(dec($"l_extendedprice")).as("v"))
      val tot = pv.agg(round(sum($"v"), 2).cast(DoubleType).as("tot"))
      pv.select($"p_key", round($"v", 2).cast(DoubleType).as("value"))
        .crossJoin(broadcast(tot))
        .where($"value" > $"tot" * 0.001)
        .select($"p_key", $"value")
        .orderBy($"value".desc, $"p_key")
    },

    // TPC-H Q12 shape (shipping-priority classes): conditional counts
    // by CASE over the order priority (returnflag stands in for
    // shipmode).
    "q_tpch_q12" -> { (s, dir) =>
      import s.implicits._
      val high = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
      Tables.t(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1997-01-01").cast(TimestampType) &&
          $"l_shipdate" < lit("1998-01-01").cast(TimestampType))
        .join(Tables.t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_returnflag")
        // low = the CASE-ELSE arm like the oracle: when(!high, 1) puts
        // a NULL o_orderpriority row (NULL cond) in NEITHER bucket,
        // while the oracle's CASE WHEN high THEN 0 ELSE 1 counts it in
        // low — keep the two spellings NULL-aligned
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy($"l_returnflag")
    },

    // TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
    // join keeps zero-order customers, two aggregation levels.
    "q_tpch_q13" -> { (s, dir) =>
      import s.implicits._
      val o = Tables.t(s, dir, "orders")
        .filter($"o_orderpriority" =!= "5-LOW")
      Tables.t(s, dir, "customer")
        .join(o, $"c_custkey" === $"o_custkey", "left_outer")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("c_count"))
        .groupBy($"c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy($"custdist".desc, $"c_count".desc)
    },

    // TPC-H Q15 shape (top supplier): the max-revenue selection joins
    // on EXACT decimal sums (equality on rounded doubles could tie
    // spuriously, equality on doubles could miss by a ULP).
    "q_tpch_q15" -> { (s, dir) =>
      import s.implicits._
      val rev = Tables.t(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1997-01-01").cast(TimestampType) &&
          $"l_shipdate" < lit("1997-04-01").cast(TimestampType))
        .groupBy($"l_suppkey")
        .agg(sum(dec($"l_extendedprice") *
          (fac(lit(1)) - fac($"l_discount"))).as("tr"))
      val mx = rev.agg(max($"tr").as("mx"))
      rev.join(broadcast(mx), $"tr" === $"mx")
        .join(broadcast(Tables.t(s, dir, "supplier")),
          $"l_suppkey" === $"s_suppkey")
        .select($"s_suppkey", $"s_name", outd($"tr").as("total_revenue"))
        .orderBy($"s_suppkey")
    },

    // TPC-H Q16 shape (supplier-part relationship count): DISTINCT
    // lineitem pairs stand in for partsupp; negative-balance suppliers
    // are the excluded set (ANTI join — the reference's NOT IN
    // complaint-supplier subquery).
    "q_tpch_q16" -> { (s, dir) =>
      import s.implicits._
      val bad = Tables.t(s, dir, "supplier")
        .filter($"s_acctbal" < 0).select($"s_suppkey".as("bad_key"))
      val pairs = Tables.t(s, dir, "lineitem")
        .select($"l_partkey", $"l_suppkey").distinct()
      broadcast(Tables.t(s, dir, "part")
          .filter($"p_brand" =!= "Brand#1" && $"p_type" =!= "PROMO" &&
            $"p_size".isin(1, 5, 9, 14, 19, 23, 36, 45)))
        .join(pairs, $"p_partkey" === $"l_partkey")
        .join(broadcast(bad), $"l_suppkey" === $"bad_key", "left_anti")
        .groupBy($"p_brand", $"p_type", $"p_size")
        .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
        .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
    },

    // TPC-H Q20 shape (potential part promotion): nested semi-join
    // chain — suppliers who shipped a meaningful volume of the target
    // parts, scoped to one nation.
    "q_tpch_q20" -> { (s, dir) =>
      import s.implicits._
      val red = Tables.t(s, dir, "part")
        .filter($"p_name".like("red%")).select($"p_partkey")
      val shipped = Tables.t(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1997-01-01").cast(TimestampType) &&
          $"l_shipdate" < lit("1998-01-01").cast(TimestampType))
        .join(broadcast(red), $"l_partkey" === $"p_partkey")
        .groupBy($"l_suppkey")
        .agg(sum(dec($"l_quantity")).as("sq"))
        .where($"sq" > 50)
      Tables.t(s, dir, "supplier")
        .join(shipped, $"s_suppkey" === $"l_suppkey", "left_semi")
        .join(broadcast(Tables.t(s, dir, "nation")
            .filter($"n_name" === "NATION_4")),
          $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"s_name")
        .orderBy($"s_name")
    },

    // TPC-H Q21 shape (suppliers who kept orders waiting): the classic
    // EXISTS + NOT EXISTS correlated self-joins over lineitem become a
    // LEFT SEMI (another supplier touched the order) and a LEFT ANTI
    // (no OTHER supplier also returned) with the inequality residual in
    // the join condition. Returnflag stands in for the receipt/commit
    // lateness predicate.
    "q_tpch_q21" -> { (s, dir) =>
      import s.implicits._
      val l = Tables.t(s, dir, "lineitem")
      val l1 = l.filter($"l_returnflag" === "R")
        .join(Tables.t(s, dir, "orders")
            .filter($"o_orderstatus" === "F").select($"o_orderkey"),
          $"l_orderkey" === $"o_orderkey")
        .select($"l_orderkey".as("ok"), $"l_suppkey".as("sk"))
      val others = l.select($"l_orderkey".as("ok2"),
        $"l_suppkey".as("sk2")).distinct()
      val othersR = l.filter($"l_returnflag" === "R")
        .select($"l_orderkey".as("ok3"), $"l_suppkey".as("sk3")).distinct()
      l1.join(others, $"ok" === $"ok2" && $"sk" =!= $"sk2", "left_semi")
        .join(othersR, $"ok" === $"ok3" && $"sk" =!= $"sk3", "left_anti")
        .join(broadcast(Tables.t(s, dir, "supplier")),
          $"sk" === $"s_suppkey")
        .groupBy($"s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy($"numwait".desc, $"s_name")
        .limit(10)
    },

    // TPC-H Q22 shape (global sales opportunity): above-average-balance
    // customers with no orders — ANTI join + a scalar threshold that is
    // REARRANGED to bal×count > sum so the comparison stays in exact
    // decimals (an IEEE average could flip boundary customers between
    // engines; same trick as Q17).
    "q_tpch_q22" -> { (s, dir) =>
      import s.implicits._
      val segs = Seq("BUILDING", "AUTOMOBILE", "MACHINERY")
      val c = Tables.t(s, dir, "customer")
        .filter($"c_mktsegment".isin(segs: _*))
      val stats = c.filter($"c_acctbal" > 0)
        .agg(sum(dec($"c_acctbal")).as("sumbal"),
          count(lit(1)).as("cnt"))
      c.crossJoin(broadcast(stats))
        .where(dec($"c_acctbal") * $"cnt" > $"sumbal")
        .join(Tables.t(s, dir, "orders").select($"o_custkey"),
          $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("numcust"),
          outd(sum(dec($"c_acctbal"))).as("totacctbal"))
        .orderBy($"c_mktsegment")
    },

    // §2.3/§4 correlated scalar subquery → decorrelated join.
    "q_scalar_subquery" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      // the avg threshold goes through DECIMAL like every other
      // double aggregate in this file (lines 10-14): a raw double avg
      // is summation-order-dependent, and a customer sitting exactly
      // at the 2*avg boundary could flip between engines/runs
      s.sql("""
        SELECT o_orderkey, o_custkey, o_totalprice AS price
        FROM orders o
        WHERE o_totalprice > (
          SELECT 2 * avg(CAST(o2.o_totalprice AS DECIMAL(28,2)))
          FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        ORDER BY o_orderkey""")
    },

    // §2.4 ungrouped aggregation (one partial row per partition,
    // final merge on driver — Phoenix UngroupedAggregateRegionObserver).
    "q_agg_ungrouped" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "lineitem").agg(
        count(lit(1)).as("n"),
        outd(sum(dec($"l_quantity"))).as("sum_qty"),
        min($"l_shipdate").as("min_ship"),
        max($"l_shipdate").as("max_ship"),
        min($"l_extendedprice").as("min_price"),
        max($"l_extendedprice").as("max_price"))
    },

    // §2.4 COUNT(DISTINCT) (Phoenix DistinctCountAggregateFunction).
    "q_count_distinct" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_suppkey", $"l_partkey").as("n_supp_part"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag")
    },

    // §2.4 SELECT DISTINCT (distinct-as-group-by).
    "q_distinct" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "lineitem")
        .select($"l_returnflag", $"l_linestatus").distinct()
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    // §2.4 HAVING (post-aggregation filter).
    "q_having" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          outd(sum(dec($"o_totalprice"))).as("total"))
        .where($"n_orders" >= 8)
        .orderBy($"o_custkey")
    },

    // §2.4 FIRST_VALUE / LAST_VALUE as *ordered aggregates* (Phoenix
    // FirstValueFunction — aggregate with ORDER BY arg, not a window fn).
    // The fixture's (l_orderkey, l_linenumber) is NOT unique (duplicate
    // pairs exist at every sf — caught at sf0.001 in r11, where the two
    // max-ord rows carry different prices and the engines tie-broke
    // differently), so the ordering key is the lexicographic
    // (ord, price) STRUCT: ties on ord resolve to the smaller/larger
    // price deterministically on both engines.
    "q_first_last_value" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "lineitem")
        .withColumn("ord", $"l_orderkey" * 10 + $"l_linenumber")
        .groupBy($"l_returnflag")
        .agg(min_by($"l_extendedprice", struct($"ord", $"l_extendedprice"))
            .as("first_price"),
          max_by($"l_extendedprice", struct($"ord", $"l_extendedprice"))
            .as("last_price"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag")
    },

    // §2.7 UNION ALL with type reconciliation (Phoenix UnionCompiler) +
    // outer ORDER BY/LIMIT applied over the union.
    "q_union_all" -> { (s, dir) =>
      import s.implicits._
      val hi = Tables.t(s, dir, "orders")
        .filter($"o_totalprice" > 250000.0)
        .select($"o_orderkey".as("k"), lit("hi").as("bucket"))
      val lo = Tables.t(s, dir, "orders")
        .filter($"o_totalprice" < 1000.0)
        .select($"o_orderkey".as("k"), lit("lo").as("bucket"))
      hi.unionAll(lo).orderBy($"k", $"bucket").limit(500)
    },

    // §2.6 ORDER BY with NULLS FIRST/LAST + DESC and unique tie-break.
    "q_orderby_nulls" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "orders")
        .select($"o_orderkey",
          nullif($"o_orderpriority", lit("3-MEDIUM")).as("prio"))
        .orderBy($"prio".desc_nulls_first, $"o_orderkey".asc)
        .limit(300)
    },

    // §1.1 UPSERT snapshot semantics: last-write-wins per PK — the PK-dedup
    // read view every Phoenix table sits on (SURVEY §7 step 1). Key =
    // l_orderkey, "version" = l_linenumber: latest line's values win.
    "q_upsert_snapshot" -> { (s, dir) =>
      import s.implicits._
      // Treat each line as an upsert of row-key l_orderkey with version
      // (l_linenumber, l_partkey, l_suppkey, l_extendedprice) — the full
      // tie-break makes last-write-wins deterministic. groupBy + max_by
      // on the ordering struct instead of a row_number window: the
      // partial-aggregate phase combines map-side, so the shuffle carries
      // one candidate per (key, map task), not every log row.
      Tables.t(s, dir, "lineitem")
        .groupBy($"l_orderkey")
        .agg(max_by(
          struct($"l_extendedprice".as("price"), $"l_quantity".as("qty"),
            $"l_linenumber".as("version")),
          struct($"l_linenumber", $"l_partkey", $"l_suppkey",
            $"l_extendedprice")).as("r"))
        .select($"l_orderkey", $"r.price", $"r.qty", $"r.version")
        .orderBy($"l_orderkey")
    },

    // Sequences (§1.1): NEXT VALUE FOR over a batch → dense row_number
    // assignment in PK order (documented semantics: batch-monotonic).
    "q_sequence" -> { (s, dir) =>
      // the read shape of a sequence-stamped load: seq mirrors a
      // CREATE SEQUENCE START WITH 5 INCREMENT BY 10 assignment (the
      // stepping machinery itself — SELECT position, MIN/MAXVALUE,
      // CYCLE, strict options — is pinned in PhoenixSqlSpec)
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT o_orderkey,
               CAST(5 + 10 * (row_number() OVER (ORDER BY o_orderkey) - 1)
                 AS BIGINT) AS seq
        FROM orders ORDER BY o_orderkey LIMIT 1000""")
    },

    // Grouped agg on time bucket (PTSDB fixture shape: TRUNC(date) GROUP BY).
    "q_time_bucket" -> { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "events")
        .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
        .agg(count(lit(1)).as("n"), outd(sum(dec($"value"))).as("sum_value"))
        .orderBy($"hour", $"event_type")
    }
  )

  private val DEC = "CAST(%s AS DECIMAL(28,2))"
  private def d(c: String) = DEC.format(c)

  val oracle: Map[String, String] = Map(
    "q1_agg" -> """
      SELECT l_returnflag, l_linestatus,
        CAST(round(sum(CAST(l_quantity AS DECIMAL(28,2))), 2) AS DOUBLE) AS sum_qty,
        CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,2))), 2) AS DOUBLE) AS sum_base_price,
        CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_disc_price,
        CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_charge,
        CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) / count(*) AS avg_qty,
        CAST(sum(CAST(l_discount AS DECIMAL(28,2))) AS DOUBLE) / count(*) AS avg_disc,
        count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q_scan_filter" -> """
      SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      WHERE l_shipdate < TIMESTAMP '1996-01-01'""",

    "q_point_lookup" -> """
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey = 42""",

    "q_range_scan" -> """
      SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey FROM lineitem
      WHERE l_orderkey BETWEEN 100 AND 300""",

    "q_skip_scan" -> """
      SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      WHERE l_orderkey IN (11, 42, 77, 101, 555)
        AND l_linenumber IN (1, 3)""",

    "q_tablesample" -> """
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      WHERE (o_orderkey * 2654435761) % 4294967296 < 214748364""",

    "q_topk" -> """
      SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
      LIMIT 100""",

    "q_limit_offset" -> """
      SELECT o_orderkey, o_orderstatus FROM orders
      ORDER BY o_orderkey LIMIT 50 OFFSET 20""",

    "q_rvc_offset" -> """
      SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      WHERE (l_orderkey, l_linenumber) > (1000, 2)
      ORDER BY l_orderkey, l_linenumber LIMIT 100""",

    "q_predicates" -> """
      SELECT p_partkey, p_name, p_brand, p_size FROM part
      WHERE p_name LIKE '%e%'
        AND NOT (lower(p_type) LIKE '%promo%')
        AND p_size BETWEEN 1 AND 40
        AND p_brand IN ('Brand#1','Brand#9','Brand#13','Brand#20')""",

    "q_null_case" -> """
      SELECT l_orderkey, l_linenumber,
             nullif(l_returnflag, 'N') IS NULL AS is_open,
             coalesce(nullif(l_returnflag, 'N'), 'OPEN') AS rf_filled,
             CASE nullif(l_returnflag, 'N')
               WHEN 'A' THEN 'accepted' WHEN 'R' THEN 'returned'
               ELSE 'other' END AS rf_class
      FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 500""",

    "q_join_inner" -> """
      SELECT c_mktsegment, count(*) AS n_orders,
             CAST(round(sum(CAST(o_totalprice AS DECIMAL(28,2))), 2) AS DOUBLE) AS sum_price
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q_join_left" -> """
      SELECT c_custkey, count(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey ORDER BY c_custkey""",

    "q_join_right" -> """
      SELECT c_nationkey, count(o_orderkey) AS n_orders, count(*) AS n_rows
      FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
      GROUP BY c_nationkey ORDER BY c_nationkey""",

    "q_join_full" -> """
      SELECT n_nationkey, n_name, n_cust
      FROM nation FULL JOIN
        (SELECT c_nationkey, count(*) AS n_cust FROM customer
         GROUP BY c_nationkey) c
        ON n_nationkey = c_nationkey
      ORDER BY n_nationkey""",

    "q_join_semi" -> """
      SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)
      ORDER BY c_custkey""",

    "q_join_anti" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_totalprice > 400000.0)
      ORDER BY c_custkey""",

    "q_star_join" -> """
      SELECT p_brand,
        CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
        count(*) AS n_lines
      FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY p_brand ORDER BY p_brand""",

    "q_tpch_q3" -> """
      SELECT l_orderkey, o_orderdate, o_orderpriority,
        CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-06-15'
        AND l_shipdate > TIMESTAMP '1998-06-15'
      GROUP BY 1, 2, 3
      ORDER BY revenue DESC, o_orderdate, l_orderkey
      LIMIT 10""",

    "q_tpch_q5" -> """
      SELECT n_name,
        CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
          AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name""",

    "q_tpch_q10" -> """
      SELECT c_custkey, c_name, c_acctbal, n_name,
        CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1997-10-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY 1, 2, 3, 4
      ORDER BY revenue DESC, c_custkey
      LIMIT 20""",

    "q_tpch_q14" -> """
      SELECT 100.0 * CAST(round(sum(CASE WHEN p_type = 'PROMO' THEN CAST(l_extendedprice AS DECIMAL(28,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) END), 2) AS DOUBLE)
        / CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS promo_revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        AND l_shipdate < TIMESTAMP '1997-10-01'""",

    "q_tpch_q19" -> """
      SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
        count(*) AS n_lines
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)""",

    "q_tpch_q17" -> """
      SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,2))), 2) AS DOUBLE) / 7.0 AS avg_yearly
      FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN (SELECT l_partkey AS pk,
                sum(CAST(l_quantity AS DECIMAL(28,2))) AS sq,
                count(*) AS cnt
              FROM lineitem GROUP BY 1) g ON l_partkey = g.pk
      WHERE p_brand <= 'Brand#20'
        AND CAST(l_quantity AS DECIMAL(28,2)) * 5 * cnt < sq""",

    "q_tpch_q18" -> """
      SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
        CAST(round(sum(CAST(l_quantity AS DECIMAL(28,2))), 2) AS DOUBLE) AS sum_qty
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
      WHERE l_orderkey IN (SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(28,2))) > 250)
      GROUP BY 1, 2, 3, 4, 5
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 100""",

    "q_tpch_q2" -> """
      WITH sup AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'),
      bridge AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
      cand AS (
        SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name
        FROM part
          JOIN bridge ON p_partkey = l_partkey
          JOIN sup ON l_suppkey = s_suppkey
        WHERE p_size = 15 AND p_type = 'STANDARD')
      SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
      FROM cand c1
      WHERE s_acctbal = (SELECT min(s_acctbal) FROM cand c2
                         WHERE c2.p_partkey = c1.p_partkey)
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      LIMIT 100""",

    "q_tpch_q4" -> """
      SELECT o_orderpriority, count(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-07-01'
        AND o_orderdate < TIMESTAMP '1997-10-01'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey
                      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",

    "q_tpch_q6" -> """
      SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,2)) * CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
        AND CAST(l_discount AS DECIMAL(4,2))
          BETWEEN CAST(0.02 AS DECIMAL(4,2)) AND CAST(0.05 AS DECIMAL(4,2))
        AND l_quantity < 24""",

    "q_tpch_q7" -> """
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        year(l_shipdate) AS l_year,
        CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
        AND n1.n_name IN ('NATION_1', 'NATION_2')
        AND n2.n_name IN ('NATION_1', 'NATION_2')
        AND n1.n_name <> n2.n_name
      GROUP BY 1, 2, 3
      ORDER BY 1, 2, 3""",

    "q_tpch_q8" -> """
      SELECT year(o_orderdate) AS o_year,
        CAST(round(sum(CASE WHEN n1.n_name = 'NATION_3'
            THEN CAST(l_extendedprice AS DECIMAL(28,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
            ELSE CAST(0 AS DECIMAL(4,2)) END), 2) AS DOUBLE)
        / CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE)
          AS mkt_share
      FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region ON n2.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
      WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY 1 ORDER BY 1""",

    "q_tpch_q9" -> """
      SELECT n_name AS nation, year(o_orderdate) AS o_year,
        CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
          - CAST(p_retailprice AS DECIMAL(28,2)) * CAST(l_quantity AS DECIMAL(28,2)) * CAST(0.10 AS DECIMAL(4,2))), 2) AS DOUBLE) AS sum_profit
      FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%'
      GROUP BY 1, 2
      ORDER BY nation, o_year DESC""",

    "q_tpch_q11" -> """
      WITH pv AS (
        SELECT l_partkey AS p_key,
          CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,2))), 2) AS DOUBLE) AS value
        FROM lineitem GROUP BY 1)
      SELECT p_key, value FROM pv
      WHERE value > (SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,2))), 2) AS DOUBLE)
                     FROM lineitem) * 0.001
      ORDER BY value DESC, p_key""",

    "q_tpch_q12" -> """
      SELECT l_returnflag,
        CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    "q_tpch_q13" -> """
      SELECT c_count, count(*) AS custdist
      FROM (SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
              LEFT OUTER JOIN orders ON c_custkey = o_custkey
                AND o_orderpriority <> '5-LOW'
            GROUP BY c_custkey) cc
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC""",

    "q_tpch_q15" -> """
      WITH rev AS (
        SELECT l_suppkey,
          sum(CAST(l_extendedprice AS DECIMAL(28,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS tr
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY 1)
      SELECT s_suppkey, s_name,
        CAST(round(tr, 2) AS DOUBLE) AS total_revenue
      FROM rev JOIN supplier ON l_suppkey = s_suppkey
      WHERE tr = (SELECT max(tr) FROM rev)
      ORDER BY s_suppkey""",

    "q_tpch_q16" -> """
      SELECT p_brand, p_type, p_size,
        count(DISTINCT l_suppkey) AS supplier_cnt
      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) b
        JOIN part ON p_partkey = l_partkey
      WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
        AND l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY 1, 2, 3
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",

    "q_tpch_q20" -> """
      SELECT s_suppkey, s_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_4'
        AND s_suppkey IN (
          SELECT l_suppkey FROM lineitem
            JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE 'red%'
            AND l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01'
          GROUP BY l_suppkey
          HAVING sum(CAST(l_quantity AS DECIMAL(28,2))) > 50)
      ORDER BY s_name""",

    "q_tpch_q21" -> """
      SELECT s_name, count(*) AS numwait
      FROM lineitem l1
        JOIN orders ON l1.l_orderkey = o_orderkey
        JOIN supplier ON l1.l_suppkey = s_suppkey
      WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_returnflag = 'R')
      GROUP BY s_name
      ORDER BY numwait DESC, s_name
      LIMIT 10""",

    "q_tpch_q22" -> """
      WITH stats AS (
        SELECT sum(CAST(c_acctbal AS DECIMAL(28,2))) AS sumbal,
          count(*) AS cnt
        FROM customer
        WHERE c_acctbal > 0
          AND c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY'))
      SELECT c_mktsegment, count(*) AS numcust,
        CAST(round(sum(CAST(c_acctbal AS DECIMAL(28,2))), 2) AS DOUBLE) AS totacctbal
      FROM customer, stats
      WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
        AND CAST(c_acctbal AS DECIMAL(28,2)) * cnt > sumbal
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",

    "q_scalar_subquery" -> """
      SELECT o_orderkey, o_custkey, o_totalprice AS price
      FROM orders o
      WHERE o_totalprice > (
        SELECT 2 * avg(CAST(o2.o_totalprice AS DECIMAL(28,2)))
        FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      ORDER BY o_orderkey""",

    "q_agg_ungrouped" -> """
      SELECT count(*) AS n,
             CAST(round(sum(CAST(l_quantity AS DECIMAL(28,2))), 2) AS DOUBLE) AS sum_qty,
             min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
             min(l_extendedprice) AS min_price,
             max(l_extendedprice) AS max_price
      FROM lineitem""",

    "q_count_distinct" -> """
      SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
             count(DISTINCT (l_suppkey, l_partkey)) AS n_supp_part,
             count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_distinct" -> """
      SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      ORDER BY l_returnflag, l_linestatus""",

    "q_having" -> """
      SELECT o_custkey, count(*) AS n_orders,
             CAST(round(sum(CAST(o_totalprice AS DECIMAL(28,2))), 2) AS DOUBLE) AS total
      FROM orders GROUP BY o_custkey
      HAVING count(*) >= 8 ORDER BY o_custkey""",

    "q_first_last_value" -> """
      WITH t AS (SELECT l_returnflag,
                   l_orderkey * 10 + l_linenumber AS ord,
                   l_extendedprice AS p FROM lineitem),
           b AS (SELECT l_returnflag, min(ord) AS mn, max(ord) AS mx
                 FROM t GROUP BY 1)
      SELECT t.l_returnflag,
             min(CASE WHEN ord = mn THEN p END) AS first_price,
             max(CASE WHEN ord = mx THEN p END) AS last_price,
             count(*) AS n
      FROM t JOIN b USING (l_returnflag)
      GROUP BY t.l_returnflag ORDER BY t.l_returnflag""",

    "q_union_all" -> """
      SELECT o_orderkey AS k, 'hi' AS bucket FROM orders
      WHERE o_totalprice > 250000.0
      UNION ALL
      SELECT o_orderkey AS k, 'lo' AS bucket FROM orders
      WHERE o_totalprice < 1000.0
      ORDER BY k, bucket LIMIT 500""",

    "q_orderby_nulls" -> """
      SELECT o_orderkey, nullif(o_orderpriority, '3-MEDIUM') AS prio
      FROM orders
      ORDER BY prio DESC NULLS FIRST, o_orderkey ASC LIMIT 300""",

    "q_upsert_snapshot" -> """
      SELECT l_orderkey, l_extendedprice AS price, l_quantity AS qty,
             l_linenumber AS version
      FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey
              ORDER BY l_linenumber DESC, l_partkey DESC, l_suppkey DESC,
                       l_extendedprice DESC) AS rn
            FROM lineitem) WHERE rn = 1
      ORDER BY l_orderkey""",

    "q_sequence" -> """
      SELECT o_orderkey,
             CAST(5 + 10 * (row_number() OVER (ORDER BY o_orderkey) - 1)
               AS BIGINT) AS seq
      FROM orders ORDER BY o_orderkey LIMIT 1000""",

    "q_time_bucket" -> """
      SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
             CAST(round(sum(CAST(value AS DECIMAL(28,2))), 2) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY hour, event_type"""
  )
}
