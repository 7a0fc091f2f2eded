package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CappedCollectAgg
import graft.functions.CappedCollectAgg.cappedCollect

/** The size-capped collect behind LSH bucket pair generation: identical
  * output to collect_list + size filter, O(cap) memory on degenerate
  * buckets (the buffer flips to a tombstone instead of materializing the
  * list the filter would drop). */
class CappedCollectSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("buffer frees its entries the moment the cap is exceeded") {
    val buf = new CappedCollectAgg.Buf(100)
    (1 to 1000000).foreach(i => buf.add(Long.box(i.toLong)))
    assert(buf.overflowed)
    // the memory bound the OOM fix is about: a 1e6-member bucket must
    // NOT be resident in the buffer — only the tombstone
    assert(buf.items.isEmpty)

    val ok = new CappedCollectAgg.Buf(100)
    (1 to 100).foreach(i => ok.add(Long.box(i.toLong)))
    assert(!ok.overflowed && ok.items.length == 100)
    // merge: overflow is contagious in both directions
    ok.mergeFrom(buf)
    assert(ok.overflowed && ok.items.isEmpty)
    val a = new CappedCollectAgg.Buf(3)
    val b = new CappedCollectAgg.Buf(3)
    (1 to 2).foreach(i => a.add(Long.box(i.toLong)))
    (3 to 4).foreach(i => b.add(Long.box(i.toLong)))
    a.mergeFrom(b) // 4 > cap=3 across the merge
    assert(a.overflowed && a.items.isEmpty)
  }

  test("matches collect_list + size filter across the partial/final split") {
    import spark.implicits._
    // group j has 7*j members, j in 1..40 → sizes straddle the cap both
    // ways; 16 input partitions force partial buffers through
    // serialize/merge
    val rows = for (j <- 1 to 40; k <- 0 until 7 * j)
      yield (s"g$j", j * 10000L + k)
    val df = rows.toDF("g", "v").repartition(16)
    val cap = 100 // groups with j > 14 overflow, smaller ones survive
    val got = df.groupBy($"g")
      .agg(sort_array(cappedCollect($"v", cap)).as("xs"))
      .where($"xs".isNotNull)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val want = df.groupBy($"g")
      .agg(sort_array(collect_list($"v")).as("xs"))
      .where(size($"xs") <= cap)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(want.nonEmpty && got == want)
    // and some groups must actually have overflowed for this to test
    // anything
    assert(got.size < 40)
  }

  test("nulls are skipped and struct elements collect intact") {
    import spark.implicits._
    val df = Seq(("a", Some(1L)), ("a", None), ("a", Some(2L)),
      ("b", Some(3L))).toDF("g", "v")
    val got = df.groupBy($"g")
      .agg(sort_array(cappedCollect(
        when($"v".isNotNull, struct($"v", ($"v" * 2).as("w"))), 10))
        .as("xs"))
      .collect().map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)).toMap
    assert(got("a").map(_.getLong(0)) == Seq(1L, 2L))
    assert(got("a").map(_.getLong(1)) == Seq(2L, 4L))
    assert(got("b").map(_.getLong(0)) == Seq(3L))
  }

  test("a degenerate 1e6-row bucket drops without materializing") {
    import spark.implicits._
    // one pathological group + healthy small groups — the shape the LSH
    // guard exists for; with collect-then-filter this is a ~multi-MB
    // single buffer, with the cap it's a tombstone
    val big = spark.range(1000000).select(lit("degenerate").as("g"), $"id")
    val ok = spark.range(50).select(lit("healthy").as("g"), $"id")
    val got = big.union(ok).repartition(16).groupBy($"g")
      .agg(sort_array(cappedCollect($"id", 1000)).as("xs"))
      .select($"g", $"xs".isNotNull.as("kept"),
        coalesce(size($"xs"), lit(-1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getBoolean(1), r.getInt(2))))
      .toMap
    assert(got("degenerate") == ((false, -1))) // dropped → null array
    assert(got("healthy") == ((true, 50)))
  }
}
