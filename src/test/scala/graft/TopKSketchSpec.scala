package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{GraftFunctions, TopTermsAgg}

/** The SpaceSaving heavy-hitters aggregate ([[graft.functions.TopTermsAgg]]):
  * exact regime determinism, approximate-regime error/completeness bounds,
  * merge behavior under repartitioning, and the partial-aggregate plan. */
class TopKSketchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  /** Zipf-ish skewed corpus: term i appears ~N/i times, i = 1..D.
    * Deterministic and order-scrambled by a multiplicative hash. */
  private def skewed(n: Int, d: Int) = {
    import spark.implicits._
    (1 to d).flatMap(i => Seq.fill(math.max(n / i, 1))(f"t$i%04d"))
      .zipWithIndex
      .sortBy { case (_, ix) => ix * 2654435761L % 104729 }
      .map(_._1)
      .toDF("term")
  }

  test("exact regime: capacity >= distinct gives exact counts, zero error") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = skewed(1000, 50).repartition(7) // 50 distinct << cap 256
    val sketch = df
      .agg(call_function("approx_top_terms", $"term", lit(256)).as("sk"))
      .select(explode($"sk").as("e"))
      .select($"e.term", $"e.est", $"e.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exact = df.groupBy($"term").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketch.length == 50)
    sketch.foreach { case (t, est, err) =>
      assert(err == 0L, s"$t err")
      assert(est == exact(t), s"$t count")
    }
    // deterministic output order: est desc, term asc
    val ord = sketch.map { case (t, est, _) => (-est, t) }
    assert(ord.sortBy(identity).sameElements(ord))
  }

  test("approximate regime: per-entry bounds hold, heavy hitters survive") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val n = 2000; val d = 400 // ~7600 rows, 400 distinct, capacity 64
    val df = skewed(n, d).repartition(5)
    val total = df.count()
    val exact = df.groupBy($"term").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sketch = df
      .agg(call_function("approx_top_terms", $"term", lit(64)).as("sk"))
      .select(explode($"sk").as("e"))
      .select($"e.term", $"e.est", $"e.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(sketch.length == 64)
    sketch.foreach { case (t, est, err) =>
      val truth = exact(t)
      assert(est >= truth, s"$t upper bound: est=$est true=$truth")
      assert(est - err <= truth, s"$t lower bound: est=$est err=$err true=$truth")
    }
    // every term with true count > total/capacity must be in the sketch
    // (SpaceSaving guarantee; the union merge preserves it empirically)
    val kept = sketch.map(_._1).toSet
    val mustKeep = exact.filter(_._2 > total / 64).keySet
    assert(mustKeep.subsetOf(kept),
      s"missing heavy hitters: ${mustKeep -- kept}")
    // the true top-10 terms are all retained and their ranking is usable:
    // each of the top-10 by est is a true top-20 term
    val trueTop20 = exact.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(20).map(_._1).toSet
    sketch.take(10).foreach { case (t, _, _) =>
      assert(trueTop20.contains(t), s"$t not in true top-20")
    }
  }

  test("merge is partition-shape invariant in the exact regime") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val base = skewed(500, 30)
    val results = Seq(1, 3, 8).map { parts =>
      base.repartition(parts)
        .agg(call_function("approx_top_terms", $"term", lit(128)).as("sk"))
        .select(explode($"sk").as("e"))
        .select($"e.term", $"e.est", $"e.err")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq
    }
    assert(results(0) == results(1) && results(1) == results(2))
  }

  test("sketch unit: eviction charges slack, serde round-trips") {
    val s = new TopTermsAgg.Sketch(2)
    s.add("a", 1, 0); s.add("a", 1, 0); s.add("b", 1, 0)
    s.add("c", 1, 0) // evicts b (min est 1): c gets est 2, err 1
    val e = s.sortedEntries.toSeq
    assert(e == Seq(("a", 2L, 0L), ("c", 2L, 1L)))
    val rt = TopTermsAgg.Sketch.fromBytes(s.toBytes)
    assert(rt.sortedEntries.toSeq == e)
    assert(rt.cap == 2 && rt.entryCount == 2)
  }

  test("binary trio: top_terms_sketch is canonical bytes; union_agg " +
      "re-merges partial sketches (bounds survive eviction); entries " +
      "reads back; all-NULL unions to NULL") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = skewed(1000, 50)
    // canonical bytes: two different partitionings of the SAME rows
    // produce identical sketch bytes in the no-eviction regime
    def bytesOf(parts: Int): Seq[Byte] = df.repartition(parts)
      .agg(call_function("top_terms_sketch", $"term", lit(256)).as("sk"))
      .head.getAs[Array[Byte]](0).toSeq
    assert(bytesOf(3) == bytesOf(11),
      "no-eviction sketch bytes must be partition-shape invariant")
    // union_agg over per-slice sketches == sketch over all rows
    // (exact regime), read back through top_terms_entries
    val perSlice = df.withColumn("s", xxhash64($"term") % 5)
      .groupBy($"s")
      .agg(call_function("top_terms_sketch", $"term", lit(256)).as("sk"))
    val merged = perSlice
      .agg(call_function("top_terms_union_agg", $"sk").as("sk"))
      .select(explode(
        call_function("top_terms_entries", $"sk")).as("e"))
      .select($"e.term", $"e.est", $"e.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exact = df.groupBy($"term").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.length == 50)
    merged.foreach { case (t, est, err) =>
      assert(err == 0L && est == exact(t), s"$t: est=$est err=$err")
    }
    // past eviction the union must keep est-err <= true <= est
    val tight = df.withColumn("s", xxhash64($"term") % 7)
      .groupBy($"s")
      .agg(call_function("top_terms_sketch", $"term", lit(8)).as("sk"))
      .agg(call_function("top_terms_union_agg", $"sk").as("sk"))
      .select(explode(
        call_function("top_terms_entries", $"sk")).as("e"))
      .select($"e.term", $"e.est", $"e.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    tight.foreach { case (t, est, err) =>
      val truth = exact.getOrElse(t, 0L)
      assert(est - err <= truth && truth <= est,
        s"$t: bound [${est - err}, $est] missed true $truth")
    }
    // all-NULL input -> NULL (mirrors kmv_union_agg)
    val nullOut = Seq(Option.empty[Array[Byte]]).toDF("sk")
      .agg(call_function("top_terms_union_agg", $"sk").as("sk"))
      .head
    assert(nullOut.isNullAt(0), "all-NULL union must be NULL")
  }

  test("plan: sketch aggregate is a partial/final ObjectHashAggregate") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = skewed(200, 10).repartition(4)
      .agg(call_function("approx_top_terms", $"term", lit(32)).as("sk"))
    val plan = df.queryExecution.executedPlan.toString
    // two ObjectHashAggregate nodes = map-side partial + final merge:
    // the shuffle carries sketches, not terms
    assert("ObjectHashAggregate".r.findAllIn(plan).length >= 2, plan)
  }
}
