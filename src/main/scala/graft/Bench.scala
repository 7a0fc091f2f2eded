package graft

import java.nio.file.{Files, Paths}

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR.
  *
  * Timing executes the FULL physical plan via queryExecution.toRdd.count()
  * — a plain df.count() lets Spark drop the final projection for
  * project-only queries and understates scan/expression cost.
  *
  * Output contract (the driver captures only a ~4 KB tail of the run log,
  * so a full-precision 90-query JSON line overflows it and loses the
  * line's head — this has broken the driver parse in past rounds):
  *  - the full per-query map goes to bench_out.json (and stdout, first);
  *  - the FINAL stdout line is a compact total-only JSON object that
  *    always fits the tail and is what the driver parses.
  *
  * Same-JVM interference (GC debt, codegen-cache churn from 90+ distinct
  * plans) has made full-battery per-query numbers diverge 3–4× from
  * isolated runs. Mitigation: a GC quiescence pause before each query and
  * best-of-two timing — the min discards one-off JIT/GC/compile stalls
  * while still timing the full plan execution, so full-battery numbers
  * track isolated runs.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-bench")
    def execute(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
    // one warm-up of the session (JIT + codegen caches) on a fixed query
    // so run-to-run numbers are comparable
    SparkEntry.queries.keys.toSeq.sorted.headOption.foreach { n =>
      try execute(n) catch { case _: Throwable => () }
    }
    // optional args = subset of query names (local iteration); the driver
    // passes none and gets the full battery
    val names =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq
    // a failed query records None — NOT a phantom sub-second "timing" of
    // the failure path (that shape hid q_date_round's crash for two
    // rounds); failures surface as null in the map + a "failed" count
    def timeOnce(name: String): Option[Double] = {
      val t0 = System.nanoTime()
      try { execute(name); Some((System.nanoTime() - t0) / 1e9) }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        None
      }
    }
    val results = names.sorted.map { name =>
      // quiesce: drain GC debt left by the previous query so its cost
      // isn't billed to this one
      System.gc()
      Thread.sleep(50)
      name -> (for (a <- timeOnce(name); b <- timeOnce(name))
        yield math.min(a, b))
    }
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    // descending by time (failures first as null): the driver keeps only
    // a ~4 KB log tail, so the expensive queries — the ones worth
    // comparing round-over-round — must survive truncation
    val qs = results
      .sortBy { case (_, v) => -v.getOrElse(Double.MaxValue) }
      .map { case (k, v) => "\"" + k + "\":" + v.map(fmt).getOrElse("null") }
      .mkString("{", ",", "}")
    val failed = results.count(_._2.isEmpty)
    val total = results.flatMap(_._2).sum
    val full =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","failed":$failed,"queries":$qs,"sf":"$sfDir"}"""
    Files.writeString(Paths.get("bench_out.json"), full + "\n")
    println(full)
    // driver-parseable summary: MUST be the last stdout line (fits the tail)
    println(
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
