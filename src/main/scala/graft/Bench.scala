package graft

import java.nio.file.{Files, Paths}

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":"total","value":...,"queries":{...}}.
  *
  * Timing executes the FULL physical plan via queryExecution.toRdd.count()
  * — a plain df.count() lets Spark drop the final projection for
  * project-only queries and understates scan/expression cost. The JSON
  * line is also written to bench_out.json so a log-scraping failure
  * (e.g. an sbt prefix) can't lose the round's numbers.
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
    val results = names.sorted.map { name =>
      val t0 = System.nanoTime()
      try execute(name) catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // Compact timings to 3 decimals: the driver captures only a ~4 KB tail
    // of the run log, and a full-precision 70-query line overflows it, so
    // the line's start (and hence the parse) is lost.
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    Files.writeString(Paths.get("bench_out.json"), json + "\n")
    spark.stop()
  }
}
