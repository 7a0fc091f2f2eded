package graft

/** Plan-inspection main (not part of the driver contract):
  * `sbt "runMain graft.DebugExplain <queryName> <sfDir>"` executes the
  * query, then prints the FINAL adaptive physical plan — executing first
  * matters because AQE finalizes stages lazily, and the `*(n)` whole-stage
  * codegen markers only appear on the finalized plan. Used to diagnose the
  * round-6 WordShingles fusion regression (see its scaladoc).
  */
object DebugExplain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("debug-explain")
    val df = SparkEntry.queries(args(0))(spark, args(1))
    df.queryExecution.toRdd.count()
    println("=== PLAN " + args(0) + " (post-execution) ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
