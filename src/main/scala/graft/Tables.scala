package graft

import org.apache.spark.sql.{functions, types, DataFrame, SparkSession}

/** Table loading for the driver's TPC-H-ish testdata (TESTDATA.md).
  *
  * Each logical table is one parquet file/dir under the scale-factor
  * directory. At cluster scale these would be partitioned parquet (or any
  * V2 source); everything downstream only sees a DataFrame, so the layout
  * can change without touching operators.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // The testdata files are immutable, so the resolved DataFrame (schema +
  // file listing, both read from parquet footers on the driver) is cached
  // per (session, dir, table) — a 70-query batch otherwise re-lists and
  // re-reads footers on every query. Plays the role of a table catalog.
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // entries for stopped sessions would otherwise pin the session (and
    // its analyzed plans) for the JVM's lifetime
    cache.keys.foreach { k =>
      if (k._1.sparkContext.isStopped) cache.remove(k)
    }
    cache.getOrElseUpdate((spark, sfDir, name), {
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      // events.ts is TIMESTAMP(NANOS) in parquet; with nanosAsLong=true it
      // arrives as LongType nanos — truncate to microsecond timestamp (same
      // truncation DuckDB applies when reading ns into its us TIMESTAMP).
      df.schema.find(f => f.name == "ts" && f.dataType == types.LongType) match {
        case Some(_) =>
          df.withColumn("ts", functions.timestamp_micros(functions.expr("ts div 1000")))
        case None => df
      }
    })
  }

  /** Register every table as a temp view so spark.sql(...) queries can use
    * bare table names — the same names the DuckDB oracle sees. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => t(spark, sfDir, n).createOrReplaceTempView(n))
}
