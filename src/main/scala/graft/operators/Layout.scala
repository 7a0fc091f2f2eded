package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Physical layout control for scale: PK-bucketed + PK-sorted tables.
  *
  * Phoenix gets join/aggregation locality from the HBase rowkey order
  * (SURVEY.md §1.1 RowKeySchema); the Spark-native equivalent is
  * bucketing: writing both sides of a recurring equi-join bucketed and
  * sorted by the key lets Spark plan the join with NO exchange and NO
  * sort — at 100 TB the dominant cost of a fact-fact join is exactly
  * that shuffle, paid once at write time instead of per query.
  */
object Layout {

  /** Write df as a bucketed+sorted managed table (session catalog).
    * Joins/groupBys between tables bucketed on the same keys with the
    * same bucket count plan shuffle-free. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Read back a bucketed table (bucket metadata comes from the catalog;
    * plain spark.read.parquet on the files would lose it). */
  def readBucketed(spark: org.apache.spark.sql.SparkSession,
      table: String): DataFrame = spark.table(table)
}
