package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{Extras, Functions, Pipeline, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (one entry per implemented operator
  * from SURVEY.md §2); `oracleSql` carries the DuckDB-equivalent ANSI SQL
  * for the driver's hash-compare. Column names are aliased identically on
  * both sides (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Functions.queries ++ Pipeline.queries ++
      Extras.queries

  def oracleSql: Map[String, String] =
    (Relational.oracle ++ Functions.oracle ++ Pipeline.oracle ++
      Extras.oracle).view
      .mapValues(_.stripMargin.trim).toMap
}
