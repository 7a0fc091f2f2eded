package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Physical layout control for scale: PK-bucketed + PK-sorted tables,
  * and Z-order multi-column clustering.
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

  /** Z-order (Morton) clustering: return `df` redistributed and sorted so
    * that a write produces files whose parquet min/max statistics prune
    * scans filtered on ANY of `cols` — a single sort key prunes only its
    * own column; bit-interleaved quantile buckets give every z column
    * locality in the same linear order (the Delta/Iceberg OPTIMIZE ZORDER
    * layout, paid once at write time instead of per query).
    *
    * Scale shape: per-column bucket boundaries come from ONE
    * approxQuantile pass (a bounded QuantileSummaries sketch aggregated
    * to the driver — same pattern as the IVF training sample,
    * Similarity.scala); the z-value itself is a scan-local codegen'd
    * kernel ([[graft.functions.ZOrderMath]]); the only shuffle is the
    * range repartition that any clustered write pays. Supported column
    * types: numerics, DATE, TIMESTAMP (range + equality pruning), and
    * STRING via a stable 64-bit hash — hashing destroys range locality,
    * so string columns prune equality/IN predicates only.
    *
    * `bits` buckets per column (2^bits); cols.size * bits must fit a
    * long. NULL/NaN values sort first (bucket 0). Row content is
    * untouched — only order changes. */
  def zorderBy(df: DataFrame, cols: Seq[String], numPartitions: Int,
      bits: Int = 10): DataFrame = {
    val k = cols.size
    require(k >= 1 && k * bits <= 62,
      s"z-order needs 1..${62 / bits} columns at $bits bits, got $k")
    require(numPartitions >= 1, "numPartitions must be positive")
    graft.functions.GraftFunctions.register(df.sparkSession)

    def norm(c: String): Column = df.schema(c).dataType match {
      // unix_date/unix_micros, not a numeric cast: ANSI mode (the
      // session default) rejects timestamp→double casts
      case _: NumericType => col(c).cast(DoubleType)
      case DateType => unix_date(col(c)).cast(DoubleType)
      case TimestampType | TimestampNTZType =>
        unix_micros(col(c).cast(TimestampType)).cast(DoubleType)
      case StringType => xxhash64(col(c)).cast(DoubleType)
      case BinaryType => xxhash64(col(c)).cast(DoubleType)
      case dt => throw new IllegalArgumentException(
        s"z-order column $c: unsupported type $dt (numeric, date, " +
          "timestamp, string, binary)")
    }
    val zcNames = cols.indices.map(i => s"__zc$i")
    require(!("__z" +: zcNames).exists(df.columns.contains),
      "df already has a __z / __zc column")
    val proj = df.select(df.columns.map(col) ++
      cols.zip(zcNames).map { case (c, n) => norm(c).as(n) }: _*)

    // one sketch pass for ALL columns; 2^bits - 1 boundaries each
    val nB = 1 << bits
    val probs = (1 until nB).map(_.toDouble / nB).toArray
    val bounds = proj.stat.approxQuantile(zcNames.toArray, probs, 0.5 / nB)
      // an all-null column yields no quantiles: every row is bucket 0
      // anyway, so any constant boundary slice is correct
      .map(b => if (b.length == nB - 1) b else Array.fill(nB - 1)(0.0))
    val flat = bounds.flatten

    proj
      .withColumn("__z", call_function("z_value",
        array(zcNames.map(col): _*), typedlit(flat), lit(bits)))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .select(df.columns.map(col): _*)
  }

  /** Z-order `df` on `cols` and write it as parquet at `path` in
    * `numFiles` clustered files. */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
      numFiles: Int, bits: Int = 10): Unit =
    zorderBy(df, cols, numFiles, bits)
      .write.mode(SaveMode.Overwrite).parquet(path)
}
