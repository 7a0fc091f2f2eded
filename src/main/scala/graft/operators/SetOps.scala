package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** UNION ALL with Phoenix-style type reconciliation (reference:
  * cc/compile/UnionCompiler.java — the n-ary UNION ALL coerces each
  * branch's column i to a common type; Spark's unionAll requires exact
  * schema match, so we compute the widened type per position and cast
  * every branch before unioning). Column names follow the first branch. */
object SetOps {

  private val widenOrder: Seq[DataType] = Seq(ByteType, ShortType,
    IntegerType, LongType, FloatType, DoubleType)

  /** Exact decimal representation of an integral type (Phoenix's
    * UnionCompiler coerces long+decimal to DECIMAL, never to DOUBLE —
    * a BIGINT beyond 2^53 would corrupt silently in a double). */
  private def asDecimal(t: DataType): Option[DecimalType] = t match {
    case d: DecimalType => Some(d)
    case ByteType => Some(DecimalType(3, 0))
    case ShortType => Some(DecimalType(5, 0))
    case IntegerType => Some(DecimalType(10, 0))
    case LongType => Some(DecimalType(20, 0))
    case _ => None
  }

  /** Decimal widening with the 38-digit cap (Spark's DecimalType
    * constructor REJECTS precision > 38, so the naive max-int-digits +
    * max-scale sum would crash on e.g. (38,0) vs (10,10); like
    * Phoenix's NumberUtil, cap precision and sacrifice scale first). */
  private def widenDecimals(d1: DecimalType, d2: DecimalType): DecimalType = {
    val intDigits = math.min(
      math.max(d1.precision - d1.scale, d2.precision - d2.scale),
      DecimalType.MAX_PRECISION)
    val scale = math.min(math.max(d1.scale, d2.scale),
      DecimalType.MAX_PRECISION - intDigits)
    DecimalType(intDigits + scale, scale)
  }

  private[graft] def widen(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (d1: DecimalType, d2: DecimalType) => widenDecimals(d1, d2)
    // decimal + integral stays DECIMAL (exact); decimal + float/double
    // goes to DOUBLE (the float side is already inexact)
    case (d: DecimalType, n) if widenOrder.contains(n) =>
      asDecimal(n).map(widenDecimals(d, _)).getOrElse(DoubleType)
    case (n, d: DecimalType) if widenOrder.contains(n) =>
      asDecimal(n).map(widenDecimals(d, _)).getOrElse(DoubleType)
    // integral + FLOAT widens to DOUBLE, not FLOAT: a float mantissa
    // is 24 bits, so casting a BIGINT to it corrupts silently beyond
    // 2^24 — the same trap the decimal rules above exist to avoid
    // (double preserves integers to 2^53, the standard SQL trade)
    case (FloatType, i)
        if Seq(ByteType, ShortType, IntegerType, LongType).contains(i) =>
      DoubleType
    case (i, FloatType)
        if Seq(ByteType, ShortType, IntegerType, LongType).contains(i) =>
      DoubleType
    case (x, y) if widenOrder.contains(x) && widenOrder.contains(y) =>
      widenOrder(math.max(widenOrder.indexOf(x), widenOrder.indexOf(y)))
    case (StringType, _) | (_, StringType) => StringType
    case (DateType, TimestampType) | (TimestampType, DateType) => TimestampType
    case (x, y) => throw new IllegalArgumentException(
      s"cannot reconcile UNION column types $x and $y")
  }

  def unionAllReconciled(branches: Seq[DataFrame]): DataFrame = {
    require(branches.nonEmpty)
    val n = branches.head.schema.length
    require(branches.forall(_.schema.length == n),
      "UNION branches must have the same column count")
    val types = branches.map(_.schema.fields.map(_.dataType))
      .reduce((a, b) => a.zip(b).map { case (x, y) => widen(x, y) })
    val names = branches.head.schema.fieldNames
    branches.map { df =>
      df.select(df.schema.fieldNames.zipWithIndex.map { case (c, i) =>
        col(c).cast(types(i)).as(names(i))
      }: _*)
    }.reduce(_ unionAll _)
  }

  /** Approximate cross-source distinct-overlap matrix via KMV sketches
    * ([[graft.functions.KmvAgg]]): per-source distinct cardinality,
    * pairwise intersection estimate and Jaccard — the SCALE path for
    * the exact gram-shuffled `q_dedup_cross_source` report.
    *
    * Shape at 100 TB: ONE scan builds a fixed k-longs sketch per source
    * (partial/final HashAggregate — the shuffle carries #sources
    * sketches, not the corpus keys), then the pairwise combine runs on
    * a #sources-row frame (the self-join is a broadcast of that tiny
    * aggregate, a declared bounded combine like the z-order stats
    * pass). Estimator error ~ 1/√k on cardinalities; intersections of
    * mostly-disjoint sources carry proportionally larger relative
    * error — KmvSketchSpec pins tolerances and the exact-below-k regime.
    *
    * @param keyHash a BIGINT hash column over the overlap key, e.g.
    *                `xxhash64(col("url"))` or a gram hash — hashing at
    *                the call site keeps the key type explicit */
  def approxSourceOverlap(df: DataFrame, srcCol: String,
      keyHash: Column, k: Int = 4096): DataFrame = {
    graft.functions.GraftFunctions.registerKernels(df.sparkSession)
    val sk = df.groupBy(col(srcCol).as("source"))
      .agg(call_function("kmv_sketch", keyHash, lit(k)).as("sk"))
    val a = sk.select(col("source").as("source_a"), col("sk").as("sk_a"))
    val b = sk.select(col("source").as("source_b"), col("sk").as("sk_b"))
    a.join(broadcast(b), col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"),
        call_function("kmv_estimate", col("sk_a")).as("n_a"),
        call_function("kmv_estimate", col("sk_b")).as("n_b"),
        call_function("kmv_intersect_estimate", col("sk_a"), col("sk_b"))
          .as("n_shared_est"),
        call_function("kmv_jaccard", col("sk_a"), col("sk_b"))
          .as("jaccard_est"))
  }
}
