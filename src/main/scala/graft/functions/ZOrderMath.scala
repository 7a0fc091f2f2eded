package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Z-order (Morton) curve kernel for multi-dimensional data layout.
  *
  * A table clustered on ONE sort key prunes parquet files only for
  * predicates on that key; interleaving the bits of per-column quantile
  * buckets gives every participating column locality in the SAME linear
  * order, so min/max file statistics prune scans filtered on ANY of the
  * z columns — the multi-column analog of the PK-sorted layout Phoenix
  * gets from the HBase rowkey (SURVEY.md §1.1 RowKeySchema; same idea
  * as Delta/Iceberg OPTIMIZE ZORDER). The kernel maps a row's
  * normalized column values to bucket ids by binary search over
  * precomputed quantile boundaries and interleaves the bucket bits into
  * one long — scan-local, no shuffle, whole-stage-codegen'd.
  */
object ZOrderMath {

  /** Z-value of one row. `vals` holds the k normalized (double) column
    * values; `bounds` holds k contiguous slices of (2^bits - 1) sorted
    * DISTINCT boundaries (padded past `counts(c)` entries — padding is
    * never read); bit i of column c's scaled bucket lands at z bit
    * (i*k + c). NULL and NaN values take bucket 0 (sort first, like
    * NULLS FIRST). The raw bucket is the count of boundaries <= v
    * (upper-bound binary search, deterministic ties); it is then
    * SPREAD over the full 2^bits range — a low-cardinality column
    * (counts(c)+1 buckets < 2^bits) would otherwise occupy only the
    * low interleave bits and the curve would degenerate to
    * highest-entropy-column-major order, destroying the other
    * columns' locality. */
  def zValue(vals: ArrayData, bounds: ArrayData, counts: ArrayData,
      bits: Int): Long = {
    val k = vals.numElements()
    val nbSlice = (1 << bits) - 1
    var z = 0L
    var c = 0
    while (c < k) {
      val m = counts.getInt(c)
      var bucket = 0
      if (!vals.isNullAt(c) && m > 0) {
        val v = vals.getDouble(c)
        var lo = 0
        var hi = m
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (bounds.getDouble(c * nbSlice + mid) <= v) lo = mid + 1
          else hi = mid
        }
        bucket = ((lo.toLong << bits) / (m + 1)).toInt
      }
      var i = 0
      while (i < bits) {
        z |= ((bucket >> i) & 1).toLong << (i * k + c)
        i += 1
      }
      c += 1
    }
    z
  }
  /** Order-preserving bucket id for a string against sorted split
    * points (binary collation — UTF8String byte order): the count of
    * boundaries <= v, the same upper-bound rule as [[zValue]]'s numeric
    * path. Boundaries come from a bounded driver sample (the
    * RangePartitioner recipe), so string z columns get REAL range
    * locality — a hash would cluster equality probes only. */
  def strBucket(v: org.apache.spark.unsafe.types.UTF8String,
      bounds: ArrayData): Int = {
    var lo = 0
    var hi = bounds.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds.getUTF8String(mid).compareTo(v) <= 0) lo = mid + 1
      else hi = mid
    }
    lo
  }
}

/** Z_STR_BUCKET(string, array<string> sortedBoundaries) → int.
  * See [[ZOrderMath.strBucket]]. */
case class StrBucket(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any, b: Any): Any =
    ZOrderMath.strBucket(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, b) =>
      s"graft.functions.ZOrderMath.strBucket($v, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): StrBucket = copy(left = l, right = r)
  override def prettyName: String = "z_str_bucket"
}

/** Z_VALUE(array<double> values, array<double> flatBoundaries,
  * array<int> boundaryCounts, int bits) → bigint.
  * See [[ZOrderMath.zValue]]. */
case class ZValue(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any, b: Any, cnt: Any, n: Any): Any =
    ZOrderMath.zValue(v.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], cnt.asInstanceOf[ArrayData],
      n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, b, cnt, n) =>
      s"graft.functions.ZOrderMath.zValue($v, $b, $cnt, $n)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): ZValue =
    copy(first = f, second = s, third = t, fourth = q)
  override def prettyName: String = "z_value"
}
