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
    * quantile boundaries, one slice per column; bit i of column c's
    * bucket lands at z bit (i*k + c). NULL and NaN values take bucket 0
    * (sort first, like NULLS FIRST). The bucket id is the count of
    * boundaries <= v, i.e. an upper-bound binary search, so ties land
    * deterministically regardless of partitioning. */
  def zValue(vals: ArrayData, bounds: ArrayData, bits: Int): Long = {
    val k = vals.numElements()
    val nb = (1 << bits) - 1
    var z = 0L
    var c = 0
    while (c < k) {
      var bucket = 0
      if (!vals.isNullAt(c)) {
        val v = vals.getDouble(c)
        var lo = 0
        var hi = nb
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (bounds.getDouble(c * nb + mid) <= v) lo = mid + 1 else hi = mid
        }
        bucket = lo
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
}

/** Z_VALUE(array<double> values, array<double> flatBoundaries, int bits)
  * → bigint. See [[ZOrderMath.zValue]]. */
case class ZValue(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any, b: Any, n: Any): Any =
    ZOrderMath.zValue(v.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, b, n) =>
      s"graft.functions.ZOrderMath.zValue($v, $b, $n)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): ZValue =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "z_value"
}
