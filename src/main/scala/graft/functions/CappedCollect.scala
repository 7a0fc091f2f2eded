package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** COLLECT_CAPPED(value, cap) — collect_list with an O(cap) memory bound.
  *
  * Why it exists: the LSH pair-generation paths ([[graft.operators.Dedup]])
  * group by (band, bucket) and collect each bucket's members to explode
  * into candidate pairs, dropping buckets larger than `maxBucket` (a
  * degenerate bucket — e.g. millions of empty/boilerplate docs sharing one
  * signature chunk — would go quadratic). With plain `collect_list` +
  * `size(...) <= cap` the guard runs AFTER the full list materializes in
  * ONE aggregation buffer: at 100 TB a 1e8-member bucket is a multi-GB
  * single buffer → executor OOM, even though the filter then throws it
  * away. This aggregate stops buffering the moment the cap is exceeded:
  * the buffer flips to an overflow marker and frees its entries, so a
  * degenerate bucket costs O(cap) memory in every partial and the merge
  * path, not O(bucket).
  *
  * Semantics: result = the collected array when the group has at most
  * `cap` non-null values, NULL when it overflowed — exactly the rows a
  * `size(collect_list(x)) <= cap` filter would keep, so callers filter
  * `isNotNull` and get identical output to the collect-then-filter shape.
  * Element order is partial/merge-order-dependent (like collect_list);
  * callers needing determinism sort the array.
  *
  * Partial aggregation stays enabled (TypedImperativeAggregate serializes
  * buffers through the standard partial/final split), so map-side partials
  * are capped too and the shuffle carries at most cap+overflow-bit per
  * (group, partition) — the count-prefilter shape's memory profile without
  * its extra aggregate + semi-join pass.
  */
case class CappedCollectAgg(
    child: Expression,
    capExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedCollectAgg.Buf] {

  private lazy val cap: Int = capExpr.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"cap must be a foldable integer literal, got $other")
  }

  override def children: Seq[Expression] = Seq(child, capExpr)
  override def dataType: DataType =
    ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): CappedCollectAgg.Buf =
    new CappedCollectAgg.Buf(cap)

  override def update(buf: CappedCollectAgg.Buf, input: InternalRow)
      : CappedCollectAgg.Buf = {
    val v = child.eval(input)
    // nulls skipped like collect_list; values copied — eval may return
    // views into a reused row/buffer
    if (v != null) buf.add(InternalRow.copyValue(v))
    buf
  }

  override def merge(buf: CappedCollectAgg.Buf, other: CappedCollectAgg.Buf)
      : CappedCollectAgg.Buf = { buf.mergeFrom(other); buf }

  override def eval(buf: CappedCollectAgg.Buf): Any =
    if (buf.overflowed) null
    else new GenericArrayData(buf.items.toArray)

  // buffers cross the partial/final shuffle as one UnsafeRow
  // (overflowed, array<child>) — the same trick Spark's Collect uses
  private lazy val serProj = UnsafeProjection.create(Array[DataType](
    BooleanType, ArrayType(child.dataType, containsNull = false)))
  private lazy val deserRow = new UnsafeRow(2)

  override def serialize(buf: CappedCollectAgg.Buf): Array[Byte] =
    serProj.apply(InternalRow(buf.overflowed,
      new GenericArrayData(buf.items.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): CappedCollectAgg.Buf = {
    val buf = new CappedCollectAgg.Buf(cap)
    deserRow.pointTo(bytes, bytes.length)
    if (deserRow.getBoolean(0)) buf.overflow()
    else {
      val arr = deserRow.getArray(1)
      arr.foreach(child.dataType,
        (_, v: Any) => buf.add(InternalRow.copyValue(v)))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CappedCollectAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CappedCollectAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): CappedCollectAgg =
    copy(child = c(0), capExpr = c(1))
  override def prettyName: String = "collect_capped"
}

object CappedCollectAgg {
  /** Collected values, or a tombstone once more than `cap` arrived —
    * entries are freed at the flip, so memory stays O(cap) no matter how
    * large the group is. */
  final class Buf(val cap: Int) {
    val items = new scala.collection.mutable.ArrayBuffer[Any]
    var overflowed = false
    def overflow(): Unit = { overflowed = true; items.clear() }
    def add(v: Any): Unit = if (!overflowed) {
      items += v
      if (items.length > cap) overflow()
    }
    def mergeFrom(other: Buf): Unit =
      if (other.overflowed) overflow()
      else other.items.foreach(add)
  }

  /** Column-API entry: `cappedCollect(struct($"id", $"sig"), 1000)`. */
  def cappedCollect(value: Column, cap: Int): Column =
    ColumnBridge.toColumn(
      CappedCollectAgg(ColumnBridge.toExpression(value),
        Literal(cap)).toAggregateExpression())
}
