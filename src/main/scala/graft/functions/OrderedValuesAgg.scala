package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Phoenix FIRST_VALUES / LAST_VALUES / NTH_VALUE — *ordered aggregates*
  * (aggregate functions with an ORDER BY argument, NOT window functions;
  * reference: phoenix-core-client .../expression/function/FirstValuesFunction
  * .java, LastValuesFunction.java, NthValueFunction.java and aggregator
  * .../expression/aggregator/FirstLastValueServerAggregator.java).
  *
  * Keeps a bounded heap of the k (ord, value) pairs with the smallest
  * (first) or largest (last) ord per group — memory is O(k) per group
  * regardless of group size, and partial buffers merge associatively, so
  * the partial/final split works across any number of partitions (the same
  * shape Phoenix uses per-region + client merge). Specialized to
  * ord: BIGINT, value: DOUBLE — the engine's measure columns.
  *
  * Output: array of the k values ordered by ord (ascending for FIRST,
  * descending for LAST). NTH_VALUE(v, ord, n) = element_at(FIRST(k=n), n).
  */
case class OrderedValuesAgg(
    value: Expression,
    ord: Expression,
    kExpr: Expression,
    last: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[OrderedValuesAgg.Buf] {

  private lazy val k: Int = kExpr.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"k must be a foldable integer literal, got $other")
  }

  override def children: Seq[Expression] = Seq(value, ord, kExpr)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): OrderedValuesAgg.Buf =
    new OrderedValuesAgg.Buf(k, last)

  override def update(buf: OrderedValuesAgg.Buf, input: InternalRow)
      : OrderedValuesAgg.Buf = {
    val v = value.eval(input)
    val o = ord.eval(input)
    if (v != null && o != null)
      buf.add(o.asInstanceOf[Long], v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: OrderedValuesAgg.Buf, other: OrderedValuesAgg.Buf)
      : OrderedValuesAgg.Buf = { buf.mergeFrom(other); buf }

  override def eval(buf: OrderedValuesAgg.Buf): Any =
    new GenericArrayData(buf.sortedValues)

  override def serialize(buf: OrderedValuesAgg.Buf): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): OrderedValuesAgg.Buf =
    OrderedValuesAgg.Buf.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): OrderedValuesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): OrderedValuesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): OrderedValuesAgg =
    copy(value = c(0), ord = c(1), kExpr = c(2))
  override def prettyName: String =
    if (last) "last_values" else "first_values"
}

object OrderedValuesAgg {
  /** Bounded top-k by ord. `last=false` keeps the k smallest ords (heap
    * root = current largest kept); `last=true` keeps the k largest. */
  final class Buf(val k: Int, val last: Boolean) {
    // parallel arrays as a binary heap on ord (max-heap for first,
    // min-heap for last → root is always the eviction candidate)
    private val ords = new Array[Long](math.max(k, 1))
    private val vals = new Array[Double](math.max(k, 1))
    private var size = 0

    private def worse(a: Long, b: Long): Boolean =
      if (last) a < b else a > b // "worse" = closer to eviction

    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0 && worse(ords(i), ords((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    }
    private def siftDown(): Unit = {
      var i = 0
      while (true) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var m = i
        if (l < size && worse(ords(l), ords(m))) m = l
        if (r < size && worse(ords(r), ords(m))) m = r
        if (m == i) return
        swap(i, m); i = m
      }
    }
    private def swap(i: Int, j: Int): Unit = {
      val to = ords(i); ords(i) = ords(j); ords(j) = to
      val tv = vals(i); vals(i) = vals(j); vals(j) = tv
    }

    def add(o: Long, v: Double): Unit = {
      if (size < k) {
        ords(size) = o; vals(size) = v; size += 1; siftUp(size - 1)
      } else if (k > 0 && worse(ords(0), o)) {
        ords(0) = o; vals(0) = v; siftDown()
      }
    }

    def mergeFrom(other: Buf): Unit = {
      var i = 0
      while (i < other.size) { add(other.ords(i), other.vals(i)); i += 1 }
    }

    /** Values ordered by ord asc (first) / desc (last). */
    def sortedValues: Array[Double] = {
      val idx = (0 until size).sortBy(ords(_))
      val ordered = if (last) idx.reverse else idx
      ordered.map(vals(_)).toArray
    }

    def toBytes: Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + 1 + 4 + size * 16)
      bb.putInt(k); bb.put(if (last) 1.toByte else 0.toByte); bb.putInt(size)
      var i = 0
      while (i < size) { bb.putLong(ords(i)); bb.putDouble(vals(i)); i += 1 }
      bb.array()
    }
  }

  object Buf {
    def fromBytes(bytes: Array[Byte]): Buf = {
      val bb = ByteBuffer.wrap(bytes)
      val k = bb.getInt; val last = bb.get() == 1; val n = bb.getInt
      val buf = new Buf(k, last)
      var i = 0
      while (i < n) { buf.add(bb.getLong, bb.getDouble); i += 1 }
      buf
    }
  }
}
