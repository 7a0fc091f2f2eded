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

  override def eval(buf: OrderedValuesAgg.Buf): Any = {
    // a group with NO non-null (value, ord) pairs is NULL, not [] — the
    // reference's FirstLastValueBaseClientAggregator.evaluate returns
    // false (SQL NULL) when topValues is empty, so IS NULL predicates
    // and oracle compares on all-null groups must agree
    val vs = buf.sortedValues
    if (vs.isEmpty) null else new GenericArrayData(vs)
  }

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

/** TOP_SCORED(term, score, k) — bounded per-group top-k rows by
  * (score desc, term asc): array<struct<term, score>> of the k best.
  *
  * The map-side-combinable form of `row_number() OVER (PARTITION BY g
  * ORDER BY score DESC) <= k`: the window shuffles EVERY row of every
  * group to its reducer and sorts; this aggregate's partial buffers keep
  * k entries per group per map task, so the shuffle carries at most
  * k rows per (group, task) — at corpus scale (per-doc top terms over
  * hundreds of terms/doc, k = 3) that is a ~100× smaller exchange with
  * no per-group sort. Same bounded-heap design as [[OrderedValuesAgg]]
  * (Phoenix's FirstLastValueServerAggregator shape), with the string
  * payload carried alongside the ordering key and deterministic
  * tie-breaking on the payload so results are reproducible across
  * partitionings.
  */
case class TopScoredAgg(
    term: Expression,
    score: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopScoredAgg.Buf] {

  private lazy val k: Int = kExpr.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"k must be a foldable integer literal, got $other")
  }

  override def children: Seq[Expression] = Seq(term, score, kExpr)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  // deliberately NOT the Phoenix first/last_values NULL-on-empty
  // contract: an internal pipeline aggregate whose consumers (explode,
  // size, array ops) want a typed EMPTY array for a group whose every
  // input pair was null
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopScoredAgg.Buf =
    new TopScoredAgg.Buf(k)

  override def update(buf: TopScoredAgg.Buf, input: InternalRow)
      : TopScoredAgg.Buf = {
    val t = term.eval(input)
    val s = score.eval(input)
    if (t != null && s != null)
      buf.add(t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
        .toString, s.asInstanceOf[Double])
    buf
  }

  override def merge(buf: TopScoredAgg.Buf, other: TopScoredAgg.Buf)
      : TopScoredAgg.Buf = { buf.mergeFrom(other); buf }

  override def eval(buf: TopScoredAgg.Buf): Any = {
    val rows = buf.sorted.map { case (t, s) =>
      InternalRow(org.apache.spark.unsafe.types.UTF8String.fromString(t), s)
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: TopScoredAgg.Buf): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopScoredAgg.Buf =
    TopScoredAgg.Buf.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): TopScoredAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopScoredAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopScoredAgg =
    copy(term = c(0), score = c(1), kExpr = c(2))
  override def prettyName: String = "top_scored"
}

/** TOP_SCORED_ID(id, score, k) — [[TopScoredAgg]] with a BIGINT payload
  * (tie-break id ASC, numeric): the map-side-combinable replacement for
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC, id ASC) <= k`
  * in neighbor-list shapes (kNN joins), where the grouped payload is a
  * row id rather than a term. A string round-trip through TOP_SCORED
  * would break ties LEXICOGRAPHICALLY ("10" < "2"), silently changing
  * which equal-scored neighbor survives — hence the typed variant. */
case class TopScoredIdAgg(
    id: Expression,
    score: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopScoredIdAgg.Buf] {

  private lazy val k: Int = kExpr.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"k must be a foldable integer literal, got $other")
  }

  // reject wrong input types at ANALYSIS time — update() would otherwise
  // ClassCastException mid-job on an INT id or a STRING score
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    id.dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => return TypeCheckFailure(
        s"top_scored_id requires an integral id column " +
          s"(TINYINT/SMALLINT/INT/BIGINT), got ${other.catalogString}")
    }
    score.dataType match {
      case _: NumericType => ()
      case other => return TypeCheckFailure(
        s"top_scored_id requires a numeric score column, " +
          s"got ${other.catalogString}")
    }
    if (!kExpr.foldable)
      TypeCheckFailure("top_scored_id requires a literal k")
    else TypeCheckSuccess
  }

  // narrower integral ids widen losslessly to the BIGINT buffer; any
  // numeric score converts to the DOUBLE buffer
  private lazy val idToLong: Any => Long = id.dataType match {
    case LongType => v => v.asInstanceOf[Long]
    case IntegerType => v => v.asInstanceOf[Int].toLong
    case ShortType => v => v.asInstanceOf[Short].toLong
    case ByteType => v => v.asInstanceOf[Byte].toLong
    case other => throw new IllegalStateException(s"unreachable: $other")
  }
  private lazy val scoreToDouble: Any => Double = score.dataType match {
    case DoubleType => v => v.asInstanceOf[Double]
    case FloatType => v => v.asInstanceOf[Float].toDouble
    case LongType => v => v.asInstanceOf[Long].toDouble
    case IntegerType => v => v.asInstanceOf[Int].toDouble
    case ShortType => v => v.asInstanceOf[Short].toDouble
    case ByteType => v => v.asInstanceOf[Byte].toDouble
    case _: DecimalType => v => v.asInstanceOf[Decimal].toDouble
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  override def children: Seq[Expression] = Seq(id, score, kExpr)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  // deliberately NOT the Phoenix first/last_values NULL-on-empty
  // contract: an internal pipeline aggregate whose consumers (explode,
  // size, array ops) want a typed EMPTY array for a group whose every
  // input pair was null
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopScoredIdAgg.Buf =
    new TopScoredIdAgg.Buf(k)

  override def update(buf: TopScoredIdAgg.Buf, input: InternalRow)
      : TopScoredIdAgg.Buf = {
    val i = id.eval(input)
    val s = score.eval(input)
    if (i != null && s != null)
      buf.add(idToLong(i), scoreToDouble(s))
    buf
  }

  override def merge(buf: TopScoredIdAgg.Buf, other: TopScoredIdAgg.Buf)
      : TopScoredIdAgg.Buf = { buf.mergeFrom(other); buf }

  override def eval(buf: TopScoredIdAgg.Buf): Any = {
    val rows = buf.sorted.map { case (i, s) => InternalRow(i, s) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: TopScoredIdAgg.Buf): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopScoredIdAgg.Buf =
    TopScoredIdAgg.Buf.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): TopScoredIdAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopScoredIdAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopScoredIdAgg =
    copy(id = c(0), score = c(1), kExpr = c(2))
  override def prettyName: String = "top_scored_id"
}

object TopScoredIdAgg {
  /** Bounded top-k by (score desc, id asc); heap root = current worst. */
  final class Buf(val k: Int) {
    private val ids = new Array[Long](math.max(k, 1))
    private val scores = new Array[Double](math.max(k, 1))
    private var size = 0

    // a is worse than b (closer to eviction)
    private def worse(ia: Long, sa: Double, ib: Long, sb: Double): Boolean =
      sa < sb || (sa == sb && ia > ib)

    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0 && worse(ids(i), scores(i),
          ids((i - 1) / 2), scores((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    }
    private def siftDown(): Unit = {
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var m = i
        if (l < size && worse(ids(l), scores(l), ids(m), scores(m))) m = l
        if (r < size && worse(ids(r), scores(r), ids(m), scores(m))) m = r
        if (m == i) done = true else { swap(i, m); i = m }
      }
    }
    private def swap(i: Int, j: Int): Unit = {
      val ti = ids(i); ids(i) = ids(j); ids(j) = ti
      val ts = scores(i); scores(i) = scores(j); scores(j) = ts
    }

    def add(id: Long, s: Double): Unit = {
      // NaN returns false on BOTH worse() directions, breaking the heap
      // invariant — which neighbors survive would then depend on
      // insertion order / partition layout. A NaN score (cosine of a
      // zero vector) means "no meaningful similarity": drop it.
      if (java.lang.Double.isNaN(s)) return
      if (size < k) {
        ids(size) = id; scores(size) = s; size += 1; siftUp(size - 1)
      } else if (k > 0 && worse(ids(0), scores(0), id, s)) {
        ids(0) = id; scores(0) = s; siftDown()
      }
    }

    def mergeFrom(other: Buf): Unit = {
      var i = 0
      while (i < other.size) { add(other.ids(i), other.scores(i)); i += 1 }
    }

    /** Entries by score desc, id asc. */
    def sorted: Array[(Long, Double)] = {
      val out = new Array[(Long, Double)](size)
      var i = 0
      while (i < size) { out(i) = (ids(i), scores(i)); i += 1 }
      scala.util.Sorting.stableSort(out,
        (a: (Long, Double), b: (Long, Double)) =>
          a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
      out
    }

    def toBytes: Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + 4 + size * 16)
      bb.putInt(k); bb.putInt(size)
      var i = 0
      while (i < size) { bb.putLong(ids(i)); bb.putDouble(scores(i)); i += 1 }
      bb.array()
    }
  }

  object Buf {
    def fromBytes(bytes: Array[Byte]): Buf = {
      val bb = ByteBuffer.wrap(bytes)
      val k = bb.getInt; val n = bb.getInt
      val buf = new Buf(k)
      var i = 0
      while (i < n) { buf.add(bb.getLong, bb.getDouble); i += 1 }
      buf
    }
  }
}

object TopScoredAgg {
  /** Bounded top-k by (score desc, term asc); the heap root is the
    * current WORST kept entry (lowest score, then greatest term). */
  final class Buf(val k: Int) {
    private val terms = new Array[String](math.max(k, 1))
    private val scores = new Array[Double](math.max(k, 1))
    private var size = 0

    // a is worse than b (closer to eviction)
    private def worse(ta: String, sa: Double, tb: String, sb: Double): Boolean =
      sa < sb || (sa == sb && ta > tb)

    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0 && worse(terms(i), scores(i),
          terms((i - 1) / 2), scores((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    }
    private def siftDown(): Unit = {
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var m = i
        if (l < size && worse(terms(l), scores(l), terms(m), scores(m))) m = l
        if (r < size && worse(terms(r), scores(r), terms(m), scores(m))) m = r
        if (m == i) done = true else { swap(i, m); i = m }
      }
    }
    private def swap(i: Int, j: Int): Unit = {
      val tt = terms(i); terms(i) = terms(j); terms(j) = tt
      val ts = scores(i); scores(i) = scores(j); scores(j) = ts
    }

    def add(t: String, s: Double): Unit = {
      // NaN compares false both ways, breaking the heap invariant and
      // making survivors partition-order dependent — same rule as
      // TopScoredIdAgg.Buf.add
      if (java.lang.Double.isNaN(s)) return
      if (size < k) {
        terms(size) = t; scores(size) = s; size += 1; siftUp(size - 1)
      } else if (k > 0 && worse(terms(0), scores(0), t, s)) {
        terms(0) = t; scores(0) = s; siftDown()
      }
    }

    def mergeFrom(other: Buf): Unit = {
      var i = 0
      while (i < other.size) { add(other.terms(i), other.scores(i)); i += 1 }
    }

    /** Entries by score desc, term asc. */
    def sorted: Array[(String, Double)] = {
      val out = new Array[(String, Double)](size)
      var i = 0
      while (i < size) { out(i) = (terms(i), scores(i)); i += 1 }
      scala.util.Sorting.stableSort(out,
        (a: (String, Double), b: (String, Double)) =>
          a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
      out
    }

    def toBytes: Array[Byte] = {
      val tb = new Array[Array[Byte]](size)
      var total = 4 + 4
      var i = 0
      while (i < size) {
        tb(i) = terms(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        total += 4 + tb(i).length + 8
        i += 1
      }
      val bb = ByteBuffer.allocate(total)
      bb.putInt(k); bb.putInt(size)
      i = 0
      while (i < size) {
        bb.putInt(tb(i).length); bb.put(tb(i)); bb.putDouble(scores(i))
        i += 1
      }
      bb.array()
    }
  }

  object Buf {
    def fromBytes(bytes: Array[Byte]): Buf = {
      val bb = ByteBuffer.wrap(bytes)
      val k = bb.getInt; val n = bb.getInt
      val buf = new Buf(k)
      var i = 0
      while (i < n) {
        val len = bb.getInt
        val tb = new Array[Byte](len); bb.get(tb)
        buf.add(new String(tb, java.nio.charset.StandardCharsets.UTF_8),
          bb.getDouble)
        i += 1
      }
      buf
    }
  }
}
