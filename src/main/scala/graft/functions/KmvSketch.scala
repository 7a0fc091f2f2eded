package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** KMV_SKETCH(hash, k) — the k-minimum-values distinct-value sketch
  * (Bar-Yossef et al. 2002; unbiased estimator from Beyer, Haas et al.,
  * "On synopses for distinct-value estimation under multiset
  * operations", SIGMOD 2007 — the same θ-sketch family Apache
  * DataSketches ships as the Theta sketch).
  *
  * Why it exists next to approx_count_distinct: HLL estimates the
  * cardinality of ONE set (and unions, since max() merges), but it
  * cannot estimate an INTERSECTION — "how many distinct url/gram keys
  * do sources A and B share" at 100 TB otherwise needs the exact
  * key-shuffled join ([[graft.queries.Pipeline]] `q_dedup_cross_source`).
  * A KMV sketch is a uniform hash-sample of the distinct keys, so set
  * operations compose: union = k smallest of the merged sketches,
  * intersection = (common survivors below the union's θ) / θ. Per-group
  * state is a fixed k longs, partials merge associatively in the
  * standard HashAggregate split, and the pairwise source combine runs
  * over #sources rows — no corpus-sized shuffle at all.
  *
  * Input contract: a LONG hash (callers write `kmv_sketch(xxhash64(key),
  * k)`), the same convention as `bloom_build` — xxhash64 is
  * type-sensitive, so hashing at the call site keeps both sides of any
  * cross-source comparison honest about types. Hashes are compared
  * UNSIGNED (the uniform [0, 2^64) domain the estimator needs).
  *
  * Estimators (n = retained values, θ = normalized k-th minimum):
  *  - fewer than k distinct hashes seen → the sketch holds ALL of them:
  *    estimates are exact and deterministic;
  *  - otherwise D̂ = (k-1)/θ (unbiased; relative error ~ 1/√(k-2));
  *  - intersection over sketches A, B: θ_u = the union sketch's θ
  *    (≤ both inputs' θ, so membership below θ_u is decidable from the
  *    retained sets alone), estimate = |{h ∈ A ∩ B : h < θ_u}| / θ_u.
  *
  * Output is the serialized sketch (BINARY); [[KmvEstimate]],
  * [[KmvUnion]], [[KmvIntersectEstimate]] and [[KmvJaccard]] read it.
  * Scalar set ops are CodegenFallback — they run on per-GROUP rows
  * (#sources², not corpus rows), never in a scan.
  */
case class KmvAgg(
    hash: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvAgg.Sketch] {

  private lazy val k: Int = kExpr.eval() match {
    case i: Int if i >= 16 && i <= (1 << 20) => i
    case l: Long if l >= 16 && l <= (1 << 20) => l.toInt
    case other => throw new IllegalArgumentException(
      s"kmv_sketch k must be a foldable integer in [16, 2^20], got $other")
  }

  override def children: Seq[Expression] = Seq(hash, kExpr)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (hash.dataType == LongType) TypeCheckSuccess
    else TypeCheckFailure("kmv_sketch takes a BIGINT hash — write " +
      "kmv_sketch(xxhash64(key), k) so the hash type is explicit")
  }

  override def createAggregationBuffer(): KmvAgg.Sketch =
    new KmvAgg.Sketch(k)

  override def update(buf: KmvAgg.Sketch, input: InternalRow)
      : KmvAgg.Sketch = {
    val h = hash.eval(input)
    if (h != null) buf.add(h.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvAgg.Sketch, other: KmvAgg.Sketch)
      : KmvAgg.Sketch = { buf.mergeFrom(other); buf }

  override def eval(buf: KmvAgg.Sketch): Any = buf.toBytes

  override def serialize(buf: KmvAgg.Sketch): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): KmvAgg.Sketch =
    KmvAgg.Sketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KmvAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KmvAgg =
    copy(hash = c(0), kExpr = c(1))
  override def prettyName: String = "kmv_sketch"
}

object KmvAgg {
  private val unsignedOrder: java.util.Comparator[java.lang.Long] =
    (a: java.lang.Long, b: java.lang.Long) =>
      java.lang.Long.compareUnsigned(a, b)

  /** The k smallest DISTINCT hashes in unsigned order. O(log k) add
    * with an early reject against the current k-th minimum. */
  final class Sketch(val k: Int) {
    private[KmvAgg] val set =
      new java.util.TreeSet[java.lang.Long](unsignedOrder)

    def add(h: Long): Unit = {
      if (set.size() < k) { set.add(h); () }
      else if (java.lang.Long.compareUnsigned(h, set.last()) < 0) {
        if (set.add(h)) set.pollLast()
        ()
      }
    }

    def mergeFrom(other: Sketch): Unit = {
      val it = other.set.iterator()
      while (it.hasNext) add(it.next())
    }

    def toBytes: Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + set.size() * 8)
      bb.putInt(k); bb.putInt(set.size())
      val it = set.iterator()
      while (it.hasNext) bb.putLong(it.next())
      bb.array()
    }
  }

  object Sketch {
    def fromBytes(bytes: Array[Byte]): Sketch = {
      val bb = ByteBuffer.wrap(bytes)
      val sk = new Sketch(bb.getInt)
      val n = bb.getInt
      var i = 0
      while (i < n) { sk.set.add(bb.getLong); i += 1 }
      sk
    }
  }

  /** Decoded serialized form: k + hashes ascending unsigned. */
  private[functions] def decode(bytes: Array[Byte]): (Int, Array[Long]) = {
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val n = bb.getInt
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = bb.getLong; i += 1 }
    (k, hs)
  }

  private[functions] def encode(k: Int, hs: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + hs.length * 8)
    bb.putInt(k); bb.putInt(hs.length)
    hs.foreach(bb.putLong)
    bb.array()
  }

  /** Unsigned hash → (0, 1] fraction of the 2^64 domain (53-bit
    * precision — the estimator's error floor is far above 2^-53). */
  private[functions] def theta(h: Long): Double =
    ((h >>> 11).toDouble + 1.0) / (1L << 53).toDouble

  /** Distinct-count estimate of one decoded sketch. */
  private[functions] def estimate(k: Int, hs: Array[Long]): Double =
    if (hs.length < k) hs.length.toDouble // saw everything: exact
    else (k - 1).toDouble / theta(hs(k - 1))

  /** Union of two decoded sketches at k = min(k_a, k_b): the k smallest
    * distinct hashes of the merged streams (one linear merge pass —
    * both inputs are sorted). */
  private[functions] def union(a: (Int, Array[Long]), b: (Int, Array[Long]))
      : (Int, Array[Long]) = {
    val k = math.min(a._1, b._1)
    val (ha, hb) = (a._2, b._2)
    val out = new Array[Long](math.min(k, ha.length + hb.length))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < ha.length || j < hb.length)) {
      val takeA = j >= hb.length || (i < ha.length &&
        java.lang.Long.compareUnsigned(ha(i), hb(j)) <= 0)
      val h = if (takeA) { val v = ha(i); i += 1; v }
              else { val v = hb(j); j += 1; v }
      if (takeA && j < hb.length && hb(j) == h) j += 1 // dedup equal heads
      if (n == 0 || out(n - 1) != h) { out(n) = h; n += 1 }
    }
    (k, if (n == out.length) out else java.util.Arrays.copyOf(out, n))
  }

  private def contains(hs: Array[Long], h: Long): Boolean = {
    // binary search in unsigned order (flip the sign bit to compare
    // as signed)
    var lo = 0; var hi = hs.length - 1
    val key = h ^ Long.MinValue
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val v = hs(mid) ^ Long.MinValue
      if (v < key) lo = mid + 1
      else if (v > key) hi = mid - 1
      else return true
    }
    false
  }

  /** |A ∩ B| estimate. When the union retained fewer than k values both
    * sketches were exhaustive and the count is exact; otherwise count
    * the common survivors below the union's θ and divide by θ. */
  private[functions] def intersectEstimate(
      a: (Int, Array[Long]), b: (Int, Array[Long])): Double = {
    val (k, u) = union(a, b)
    if (u.isEmpty) return 0.0
    if (u.length < k) {
      var c = 0; var i = 0
      while (i < u.length) {
        if (contains(a._2, u(i)) && contains(b._2, u(i))) c += 1
        i += 1
      }
      c.toDouble
    } else {
      val th = theta(u(k - 1))
      var c = 0; var i = 0
      // survivors strictly below the k-th minimum (the k-th itself is
      // the θ boundary: DataSketches counts < θ)
      while (i < k - 1) {
        if (contains(a._2, u(i)) && contains(b._2, u(i))) c += 1
        i += 1
      }
      c.toDouble / th
    }
  }

  /** Jaccard estimate |A∩B| / |A∪B|: the union's k-min values are a
    * uniform sample of A∪B, so the common fraction among them IS the
    * Jaccard estimate (exact when the union retained everything). */
  private[functions] def jaccard(
      a: (Int, Array[Long]), b: (Int, Array[Long])): Double = {
    val (k, u) = union(a, b)
    if (u.isEmpty) return 0.0
    // same sample as intersectEstimate: strictly below the θ boundary
    val bound = if (u.length < k) u.length else k - 1
    var c = 0; var i = 0
    while (i < bound) {
      if (contains(a._2, u(i)) && contains(b._2, u(i))) c += 1
      i += 1
    }
    c.toDouble / bound
  }
}

/** KMV_ESTIMATE(sketch) → double distinct-count estimate. */
case class KmvEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KmvSketchOps.requireBinary(children, prettyName)
  override def nullSafeEval(v: Any): Any = {
    val (k, hs) = KmvAgg.decode(v.asInstanceOf[Array[Byte]])
    KmvAgg.estimate(k, hs)
  }
  override protected def withNewChildInternal(c: Expression): KmvEstimate =
    copy(child = c)
  override def prettyName: String = "kmv_estimate"
}

/** KMV_UNION(a, b) → binary union sketch (k = min of the inputs'). */
case class KmvUnion(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KmvSketchOps.requireBinary(children, prettyName)
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (k, hs) = KmvAgg.union(
      KmvAgg.decode(a.asInstanceOf[Array[Byte]]),
      KmvAgg.decode(b.asInstanceOf[Array[Byte]]))
    KmvAgg.encode(k, hs)
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KmvUnion = copy(left = l, right = r)
  override def prettyName: String = "kmv_union"
}

/** KMV_INTERSECT_ESTIMATE(a, b) → double |A ∩ B| estimate. */
case class KmvIntersectEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KmvSketchOps.requireBinary(children, prettyName)
  override def nullSafeEval(a: Any, b: Any): Any =
    KmvAgg.intersectEstimate(
      KmvAgg.decode(a.asInstanceOf[Array[Byte]]),
      KmvAgg.decode(b.asInstanceOf[Array[Byte]]))
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KmvIntersectEstimate =
    copy(left = l, right = r)
  override def prettyName: String = "kmv_intersect_estimate"
}

/** KMV_JACCARD(a, b) → double Jaccard similarity estimate. */
case class KmvJaccard(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KmvSketchOps.requireBinary(children, prettyName)
  override def nullSafeEval(a: Any, b: Any): Any =
    KmvAgg.jaccard(
      KmvAgg.decode(a.asInstanceOf[Array[Byte]]),
      KmvAgg.decode(b.asInstanceOf[Array[Byte]]))
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KmvJaccard = copy(left = l, right = r)
  override def prettyName: String = "kmv_jaccard"
}

private[functions] object KmvSketchOps {
  def requireBinary(children: Seq[Expression], fn: String)
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (children.forall(_.dataType == BinaryType)) TypeCheckSuccess
    else TypeCheckFailure(
      s"$fn takes serialized kmv_sketch BINARY arguments")
  }
}
