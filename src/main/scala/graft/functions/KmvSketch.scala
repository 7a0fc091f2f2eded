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
  * state is a fixed primitive table of ~2k longs (k longs serialized),
  * partials merge associatively in the
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
    if (hash.dataType != LongType)
      TypeCheckFailure("kmv_sketch takes a BIGINT hash — write " +
        "kmv_sketch(xxhash64(key), k) so the hash type is explicit")
    // k must be checkable at analysis time: a column reference would
    // otherwise surface as an opaque eval() UnsupportedOperationException
    // from deep inside planning instead of a typed analysis error
    else if (!kExpr.foldable ||
        !(kExpr.dataType == IntegerType || kExpr.dataType == LongType))
      TypeCheckFailure("kmv_sketch k must be a foldable integer " +
        "literal in [16, 2^20]")
    else TypeCheckSuccess
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

  /** Serialized empty sketch for k — what `kmv_sketch` returns over
    * zero rows (the MV rewrite's zero-state-rows identity). */
  def emptySketchBytes(k: Int): Array[Byte] = encode(k, Array.emptyLongArray)

  /** The k smallest DISTINCT hashes — primitive, allocation-free per
    * row (the finding that killed the first TreeSet draft: boxed Longs
    * and ~40-byte tree entries on a corpus-scan hot path). The state is
    * an open-addressing long table (0 = empty slot, a real 0 hash
    * tracked by flag) filled up to ~75%, then COMPACTED: sort the
    * resident values unsigned, keep the k smallest, set θ to the k-th —
    * every later hash ≥ θ is rejected with one unsigned compare. The
    * common per-row path is that single compare; accepted inserts decay
    * like k·ln(n/k), so the periodic O(cap log cap) compaction
    * amortizes to nothing (the Apache DataSketches Theta update-sketch
    * design). */
  final class Sketch(val k: Int) {
    // table capacity GROWS geometrically toward capMax instead of
    // preallocating 2k slots: an exact-regime k of 2^20 would otherwise
    // pin a 16 MB buffer per group per task from the first row — per-
    // period retention shapes hold #periods × tasks buffers at once,
    // gigabytes of transient memory for sketches that may only ever see
    // a few thousand values. Start at 8 KB and double on fill; only a
    // sketch that genuinely approaches k distinct hashes reaches capMax.
    private val capMax = Integer.highestOneBit(math.max(64, 2 * k) - 1) << 1
    private var cap = math.min(capMax, 1024)
    private var table = new Array[Long](cap)
    private var n = 0 // resident entries (incl. the tracked zero)
    private var hasZero = false
    private var saturated = false // θ valid only after first compaction
    private var theta = -1L // unsigned max until saturated

    def add(h: Long): Unit = {
      if (saturated && java.lang.Long.compareUnsigned(h, theta) >= 0)
        return
      if (h == 0L) {
        if (!hasZero) { hasZero = true; n += 1; maybeCompact() }
        return
      }
      var i = (scramble(h) & (cap - 1)).toInt
      while (table(i) != 0L) {
        if (table(i) == h) return
        i = (i + 1) & (cap - 1)
      }
      table(i) = h; n += 1
      maybeCompact()
    }

    // re-spread the already-uniform hash so linear probing doesn't
    // cluster on any structure in the low bits
    private def scramble(h: Long): Long = {
      val x = h * 0x9E3779B97F4A7C15L
      x ^ (x >>> 32)
    }

    private def maybeCompact(): Unit =
      if (n >= (cap >> 2) * 3) {
        if (cap < capMax) grow() else compact()
      }

    // double the table and rehash — resident set unchanged, so the
    // sketch's value semantics don't depend on the growth schedule
    private def grow(): Unit = {
      val old = table
      cap = cap << 1
      table = new Array[Long](cap)
      var i = 0
      while (i < old.length) {
        val h = old(i)
        if (h != 0L) {
          var j = (scramble(h) & (cap - 1)).toInt
          while (table(j) != 0L) j = (j + 1) & (cap - 1)
          table(j) = h
        }
        i += 1
      }
    }

    private def compact(): Unit = {
      val kept = resident()
      if (kept.length > k) {
        // kept is ascending unsigned: θ = the k-th smallest; everything
        // at or past it can never re-enter the k-minimum set
        theta = kept(k)
        saturated = true
      }
      java.util.Arrays.fill(table, 0L)
      hasZero = false
      n = 0
      val m = math.min(k, kept.length)
      var i = 0
      while (i < m) {
        val h = kept(i)
        if (h == 0L) hasZero = true
        else {
          var j = (scramble(h) & (cap - 1)).toInt
          while (table(j) != 0L) j = (j + 1) & (cap - 1)
          table(j) = h
        }
        n += 1
        i += 1
      }
    }

    /** Resident values ascending unsigned (sign-bit flip → signed sort). */
    private def resident(): Array[Long] = {
      val out = new Array[Long](n)
      var m = 0
      if (hasZero) { out(m) = Long.MinValue; m += 1 } // 0 ^ MinValue
      var i = 0
      while (i < cap) {
        if (table(i) != 0L) { out(m) = table(i) ^ Long.MinValue; m += 1 }
        i += 1
      }
      java.util.Arrays.sort(out)
      var j = 0
      while (j < out.length) { out(j) = out(j) ^ Long.MinValue; j += 1 }
      out
    }

    /** Canonical k-minimum form: ascending unsigned, truncated to k. */
    private[KmvAgg] def kMin: Array[Long] = {
      val r = resident()
      if (r.length <= k) r else java.util.Arrays.copyOf(r, k)
    }

    def mergeFrom(other: Sketch): Unit = {
      val hs = other.kMin
      var i = 0
      while (i < hs.length) { add(hs(i)); i += 1 }
    }

    def toBytes: Array[Byte] = encode(k, kMin)
  }

  object Sketch {
    def fromBytes(bytes: Array[Byte]): Sketch = {
      val (k, hs) = decode(bytes)
      val sk = new Sketch(k)
      var i = 0
      while (i < hs.length) { sk.add(hs(i)); i += 1 }
      sk
    }
  }

  /** Decoded serialized form: k + hashes ascending unsigned. The header
    * is VALIDATED — these scalar ops take any BINARY column, and a
    * malformed/foreign payload (a bloom filter, truncated bytes) must
    * fail with a typed message, not a NegativeArraySizeException or an
    * OOM-sized allocation from a garbage length. */
  private[functions] def decode(bytes: Array[Byte]): (Int, Array[Long]) = {
    def bad(why: String) = throw new IllegalArgumentException(
      s"not a kmv_sketch payload ($why)")
    if (bytes.length < 8) bad(s"${bytes.length} bytes, header needs 8")
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val n = bb.getInt
    if (k < 16 || k > (1 << 20)) bad(s"k=$k outside [16, 2^20]")
    if (n < 0 || n > k) bad(s"n=$n outside [0, k=$k]")
    if (bytes.length != 8 + 8 * n)
      bad(s"${bytes.length} bytes, expected ${8 + 8 * n}")
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

/** KMV_UNION_AGG(sketch) → BINARY: merges serialized KMV sketches
  * across rows — the re-aggregation path (many per-group sketches →
  * one coarser-group sketch). NULL inputs skip; all-NULL → NULL.
  * Mixed-k inputs union at min(k) (the only sound θ), same as the
  * scalar [[KmvUnion]]. Sum-mergeable by construction (union is
  * commutative/associative/idempotent), so partial aggregation and
  * any merge order give byte-identical results — the property the
  * sketch-valued MV fold ([[graft.operators.Materialize]]) and
  * coarser-grain rollup serving both lean on. */
case class KmvUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvUnionAgg.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KmvSketchOps.requireBinary(children, prettyName)

  override def createAggregationBuffer(): KmvUnionAgg.Buf =
    new KmvUnionAgg.Buf(null)

  override def update(buf: KmvUnionAgg.Buf, input: InternalRow)
      : KmvUnionAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val in = KmvAgg.decode(v.asInstanceOf[Array[Byte]])
      buf.cur = if (buf.cur == null) in else KmvAgg.union(buf.cur, in)
    }
    buf
  }

  override def merge(buf: KmvUnionAgg.Buf, other: KmvUnionAgg.Buf)
      : KmvUnionAgg.Buf = {
    if (other.cur != null)
      buf.cur = if (buf.cur == null) other.cur
        else KmvAgg.union(buf.cur, other.cur)
    buf
  }

  override def eval(buf: KmvUnionAgg.Buf): Any =
    if (buf.cur == null) null else KmvAgg.encode(buf.cur._1, buf.cur._2)

  override def serialize(buf: KmvUnionAgg.Buf): Array[Byte] =
    if (buf.cur == null) Array.emptyByteArray
    else KmvAgg.encode(buf.cur._1, buf.cur._2)
  override def deserialize(bytes: Array[Byte]): KmvUnionAgg.Buf =
    if (bytes.isEmpty) new KmvUnionAgg.Buf(null)
    else new KmvUnionAgg.Buf(KmvAgg.decode(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KmvUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): KmvUnionAgg = copy(child = cs.head)
  override def prettyName: String = "kmv_union_agg"
}

object KmvUnionAgg {
  /** Mutable holder: null until the first non-null input. */
  final class Buf(var cur: (Int, Array[Long]))
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
