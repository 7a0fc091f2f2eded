package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** APPROX_TOP_TERMS(term, capacity) — bounded-memory heavy-hitters
  * aggregate: the SpaceSaving stream summary (Metwally, Agrawal, El
  * Abbadi, "Efficient computation of frequent and top-k elements in data
  * streams", ICDT 2005) with the union-style merge used by practical
  * mergeable implementations (Agarwal et al., "Mergeable Summaries",
  * PODS 2012, prove the equivalent Misra-Gries form; Apache DataSketches'
  * frequent-items sketch ships the same shape).
  *
  * Why it exists: the engine's exact vocabulary statistics
  * ([[graft.operators.TextAnalysis.termFrequencies]]) shuffle one row per
  * distinct term — correct, but a web-corpus vocabulary at 100 TB is
  * billions of terms. This aggregate caps the state at `capacity` entries
  * per partial buffer, so the shuffle carries fixed-size sketches from
  * every map task regardless of corpus size, and partial buffers merge
  * associatively in the standard partial/final HashAggregate split.
  *
  * Guarantees (n = rows aggregated, m = capacity):
  *  - each emitted (term, est, err) bounds the true count:
  *    est - err <= true <= est (holds through merges: upper bounds and
  *    slacks both add);
  *  - single-buffer streams: err <= n/m and every term with
  *    true > n/m is present (classic SpaceSaving); the merged-path
  *    completeness is property-tested in TopKSketchSpec rather than
  *    claimed analytically;
  *  - when the number of distinct terms never exceeds m, no eviction
  *    happens anywhere: err = 0, counts are EXACT, merge is plain
  *    addition, and the result is deterministic — that regime is what
  *    the oracle-checked query pins.
  *
  * Output: array<struct<term, est, err>> sorted by est desc, term asc;
  * slice(...) of it is the top-k.
  *
  * Update is O(log m) via a min-heap on est; eviction replaces the
  * minimum root and inherits its count as the newcomer's error, the
  * SpaceSaving stream-summary rule.
  */
case class TopTermsAgg(
    term: Expression,
    capExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopTermsAgg.Sketch] {

  private lazy val cap: Int = capExpr.eval() match {
    case i: Int if i >= 1 => i
    case l: Long if l >= 1 => l.toInt
    // cap = 0 would silently return an EMPTY result for any input
    // (every add takes the eviction branch without growing the map),
    // and a negative cap threw an obscure HashMap initial-capacity
    // error from inside buffer creation
    case i @ (_: Int | _: Long) => throw new IllegalArgumentException(
      s"approx_top_terms capacity must be >= 1, got $i")
    case other => throw new IllegalArgumentException(
      s"capacity must be a foldable integer literal, got $other")
  }

  override def children: Seq[Expression] = Seq(term, capExpr)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): TopTermsAgg.Sketch =
    new TopTermsAgg.Sketch(cap)

  override def update(buf: TopTermsAgg.Sketch, input: InternalRow)
      : TopTermsAgg.Sketch = {
    val t = term.eval(input)
    if (t != null) buf.add(t.asInstanceOf[UTF8String].toString, 1L, 0L)
    buf
  }

  override def merge(buf: TopTermsAgg.Sketch, other: TopTermsAgg.Sketch)
      : TopTermsAgg.Sketch = { buf.mergeFrom(other); buf }

  override def eval(buf: TopTermsAgg.Sketch): Any = {
    val rows = buf.sortedEntries.map { case (t, est, err) =>
      InternalRow(UTF8String.fromString(t), est, err)
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: TopTermsAgg.Sketch): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopTermsAgg.Sketch =
    TopTermsAgg.Sketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): TopTermsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopTermsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopTermsAgg =
    copy(term = c(0), capExpr = c(1))
  override def prettyName: String = "approx_top_terms"
}

object TopTermsAgg {
  /** SpaceSaving summary: capacity-bounded (term, est, err) entries with
    * a min-heap on est (parallel arrays + term->slot map) so eviction is
    * O(log m). est is an upper bound on the true count; err the slack. */
  final class Sketch(val cap: Int) {
    private val terms = new Array[String](math.max(cap, 1))
    private val ests = new Array[Long](math.max(cap, 1))
    private val errs = new Array[Long](math.max(cap, 1))
    private val pos = new java.util.HashMap[String, Integer](cap * 2)
    private var size = 0

    def entryCount: Int = size

    private def swap(i: Int, j: Int): Unit = {
      val tt = terms(i); terms(i) = terms(j); terms(j) = tt
      val te = ests(i); ests(i) = ests(j); ests(j) = te
      val tr = errs(i); errs(i) = errs(j); errs(j) = tr
      pos.put(terms(i), i); pos.put(terms(j), j)
    }
    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0 && ests(i) < ests((i - 1) / 2)) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    }
    private def siftDown(i0: Int): Unit = {
      var i = i0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var m = i
        if (l < size && ests(l) < ests(m)) m = l
        if (r < size && ests(r) < ests(m)) m = r
        if (m == i) done = true else { swap(i, m); i = m }
      }
    }

    /** Fold in `w` occurrences of `t` carrying `e` of slack (update path
      * uses (1, 0); merge reuses this with the other side's entries). */
    def add(t: String, w: Long, e: Long): Unit = {
      val p = pos.get(t)
      if (p != null) {
        ests(p) += w; errs(p) += e; siftDown(p)
      } else if (size < cap) {
        terms(size) = t; ests(size) = w; errs(size) = e
        pos.put(t, size); size += 1; siftUp(size - 1)
      } else {
        // SpaceSaving eviction: the newcomer replaces the minimum root
        // and inherits its est as additional slack — its true count may
        // be anything up to minEst occurrences we never saw
        val minEst = ests(0)
        pos.remove(terms(0))
        terms(0) = t; ests(0) = w + minEst; errs(0) = e + minEst
        pos.put(t, 0)
        siftDown(0)
      }
    }

    /** Union merge: per-entry upper bounds (est) and slacks (err) add;
      * overflow evicts minimum entries exactly like the update path. */
    def mergeFrom(other: Sketch): Unit = {
      var i = 0
      while (i < other.size) {
        add(other.terms(i), other.ests(i), other.errs(i))
        i += 1
      }
    }

    /** (term, est, err), est desc then term asc (deterministic ties). */
    def sortedEntries: Array[(String, Long, Long)] = {
      val out = new Array[(String, Long, Long)](size)
      var i = 0
      while (i < size) { out(i) = (terms(i), ests(i), errs(i)); i += 1 }
      scala.util.Sorting.stableSort(out,
        (a: (String, Long, Long), b: (String, Long, Long)) =>
          a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
      out
    }

    def toBytes: Array[Byte] = {
      val termBytes = new Array[Array[Byte]](size)
      var total = 4 + 4
      var i = 0
      while (i < size) {
        termBytes(i) = terms(i).getBytes(StandardCharsets.UTF_8)
        total += 4 + termBytes(i).length + 16
        i += 1
      }
      val bb = ByteBuffer.allocate(total)
      bb.putInt(cap); bb.putInt(size)
      i = 0
      while (i < size) {
        bb.putInt(termBytes(i).length); bb.put(termBytes(i))
        bb.putLong(ests(i)); bb.putLong(errs(i)); i += 1
      }
      bb.array()
    }
  }

  object Sketch {
    def fromBytes(bytes: Array[Byte]): Sketch = {
      val bb = ByteBuffer.wrap(bytes)
      val cap = bb.getInt; val n = bb.getInt
      val s = new Sketch(cap)
      var i = 0
      while (i < n) {
        val len = bb.getInt
        val tb = new Array[Byte](len); bb.get(tb)
        s.add(new String(tb, StandardCharsets.UTF_8), bb.getLong, bb.getLong)
        i += 1
      }
      s
    }

    /** Canonical serialization: entries sorted (est desc, term asc)
      * before encoding, so EQUAL summaries are EQUAL bytes regardless
      * of the heap order insertion history left behind. In the
      * no-eviction regime (distinct terms ≤ cap in every partial
      * buffer) the summary itself is merge-order-independent — exact
      * counts, err = 0 — so canonical bytes make "incremental fold ==
      * full rebuild" byte-checkable, the same contract the KMV state
      * column pins. Past eviction the CONTENT is inherently
      * order-sensitive (SpaceSaving merge is not idempotent); the
      * bounds est-err ≤ true ≤ est still hold, the bytes just stop
      * being replay-stable. */
    def canonicalBytes(s: Sketch): Array[Byte] = {
      val entries = s.sortedEntries
      val termBytes = entries.map(_._1.getBytes(StandardCharsets.UTF_8))
      val total = 8 + termBytes.map(_.length + 20).sum
      val bb = ByteBuffer.allocate(total)
      bb.putInt(s.cap); bb.putInt(entries.length)
      var i = 0
      while (i < entries.length) {
        bb.putInt(termBytes(i).length); bb.put(termBytes(i))
        bb.putLong(entries(i)._2); bb.putLong(entries(i)._3); i += 1
      }
      bb.array()
    }

    /** Canonical bytes of the EMPTY cap-`cap` sketch — what a direct
      * `top_terms_sketch` emits over zero rows. The MV-rewrite serving
      * path coalesces [[TopTermsUnionAgg]]'s all-NULL NULL onto this so
      * a served aggregate over an empty state slice reads back as an
      * empty entry list, exactly like the direct aggregate. */
    def emptySketchBytes(cap: Int): Array[Byte] =
      canonicalBytes(new Sketch(cap))

    /** Union at min(cap) — the only sound capacity when inputs differ
      * (a wider sketch folded into a narrower one must obey the
      * narrower error budget), mirroring KMV_UNION's min(k). Equal-cap
      * inputs (the MV fold) skip the re-cap. */
    def union(a: Sketch, b: Sketch): Sketch = {
      if (a.cap <= b.cap) { a.mergeFrom(b); a }
      else { val s = new Sketch(b.cap); s.mergeFrom(a); s.mergeFrom(b); s }
    }
  }
}

/** TOP_TERMS_SKETCH(term, capacity) → BINARY: the [[TopTermsAgg]]
  * SpaceSaving summary in canonical serialized form
  * ([[TopTermsAgg.Sketch.canonicalBytes]]) — the STATE-COLUMN spelling
  * for maintained heavy-hitter MVs ([[graft.operators.Materialize]]
  * `topks = col -> cap`), where the per-group sketch must persist,
  * re-merge on refresh ([[TopTermsUnionAgg]]) and read back
  * ([[TopTermsEntries]]). NULL terms skip; a group with only NULL
  * terms yields an EMPTY sketch (not NULL — the state row still
  * exists and must merge). */
case class TopTermsSketchAgg(
    term: Expression,
    capExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopTermsAgg.Sketch] {

  private lazy val cap: Int = capExpr.eval() match {
    case i: Int if i >= 1 => i
    case l: Long if l >= 1 => l.toInt
    case i @ (_: Int | _: Long) => throw new IllegalArgumentException(
      s"top_terms_sketch capacity must be >= 1, got $i")
    case other => throw new IllegalArgumentException(
      s"capacity must be a foldable integer literal, got $other")
  }

  override def children: Seq[Expression] = Seq(term, capExpr)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopTermsAgg.Sketch =
    new TopTermsAgg.Sketch(cap)

  override def update(buf: TopTermsAgg.Sketch, input: InternalRow)
      : TopTermsAgg.Sketch = {
    val t = term.eval(input)
    if (t != null) buf.add(t.asInstanceOf[UTF8String].toString, 1L, 0L)
    buf
  }

  override def merge(buf: TopTermsAgg.Sketch, other: TopTermsAgg.Sketch)
      : TopTermsAgg.Sketch = { buf.mergeFrom(other); buf }

  override def eval(buf: TopTermsAgg.Sketch): Any =
    TopTermsAgg.Sketch.canonicalBytes(buf)

  override def serialize(buf: TopTermsAgg.Sketch): Array[Byte] =
    buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopTermsAgg.Sketch =
    TopTermsAgg.Sketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): TopTermsSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopTermsSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopTermsSketchAgg =
    copy(term = c(0), capExpr = c(1))
  override def prettyName: String = "top_terms_sketch"
}

/** TOP_TERMS_UNION_AGG(sketch) → BINARY: merges serialized SpaceSaving
  * sketches across rows — the MV-fold / coarser-rollup path (state
  * sketch ⊕ delta sketch per group). NULL inputs skip; all-NULL →
  * NULL. Upper bounds (est) and slacks (err) ADD through the merge, so
  * the bound est-err ≤ true ≤ est survives any merge tree; in the
  * no-eviction regime counts stay exact and the canonical output is
  * byte-identical to a single-pass rebuild. Mixed-cap inputs merge at
  * min(cap) ([[TopTermsAgg.Sketch.union]]). */
case class TopTermsUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopTermsUnionAgg.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KmvSketchOps.requireBinary(children, prettyName)

  override def createAggregationBuffer(): TopTermsUnionAgg.Buf =
    new TopTermsUnionAgg.Buf(null)

  override def update(buf: TopTermsUnionAgg.Buf, input: InternalRow)
      : TopTermsUnionAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val in = TopTermsAgg.Sketch.fromBytes(v.asInstanceOf[Array[Byte]])
      buf.cur = if (buf.cur == null) in
        else TopTermsAgg.Sketch.union(buf.cur, in)
    }
    buf
  }

  override def merge(buf: TopTermsUnionAgg.Buf, other: TopTermsUnionAgg.Buf)
      : TopTermsUnionAgg.Buf = {
    if (other.cur != null)
      buf.cur = if (buf.cur == null) other.cur
        else TopTermsAgg.Sketch.union(buf.cur, other.cur)
    buf
  }

  override def eval(buf: TopTermsUnionAgg.Buf): Any =
    if (buf.cur == null) null
    else TopTermsAgg.Sketch.canonicalBytes(buf.cur)

  override def serialize(buf: TopTermsUnionAgg.Buf): Array[Byte] =
    if (buf.cur == null) Array.emptyByteArray
    else TopTermsAgg.Sketch.canonicalBytes(buf.cur)
  override def deserialize(bytes: Array[Byte]): TopTermsUnionAgg.Buf =
    if (bytes.isEmpty) new TopTermsUnionAgg.Buf(null)
    else new TopTermsUnionAgg.Buf(TopTermsAgg.Sketch.fromBytes(bytes))

  override def withNewMutableAggBufferOffset(o: Int): TopTermsUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopTermsUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): TopTermsUnionAgg = copy(child = cs.head)
  override def prettyName: String = "top_terms_union_agg"
}

object TopTermsUnionAgg {
  /** Mutable holder: null until the first non-null input. */
  final class Buf(var cur: TopTermsAgg.Sketch)
}

/** TOP_TERMS_ENTRIES(sketch) → array<struct<term,est,err>> sorted est
  * desc, term asc — the read side of the binary SpaceSaving state
  * column ([[TopTermsSketchAgg]]); `slice(..., 1, k)` of it is the
  * top-k. */
case class TopTermsEntries(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KmvSketchOps.requireBinary(children, prettyName)
  override def nullSafeEval(v: Any): Any = {
    val s = TopTermsAgg.Sketch.fromBytes(v.asInstanceOf[Array[Byte]])
    val rows = s.sortedEntries.map { case (t, est, err) =>
      InternalRow(UTF8String.fromString(t), est, err)
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }
  override protected def withNewChildInternal(c: Expression)
      : TopTermsEntries = copy(child = c)
  override def prettyName: String = "top_terms_entries"
}
