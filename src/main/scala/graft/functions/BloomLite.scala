package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Bloom-filter kernel over 64-bit keys: BLOOM_BUILD (aggregate → binary
  * filter) and BLOOM_CONTAINS (scalar probe).
  *
  * The engine's use is the broadcast-prefilter pattern
  * ([[graft.operators.Membership]]): build a compact filter over a small
  * key set once, broadcast the single binary value, and drop non-members
  * scan-locally BEFORE any shuffle join — at corpus scale the filter
  * kills the vast majority of rows for the price of two hashes, and the
  * (tiny) surviving set pays the exact join. The same composition backs
  * Phoenix-style point-lookup pruning and Spark's own runtime row-level
  * filtering; this version makes it an explicit, reusable operator.
  *
  * Keys are 64-bit (callers hash arbitrary columns with xxhash64, which
  * is codegen'd). Bit positions use Kirsch–Mitzenmacher double hashing:
  * two XXH64 seeds give h1, h2 and bit_i = (h1 + i·h2) mod numBits — the
  * standard construction with the standard false-positive bound
  * (1 - e^(-kn/m))^k; no false negatives ever. The filter serializes as
  * [numHashes:int][numWords:int][words:long...] — the probe reads its
  * parameters from the header, so build and probe cannot disagree.
  *
  * Merge is bitwise OR: associative, commutative, layout-independent —
  * the filter bytes are identical for any partitioning of the build side.
  */
object BloomLite {
  val Seed1 = 0xB100F17EL
  val Seed2 = 0x5EEDBEEFL

  def wordCount(numBits: Int): Int = {
    // upper bound too: numBits + 63 overflows Int past 2^31-64 and a
    // negative word count became a NegativeArraySizeException mid-job
    require(numBits >= 64 && numBits <= Int.MaxValue - 63,
      s"numBits must be in [64, ${Int.MaxValue - 63}], got $numBits")
    (numBits + 63) / 64
  }

  /** Static forwarder target for both interpreted and generated code. */
  def contains(filter: Array[Byte], key: Long): Boolean = {
    val bb = ByteBuffer.wrap(filter)
    val k = bb.getInt(0)
    val numWords = bb.getInt(4)
    val numBits = numWords.toLong * 64
    val h1 = XXH64.hashLong(key, Seed1)
    val h2 = XXH64.hashLong(key, Seed2)
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits)
      val word = bb.getLong(8 + 8 * (bit >>> 6).toInt)
      if ((word & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def set(words: Array[Long], numHashes: Int, key: Long): Unit = {
    val numBits = words.length.toLong * 64
    val h1 = XXH64.hashLong(key, Seed1)
    val h2 = XXH64.hashLong(key, Seed2)
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits)
      words((bit >>> 6).toInt) |= 1L << (bit & 63)
      i += 1
    }
  }

  def toBytes(words: Array[Long], numHashes: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * words.length)
    bb.putInt(numHashes); bb.putInt(words.length)
    var i = 0
    while (i < words.length) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): (Array[Long], Int) = {
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val words = new Array[Long](bb.getInt)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong; i += 1 }
    (words, k)
  }
}

/** BLOOM_BUILD(key, numBits, numHashes) → binary Bloom filter over the
  * aggregated 64-bit keys. Partial buffers are fixed-size bitsets that
  * merge by OR, so the shuffle carries one numBits-bit summary per map
  * task regardless of row count. */
case class BloomBuildAgg(
    key: Expression,
    numBitsExpr: Expression,
    numHashesExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private def foldableInt(e: Expression, what: String): Int = e.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be a foldable integer literal, got $other")
  }
  private lazy val numWords = BloomLite.wordCount(
    foldableInt(numBitsExpr, "numBits"))
  private lazy val numHashes = {
    val k = foldableInt(numHashesExpr, "numHashes")
    require(k >= 1 && k <= 16, s"numHashes must be in [1,16], got $k")
    k
  }

  override def children: Seq[Expression] = Seq(key, numBitsExpr, numHashesExpr)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  // reject non-BIGINT keys at ANALYSIS time: update()'s asInstanceOf
  // would otherwise ClassCastException mid-job, and the probe side
  // (BloomContainsExpr) already rejects non-LongType — build and probe
  // must agree
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (key.dataType != LongType)
      TypeCheckFailure(s"bloom_build requires a BIGINT key (hash the " +
        s"column with xxhash64 first), got ${key.dataType.catalogString}")
    else TypeCheckSuccess
  }

  override def createAggregationBuffer(): Array[Long] = {
    numHashes // validate eagerly
    new Array[Long](numWords)
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = key.eval(input)
    if (v != null) BloomLite.set(buf, numHashes, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    BloomLite.toBytes(buf, numHashes)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomLite.toBytes(buf, numHashes)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomLite.fromBytes(bytes)._1

  override def withNewMutableAggBufferOffset(o: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): BloomBuildAgg =
    copy(key = c(0), numBitsExpr = c(1), numHashesExpr = c(2))
  override def prettyName: String = "bloom_build"
}

/** BLOOM_CONTAINS(filter, key) — true iff the key MAY be in the set the
  * filter was built over (no false negatives). Codegen'd via the static
  * forwarder so the probe stays inside whole-stage codegen. */
case class BloomContainsExpr(filter: Expression, keyExpr: Expression)
  extends BinaryExpression {

  override def left: Expression = filter
  override def right: Expression = keyExpr
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (filter.dataType != BinaryType)
      TypeCheckFailure(s"filter must be BINARY, got ${filter.dataType}")
    else if (keyExpr.dataType != LongType)
      TypeCheckFailure(
        s"key must be BIGINT (hash with xxhash64), got ${keyExpr.dataType}")
    else TypeCheckSuccess
  }
  override def dataType: DataType = BooleanType

  override def nullSafeEval(f: Any, k: Any): Any =
    BloomLite.contains(f.asInstanceOf[Array[Byte]], k.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (f, k) =>
      s"${ev.value} = graft.functions.BloomLite.contains($f, $k);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BloomContainsExpr =
    copy(filter = l, keyExpr = r)
  override def prettyName: String = "bloom_contains"
}
