package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels for the shingle/minhash expressions — same pattern as
  * [[JsonOps]]/[[BsonOps]]: whole-stage codegen emits direct calls, the
  * interpreted path shares the identical implementation. The permutation
  * seed arrays are plain `long[]` reference objects (serializable, shipped
  * per-task by the codegen framework). */
object ShingleOps {
  private val P = 2147483647L

  def minhash(arr: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData = {
    val numHashes = as.length
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        // xxHash64 with the same seed Spark's xxhash64() uses (42)
        val raw = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        val h = java.lang.Math.floorMod(raw, P)
        var k = 0
        while (k < numHashes) {
          val p = (as(k) * h + bs(k)) % P
          if (p < mins(k)) mins(k) = p
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def shingles(words: ArrayData, n: Int): ArrayData = {
    val nw = words.numElements()
    if (n > 1 && nw < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    if (n <= 1) {
      var i = 0
      while (i < nw) { seen.add(words.getUTF8String(i)); i += 1 }
    } else {
      val sep = UTF8String.fromString(" ")
      var i = 0
      while (i <= nw - n) {
        // concat_ws semantics: null parts are skipped, never propagated
        var s: UTF8String = null
        var j = 0
        while (j < n) {
          val w = words.getUTF8String(i + j)
          if (w != null) s = if (s == null) w else UTF8String.concat(s, sep, w)
          j += 1
        }
        seen.add(if (s == null) UTF8String.EMPTY_UTF8 else s)
        i += 1
      }
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}

/** MinHash signature as ONE fused expression: for an array<string> of
  * shingles, computes all `numHashes` permutation minima in a single tight
  * loop (hash each shingle once, update every permutation's running min).
  *
  * The composed-builtins version (numHashes × array_min(transform(...)))
  * allocates numHashes intermediate arrays per row and re-hashes each
  * shingle per permutation — this expression is O(|shingles| × numHashes)
  * arithmetic with zero allocation beyond the output. Permutations are
  * (a·h + b) mod P universal hashes, P = 2^31−1, h = xxHash64(shingle)
  * mod P, seeds fixed per `seedTag` so plans are deterministic.
  */
case class MinHashSignature(child: Expression, numHashes: Int,
    seedTag: Long = 0x5EED5EEDL)
    extends UnaryExpression {

  // deterministic seeds; must stay in sync with Dedup.seeds for tests
  @transient private lazy val ab: (Array[Long], Array[Long]) = {
    val rng = new java.util.Random(seedTag)
    val as = new Array[Long](numHashes)
    val bs = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      as(i) = 1L + rng.nextInt(Int.MaxValue - 1)
      bs(i) = rng.nextInt(Int.MaxValue).toLong
      i += 1
    }
    (as, bs)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    ShingleOps.minhash(v.asInstanceOf[ArrayData], ab._1, ab._2)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val as = ctx.addReferenceObj("minhashA", ab._1, "long[]")
    val bs = ctx.addReferenceObj("minhashB", ab._2, "long[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ShingleOps.minhash($c, $as, $bs);""")
  }

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
  override def prettyName: String = "minhash_signature"
}

/** Word n-gram shingles as ONE fused expression over a word array.
  *
  * Output is identical to the composed form
  * `array_distinct(transform(sequence(...), concat_ws(" ", w[i..i+n-1])))`
  * (first-occurrence order, empty array when fewer than n words) — but the
  * composed form is a stack of interpreted higher-order lambdas evaluated
  * per ELEMENT, which dominates the whole LSH pipeline. This is a single
  * tight loop per row.
  *
  * DELIBERATELY CodegenFallback — the fallback is a measured fusion
  * BARRIER, not a shortcut. With a doGenCode (same static-kernel call as
  * [[MinHashSignature]]), whole-stage codegen inlines this kernel into the
  * fused downstream stages of the LSH pipelines (stack traces show it
  * re-evaluated inside generated hashAgg consume chains), and measured
  * kernel invocations on q_dedup_minhash sf0.01 DOUBLE (3500 → 7352),
  * taking q_dedup_minhash/q_dedup_incremental_lsh from 2.5/2.9 s to
  * 5.6/5.9 s at sf0.1. As a fallback, the expression pins a stage
  * boundary: shingle arrays are materialized once per document and only
  * the cheap downstream expressions re-run per use. At 100 TB the
  * shingle kernel runs exactly N-docs times either way only under this
  * form. Do not "fix" this to codegen without re-measuring both queries.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  // n<=1 passes input elements through distinct, which may include null
  // (matching array_distinct); n>1 joins with concat_ws semantics (null
  // words skipped), so shingles themselves are never null
  override def dataType: DataType =
    ArrayType(StringType, containsNull = n <= 1)

  override def nullSafeEval(v: Any): Any =
    ShingleOps.shingles(v.asInstanceOf[ArrayData], n)

  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
  override def prettyName: String = "word_shingles"
}
