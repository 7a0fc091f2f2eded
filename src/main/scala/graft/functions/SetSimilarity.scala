package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused pair-similarity kernels for the LSH verify stage.
  *
  * The composed-builtins forms (aggregate(zip_with(...)) for signature
  * agreement, array_intersect for exact Jaccard) are higher-order
  * expressions that Spark evaluates INTERPRETED (CodegenFallback) — at
  * ~200k candidate pairs per LSH block that per-row overhead dominates the
  * whole dedup pipeline. These are single static-call kernels that stay
  * inside whole-stage codegen.
  */
object SetSimilarity {

  /** Count of positions where two long arrays agree (minhash signature
    * agreement; the Jaccard estimator is agreement/numHashes). */
  def agreement(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0; var c = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  /** Exact Jaccard similarity of two string arrays treated as sets (inputs
    * are already distinct shingle sets). */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    // probe the smaller side's hash set with the larger side
    val (small, ns, large, nl) = if (na <= nb) (a, na, b, nb) else (b, nb, a, na)
    val set = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](
      ns * 2)
    var i = 0
    while (i < ns) { set.add(small.getUTF8String(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < nl) {
      if (set.contains(large.getUTF8String(i))) inter += 1
      i += 1
    }
    inter.toDouble / (na + nb - inter)
  }

  /** Count of elements contained in a fixed set (stopword hits). */
  def countIn(a: ArrayData,
      set: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]): Int = {
    val n = a.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (set.contains(a.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  /** Longest element length in characters (UTF8String.numChars, matching
    * the length() builtin); 0 for an empty array. Null elements are
    * skipped — length(NULL) is NULL, which can never be the max. */
  def maxStrLen(a: ArrayData): Int = {
    val n = a.numElements()
    var mx = 0
    var i = 0
    while (i < n) {
      val s = a.getUTF8String(i)
      if (s != null) {
        val len = s.numChars()
        if (len > mx) mx = len
      }
      i += 1
    }
    mx
  }
}

/** MAX_STRLEN(array<string>) → int: longest element's length (0 when
  * empty). Fused form of the ANY/ALL length-predicate folds — exists(ws,
  * length(w) > k) ⇔ max_strlen(ws) > k and forall(ws, length(w) <= k) ⇔
  * max_strlen(ws) <= k, without the interpreted per-element lambda
  * dispatch of exists/forall.
  *
  * CONTRACT: assumes containsNull = false (split()/tokenizer outputs,
  * which is every engine call site). On arrays WITH null elements the
  * equivalence above diverges from HOF three-valued logic in one corner:
  * when no non-null element satisfies the predicate, exists yields NULL
  * (unknown because of the nulls) while max_strlen's comparison yields
  * false. Returning NULL whenever nulls are present would diverge on the
  * opposite (and more common) corner — exists = TRUE with a long element
  * alongside a null — so the fused kernel keeps skip-null max semantics
  * and documents the assumption instead. */
case class MaxStrLen(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any): Any =
    SetSimilarity.maxStrLen(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.SetSimilarity.maxStrLen($a)")
  override protected def withNewChildInternal(c: Expression): MaxStrLen =
    copy(child = c)
  override def prettyName: String = "max_strlen"
}

/** STOPWORD_HITS(array<string>; fixed word list) → int: how many elements
  * are in the list. Fused form of size(filter(ws, isin(...))) — the HOF
  * runs interpreted with an O(list) isin per element; this is one hash
  * probe per element inside whole-stage codegen. */
case class StopwordHits(child: Expression, words: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType

  @transient private lazy val set = {
    val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](
      words.size * 2)
    words.foreach(w =>
      s.add(org.apache.spark.unsafe.types.UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(a: Any): Any =
    SetSimilarity.countIn(a.asInstanceOf[ArrayData], set)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopwords", set, "java.util.HashSet")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.SetSimilarity.countIn($a, $setRef)")
  }
  override protected def withNewChildInternal(c: Expression): StopwordHits =
    copy(child = c)
  override def prettyName: String = "stopword_hits"
}

/** SIG_AGREEMENT(array<long>, array<long>) → int. */
case class SigAgreement(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    SetSimilarity.agreement(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SetSimilarity.agreement($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SigAgreement = copy(left = l, right = r)
  override def prettyName: String = "sig_agreement"
}

/** JACCARD_SIM(array<string>, array<string>) → double. */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    SetSimilarity.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SetSimilarity.jaccard($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): JaccardSim = copy(left = l, right = r)
  override def prettyName: String = "jaccard_sim"
}
