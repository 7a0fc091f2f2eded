package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multi-phrase substring matching via Aho-Corasick (Aho & Corasick
  * 1975): the blocklist/bad-words filter of C4/CCNet-style curation.
  * The naive form is |phrases| separate `contains` scans over every
  * document — at thousands of phrases that multiplies the corpus scan
  * cost by the list size; the automaton finds ALL matches in ONE pass
  * regardless of how many phrases are loaded.
  *
  * The automaton builds once at plan time from the literal phrase list
  * and ships to executors as a reference object (like the BPE merge
  * table); matching is scan-local, no shuffle, whole-stage codegen.
  * Semantics are plain SUBSTRING containment on the raw characters
  * (callers lowercase/normalize upstream if wanted), so the result
  * equals filtering the phrase list with `contains(text, p)` — which
  * is exactly the SQL oracle form.
  */
object PhraseMatch {

  /** Aho-Corasick automaton over Java chars (UTF-16 code units —
    * substring containment is unaffected by where code-point
    * boundaries fall, since a match is a contiguous unit run). */
  final class Automaton(phrases: Array[String]) extends Serializable {
    val n: Int = phrases.length
    // dense trie in parallel arrays; children as per-node HashMap
    // (phrase alphabets are tiny vs Char range)
    private val children =
      new java.util.ArrayList[java.util.HashMap[Character, Integer]]()
    private val out = new java.util.ArrayList[java.util.ArrayList[Integer]]()
    private var fail: Array[Int] = _

    private def newNode(): Int = {
      children.add(new java.util.HashMap[Character, Integer]())
      out.add(new java.util.ArrayList[Integer]())
      children.size() - 1
    }

    {
      newNode() // root = 0
      var p = 0
      while (p < n) {
        val s = phrases(p)
        require(s.nonEmpty, "phrase_matches: empty phrase")
        var node = 0
        var i = 0
        while (i < s.length) {
          val c = s.charAt(i)
          var next = children.get(node).get(c)
          if (next == null) { next = newNode(); children.get(node).put(c, next) }
          node = next
          i += 1
        }
        out.get(node).add(p)
        p += 1
      }
      // BFS failure links; merge output sets along fail chains
      fail = new Array[Int](children.size())
      val queue = new java.util.ArrayDeque[Integer]()
      children.get(0).forEach((_, v) => { fail(v) = 0; queue.add(v) })
      while (!queue.isEmpty) {
        val u = queue.poll()
        children.get(u).forEach { (c, v) =>
          var f = fail(u)
          while (f != 0 && !children.get(f).containsKey(c)) f = fail(f)
          val fc = children.get(f).get(c)
          fail(v) = if (fc != null && fc != v) fc else 0
          out.get(v).addAll(out.get(fail(v)))
          queue.add(v)
        }
      }
    }

    /** Distinct matched phrase indexes of `text`, ascending (= the
      * phrase-list order the SQL `list_filter` oracle preserves). */
    def matches(text: String): Array[Int] = {
      val hit = new Array[Boolean](n)
      var found = 0
      var node = 0
      var i = 0
      while (i < text.length && found < n) {
        val c = text.charAt(i)
        while (node != 0 && !children.get(node).containsKey(c)) node = fail(node)
        val next = children.get(node).get(c)
        node = if (next != null) next else 0
        val o = out.get(node)
        var j = 0
        while (j < o.size()) {
          val p = o.get(j)
          if (!hit(p)) { hit(p) = true; found += 1 }
          j += 1
        }
        i += 1
      }
      val res = new Array[Int](found)
      var k = 0
      var p = 0
      while (p < n) {
        if (hit(p)) { res(k) = p; k += 1 }
        p += 1
      }
      res
    }
  }
}

/** PHRASE_MATCHES(string text, array<string> phrases) → array<string>:
  * the phrases occurring in `text` as substrings, in phrase-list
  * order. `phrases` must be a literal; one automaton pass per row.
  * See [[PhraseMatch]]. */
case class PhraseMatches(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        if (!right.foldable) TypeCheckFailure(
          "phrase_matches phrases must be a literal (foldable) array")
        else PhraseMatches.checkNoNulls(right, "phrase_matches phrases")
      case (l, r) => TypeCheckFailure("phrase_matches requires " +
        s"(STRING, ARRAY<STRING>), got (${l.catalogString}, " +
        r.catalogString + ")")
    }
  }

  @transient private lazy val phrases: Array[UTF8String] = {
    val arr = right.eval().asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements())(arr.getUTF8String)
  }
  @transient private lazy val automaton: PhraseMatch.Automaton =
    new PhraseMatch.Automaton(phrases.map(_.toString))

  def matchArray(text: UTF8String): ArrayData = {
    val idx = automaton.matches(text.toString)
    val res = new Array[AnyRef](idx.length)
    var i = 0
    while (i < idx.length) { res(i) = phrases(idx(i)); i += 1 }
    new GenericArrayData(res)
  }

  override def nullSafeEval(t: Any, p: Any): Any =
    matchArray(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("phraseMatcher", this,
      classOf[PhraseMatches].getName)
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = $self.matchArray($t);")
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PhraseMatches = copy(left = l, right = r)
  override def prettyName: String = "phrase_matches"
}

object PhraseMatches {
  /** Analysis-time guard shared with [[BpeTokens]]: the list argument is
    * foldable, so a NULL array or NULL element can be rejected HERE with
    * a typed error instead of surfacing as an opaque NPE from the lazy
    * automaton/table build on the first row of a running job. */
  private[functions] def checkNoNulls(e: Expression, what: String)
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    val arr = e.eval()
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (arr == null) return TypeCheckFailure(s"$what must not be NULL")
    var i = 0
    while (i < arr.numElements()) {
      if (arr.isNullAt(i))
        return TypeCheckFailure(s"$what must not contain NULL (element $i)")
      i += 1
    }
    TypeCheckSuccess
  }
}
