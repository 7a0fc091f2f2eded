package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding subword tokenizer, apply side (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword
  * Units"). Training ([[graft.operators.Tokenize.bpeTrain]]) produces
  * an ordered merge list; encoding a word replays the merges by rank:
  * start from the word's code points and repeatedly fuse the
  * lowest-ranked adjacent pair until none applies — exactly the
  * GPT-2-style greedy loop, so token counts are the ones a real
  * pretraining pipeline would pack against (the regex estimate in
  * `TextAnalysis.subwordCountEstimate` stays as the zero-setup
  * heuristic).
  *
  * The merge table rides to executors once per plan as a reference
  * object (NOT re-parsed per row); per-word results are memoized in a
  * bounded PER-TABLE cache — corpus word frequencies are Zipf, so the
  * hot words hit the cache almost always.
  */
object BpeMath {

  /** Parsed merge table: pair "a b" → rank (lower merges first).
    * SPACE is the one safe separator: symbols come from \s+-split
    * words, so they can never contain a space — but crawled text CAN
    * contain literal NULs, which would make a NUL separator ambiguous
    * (("a\u0000","b") and ("a","\u0000b") would share a key). */
  final class Table(val ranks: java.util.HashMap[String, Integer])
      extends Serializable {
    // per-TABLE memo of word → encoded pieces (bounded; cleared
    // wholesale when full). Owning the cache makes cross-plan
    // collisions structurally impossible — a shared static map keyed
    // by any table-identity scheme (counter, hash) could hand plan B
    // results cached for plan A's different merges when both run in
    // one executor JVM. Transient + null-checked rebuild (NOT a
    // @transient lazy val: its initialized-bitmap serializes, which
    // would leave the field null-but-"initialized" after
    // deserialization if it was forced on the driver).
    @transient private var memoRef:
      java.util.concurrent.ConcurrentHashMap[String, Array[String]] = _
    def memo: java.util.concurrent.ConcurrentHashMap[String, Array[String]] = {
      var m = memoRef
      if (m == null) synchronized {
        if (memoRef == null)
          memoRef =
            new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
        m = memoRef
      }
      m
    }
  }
  object Table {
    /** merges as "left right" strings in rank order (symbols are
      * \s+-split words, so they never contain a space themselves). */
    def apply(merges: Array[String]): Table = {
      val m = new java.util.HashMap[String, Integer]()
      var i = 0
      while (i < merges.length) {
        val s = merges(i)
        val sp = s.indexOf(' ')
        require(sp > 0 && sp < s.length - 1, s"bad merge entry '$s'")
        m.put(s.substring(0, sp) + ' ' + s.substring(sp + 1), i)
        i += 1
      }
      new Table(m)
    }
  }

  private val MemoCap = 1 << 16

  private def encodeWord(word: String, t: Table): Array[String] = {
    // split to code points
    var n = word.codePointCount(0, word.length)
    if (n <= 1) return Array(word)
    var syms = new Array[String](n)
    var i = 0
    var k = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val c = Character.charCount(cp)
      syms(k) = word.substring(i, i + c)
      k += 1
      i += c
    }
    // greedy: fuse the lowest-ranked adjacent pair until none applies
    var done = false
    while (!done && n > 1) {
      var bestRank = Integer.MAX_VALUE
      var bestAt = -1
      i = 0
      while (i < n - 1) {
        val r = t.ranks.get(syms(i) + ' ' + syms(i + 1))
        if (r != null && r < bestRank) { bestRank = r; bestAt = i }
        i += 1
      }
      if (bestAt < 0) done = true
      else {
        // fuse EVERY occurrence of the best pair left-to-right (one
        // table scan per rank, the standard apply loop)
        val a = syms(bestAt)
        val b = syms(bestAt + 1)
        val out = new Array[String](n)
        var w = 0
        i = 0
        while (i < n) {
          if (i < n - 1 && syms(i) == a && syms(i + 1) == b) {
            out(w) = a + b; w += 1; i += 2
          } else { out(w) = syms(i); w += 1; i += 1 }
        }
        syms = out
        n = w
      }
    }
    java.util.Arrays.copyOf(syms, n)
  }

  /** Encode a word array to the flattened subword token array. */
  def encode(words: ArrayData, t: Table): ArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    val nw = words.numElements()
    var i = 0
    while (i < nw) {
      val w = words.getUTF8String(i).toString
      if (w.nonEmpty) {
        val memo = t.memo
        var pieces = memo.get(w)
        if (pieces == null) {
          pieces = encodeWord(w, t)
          if (memo.size() >= MemoCap) memo.clear()
          memo.put(w, pieces)
        }
        var j = 0
        while (j < pieces.length) {
          out.add(UTF8String.fromString(pieces(j)))
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** BPE_TOKENS(array<string> words, array<string> merges) → array<string>
  * subword tokens (empty words dropped). `merges` must be a literal —
  * the table is parsed once at plan time and shipped as a reference
  * object, never per row. See [[BpeMath]]. */
case class BpeTokens(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        if (!right.foldable) TypeCheckFailure(
          "bpe_tokens merges must be a literal (foldable) array")
        else PhraseMatches.checkNoNulls(right, "bpe_tokens merges")
      case (l, r) => TypeCheckFailure("bpe_tokens requires " +
        s"(ARRAY<STRING>, ARRAY<STRING>), got (${l.catalogString}, " +
        r.catalogString + ")")
    }
  }

  @transient private lazy val table: BpeMath.Table = {
    val arr = right.eval().asInstanceOf[ArrayData]
    val merges = new Array[String](arr.numElements())
    var i = 0
    while (i < merges.length) {
      merges(i) = arr.getUTF8String(i).toString
      i += 1
    }
    BpeMath.Table(merges)
  }

  override def nullSafeEval(w: Any, m: Any): Any =
    BpeMath.encode(w.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeMath.Table].getName)
    nullSafeCodeGen(ctx, ev, (w, _) =>
      s"${ev.value} = graft.functions.BpeMath.encode($w, $tbl);")
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BpeTokens = copy(left = l, right = r)
  override def prettyName: String = "bpe_tokens"
}
