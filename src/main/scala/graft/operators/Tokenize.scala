package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** BPE subword tokenization (Sennrich et al. 2016): train a merge
  * list on the corpus, then tokenize / count tokens per document with
  * the codegen'd [[graft.functions.BpeTokens]] kernel.
  *
  * Scale shape: training reduces the corpus to a WORD HISTOGRAM first
  * (one map-combinable groupBy — the shuffle carries distinct words,
  * not text), caps it at the `maxVocabWords` most frequent words
  * (deterministic tie-break), and runs the merge loop on the driver
  * over that bounded table — same bounded-driver-training pattern as
  * the IVF/PQ codebooks ([[Similarity]]); rare tail words beyond the
  * cap shift pair counts negligibly since counts are
  * frequency-weighted. Encoding is a pure scan: the merge table ships
  * once as a reference object, each doc tokenizes locally, nothing
  * shuffles.
  */
object Tokenize {

  /** Train `numMerges` BPE merges over the word histogram of
    * `df.textCol`. Pair RE-COUNTING is incremental — an inverted
    * pair→words index touches only the words a merge changed — but
    * best-pair SELECTION is still a linear scan of the live pair map
    * each round (O(#pairs); bounded by the vocab cap and fine at the
    * default 65k words; a rank-ordered heap is the upgrade path if
    * numMerges grows into the tens of thousands). Deterministic: ties
    * in pair frequency break lexicographically; the histogram cap
    * breaks (count desc, word asc). Stops early when no pair occurs
    * twice. */
  def bpeTrain(df: DataFrame, textCol: String, numMerges: Int,
      maxVocabWords: Int = 65536): Seq[String] = {
    graft.functions.GraftFunctions.registerKernels(df.sparkSession)
    val hist = df
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxVocabWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    // symbol sequences per word (code points)
    val words = hist.map { case (w, c) =>
      val syms = mutable.ArrayBuffer[String]()
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        val n = Character.charCount(cp)
        syms += w.substring(i, i + n)
        i += n
      }
      (syms, c)
    }

    // pair -> total frequency, and pair -> word indexes containing it
    val pairFreq = mutable.HashMap[(String, String), Long]()
    val pairWords = mutable.HashMap[(String, String),
      mutable.HashSet[Int]]()
    def addWord(idx: Int, sign: Long): Unit = {
      val (syms, c) = words(idx)
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        val f = pairFreq.getOrElse(p, 0L) + sign * c
        if (f == 0L) pairFreq.remove(p) else pairFreq(p) = f
        if (sign > 0)
          pairWords.getOrElseUpdate(p, mutable.HashSet[Int]()) += idx
        else
          // prune the index on retraction: the re-add pass restores it
          // for pairs the word STILL contains, so without this the sets
          // accumulate stale word indexes and every later round that
          // picks such a pair re-processes words it no longer touches —
          // per-round cost creeping toward O(vocab) on merge-heavy
          // corpora instead of the claimed O(words containing the pair)
          pairWords.get(p).foreach { s =>
            s -= idx; if (s.isEmpty) pairWords.remove(p)
          }
        i += 1
      }
    }
    words.indices.foreach(addWord(_, 1L))

    val merges = mutable.ArrayBuffer[String]()
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      // most frequent pair; lexicographic tie-break for determinism
      var best: (String, String) = null
      var bestF = 1L // require freq >= 2
      for ((p, f) <- pairFreq) {
        if (f > bestF || (f == bestF && best != null &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestF = f
        }
      }
      if (best == null) exhausted = true
      else {
        merges += s"${best._1} ${best._2}"
        val affected = pairWords.getOrElse(best, mutable.HashSet[Int]())
          .toArray.sorted
        affected.foreach { idx =>
          addWord(idx, -1L) // retract the word's old pair counts
          val (syms, _) = words(idx)
          var i = 0
          while (i < syms.length - 1) {
            if (syms(i) == best._1 && syms(i + 1) == best._2) {
              syms(i) = best._1 + best._2
              syms.remove(i + 1)
            } else i += 1
          }
          addWord(idx, 1L) // re-add with the fused symbol
        }
        pairWords.remove(best)
        pairFreq.remove(best)
      }
      round += 1
    }
    merges.toSeq
  }

  /** Subword tokens of `textCol` under `merges` (flattened across the
    * doc's words). */
  def bpeTokens(text: Column, merges: Seq[String]): Column =
    call_function("bpe_tokens",
      split(lower(trim(text)), "\\s+"), typedlit(merges))

  /** BPE token count per document — the packing-budget input
    * ([[Curation.packSequences]]). */
  def bpeCount(text: Column, merges: Seq[String]): Column =
    size(bpeTokens(text, merges))
}
