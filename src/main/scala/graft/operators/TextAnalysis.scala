package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text analysis for training-data pipelines: quality scoring, language
  * identification, token counting, fingerprinting. Pure column
  * expressions — each metric is a scan-local computation (no shuffle). */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(split(trim(text), "\\s+"))

  /** BPE-ish subword count estimate: words + digit runs + punctuation
    * marks counted separately (a cheap proxy for tokenizer token counts). */
  def subwordCountEstimate(text: Column): Column =
    size(split(trim(text), "\\s+")) +
      length(regexp_replace(text, "[^0-9.,;:!?]", "")).cast(IntegerType)

  private val stop = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pour", "dans", "une"),
    "es" -> Seq("el", "la", "los", "que", "y", "es", "para", "con"))

  /** Count of tokens that appear in a fixed stopword list. */
  def stopwordHits(words: Column, lang: String): Column =
    size(filter(words, w => w.isin(stop(lang).map(lit): _*)))

  /** Quality metrics: token count, mean word length, stopword ratio,
    * non-alphanumeric ratio, digit ratio — the usual cheap filters for
    * corpus curation. */
  def qualityMetrics(df: DataFrame, textCol: String): DataFrame = {
    val words = split(lower(trim(col(textCol))), "\\s+")
    df.withColumn("n_tok", size(words))
      .withColumn("mean_wlen",
        (length(regexp_replace(col(textCol), "\\s+", "")).cast(DoubleType) /
          size(words)))
      .withColumn("stopword_ratio",
        stopwordHits(words, "en").cast(DoubleType) / size(words))
      .withColumn("symbol_ratio",
        length(regexp_replace(lower(col(textCol)), "[a-z0-9\\s]", ""))
          .cast(DoubleType) / length(col(textCol)))
      .withColumn("digit_ratio",
        length(regexp_replace(col(textCol), "[^0-9]", ""))
          .cast(DoubleType) / length(col(textCol)))
  }

  /** Stopword-heuristic language ID: score each language by stopword hits,
    * pick the argmax with deterministic tie-break order en>de>fr>es;
    * 'und' when nothing matches. */
  def langId(text: Column): Column = {
    val words = split(lower(text), "\\s+")
    val en = stopwordHits(words, "en")
    val de = stopwordHits(words, "de")
    val fr = stopwordHits(words, "fr")
    val es = stopwordHits(words, "es")
    val mx = greatest(en, de, fr, es)
    when(mx === 0, "und")
      .when(en === mx, "en").when(de === mx, "de")
      .when(fr === mx, "fr").otherwise("es")
  }

  /** Document fingerprint: digest of normalized text (see Dedup). */
  def fingerprint(text: Column): Column = Dedup.fingerprint(text)
}
