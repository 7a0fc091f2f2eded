package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-curation operators beyond dedup/quality: repetition metrics,
  * benchmark-contamination detection, deterministic dataset splitting and
  * stratified mixing, and fixed-window sequence packing.
  *
  * Everything is declarative DataFrame transforms. The one global
  * operation (sequence packing needs a corpus-wide prefix sum) uses the
  * classic two-phase shape — per-partition local sums + a driver-side
  * prefix of partition totals — instead of a single-partition window, so
  * it scales to arbitrarily many partitions.
  */
object Curation {

  /** (id * 2654435761) mod 2^32 without 64-bit overflow: ids above
    * ~3.47e9 would overflow the naive product, which under ANSI mode
    * (`spark.sql.ansi.enabled`) is a runtime ArithmeticException in the
    * middle of every split/sample/packing job. Split the reduced operand
    * at 16 bits and accumulate mod 2^32 — every intermediate stays below
    * 2^49. Identical value to the naive form for every id ((a mod n)·m
    * mod n = a·m mod n), so the DuckDB oracles keep their simple
    * spelling. */
  private[graft] def hash32(id: Column): Column = {
    val a = pmod(id, lit(4294967296L))
    val hi = floor(a / lit(65536L)).cast(LongType)
    val lo = pmod(a, lit(65536L))
    pmod(
      pmod(hi * lit(2654435761L), lit(4294967296L)) * lit(65536L) +
        lo * lit(2654435761L),
      lit(4294967296L))
  }

  /** Deterministic per-row fraction in [0, 1) from a numeric id: the same
    * portable multiplicative hash the TABLESAMPLE operator uses
    * (reference TableSamplerPredicate.java hashes the rowkey against the
    * rate), so any engine — and the DuckDB oracle — reproduces the split
    * bit-for-bit. Injective for ids below 2^32 (odd multiplier);
    * ANSI-overflow-safe for any BIGINT id ([[hash32]]). */
  def hashFrac(id: Column): Column =
    hash32(id).cast(DoubleType) / lit(4294967296.0)

  /** The Efraimidis–Spirakis sampling key shared by [[weightedSample]]
    * and [[weightedSamplePerStratum]] — ln(u)/w with u ∈ (0, 1] from the
    * portable hash (the +1 keeps ln() finite at hash = 0), quantized to
    * 6 decimals so the selection is bit-for-bit reproducible across
    * engines. ONE definition: the plain and per-stratum paths must never
    * silently diverge. */
  private def esKey(id: Column, weight: Column): Column = {
    val u = (hash32(id) + 1).cast(DoubleType) / lit(4294967296.0)
    round(graft.functions.GraftFunctions.ln(u) /
      weight.cast(DoubleType) * 1e6, 6)
  }

  /** Gopher-style repetition signals per document:
    *  - dup_word_frac:  1 − distinct_words / total_words
    *  - top_word_frac:  occurrences of the most frequent word / total
    *  - dup_2gram_frac: 1 − distinct_2grams / total_2grams
    *
    * One scan; the word histogram is a two-level partial aggregate keyed
    * by (doc, word) then doc, so the shuffle carries histogram rows, not
    * tokens. The 2-gram distinct count is computed scan-locally (fused
    * shingle kernel) and rides through the aggregate as a per-doc
    * constant. */
  def repetitionMetrics(df: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val words = split(lower(trim(col(textCol))), "\\s+")
    val base = df
      .select(col(idCol).as("doc"), words.as("w"))
      .select(col("doc"), col("w"),
        size(Dedup.shinglesFromWords(col("w"), 2)).as("n2d"))
    val hist = base
      .select(col("doc"), col("n2d"), explode(col("w")).as("word"))
      .groupBy(col("doc"), col("word"))
      .agg(count(lit(1)).as("cnt"), max(col("n2d")).as("n2d"))
    hist.groupBy(col("doc"))
      .agg(sum(col("cnt")).as("n_tok"),
        count(lit(1)).as("n_distinct"),
        max(col("cnt")).as("top_cnt"),
        max(col("n2d")).as("n2d"))
      .select(col("doc"), col("n_tok"),
        round(lit(1.0) -
          col("n_distinct").cast(DoubleType) / col("n_tok"), 8)
          .as("dup_word_frac"),
        round(col("top_cnt").cast(DoubleType) / col("n_tok"), 8)
          .as("top_word_frac"),
        when(col("n_tok") > 1,
          round(lit(1.0) -
            col("n2d").cast(DoubleType) / (col("n_tok") - 1), 8))
          .otherwise(lit(0.0)).as("dup_2gram_frac"))
  }

  /** Benchmark-contamination report: for every candidate document, how
    * many of its distinct word n-grams appear anywhere in the benchmark
    * set. The benchmark n-gram table is DISTINCT and benchmark-sized —
    * eval sets are tiny relative to a training corpus — so it broadcasts
    * and the candidate side streams through a broadcast left join with no
    * shuffle; per-doc totals are one keyed aggregate.
    *
    * @return doc, n_grams, n_hit, overlap_frac, contaminated (0/1 at
    *         `flagAt`) */
  def contamination(docs: DataFrame, bench: DataFrame, textCol: String,
      idCol: String, n: Int, flagAt: Double = 0.5): DataFrame = {
    def grams(df: DataFrame, keyed: Boolean): DataFrame = {
      val key = if (keyed) Seq(col(idCol).as("doc")) else Seq.empty
      val carry = if (keyed) Seq(col("doc")) else Seq.empty
      df.select(key :+ split(lower(trim(col(textCol))), "\\s+").as("w"): _*)
        .select(carry :+
          explode(Dedup.shinglesFromWords(col("w"), n)).as("g"): _*)
    }
    val candGrams = grams(docs, keyed = true)
    val benchGrams = grams(bench, keyed = false).distinct()
      .withColumn("hit", lit(1))
    val hits = candGrams.join(broadcast(benchGrams), Seq("g"), "left")
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0))).as("n_hit"))
    // docs with fewer than n words produce no grams and would vanish
    // from the report entirely — the "for every candidate document"
    // contract requires them PRESENT with zero grams (short docs are
    // exactly the ones most likely to be verbatim benchmark prompts at
    // larger n; callers wanting a substring check on them should lower
    // n or add a dedicated short-doc pass)
    docs.select(col(idCol).as("doc")).distinct()
      .join(hits, Seq("doc"), "left")
      .select(col("doc"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        coalesce(round(col("n_hit").cast(DoubleType) / col("n_grams"), 8),
          lit(0.0)).as("overlap_frac"),
        when(col("n_hit").cast(DoubleType) / col("n_grams") >= flagAt,
          lit(1)).otherwise(lit(0)).as("contaminated"))
  }

  /** Deterministic epoch shuffle + shard assignment (trainer data-order
    * prep): epoch e permutes the corpus by the portable multiplicative
    * hash of (id + e·1000003) — a different but fully reproducible
    * order per epoch, identical across engines, layouts, partition
    * counts and runs (what makes a training run resumable and an
    * ordering bug bisectable). Shards are ranges of the hash space
    * (`floor(key / (2^32/shards))`), so assignment is SCAN-LOCAL —
    * no count, no global sort, no window; the trainer's writer does
    * `PARTITION BY shard` + sort-within-partition by `shuffle_key` and
    * each worker reads exactly its shard's files. Shard sizes are
    * equal in expectation (hash-uniform), which is the trainer
    * contract; exactly-equal sizes would need a global prefix sum for
    * zero practical gain.
    *
    * @return input columns + (shuffle_key, shard)
    */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int,
      shards: Int = 16): DataFrame = {
    require(shards > 0 && 4294967296L % shards == 0,
      s"shards must divide the 2^32 hash space, got $shards")
    // pre-reduce the id mod 2^32 BEFORE adding the epoch offset:
    // (id % m + off) % m == (id + off) % m, but the raw addition
    // overflows Long for ids near Long.MaxValue — an ANSI-mode runtime
    // error, and a silent divergence from the HUGEINT-arithmetic oracle
    // in non-ANSI (hash32's own doc is explicit about this hazard)
    val key = hash32(pmod(col(idCol), lit(4294967296L)) +
      lit(epoch.toLong * 1000003L))
    df.withColumn("shuffle_key", key)
      .withColumn("shard",
        floor(col("shuffle_key") / lit((4294967296L / shards).toDouble)))
  }

  /** Deterministic train/validation/test assignment from the id hash:
    * stable across runs, engines, and table layouts (no sampling state).
    * Scan-local — composes under any downstream groupBy/filter. */
  def trainValTestSplit(df: DataFrame, idCol: String,
      trainFrac: Double = 0.8, valFrac: Double = 0.1): DataFrame = {
    val f = hashFrac(col(idCol))
    df.withColumn("split",
      when(f < trainFrac, "train")
        .when(f < trainFrac + valFrac, "val")
        .otherwise("test"))
  }

  /** Single-pass gate observability via Spark's CollectMetrics
    * (`df.observe`): row and token counts of the kept/dropped split
    * ride the SAME job that produces the filtered output — at 100 TB a
    * "count what we dropped" second scan is a second 100 TB read, and a
    * driver-side `.count()` pair is two. The metrics materialize with
    * the first action on the returned frame (`Observation.get`); in
    * streaming the same node surfaces per-batch via
    * `QueryProgress.observedMetrics`.
    *
    * @param keepCol boolean gate column (e.g. the C4/Gopher `keep`)
    * @param tokCol  token-count column for budget accounting
    * @return (kept rows only, observation handle)
    */
  def observedGate(df: DataFrame, keepCol: String, tokCol: String)
      : (DataFrame, Option[org.apache.spark.sql.Observation]) = {
    val metrics = Seq(
      count(lit(1)).as("rows_in"),
      count(when(col(keepCol), 1)).as("rows_kept"),
      coalesce(sum(col(tokCol).cast(LongType)), lit(0L)).as("tokens_in"),
      coalesce(sum(when(col(keepCol), col(tokCol).cast(LongType))),
        lit(0L)).as("tokens_kept"))
    // an Observation handle rejects streaming Datasets (its listener
    // model is batch-only) — streams use the name-based node and report
    // per micro-batch via QueryProgress.observedMetrics("curation_gate")
    if (df.isStreaming)
      (df.observe("curation_gate", metrics.head, metrics.tail: _*)
        .where(col(keepCol)), None)
    else {
      val obs = new org.apache.spark.sql.Observation("curation_gate")
      (df.observe(obs, metrics.head, metrics.tail: _*)
        .where(col(keepCol)), Some(obs))
    }
  }

  /** Dedup-aware (leakage-safe) train/test split: near-duplicate
    * CLUSTERS — not documents — are the unit of assignment, so no
    * near-dup pair ever straddles the train/eval boundary. A per-doc
    * hash split leaks: two near-identical docs hash independently, one
    * lands in eval, and the model is scored on its own training text
    * (the contamination inflation Lee et al. 2022 §6 measure). Clusters
    * come from [[Dedup.connectedComponents]] over ANY pair set — exact
    * fingerprint pairs, MinHash/SimHash LSH pairs, embedding near-dups;
    * every doc inherits its CLUSTER id's hash draw through the same
    * multiplicative hash as [[trainValTestSplit]], so singletons (the
    * vast majority) split at exactly the per-doc rates and the
    * assignment is deterministic under any partitioning.
    *
    * Scale: component labels cost O(cluster diameter) id-keyed shuffles
    * (near-dup clusters are short-diameter); the split itself is a
    * scan-local expression over the label table.
    *
    * @param pairs near-dup pairs, columns `id_a`, `id_b`
    * @return (id, cluster_id, split)
    */
  def leakageSafeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
      testFrac: Double = 0.1): DataFrame = {
    require(testFrac > 0 && testFrac < 1, "testFrac must be in (0, 1)")
    graft.operators.Dedup.connectedComponents(
        docs.select(col(idCol).as("id")), pairs)
      .withColumn("split",
        when(hashFrac(col("cluster_id")) < testFrac, "test")
          .otherwise("train"))
  }

  /** Stratified sampling for dataset mixing: keep a row iff its id hash
    * falls under the stratum's rate — the deterministic form of
    * per-source mixture weights in a training-data recipe. Strata not in
    * `rates` keep `defaultRate`. Scan-local filter, no shuffle. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(col(strataCol) === k, lit(r)).otherwise(acc)
    }
    df.where(hashFrac(col(idCol)) < rate)
  }

  /** Overlapping fixed-size chunks of each document (the windowing
    * step of RAG/embedding pipelines): whitespace words re-joined into
    * windows of `chunkTokens` starting every `chunkTokens - overlap`
    * words, last window short. Scan-local — tokenize once, explode
    * the window starts, slice; no shuffle, composes with downstream
    * embed/dedup stages. A tail window whose words are ALL overlap
    * (start + overlap >= word count) is suppressed — it would be a
    * strict subset of the previous chunk and downstream stages would
    * embed/index duplicate content. Empty/whitespace-only docs emit
    * no chunks. Output: doc, chunk_start (word offset), n_tok,
    * chunk. */
  def chunkDocuments(df: DataFrame, textCol: String, idCol: String,
      chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got $overlap / $chunkTokens")
    val step = chunkTokens - overlap
    val words = split(trim(col(textCol)), "\\s+")
    df.where(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc"), words.as("ws"))
      .select(col("doc"), col("ws"),
        explode(sequence(lit(0), size(col("ws")) - 1, lit(step)))
          .as("chunk_start"))
      .where(col("chunk_start") === 0 ||
        size(col("ws")) > col("chunk_start") + overlap)
      .select(col("doc"), col("chunk_start"),
        size(slice(col("ws"), col("chunk_start") + 1, lit(chunkTokens)))
          .as("n_tok"),
        array_join(slice(col("ws"), col("chunk_start") + 1,
          lit(chunkTokens)), " ").as("chunk"))
  }

  /** Mixture sampling to per-source token budgets (the Pile/DoReMi
    * recipe): source s should contribute `weights(s) * budgetTokens`
    * tokens to the training mix, so its keep rate is
    * min(1, target / corpusTokens(s)), applied as the same
    * deterministic id-hash filter as [[stratifiedSample]]. ONE tiny
    * aggregate (per-source token totals — rows ≤ #sources) feeds a
    * scan-local filter; the corpus itself never shuffles. Sources
    * absent from `weights` drop (rate 0); rates cap at 1 — a source
    * whose weight demands MORE than its corpus has is taken whole (no
    * upsampling; union k copies upstream if a source must repeat).
    * `strataCol` must be STRING; token totals read `tokenCol` as
    * BIGINT. */
  def mixtureSample(df: DataFrame, idCol: String, strataCol: String,
      tokenCol: String, weights: Map[String, Double],
      budgetTokens: Long): DataFrame = {
    // a source with NULL or non-positive token total contributes
    // nothing: sum() is null for all-null columns, and w*budget/0
    // would be Infinity → capped rate 1.0, keeping a zero-token
    // source WHOLE instead of dropping it
    val totals = df.groupBy(col(strataCol))
      .agg(sum(col(tokenCol).cast(LongType)).as("t"))
      .collect()
      .collect { case r if !r.isNullAt(1) && r.getLong(1) > 0 =>
        r.getString(0) -> r.getLong(1) }.toMap
    // same arithmetic shape the SQL oracle uses: (w * budget) / total,
    // then cap — bit-identical doubles give bit-identical filters
    val rates = weights.flatMap { case (s, w) =>
      totals.get(s).map(t =>
        s -> math.min(1.0, w * budgetTokens / t))
    }
    stratifiedSample(df, idCol, strataCol, rates, defaultRate = 0.0)
  }

  /** Temperature-scaled mixture sampling (the multilingual α-sampling
    * recipe — Conneau & Lample, "Cross-lingual Language Model
    * Pretraining", 2019 §3.1): source s targets share
    * q_s = p_s^α / Σ p^α of the token budget, where p_s is its corpus
    * token share. α < 1 flattens the distribution, upsampling
    * low-resource sources relative to their raw share (α = 1 reduces
    * to proportional sampling); rates cap at 1 — no repetition, union
    * copies upstream if a source must repeat.
    *
    * Same scale shape as [[mixtureSample]]: ONE tiny per-source
    * aggregate → scan-local deterministic hash filter; the corpus never
    * shuffles. Rates round to 12 decimals on both engines — pow() is
    * not IEEE-exact across libm implementations, and the filter
    * boundary must be bit-identical for the oracle. */
  def temperatureSample(df: DataFrame, idCol: String, strataCol: String,
      tokenCol: String, alpha: Double, budgetTokens: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val totals = df.groupBy(col(strataCol))
      .agg(sum(col(tokenCol).cast(LongType)).as("t"))
      .collect()
      .collect { case r if !r.isNullAt(1) && r.getLong(1) > 0 =>
        r.getString(0) -> r.getLong(1) }.toMap
    val grand = totals.values.sum.toDouble
    val zsum = totals.values.map(t => math.pow(t / grand, alpha)).sum
    val rates = totals.map { case (s, t) =>
      val q = math.pow(t / grand, alpha) / zsum
      s -> math.round(
        math.min(1.0, q * budgetTokens / t) * 1e12) / 1e12
    }
    stratifiedSample(df, idCol, strataCol, rates, defaultRate = 0.0)
  }

  /** Deterministic weighted sampling without replacement (Efraimidis &
    * Spirakis, "Weighted random sampling with a reservoir", IPL 2006):
    * each row's key is ln(u)/w for u = its deterministic id-hash
    * fraction, and the sample is the k LARGEST keys — rows are selected
    * with probability proportional to weight, reproducibly across runs,
    * engines, and layouts (no sampling state, no RNG).
    *
    * Shape at scale: the key is scan-local arithmetic and the top-k is
    * TakeOrderedAndProject (per-partition heads, driver merge — never a
    * global sort). Keys quantize to 6dp with an id tie-break so the
    * selected SET is engine-exact even at ln()'s last ulp.
    *
    * @param weightCol weights (e.g. a quality score or token count —
    *                  heavier rows sampled more often). Rows with
    *                  weight ≤ 0 have zero selection probability and are
    *                  excluded — without the filter their key would be
    *                  NaN, which Spark sorts ABOVE every real key and
    *                  the invalid row would win the sample
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame =
    df.where(col(weightCol) > 0)
      .withColumn("skey", esKey(col(idCol), col(weightCol)))
      .orderBy(col("skey").desc, col(idCol))
      .limit(k)

  /** Per-stratum weighted quota sampling: the k heaviest-biased rows of
    * EVERY stratum (per-source quotas in a mixing recipe), using the
    * same Efraimidis–Spirakis keys as [[weightedSample]] but selected
    * with the bounded-heap `top_scored_id` aggregate — the shuffle
    * carries at most k candidates per (stratum, map task) and there is
    * no per-stratum sort, unlike the row_number window form.
    *
    * `idCol` must be integral (TINYINT..BIGINT — enforced at analysis
    * time by the bounded-heap aggregate; output ids are BIGINT).
    *
    * @return (id, stratum, skey) — `idCol`'s winners per `strataCol`
    */
  def weightedSamplePerStratum(df: DataFrame, idCol: String,
      weightCol: String, strataCol: String, k: Int): DataFrame = {
    graft.functions.GraftFunctions.registerKernels(df.sparkSession)
    // weight ≤ 0 = zero selection probability (see weightedSample: a
    // NaN key would otherwise sort above every real candidate)
    df.where(col(weightCol) > 0)
      .withColumn("skey", esKey(col(idCol), col(weightCol)))
      .groupBy(col(strataCol).as("stratum"))
      .agg(call_function("top_scored_id", col(idCol), col("skey"), lit(k))
        .as("top"))
      .select(col("stratum"), explode(col("top")).as("e"))
      .select(col("e.id").as(idCol), col("stratum"),
        col("e.score").as("skey"))
  }

  /** Quantile bucketing of a score column — the perplexity-bucket
    * assignment of LLM data recipes (e.g. CCNet's head/middle/tail by LM
    * score): thresholds at the given quantiles, then each row's bucket =
    * how many thresholds its score exceeds (0 = lowest band).
    *
    * `exact = true` uses PERCENTILE_DISC — thresholds are actual data
    * values under the SQL-standard cume_dist rule, so any engine agrees
    * bit-for-bit (the oracle mode); note Spark's exact percentile
    * buffers each aggregation group's values, so at corpus scale use
    * `exact = false` (approx_percentile's bounded sketch, same plan
    * shape). Thresholds are a single broadcast row; the assignment
    * itself is scan-local.
    */
  def scoreBuckets(scored: DataFrame, scoreCol: String,
      probs: Seq[Double], exact: Boolean): DataFrame = {
    require(probs.nonEmpty && probs == probs.sorted,
      "quantile probs must be ascending")
    val thCols = probs.zipWithIndex.map { case (p, i) =>
      val t =
        if (exact) expr(
          s"percentile_disc($p) WITHIN GROUP (ORDER BY `$scoreCol`)")
        else expr(s"approx_percentile(`$scoreCol`, $p)")
      t.cast(DoubleType).as(s"__t$i")
    }
    val th = scored.agg(thCols.head, thCols.tail: _*)
    val bucket = probs.indices
      .map(i => when(col(scoreCol) > col(s"__t$i"), 1).otherwise(0))
      .reduce(_ + _)
    scored.crossJoin(broadcast(th))
      .withColumn("bucket", bucket)
      .drop(probs.indices.map(i => s"__t$i"): _*)
  }

  /** DSIR-style importance weights for data selection (Xie et al.,
    * "Data Selection for Language Models via Importance Resampling",
    * NeurIPS 2023): score every document by how much more likely its
    * tokens are under a TARGET distribution (the data you want more of
    * — a high-quality subset, a domain) than under the RAW corpus
    * distribution. Selection then keeps the top weights or samples
    * proportionally (compose with [[trainValTestSplit]]'s hash for the
    * deterministic Gumbel-free variant).
    *
    * weight(doc) = mean over tokens t of
    *   ln p_target(t) − ln p_raw(t), add-1 smoothed over the shared
    * vocabulary. Per-term log ratios quantize to 1e-8 as SCALED LONGS
    * (same engine-portable trick as unigramLogProb) so the per-doc sum
    * is exact-integer and the mean is two IEEE divisions — bit-identical
    * on any engine, immune to ln()'s last-ulp divergence.
    *
    * Shape at scale: one token explode feeds BOTH distributions (the
    * target indicator is a conditional sum, not a second scan); the term
    * stats table is vocabulary-sized and carries no broadcast hint (AQE
    * broadcasts while it fits); the doc-side join aggregates tf per
    * (doc, term) first so the join carries histogram rows, not tokens.
    * `hashBuckets = Some(b)` follows the paper's hashed-feature variant:
    * terms fold into b buckets (xxhash64 pmod), bounding the stats table
    * at any corpus size for a small collision bias.
    *
    * @return (doc, n_tok, logw) — logw > 0 means target-like
    */
  def dsirWeights(df: DataFrame, textCol: String, idCol: String,
      targetPred: Column, hashBuckets: Option[Int] = None): DataFrame = {
    val term0 = explode(split(lower(trim(col(textCol))), "\\s+")).as("term")
    val tokens = df.select(col(idCol).as("doc"),
        targetPred.cast(IntegerType).as("is_tgt"), term0)
      .select(col("doc"), col("is_tgt"), hashBuckets match {
        case Some(b) =>
          pmod(xxhash64(col("term")), lit(b.toLong)).cast(StringType)
            .as("term")
        case None => col("term")
      })
    val hist = tokens.groupBy(col("doc"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val stats = tokens.groupBy(col("term"))
      .agg(count(lit(1)).as("cnt_raw"), sum(col("is_tgt")).as("cnt_tgt"))
    val tot = stats.agg(
      sum(col("cnt_raw")).cast(DoubleType).as("tot_raw"),
      sum(col("cnt_tgt")).cast(DoubleType).as("tot_tgt"),
      count(lit(1)).cast(DoubleType).as("v"))
    // λ(term), scaled-long: counts are exact doubles (< 2^53), ln is
    // quantized at 1e-8 so both engines round to the same long
    val lam = stats.crossJoin(broadcast(tot))
      .select(col("term"),
        round(graft.functions.GraftFunctions.ln(
          ((col("cnt_tgt") + 1).cast(DoubleType) * (col("tot_raw") + col("v"))) /
            ((col("cnt_raw") + 1).cast(DoubleType) * (col("tot_tgt") + col("v"))))
          * 1e8).cast(LongType).as("lam"))
    hist.join(lam, "term")
      .groupBy(col("doc"))
      .agg(sum(col("tf")).as("n_tok"),
        sum(col("tf") * col("lam")).as("lsum"))
      .select(col("doc"), col("n_tok"),
        (col("lsum").cast(DoubleType) / col("n_tok") / 1e8).as("logw"))
  }

  /** Fixed-window sequence packing (the concat-and-chunk layout LLM
    * pretraining uses): order documents by the deterministic shuffle
    * hash, take the running token offset, and assign each document to
    * the context window containing its first token.
    *
    * The corpus-wide prefix sum is two-phase: range-partition by the
    * shuffle key, local cumulative sums per partition (window keyed by
    * partition id — no global single-partition window), then add the
    * prefix of whole-partition totals. The totals collect is
    * #partitions-sized driver work, not data-sized. The pid-stamped
    * frame is localCheckpointed so the totals job and the output job
    * cannot see different range-sampling outcomes.
    *
    * @return doc, n_tok, offset (first-token position), bin (window id) */
  def packSequences(df: DataFrame, idCol: String, tokCol: String,
      budget: Long, partitions: Int = 32): DataFrame = {
    // same loud guards as packBinsWhole: a NULL/non-positive token
    // count would null the running offset silently, and the doc would
    // land in a __HIVE_DEFAULT_PARTITION__ shard no trainer reads
    val keyed = df
      .select(col(idCol).as("doc"),
        when(col(tokCol).cast(LongType).isNull ||
            col(tokCol).cast(LongType) <= 0,
          raise_error(concat(lit("packSequences: document "),
            col(idCol).cast(StringType),
            lit(" has a non-positive or unparseable token count"))))
          .otherwise(col(tokCol).cast(LongType)).as("n_tok"),
        hash32(col(idCol)).as("k"))
      .repartitionByRange(partitions, col("k"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    // ROWS frame with a doc tie-break: orderBy(k) alone defaults to a
    // RANGE frame, where rows with EQUAL hash keys (duplicate ids, or
    // distinct ids colliding mod 2^32) are peers that each receive the
    // sum of the whole peer group — overlapping offsets and a hole in
    // the stream. The key is injective below 2^32 so fixture results
    // are unchanged; this closes the collision case.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pid")).orderBy(col("k"), col("doc"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val local = keyed.withColumn("local_cum",
      sum(col("n_tok")).over(w) - col("n_tok"))
    val prefix = keyed.groupBy(col("pid"))
      .agg(sum(col("n_tok")).as("ptotal"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      .scanLeft((Int.MinValue, 0L)) { case ((_, acc), (pid, t)) =>
        (pid, acc + t)
      }
    val offsetOf = prefix.zip(prefix.drop(1)).map {
      case ((_, before), (pid, _)) => pid -> before
    }.toMap
    val prefixCol = offsetOf.foldLeft(lit(0L)) { case (acc, (pid, off)) =>
      when(col("pid") === pid, lit(off)).otherwise(acc)
    }
    local
      .select(col("doc"), col("n_tok"),
        (col("local_cum") + prefixCol).as("offset"))
      .withColumn("bin", floor(col("offset") / budget))
  }

  /** Whole-document bin packing — the no-split companion to
    * [[packSequences]] for corpora where an example must NOT straddle
    * sequences (SFT/eval batches, contrastive pairs): best-fit-
    * decreasing (BFD) inside each hash partition. BFD carries the
    * classic ≤ 11/9·OPT + 1 bin guarantee per partition, and hash
    * partitions are iid samples of the length distribution, so realized
    * padding tracks global BFD (and beats the naive
    * open-a-bin-when-full sequential fill — ScalaTested).
    *
    * Scale shape: ONE shuffle (hash repartition by doc id), a
    * sort-within-partitions (Spark's external sort — the partition is
    * never materialized in memory), then a streaming per-partition pass
    * holding only the open-bin residual TreeMap: O(partition tokens /
    * budget) longs, the packing state itself — this is the genuinely
    * imperative per-partition case where mapPartitions is the right
    * tool. Deterministic for a fixed `partitions` (hash placement +
    * (n_tok desc, doc) order fix every assignment); bin ids are
    * (partitionId << 32 | localBin), globally unique.
    *
    * A document larger than `budget` can never pack — raised loudly
    * in-plan, not silently dropped.
    *
    * @return (doc, n_tok, bin)
    */
  def packBinsWhole(df: DataFrame, idCol: String, tokCol: String,
      budget: Long, partitions: Int = 32): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    // every-doc-packed-exactly-once contract: a non-numeric id or a
    // non-positive token count is raised loudly in-plan, mirroring the
    // over-budget guard — a silent NULL cast would collapse all
    // affected docs onto doc=null, and a silent filter would drop them
    val guarded = df
      .select(col(idCol).as("__rawid"),
        col(tokCol).cast(LongType).as("n_tok"))
      .withColumn("doc",
        when(col("__rawid").isNull ||
            col("__rawid").cast(LongType).isNull,
          raise_error(concat(
            lit(s"packBinsWhole: id column '$idCol' must be numeric " +
              "and non-null, got: "),
            coalesce(col("__rawid").cast(StringType), lit("NULL")))))
          .otherwise(col("__rawid").cast(LongType)))
      .withColumn("n_tok",
        when(col("n_tok").isNull || col("n_tok") <= 0, raise_error(concat(
          lit("packBinsWhole: document "), col("doc").cast(StringType),
          lit(" has a non-positive or unparseable token count"))))
          .when(col("n_tok") > budget, raise_error(concat(
            lit("document "), col("doc"),
            lit(s" exceeds the packing budget $budget tokens: "),
            col("n_tok").cast(StringType))))
          .otherwise(col("n_tok")))
      .select(col("doc"), col("n_tok"))
    guarded
      .repartition(partitions, col("doc"))
      .sortWithinPartitions(col("n_tok").desc, col("doc"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId().toLong
        // residual capacity -> bins with exactly that residual (LIFO);
        // ceilingEntry = tightest open bin that fits = best fit
        val open = new java.util.TreeMap[Long,
          scala.collection.mutable.ArrayDeque[Long]]()
        var nextBin = 0L
        def push(resid: Long, bin: Long): Unit = if (resid > 0) {
          val st = open.get(resid)
          if (st == null) {
            val s = scala.collection.mutable.ArrayDeque.empty[Long]
            s.prepend(bin); open.put(resid, s)
          } else st.prepend(bin)
        }
        it.map { case (doc, s) =>
          val e = open.ceilingEntry(s)
          val bin = if (e == null) {
            val b = nextBin; nextBin += 1
            push(budget - s, b); b
          } else {
            val st = e.getValue
            val b = st.removeHead()
            if (st.isEmpty) open.remove(e.getKey)
            push(e.getKey - s, b); b
          }
          (doc, s, (pid << 32) | bin)
        }
      }
      .toDF("doc", "n_tok", "bin")
  }

  /** Boundary-splitting sequence packing — the ACTUAL concat-and-chunk
    * layout pretraining uses: the corpus token stream chunks into
    * `budget`-token windows and a document crossing a boundary SPLITS
    * across the adjacent bins ([[packSequences]] assigns whole docs to
    * their first-token bin; this emits the per-bin pieces). Each doc
    * explodes into the bins it touches with its slice coordinates —
    * scan-local arithmetic on top of the same two-phase prefix sum, no
    * extra shuffle.
    *
    * @return (doc, bin, bin_offset, piece_len, doc_offset): piece of
    *         `doc` occupying [bin_offset, bin_offset+piece_len) of `bin`,
    *         starting at `doc_offset` within the document
    */
  def packSequencesSplit(df: DataFrame, idCol: String, tokCol: String,
      budget: Long, partitions: Int = 32): DataFrame = {
    val packed = packSequences(df, idCol, tokCol, budget, partitions)
      .where(col("n_tok") > 0)
    packed
      .withColumn("bin",
        explode(sequence(col("bin"),
          floor((col("offset") + col("n_tok") - 1) / budget))))
      .select(col("doc"), col("bin"),
        greatest(col("offset") - col("bin") * budget, lit(0L))
          .as("bin_offset"),
        (least((col("bin") + 1) * budget, col("offset") + col("n_tok")) -
          greatest(col("bin") * budget, col("offset"))).as("piece_len"),
        greatest(col("bin") * budget - col("offset"), lit(0L))
          .as("doc_offset"))
  }
}
