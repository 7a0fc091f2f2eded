package graft.operators

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Classifier-based quality filtering — the GPT-3/CCNet-style stage
  * where a linear model trained on a trusted "high-quality" reference
  * set scores every corpus document, replacing hand-tuned thresholds on
  * individual heuristics with one learned decision surface.
  *
  * Spark-first shape: featurization is the same scan-local fused
  * kernels the heuristic filters use ([[graft.functions.TextMetrics]],
  * stopword probe — no shuffle, no UDF beyond the ml vector bridge);
  * training is `spark.ml`'s LogisticRegression (distributed
  * treeAggregate LBFGS — the standard scale path); inference is one
  * broadcast of the coefficient vector inside `model.transform`, again
  * scan-local. The Pareto-thresholded keep rule reproduces the
  * published GPT-3 recipe with the engine's deterministic per-id hash
  * in place of `np.random.pareto`, so reruns keep the same documents.
  */
object QualityFilter {

  /** Scan-local feature vector (no shuffle): token count (log-scaled),
    * mean word length, stopword ratio, symbol ratio, digit ratio,
    * punct-per-token — the classic cheap quality signals. */
  def featurize(df: DataFrame, textCol: String): DataFrame = {
    val m = graft.operators.TextAnalysis.qualityMetrics(df, textCol)
    // every feature coalesces: ONE null element in the array kills
    // array_to_vector at runtime ('Null value in non-nullable field'),
    // and NULL text nulls n_tok through split/size
    m.withColumn("features", array_to_vector(array(
      coalesce(log1p(col("n_tok").cast(DoubleType)), lit(0.0)),
      coalesce(col("mean_wlen"), lit(0.0)),
      coalesce(col("stopword_ratio"), lit(0.0)),
      coalesce(col("symbol_ratio"), lit(0.0)),
      coalesce(col("digit_ratio"), lit(0.0)),
      coalesce(
        graft.operators.TextAnalysis.subwordCountEstimate(col(textCol))
          .cast(DoubleType) / col("n_tok"), lit(0.0)))))
      .drop("n_tok", "mean_wlen", "stopword_ratio", "symbol_ratio",
        "digit_ratio")
  }

  /** Train the quality model on a labeled frame (`labelCol` ∈ {0, 1};
    * 1 = trusted/high-quality). Deterministic given the input: fixed
    * iteration budget, L2 only, standardized features. */
  def train(labeled: DataFrame, textCol: String,
      labelCol: String): LogisticRegressionModel =
    new LogisticRegression()
      .setFeaturesCol("features")
      .setLabelCol(labelCol)
      .setMaxIter(50)
      .setRegParam(1e-3)
      .setElasticNetParam(0.0)
      .setStandardization(true)
      .fit(featurize(labeled, textCol)
        .select(col(labelCol).cast(DoubleType).as(labelCol),
          col("features")))

  /** Score every document: (idCol, quality_prob) — P(high quality). */
  def score(model: LogisticRegressionModel, docs: DataFrame,
      textCol: String, idCol: String): DataFrame =
    model.transform(featurize(docs, textCol))
      .select(col(idCol),
        vector_to_array(col("probability")).getItem(1).as("quality_prob"))

  /** GPT-3's Pareto keep rule, made deterministic: keep a document iff
    * `pareto(alpha) > 1 - score` where the Pareto draw comes from the
    * engine's portable per-id hash via inverse CDF
    * (`(1-u)^(-1/alpha) - 1`) instead of np.random — so low-scoring
    * documents still enter the corpus with score-proportional
    * probability (diversity), and the exact same documents survive on
    * every rerun and any partitioning. */
  def paretoKeep(id: Column, score: Column, alpha: Double = 9.0): Column = {
    val u = Curation.hashFrac(id)
    pow(lit(1.0) - u, lit(-1.0 / alpha)) - lit(1.0) > lit(1.0) - score
  }

  /** Score + filter in one pass: the documents that survive the Pareto
    * rule, with their scores. */
  def filter(model: LogisticRegressionModel, docs: DataFrame,
      textCol: String, idCol: String, alpha: Double = 9.0): DataFrame =
    score(model, docs, textCol, idCol)
      .where(paretoKeep(col(idCol), col("quality_prob"), alpha))
}
