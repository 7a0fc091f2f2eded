package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale rehearsal: self-scale the sf fixture ~`factor`× into a temp
  * dir and measure how the most expensive queries' wall time grows —
  * the cheapest way to convert "the plan looks right at 100×" into a
  * measurement. Per query it reports the measured scaling exponent
  * `log(t_scaled / t_base) / log(factor)`: ~1.0 = linear, ~1.1 ≈
  * n log n at this range, >1.3 = super-linear (investigate).
  *
  * Fixture synthesis (all tables land in the output dir so any query
  * runs unmodified):
  *  - dimensions (region/nation/supplier/part/customer) copy verbatim —
  *    fact/dim joins keep matching;
  *  - orders/lineitem replicate with o_orderkey/l_orderkey shifted per
  *    replica by a common offset, so the order↔line FK stays consistent
  *    and key cardinality actually grows;
  *  - events replicate with user_id shifted (user-keyed operators —
  *    sessionize, funnel, retention — see real new users);
  *  - documents replicate with doc_id shifted AND the text alphabet
  *    rotated per replica (translate over a 20-letter band) — without
  *    this every replica is an exact duplicate and similarity/dedup
  *    pair generation measures the quadratic blowup of an artificial
  *    100%-duplicate corpus instead of the operator's scaling;
  *  - embeddings replicate with vec_id shifted and a deterministic
  *    per-replica sign flip on one dimension (same reason).
  *
  * Timing is best-of-2 per query per scale with the same unpersist +
  * GC quiescence discipline as [[Bench]].
  */
object ScaleRehearsal {

  private val Queries = Seq(
    "q_bm25_multiquery", "q_dedup_incremental_lsh", "q_dup_gram_frac",
    "q_dedup_minhash", "q_dedup_simhash", "q_containment_pairs",
    "q_dedup_cross_source", "q_trigram_logprob",
    "q_line_dedup_incremental", "q_line_dedup", "q_quality_classifier",
    "q_jaccard_char", "q_gopher_repetition", "q_split_leakage_safe",
    "q_bson_update", "q_pagerank", "q_dedup_spans_incremental",
    "q_pii_scrub", "q1_agg", "q_zorder_scan", "q_count_distinct",
    "q_sessionize", "q_dedup_cluster", "q_tpch_q3", "q_overlap_sketch")
  // q_ivm_refresh is fixed-size by construction (it filters doc_id<380
  // regardless of corpus size), so it is excluded: its rehearsal would
  // measure nothing.

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = GraftSession.build("graft-scale-rehearsal")
    val out = java.nio.file.Files
      .createTempDirectory(s"graft_scale_x$factor").toString
    println(s"[scale] building ${factor}x fixture from $base at $out")
    buildFixture(spark, base, out, factor)

    def timeBest2(name: String, dir: String): Option[Double] = {
      def once(): Option[Double] = {
        GraftSession.quiesce(spark)
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(name)(spark, dir)
            .queryExecution.toRdd.count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[scale] $name FAILED at $dir: " +
            e.getMessage.linesIterator.next())
          None
        }
      }
      for (a <- once(); b <- once()) yield math.min(a, b)
    }

    val rows = Queries.flatMap { q =>
      val t1 = timeBest2(q, base)
      val tN = timeBest2(q, out)
      (t1, tN) match {
        case (Some(a), Some(b)) =>
          val exp = math.log(b / a) / math.log(factor.toDouble)
          println(f"[scale] $q%-28s base=$a%7.2fs x$factor=$b%8.2fs " +
            f"exponent=$exp%5.2f")
          Some((q, a, b, exp))
        case _ => None
      }
    }
    val json = rows.map { case (q, a, b, e) =>
      f"""{"q":"$q","base_sec":$a%.3f,"scaled_sec":$b%.3f,"exponent":$e%.3f}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"scale_rehearsal","factor":$factor,"rows":$json}""")
    spark.stop()
  }

  private[graft] def buildFixture(spark: SparkSession, base: String,
      out: String, factor: Int): Unit = {
    def t(n: String): DataFrame = Tables.t(spark, base, n)
    def write(df: DataFrame, n: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(s"$out/$n.parquet")
    Seq("region", "nation", "supplier", "part", "customer")
      .foreach(n => write(t(n), n))
    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head.getLong(0) + 1
    def replicate(df: DataFrame, shifts: Map[String, Long],
        extra: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until factor).map { i =>
        val shifted = shifts.foldLeft(df) { case (d, (c, off)) =>
          d.withColumn(c, col(c) + lit(i * off)) }
        extra(shifted, i)
      }.reduce(_ unionByName _)

    val orders = t("orders"); val line = t("lineitem")
    val okOff = maxOf(orders, "o_orderkey")
    write(replicate(orders, Map("o_orderkey" -> okOff)), "orders")
    write(replicate(line, Map("l_orderkey" -> okOff)), "lineitem")

    val ev = t("events")
    write(replicate(ev, Map("user_id" -> maxOf(ev, "user_id"))), "events")

    val docs = t("documents")
    val alpha = "abcdefghijklmnopqrst"
    write(replicate(docs, Map("doc_id" -> maxOf(docs, "doc_id")),
      (d, i) =>
        if (i == 0) d
        else {
          val rot = alpha.drop(i % alpha.length) +
            alpha.take(i % alpha.length)
          d.withColumn("text", translate(col("text"), alpha, rot))
        }), "documents")

    val emb = t("embeddings")
    write(replicate(emb, Map("vec_id" -> maxOf(emb, "vec_id")),
      (d, i) =>
        if (i == 0) d
        else d.withColumn("embedding",
          transform(col("embedding"), (x, j) =>
            when(j === (i % 64), -x).otherwise(x)))), "embeddings")
  }
}
