package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge-list DataFrames.
  *
  * Companion to [[Dedup.connectedComponents]]: where components give the
  * partition of a near-dup graph, PageRank gives a CENTRALITY score over
  * the same kind of graph — the standard quality/authority signal a
  * crawl-derived training corpus attaches to hosts (Common Crawl host
  * ranks) and, over a duplication graph, a principled "most-linked
  * representative" pick that survives where min-id canonicals are
  * arbitrary.
  */
object Graph {

  /** PageRank by power iteration (Page et al. 1999, the classic
    * random-surfer fixpoint) over a directed `(src, dst)` edge list.
    *
    * Per iteration: one `src`-keyed join of the rank vector against the
    * pre-weighted edge table, one `dst`-keyed partial+final sum, one
    * `id`-keyed left join back onto the node spine — all shuffles on the
    * vertex id, nothing driver-side except the per-iteration dangling
    * mass (ONE scalar aggregate; the dangling node SET is precomputed
    * once). Edge weights (1/outdegree) are joined once OUTSIDE the loop.
    * Each iteration `localCheckpoint`s the rank vector — iterative
    * self-joins otherwise double lineage per round (same policy as
    * [[Dedup.connectedComponents]]); at cluster scale swap for reliable
    * checkpointing. Iteration count is fixed (power iteration converges
    * geometrically at rate ~`damping`; 10-20 rounds is the conventional
    * web-graph setting), so the result is deterministic up to
    * floating-point summation order.
    *
    * Dangling nodes (no out-edges) redistribute their mass uniformly —
    * the standard stochastic-matrix completion, so ranks always sum to 1.
    *
    * @param edges directed edges, columns `src`, `dst`; parallel edges
    *              count with multiplicity
    * @param nodes optional explicit vertex spine (one column `id`) —
    *              pass it when isolated vertices must participate;
    *              defaults to the vertices appearing in `edges`
    * @return (id, pr) — ranks sum to 1 over the node set
    */
  def pageRank(edges: DataFrame, iterations: Int = 10,
      damping: Double = 0.85, nodes: Option[DataFrame] = None): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(damping > 0 && damping < 1, "damping must be in (0, 1)")
    val e = edges.select(col("src"), col("dst"))
    // NULL endpoints leak mass silently: a NULL dst enters the default
    // spine but null never equi-joins, so its contributions vanish each
    // iteration; a NULL src drops from the weighted table yet counts as
    // dangling. Refuse loudly, like the stray-vertex guard below.
    require(e.where(col("src").isNull || col("dst").isNull).isEmpty,
      "edges contain NULL endpoints — rank mass would leak")
    val spine = nodes
      .map(_.select(col("id")).distinct())
      .getOrElse(e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct())
      .localCheckpoint()
    val n = spine.count() // driver scalar: |V| (metadata-class)
    require(n > 0, "graph has no vertices")
    // an explicit spine that omits edge endpoints would silently LEAK
    // rank mass (contributions to missing vertices drop in the spine
    // join), breaking the documented sums-to-1 invariant — refuse loudly
    if (nodes.isDefined) {
      val stray = e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id")))
        .join(spine, Seq("id"), "left_anti")
      require(stray.isEmpty,
        "edges reference vertices missing from the provided node spine " +
          s"(e.g. ${stray.head.get(0)}) — rank mass would leak")
    }
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val weighted = e.join(deg, "src")
      .select(col("src"), col("dst"), (lit(1.0) / col("deg")).as("w"))
      .localCheckpoint()
    val dangling = spine
      .join(deg.withColumnRenamed("src", "id"), Seq("id"), "left_anti")
      .localCheckpoint()
    val base = (1.0 - damping) / n
    var ranks = spine.select(col("id"), lit(1.0 / n).as("pr"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      val dm = ranks.join(dangling, Seq("id"), "left_semi")
        .agg(coalesce(sum(col("pr")), lit(0.0))).head.getDouble(0)
      val contrib = weighted
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst"))
        .agg(sum(col("pr") * col("w")).as("c"))
        .withColumnRenamed("dst", "id")
      val prev = ranks
      ranks = spine.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + lit(damping) *
            (coalesce(col("c"), lit(0.0)) + lit(dm / n))).as("pr"))
        .localCheckpoint()
      // the superseded vector's checkpoint blocks would otherwise stay
      // pinned in the block manager for the session's lifetime —
      // iterations × |V|-row block sets squeezing execution memory
      prev.unpersist()
    }
    // the final vector is checkpointed (lineage truncated), so the
    // loop-invariant inputs can release their blocks too
    spine.unpersist(); weighted.unpersist(); dangling.unpersist()
    ranks
  }
}
