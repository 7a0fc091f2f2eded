package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped persisted artifacts shared by the serving-path
  * queries (BM25 postings, the positional phrase index, PQ/IVF/IVF-PQ
  * ANN indexes): built ONCE per (artifact, source dir), persisted to
  * parquet, and read back.
  *
  * This is the production split made explicit: an index is built once
  * and served many times, so a benchmarked top-k query should time the
  * SERVING path — re-deriving the index inside every repetition of a
  * search benchmarks nothing a user ever runs. It also makes the
  * layout claims physically real: the postings artifact is range-
  * partitioned by term on disk, so a phrase/BM25 query's term filter
  * prunes parquet FILES (not just in-memory partitions), and an ANN
  * search projecting the 8-byte code column reads only that column.
  *
  * Build cost is not hidden: per-artifact build seconds are recorded in
  * [[buildSeconds]] and reported once by [[graft.Bench]] alongside the
  * per-query serving times.
  */
object Artifacts {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Seq[String]]()
  /** (artifact name, source dir) → build wall seconds — keyed like the
    * build cache itself, so a both-scale session (sf0.01 then sf0.1 in
    * one JVM) keeps one entry PER build instead of the second scale
    * silently overwriting the first's accounting. */
  val buildSeconds =
    new java.util.concurrent.ConcurrentHashMap[(String, String), java.lang.Double]()

  /** An n-part artifact (e.g. IVF-PQ = centroids + codebook + codes):
    * `build` runs once per (name, dir); every later call reads the
    * persisted parquet parts. */
  def parts(s: SparkSession, dir: String, name: String, n: Int)(
      build: => Seq[DataFrame]): Seq[DataFrame] = {
    val paths = cache.computeIfAbsent((name, dir), _ => {
      val t0 = System.nanoTime()
      val dfs = build
      require(dfs.length == n, s"artifact $name: expected $n parts")
      val ps = dfs.zipWithIndex.map { case (df, i) =>
        val p = java.nio.file.Files
          .createTempDirectory(s"graft_art_${name}_$i").toString
        df.write.mode("overwrite").parquet(p)
        p
      }
      buildSeconds.put((name, dir), (System.nanoTime() - t0) / 1e9)
      ps
    })
    paths.map(s.read.parquet)
  }

  def one(s: SparkSession, dir: String, name: String)(
      build: => DataFrame): DataFrame =
    parts(s, dir, name, 1)(Seq(build)).head

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(String, String), AnyRef]()

  /** Mixed artifacts whose build yields driver-side state (a trained
    * codebook / centroid array) alongside DataFrames: the whole value
    * is memoized per (name, dir); persist the DataFrame components
    * inside `build` via [[persisted]] so later reads serve from
    * parquet. */
  def memoized[T <: AnyRef](dir: String, name: String)(build: => T): T =
    memo.computeIfAbsent((name, dir), _ => {
      val t0 = System.nanoTime()
      val v = build
      buildSeconds.put((name, dir), (System.nanoTime() - t0) / 1e9)
      v.asInstanceOf[AnyRef]
    }).asInstanceOf[T]

  /** Write a DataFrame artifact component to parquet and return the
    * read — the serving path scans files (column pruning, stats). */
  def persisted(s: SparkSession, name: String)(df: DataFrame): DataFrame = {
    val p = java.nio.file.Files
      .createTempDirectory(s"graft_art_$name").toString
    df.write.mode("overwrite").parquet(p)
    s.read.parquet(p)
  }
}
