package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{GraftIndexes, GraftSparkExtensions}

/** Covered-index rewrite (reference QueryOptimizer.java:103,652): a query
  * whose references are covered by a registered PK-sorted projection and
  * whose predicate leads with the index key scans the INDEX, never the
  * base table — and inherits the index's file pruning on that key. */
class IndexRewriteSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private lazy val (baseDir, idxDir): (String, String) = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_idx_base").toString
    val idx = java.nio.file.Files.createTempDirectory("graft_idx_idx").toString
    val df = (0L until 1000L)
      .map(i => (i, s"name_$i", (i * 7) % 1000, s"extra_$i"))
      .toDF("k", "name", "v", "extra")
    df.repartitionByRange(4, $"k").sortWithinPartitions($"k")
      .write.mode("overwrite").parquet(base)
    // the "index": projection re-sorted by v, covering (v, k, name)
    df.select($"v", $"k", $"name")
      .repartitionByRange(4, $"v").sortWithinPartitions($"v")
      .write.mode("overwrite").parquet(idx)
    (base, idx)
  }

  private def base = spark.read.format("graftpk").option("pk", "k")
    .load(baseDir)

  private def scans(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.description()
    }

  test("covered query with index-key predicate scans the index") {
    import spark.implicits._
    GraftIndexes.register(baseDir,
      GraftIndexes.IndexDef(idxDir, Seq("v")))
    try {
      val q = base.where($"v" === 441L).select($"k", $"name")
      val ds = scans(q)
      assert(ds.nonEmpty && ds.forall(_.contains(idxDir)),
        s"expected index scan, got $ds")
      // correct rows, and only matching files opened (pruning on v)
      val rows = q.orderBy($"k").collect()
      val exp = (0L until 1000L).filter(i => (i * 7) % 1000 == 441)
      assert(rows.map(_.getLong(0)).toSeq == exp)
      assert(q.queryExecution.executedPlan.collect {
        case b: BatchScanExec => b.inputRDD.getNumPartitions
      }.sum == 1, "index key range should prune to one file")
    } finally GraftIndexes.drop(baseDir)
  }

  test("non-covered or keyless queries stay on the base table") {
    import spark.implicits._
    GraftIndexes.register(baseDir,
      GraftIndexes.IndexDef(idxDir, Seq("v")))
    try {
      // references 'extra' which the index does not cover
      val notCovered = base.where($"v" === 441L).select($"k", $"extra")
      assert(scans(notCovered).forall(_.contains(baseDir)))
      assert(notCovered.collect().length == 1)
      // covered columns but no predicate on the index key
      val noKey = base.where($"k" < 10L).select($"k", $"name")
      assert(scans(noKey).forall(_.contains(baseDir)))
      assert(noKey.count() == 10)
    } finally GraftIndexes.drop(baseDir)
  }

  test("unregistered base is untouched") {
    import spark.implicits._
    val q = base.where($"v" === 441L).select($"k", $"name")
    assert(scans(q).forall(_.contains(baseDir)))
  }

  test("a type-divergent index refuses the rewrite; self-registration " +
      "is rejected at register time") {
    import spark.implicits._
    // "index" whose v column is INT where the base declares BIGINT —
    // the rewrite alias keeps the base exprId, so parents would bind an
    // 8-byte read against a 4-byte column: silent corruption. Must
    // refuse and stay on the base.
    val badIdx = java.nio.file.Files
      .createTempDirectory("graft_idx_badtype").toString
    (0L until 1000L).map(i => (((i * 7) % 1000).toInt, i, s"name_$i"))
      .toDF("v", "k", "name")
      .repartitionByRange(4, $"v").sortWithinPartitions($"v")
      .write.mode("overwrite").parquet(badIdx)
    GraftIndexes.register(baseDir,
      GraftIndexes.IndexDef(badIdx, Seq("v")))
    try {
      val q = base.where($"v" === 441L).select($"k", $"name")
      assert(scans(q).forall(_.contains(baseDir)),
        "a type-divergent index column must refuse the rewrite")
    } finally GraftIndexes.drop(baseDir)
    // base-as-its-own-index: the optimizer fixpoint would re-rewrite
    // with fresh exprIds forever — reject at registration
    val e = intercept[IllegalArgumentException] {
      GraftIndexes.register(baseDir,
        GraftIndexes.IndexDef(baseDir, Seq("k")))
    }
    assert(e.getMessage.contains("must differ"))
  }

  test("an index-registration cycle is rejected; a chain is not") {
    // a→b then b→a would ping-pong the relation between the two paths
    // every optimizer iteration — same non-convergence as
    // self-registration, one hop removed. a→b→c converges and stays
    // legal.
    GraftIndexes.register(baseDir,
      GraftIndexes.IndexDef(idxDir, Seq("v")))
    try {
      val e = intercept[IllegalArgumentException] {
        GraftIndexes.register(idxDir,
          GraftIndexes.IndexDef(baseDir, Seq("k")))
      }
      assert(e.getMessage.contains("cycle"))
      // chain: c (a fresh third projection) may index the index
      val cDir = java.nio.file.Files
        .createTempDirectory("graft_idx_chain").toString
      spark.read.parquet(idxDir)
        .write.mode("overwrite").parquet(cDir)
      GraftIndexes.register(idxDir,
        GraftIndexes.IndexDef(cDir, Seq("v")))
      // and closing the 3-cycle c→a is still caught through the walk
      val e3 = intercept[IllegalArgumentException] {
        GraftIndexes.register(cDir,
          GraftIndexes.IndexDef(baseDir, Seq("k")))
      }
      assert(e3.getMessage.contains("cycle"))
    } finally {
      GraftIndexes.drop(idxDir)
      GraftIndexes.drop(baseDir)
    }
  }
}
