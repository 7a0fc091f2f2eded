package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The PK-sort-aware V2 source (SURVEY §4b): ordering reported to
  * Catalyst (sort elision) + leading-PK min/max file pruning. */
class GraftPkSourceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_pk_src").toString
    (0L until 1000L).map(i => (i, s"name_$i", i * 2.5))
      .toDF("k", "name", "v")
      .repartitionByRange(4, $"k")
      .sortWithinPartitions($"k")
      .write.mode("overwrite").parquet(d)
    d
  }

  private def pkRead = spark.read.format("graftpk")
    .option("pk", "k").load(dir)

  test("reads back exactly what vanilla parquet reads") {
    val got = pkRead.orderBy("k").collect()
    val exp = spark.read.parquet(dir).orderBy("k").collect()
    assert(got.length == 1000)
    assert(got.toSeq == exp.toSeq)
  }

  test("reported PK ordering elides per-partition sorts") {
    import spark.implicits._
    val plan = pkRead.sortWithinPartitions($"k")
      .queryExecution.executedPlan
    assert(plan.collect { case s: SortExec => s }.isEmpty,
      s"expected sort elision, got:\n$plan")
    // the same shape over vanilla parquet DOES sort — proves the elision
    // comes from the reported ordering, not the optimizer shortcutting
    val vanilla = spark.read.parquet(dir).sortWithinPartitions($"k")
      .queryExecution.executedPlan
    assert(vanilla.collect { case s: SortExec => s }.nonEmpty)
  }

  test("leading-PK range filter prunes files via footer statistics") {
    import spark.implicits._
    def partitions(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case b: BatchScanExec => b.inputRDD.getNumPartitions
      }.sum
    assert(partitions(pkRead) == 4)
    // keys 0..999 over 4 range files (~250 each): a 10-key range hits 1
    val narrow = pkRead.where($"k" >= 500L && $"k" <= 509L)
    assert(partitions(narrow) == 1, "expected 3 of 4 files pruned")
    assert(narrow.count() == 10) // residual filter still applied
    val point = pkRead.where($"k" === 42L)
    assert(partitions(point) == 1)
    assert(point.select("name").collect()(0).getString(0) == "name_42")
    // a non-PK conjunct must not tighten the PK range (its constant is
    // meaningless as a key bound — pruning on it would drop real rows)
    val mixed = pkRead.where($"k" >= 500L && $"name" === "name_777")
    assert(mixed.count() == 1)
    assert(mixed.select("k").collect()(0).getLong(0) == 777L)
  }

  test("timestamp and boolean columns roundtrip through the reader") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_pk_ts").toString
    (0L until 100L)
      .map(i => (i, java.sql.Timestamp.valueOf(s"2024-01-01 00:0${i % 6}:00"),
        i % 2 == 0))
      .toDF("k", "ts", "flag")
      .repartitionByRange(2, $"k").sortWithinPartitions($"k")
      .write.mode("overwrite").parquet(d)
    val got = spark.read.format("graftpk").option("pk", "k").load(d)
      .orderBy("k").collect()
    val exp = spark.read.parquet(d).orderBy("k").collect()
    assert(got.toSeq == exp.toSeq)
  }

  test("TIMESTAMP(MILLIS) parquet files read at the correct epoch scale") {
    import spark.implicits._
    // Spark timestamps are micros-since-epoch; a MILLIS-annotated INT64
    // column read raw would be off by 1000x (a 2026 timestamp lands in
    // January 1970). The reader must honor the annotation's unit.
    val d = java.nio.file.Files.createTempDirectory("graft_pk_ms").toString
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    try {
      spark.conf.set("spark.sql.parquet.outputTimestampType",
        "TIMESTAMP_MILLIS")
      (0L until 50L)
        .map(i => (i, java.sql.Timestamp.valueOf(
          s"2026-03-01 00:0${i % 6}:00")))
        .toDF("k", "ts")
        .repartitionByRange(2, $"k").sortWithinPartitions($"k")
        .write.mode("overwrite").parquet(d)
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    val got = spark.read.format("graftpk").option("pk", "k").load(d)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getTimestamp(1)))
    val exp = spark.read.parquet(d)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getTimestamp(1)))
    assert(got.toSeq == exp.toSeq)
    assert(got.head._2.toString.startsWith("2026-03-01"),
      s"millis must scale to micros, got ${got.head._2}")
  }

  test("column pruning reaches the parquet reader") {
    val plan = pkRead.select("name").queryExecution.executedPlan
    val scans = plan.collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty)
    assert(scans.head.scan.readSchema().fieldNames.toSeq == Seq("name"))
  }

  test("index registration validates up front; a stale registration " +
      "never fails the query (round-9 fourth review pins)") {
    import graft.plans.GraftIndexes
    val e = intercept[IllegalArgumentException](
      GraftIndexes.register("/tmp/nowhere_base",
        GraftIndexes.IndexDef("/tmp/nowhere_idx", Seq.empty)))
    assert(e.getMessage.contains("at least one key column"))
    // an index dir deleted AFTER registration: the rewrite must refuse
    // and leave the base plan intact, not fail planning
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft_idx_base").toString
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft_idx_gone").toString
    Seq((1L, "a")).toDF("k", "v").write.mode("overwrite").parquet(base)
    Seq((1L, "a")).toDF("k", "v").write.mode("overwrite").parquet(idxDir)
    GraftIndexes.register(base, GraftIndexes.IndexDef(idxDir, Seq("k")))
    try {
      // delete the index files out from under the registration
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(idxDir))
      val df = spark.read.format("graftpk").option("pk", "k").load(base)
        .where(org.apache.spark.sql.functions.col("k") === 1L)
        .select("k", "v")
      assert(df.collect().map(_.getLong(0)).toSeq == Seq(1L),
        "query must fall back to the base scan, not fail planning")
    } finally GraftIndexes.drop(base)
  }

  test("logical annotations: DATE reads as DateType; DECIMAL refuses " +
      "loudly instead of returning unscaled values") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pk_logical").toString
    Seq((1L, java.sql.Date.valueOf("2024-03-15")))
      .toDF("k", "d").write.mode("overwrite").parquet(dir)
    val df = spark.read.format("graftpk").option("pk", "k").load(dir)
    assert(df.schema("d").dataType ==
      org.apache.spark.sql.types.DateType,
      s"DATE annotation must surface as DateType: ${df.schema}")
    assert(df.collect()(0).getDate(1).toString == "2024-03-15",
      "days-since-epoch passthrough must render the same date")
    // DECIMAL-annotated columns store UNSCALED ints: mapping them to
    // the physical type read 123.45 as 12345 — must refuse
    val decDir = java.nio.file.Files
      .createTempDirectory("graft_pk_decimal").toString
    Seq((1L, BigDecimal("123.45")))
      .toDF("k", "m").write.mode("overwrite").parquet(decDir)
    val e = intercept[Exception](
      spark.read.format("graftpk").option("pk", "k").load(decDir)
        .collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("DECIMAL")),
      s"expected the loud DECIMAL refusal, got: ${msgs(e)}")
  }
}
