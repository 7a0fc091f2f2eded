package graft.operators

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.parquet.{ParquetOptions, ParquetUtils}
import org.apache.spark.sql.types.StructType

/** Driver-local parquet writes for provably SMALL frames.
  *
  * Every MV refresh pays a distributed write job (plan + schedule +
  * task + commit protocol + footer) for the new state directory and
  * another for the one-row meta pointer — 0.4-0.9 s of fixed driver
  * latency per refresh even when the folded state is a handful of
  * rows. For a frame that fits a row cap, the same bytes can be
  * produced by collecting the rows (one cheap job over the fold's
  * already-checkpointed blocks) and streaming them through Spark's OWN
  * parquet [[org.apache.spark.sql.execution.datasources.OutputWriter]]
  * on the driver thread: [[ParquetUtils.prepareWrite]] configures the
  * identical WriteSupport/compression/rebase settings the distributed
  * write uses, so the file is encoding-identical — just without a job
  * per write.
  *
  * This is NOT result caching: the rows are computed from the same
  * plan the distributed write would run, per invocation. It is the
  * "driver should do almost no data work" rule's complement: a 1-row
  * meta pointer IS no data work, and round-tripping it through the
  * cluster scheduler is pure overhead.
  *
  * Scale: callers gate on [[cap]] — a state that outgrows it (the
  * 100 TB regime) takes the distributed write exactly as before. The
  * FS comes from the path, so non-local filesystems work unchanged.
  */
object DriverParquet {

  /** Direct-write row cap. Above it callers fall back to the
    * distributed write; the probe that discovers the overflow is a
    * `limit(cap+1)` take — partition-incremental, never a full scan.
    * Env-overridable for A/B and for clusters that want it off (0). */
  val cap: Int = sys.env.get("SPARK_GRAFT_DIRECT_WRITE_CAP")
    .flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(4096)

  /** Stream `rows` (plan-output InternalRows of `schema`) into ONE
    * parquet part file under `dir` (created if needed), named like a
    * normal Spark output file. Files already in `dir` are untouched. */
  def writeRows(df: DataFrame, schema: StructType,
      rows: Iterator[InternalRow], dir: String): Unit = {
    val spark = df.sparkSession
    val hadoopConf = spark.sessionState.newHadoopConf()
    val job = Job.getInstance(hadoopConf)
    val factory = ParquetUtils.prepareWrite(spark.sessionState.conf,
      job, schema,
      new ParquetOptions(Map.empty[String, String],
        spark.sessionState.conf))
    val ctx = new TaskAttemptContextImpl(job.getConfiguration,
      new TaskAttemptID(new TaskID(new JobID(UUID.randomUUID.toString, 0),
        TaskType.MAP, 0), 0))
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(job.getConfiguration)
    if (!fs.exists(dirPath)) fs.mkdirs(dirPath)
    val file = new Path(dirPath,
      s"part-00000-${UUID.randomUUID}-c000${factory.getFileExtension(ctx)}")
    val writer = factory.newInstance(file.toString, schema, ctx)
    try rows.foreach(writer.write) finally writer.close()
  }

  /** Probe-and-write: collect up to cap+1 rows of `df`; within the cap,
    * write them as one file under `dir` and return true. Over the cap
    * (or with the cap disabled) return false with NOTHING written —
    * the caller runs its usual distributed write. `dir` must be a
    * fresh directory (the flip-don't-overwrite state contract). */
  def writeIfSmall(df: DataFrame, dir: String): Boolean =
    cap > 0 && {
      val rows =
        df.limit(cap + 1).queryExecution.executedPlan.executeCollect()
      rows.length <= cap && {
        writeRows(df, df.schema, rows.iterator, dir)
        true
      }
    }

  /** Bucket-manifested variant of [[writeIfSmall]]: probe `df` with
    * the bucket id APPENDED (ordinal = df's field count, so the data
    * schema's ordinals 0..n-1 are untouched and the writer simply
    * never reads the id); within the cap, write one file per present
    * `__b=<i>` dir plus the `_schema` anchor — the exact layout
    * `Materialize.writeBucketed`'s repartition + partitionBy job
    * produces, without the exchange, the job, or the commit. */
  def writeBucketedIfSmall(df: DataFrame,
      bucketId: org.apache.spark.sql.Column, dir: String): Boolean =
    cap > 0 && {
      val withB = df.withColumn("__b", bucketId)
      val rows =
        withB.limit(cap + 1).queryExecution.executedPlan.executeCollect()
      rows.length <= cap && {
        val n = df.schema.length
        // the writer consumes row.numFields, so strip the appended
        // bucket id with a prefix projection (each row is fully
        // serialized before the next apply — buffer reuse is safe)
        val proj = org.apache.spark.sql.catalyst.expressions
          .UnsafeProjection.create(
            df.schema.fields.zipWithIndex.map { case (f, i) =>
              org.apache.spark.sql.catalyst.expressions
                .BoundReference(i, f.dataType, f.nullable)
            }.toSeq)
        rows.groupBy(_.getInt(n)).foreach { case (b, rs) =>
          writeRows(df, df.schema, rs.iterator.map(proj(_)),
            s"$dir/__b=$b") }
        writeRows(df, df.schema, Iterator.empty, s"$dir/_schema")
        true
      }
    }

  /** Overwrite `dir` with `df`'s rows (must be tiny — the MV meta
    * shape: a one-row local relation). Replaces SaveMode.Overwrite's
    * delete-then-distributed-write with write-new-file-then-delete-old
    * — one driver job fewer, and a concurrent reader sees old or new
    * bytes rather than a mid-overwrite empty directory. */
  def overwriteSmall(df: DataFrame, dir: String): Unit = {
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(
      df.sparkSession.sessionState.newHadoopConf())
    val old =
      if (fs.exists(dirPath)) fs.listStatus(dirPath).filter(_.isFile)
      else Array.empty[org.apache.hadoop.fs.FileStatus]
    val rows = df.queryExecution.executedPlan.executeCollect()
    writeRows(df, df.schema, rows.iterator, dir)
    old.foreach(s => fs.delete(s.getPath, false))
  }
}
