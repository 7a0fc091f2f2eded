package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Physical layout control for scale: PK-bucketed + PK-sorted tables,
  * and Z-order multi-column clustering.
  *
  * Phoenix gets join/aggregation locality from the HBase rowkey order
  * (SURVEY.md §1.1 RowKeySchema); the Spark-native equivalent is
  * bucketing: writing both sides of a recurring equi-join bucketed and
  * sorted by the key lets Spark plan the join with NO exchange and NO
  * sort — at 100 TB the dominant cost of a fact-fact join is exactly
  * that shuffle, paid once at write time instead of per query.
  */
object Layout {

  /** Write df as a bucketed+sorted managed table (session catalog).
    * Joins/groupBys between tables bucketed on the same keys with the
    * same bucket count plan shuffle-free. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Read back a bucketed table (bucket metadata comes from the catalog;
    * plain spark.read.parquet on the files would lose it). */
  def readBucketed(spark: org.apache.spark.sql.SparkSession,
      table: String): DataFrame = spark.table(table)

  /** Z-order (Morton) clustering: return `df` redistributed and sorted so
    * that a write produces files whose parquet min/max statistics prune
    * scans filtered on ANY of `cols` — a single sort key prunes only its
    * own column; bit-interleaved quantile buckets give every z column
    * locality in the same linear order (the Delta/Iceberg OPTIMIZE ZORDER
    * layout, paid once at write time instead of per query).
    *
    * Scale shape: numeric/date/timestamp boundaries come from ONE
    * approxQuantile pass (a bounded QuantileSummaries sketch aggregated
    * to the driver — same pattern as the IVF training sample,
    * Similarity.scala); STRING columns get order-preserving split
    * points from a bounded hash-ordered driver sample (the
    * RangePartitioner recipe, stride-picked over the sorted sample —
    * quantiles in distinct-value space), so string predicates prune by
    * RANGE, not just equality; BINARY clusters by stable hash
    * (equality pruning only). The z-value itself is a scan-local
    * codegen'd kernel ([[graft.functions.ZOrderMath]]); the only
    * shuffle is the range repartition that any clustered write pays.
    *
    * `bits` buckets per column (2^bits); cols.size * bits must fit a
    * long. NULL/NaN values sort first (bucket 0). Row content is
    * untouched — only order changes. */
  def zorderBy(df: DataFrame, cols: Seq[String], numPartitions: Int,
      bits: Int = 10): DataFrame = {
    val k = cols.size
    // bits itself must be bounded, not just k*bits: bits=31 passes a
    // 2-column k*bits<=62 check yet 1<<31 overflows Int to a negative
    // bucket count; bits in the high teens allocates millions of
    // quantile probabilities on the driver; bits=0 is a silent no-op
    // (every row z=0). 16 bits = 65536 buckets per column, already far
    // past any useful clustering resolution.
    require(bits >= 1 && bits <= 16, s"bits must be 1..16, got $bits")
    require(k >= 1 && k * bits <= 62,
      s"z-order needs 1..${62 / bits} columns at $bits bits, got $k")
    require(numPartitions >= 1, "numPartitions must be positive")
    graft.functions.GraftFunctions.registerKernels(df.sparkSession)
    val nB = 1 << bits

    // string columns: sorted split points from a bounded sample of the
    // DISTINCT values (distinct BEFORE the limit — a heavy-hitter value
    // would otherwise fill the whole sample with copies of itself and
    // the column would silently lose its split points), hash-of-value
    // ordered so the truncation is a deterministic pseudo-random pick,
    // truncated to 64 chars to bound driver memory (any consistent
    // prefix rule yields valid split points). Sorted by UTF8String
    // BYTE order, not java.lang.String's UTF-16 code-unit order — the
    // scan-side kernel binary-searches with UTF8String.compareTo, and
    // the two orders disagree between supplementary characters and
    // [U+E000, U+FFFF]; a driver-side String sort would hand the
    // kernel an unsorted array there
    def stringBounds(c: String): Array[String] = {
      val distinct = df.select(substring(col(c), 1, 64).as("s"))
        .where(col("s").isNotNull)
        .distinct()
        .orderBy(xxhash64(col("s")))
        .limit(math.max(4 * nB, 4096))
        .collect()
        .map(r => org.apache.spark.unsafe.types.UTF8String
          .fromString(r.getString(0)))
        .sortWith(_.compareTo(_) < 0)
        .map(_.toString)
      // distinct values, dense from 0: duplicate split points would
      // scatter a low-cardinality column over sparse bucket multiples,
      // wasting the fine interleave bits the z-curve packs lowest
      if (distinct.length <= 1) Array.empty
      else if (distinct.length <= nB) distinct.drop(1)
      else Array.tabulate(nB - 1)(j =>
        distinct(((j + 1).toLong * distinct.length / nB).toInt))
    }

    // per column: (normalized double column, boundary slice or null for
    // "sketch it with approxQuantile")
    def norm(c: String): (Column, Array[Double]) = df.schema(c).dataType match {
      // unix_date/unix_micros, not a numeric cast: ANSI mode (the
      // session default) rejects timestamp→double casts
      case _: NumericType => (col(c).cast(DoubleType), null)
      case DateType => (unix_date(col(c)).cast(DoubleType), null)
      case TimestampType | TimestampNTZType =>
        (unix_micros(col(c).cast(TimestampType)).cast(DoubleType), null)
      case StringType =>
        // the scan-side kernel maps each value to its dense rank among
        // the splits; the z_value boundaries become the identity splits
        // j+0.5 (count of splits <= integer rank b is exactly b)
        val splits = stringBounds(c)
        (call_function("z_str_bucket", col(c), typedlit(splits.toSeq))
          .cast(DoubleType),
          Array.tabulate(splits.length)(j => j + 0.5))
      case BinaryType => (xxhash64(col(c)).cast(DoubleType), null)
      case dt => throw new IllegalArgumentException(
        s"z-order column $c: unsupported type $dt (numeric, date, " +
          "timestamp, string, binary)")
    }
    val zcNames = cols.indices.map(i => s"__zc$i")
    require(!("__z" +: zcNames).exists(df.columns.contains),
      "df already has a __z / __zc column")
    val normed = cols.map(norm)
    val proj = df.select(df.columns.map(col) ++
      normed.zip(zcNames).map { case ((e, _), n) => e.as(n) }: _*)

    // one sketch pass for ALL quantile-bucketed columns; up to 2^bits-1
    // boundaries each (string columns already carry dense rank ids)
    val probs = (1 until nB).map(_.toDouble / nB).toArray
    val sketchNames = zcNames.zip(normed).collect {
      case (n, (_, null)) => n
    }
    val sketchedByName = sketchNames.zip(proj.stat
      .approxQuantile(sketchNames.toArray, probs, 0.5 / nB)).toMap
    // DISTINCT boundaries per column (an all-null column has none —
    // every row takes bucket 0), padded to a fixed 2^bits-1 slice with
    // +Inf the kernel never reads; z_value scales each column's bucket
    // by its own boundary count so low-cardinality columns still spread
    // over the full bit range (otherwise the curve degenerates to
    // highest-entropy-column-major order)
    val slices = zcNames.zip(normed).map {
      case (n, (_, null)) => sketchedByName(n).distinct
      case (_, (_, fixed)) => fixed
    }
    val counts = slices.map(_.length)
    require(counts.forall(_ <= nB - 1), "boundary slice exceeds 2^bits-1")
    val flat = slices.flatMap(s =>
      s ++ Array.fill(nB - 1 - s.length)(Double.PositiveInfinity)).toArray

    proj
      .withColumn("__z", call_function("z_value",
        array(zcNames.map(col): _*), typedlit(flat),
        typedlit(counts), lit(bits)))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .select(df.columns.map(col): _*)
  }

  /** Z-order `df` on `cols` and write it as parquet at `path` in
    * `numFiles` clustered files. */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
      numFiles: Int, bits: Int = 10): Unit =
    zorderBy(df, cols, numFiles, bits)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Token-budget sharded export — the training-data delivery layout:
    * documents are assigned to shards by the corpus-wide token prefix
    * sum (shard = floor(cumulative tokens / budget), the
    * [[Curation.packSequences]] machinery: deterministic hash order,
    * two-phase prefix sum, no single-partition window), so every shard
    * except the last carries ≈ `tokensPerShard` tokens regardless of
    * document-length skew, and the assignment is reproducible across
    * runs and layouts. Documents never split across shards (a doc that
    * crosses the boundary lands in the shard its FIRST token falls in
    * — boundary-splitting docs themselves is
    * [[Curation.packSequencesSplit]]'s job upstream).
    *
    * Written `PARTITIONBY(shard)`, so a trainer reading shard k prunes
    * every other shard's files at listing time, and shards can be
    * consumed/replicated independently. */
  def writeShardedByTokens(df: DataFrame, idCol: String, tokCol: String,
      path: String, tokensPerShard: Long, partitions: Int = 32): Unit = {
    // the OUTPUT column collides too: a df that already carries a
    // 'shard' column (common in re-export flows) would produce two and
    // fail partitionBy with an ambiguous reference at write time
    require(!df.columns.contains("shard"),
      "input already has a 'shard' column — rename it before the " +
        "token-sharded export (the export writes its own)")
    // NULL ids can't join back to their bin — they would silently
    // vanish from the export (packSequences hashes the id, so they
    // would corrupt the prefix sums anyway); refuse loudly
    val guarded = df.withColumn(idCol,
      when(col(idCol).isNull, raise_error(lit(
        s"writeShardedByTokens: NULL id in '$idCol' — every doc must " +
          "carry a join-able id"))).otherwise(col(idCol)))
    // the helper join column gets a reserved name: a plain "doc" would
    // collide with a caller whose idCol IS "doc", and drop("doc") then
    // removes BOTH columns — shipping shards with no id at all
    val bins = Curation
      .packSequences(guarded, idCol, tokCol, tokensPerShard, partitions)
      .select(col("doc").as("__shard_doc"),
        col("bin").cast("int").as("shard"))
    // duplicate ids fan the join out quadratically per duplicate group
    // (the doc written multiple times into its shard, token budgets
    // silently blown) — same loud-guard philosophy as the NULL check:
    // refuse in-plan via a per-id occurrence count
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
    // the guard rides idCol itself (a dropped helper column would be
    // pruned out of the plan, raise_error and all)
    val dupGuarded = guarded
      .withColumn("__id_n", count(lit(1)).over(w))
      .withColumn(idCol, when(col("__id_n") > 1, raise_error(lit(
        s"writeShardedByTokens: duplicate ids in '$idCol' — the bin " +
          "join would duplicate documents into the export")))
        .otherwise(col(idCol)))
      .drop("__id_n")
    dupGuarded.join(bins, dupGuarded(idCol) === bins("__shard_doc"))
      .drop("__shard_doc")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard").parquet(path)
  }
}
