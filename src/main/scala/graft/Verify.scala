package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Failures are LOUD: a query that throws gets an entry in
  * `outDir/failures.json` and the run exits non-zero. (The pre-round-8
  * shape only stderr-logged, so a broken query simply vanished from the
  * correctness set — q_date_round was silently absent for two rounds.) */
object Verify {
  /** Codec-bound no-oracle queries whose output is nonetheless
    * bit-stable (deterministic JDK render + decode): pinned against
    * committed golden hashes (src/main/resources/goldens.txt, keyed
    * `<sf-basename>/<query>`) so a codec/blocking regression fails the
    * verify run loudly instead of hiding behind "no_oracle". An
    * unpinned (sf, query) prints its hash for committing — regenerate
    * by running Verify at the new scale and pasting the printed line.
    * JVM caveat: the hash pins THIS container's JDK rasterizer/codec
    * output; a JDK major bump may legitimately re-pin. */
  private val goldenPinned = Set("q_image_dedup", "q_audio_dedup",
    "q_image_dedup_incremental", "q_audio_dedup_incremental",
    // seeded-hash text dedups: batch outputs are deterministic (the
    // MinHash permutations, SimHash feature hashes and LSH bands are
    // all fixed-seed), so a hash/banding regression is pinnable even
    // though bucket membership has no SQL spelling
    "q_dedup_minhash", "q_dedup_simhash", "q_dedup_incremental_lsh",
    // deterministic sequential/derived outputs with no SQL spelling:
    // greedy MMR selection, best-fit-decreasing packing, the
    // histogram-trained BPE merge table, zlib ratio buckets, and
    // centroid-seeded semantic dedup are all fixed-seed functions of
    // the fixture — pinnable end to end
    "q_mmr_select", "q_pack_bins", "q_bpe_tokens",
    "q_compression_ratio", "q_dedup_semantic",
    "q_dedup_simhash_incremental", "q_dedup_embedding_lsh")

  /** Order-insensitive canonical hash: rows rendered field-by-field
    * (binary → hex), fields \u0001-joined (an unambiguous separator
    * — spelled as an ESCAPE, not a raw control byte, so reviewers and
    * diffs can see it; plain concatenation would render ("1","23") and
    * ("12","3") identically), rows sorted, newline-joined, SHA-256. */
  def resultHash(df: org.apache.spark.sql.DataFrame): String = {
    val lines = df.collect().map(_.toSeq.map {
      case null => "NULL"
      case b: Array[Byte] => b.map(x => f"$x%02x").mkString
      case x => x.toString
    }.mkString("\u0001")).sorted.mkString("\n")
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(lines.getBytes("UTF-8")).map(b => f"$b%02x").mkString
  }

  def goldens: Map[String, String] = {
    val in = getClass.getResourceAsStream("/goldens.txt")
    if (in == null) Map.empty
    else try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l => val parts = l.split("\\s+"); parts(0) -> parts(1) }.toMap
    finally in.close()
  }

  def main(args: Array[String]): Unit = {
    // optional trailing args: "goldens-only" runs just the golden-pinned
    // queries (fast regeneration after an intentional codec change);
    // any other names run just those queries (local iteration — the
    // driver always runs the full battery)
    val (sfDir, outDir) = (args(0), args(1))
    val rest = args.drop(2).toSeq
    val goldensOnly = rest == Seq("goldens-only")
    val only: Option[Set[String]] =
      if (rest.nonEmpty && !goldensOnly) Some(rest.toSet) else None
    val spark = GraftSession.build("graft-verify")
    new java.io.File(outDir).mkdirs()
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val pins = goldens
    val sfBase = Paths.get(sfDir).getFileName.toString
    val toRun =
      if (goldensOnly) SparkEntry.queries.filter(q => goldenPinned(q._1))
      else only match {
        case Some(names) => SparkEntry.queries.filter(q => names(q._1))
        case None => SparkEntry.queries
      }
    toRun.foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        if (goldenPinned(name)) {
          val key = s"$sfBase/$name"
          val h = resultHash(spark.read.parquet(s"$outDir/$name"))
          pins.get(key) match {
            case Some(g) if g != h =>
              System.err.println(s"[verify] $name GOLDEN MISMATCH: got $h want $g")
              failures += name -> s"golden mismatch at $key: got $h want $g"
            case Some(_) => println(s"[verify] $name golden ok")
            case None => println(s"[verify] unpinned golden: $key $h")
          }
        }
      }
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")}"
        System.err.println(s"[verify] $name FAILED: $msg")
        failures += name -> msg
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/failures.json"), failures
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    spark.stop()
    if (failures.nonEmpty) {
      System.err.println(s"[verify] ${failures.size}/" +
        s"${SparkEntry.queries.size} queries FAILED: " +
        failures.keys.mkString(", "))
      sys.exit(1)
    }
  }
}
