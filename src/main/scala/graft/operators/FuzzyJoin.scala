package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Edit-distance similarity self-join (fuzzy matching — entity/name
  * resolution, near-identical record linkage) without a cross join.
  *
  * The scale shape is q-gram PREFIX FILTERING (Gravano et al., VLDB
  * 2001 "Approximate string joins in a database (almost) for free";
  * prefix selection per Xiao et al., "Ed-Join", VLDB 2008): d edit
  * operations destroy at most q·d of a string's q-grams, so two strings
  * within edit distance d must share a q-gram among each one's q·d + 1
  * GLOBALLY RAREST grams (rarest-first makes the join key selective —
  * the same property [[Dedup.containmentPairs]] exploits for set
  * overlap). Candidates join on those prefix grams only, prune by the
  * length filter ||a|−|b|| ≤ d, and verify with the exact built-in
  * `levenshtein` (codegen'd). Completeness requires every string to
  * carry more than q·d grams, i.e. length ≥ q·(d+1); shorter strings
  * make zero-overlap true pairs possible, so the operator FAILS LOUDLY
  * on them (route short strings to a broadcast pass upstream if the
  * domain has them — same loud-guard contract as `Temporal.rangeJoin`).
  */
object FuzzyJoin {

  /** Character q-grams of an ALREADY-PROJECTED string column (pass a
    * materialized column), in order, duplicates kept. */
  private def qgrams(s: Column, q: Int): Column =
    transform(sequence(lit(1), length(s) - (q - 1)),
      i => s.substr(i, lit(q)))

  /** All pairs (id_a < id_b) with levenshtein(s_a, s_b) ≤ maxDist.
    *
    * @param df      input; one string per row
    * @param strCol  the string column (length must be ≥ q·(maxDist+1) —
    *                loud in-plan assert otherwise)
    * @param idCol   integral id
    * @param maxDist inclusive edit-distance threshold
    * @param q       q-gram width (2 suits short identifier-like strings)
    * @param maxBucket degenerate-gram cap, same contract as the LSH
    *                paths: a prefix gram shared by more than this many
    *                strings is dropped from candidate generation —
    *                with rarest-first prefixes this fires only on
    *                pathological corpora (e.g. one string value
    *                repeated everywhere), which exact dedup collapses
    *                first
    * @return (id_a, id_b, dist)
    */
  def editDistancePairs(df: DataFrame, strCol: String, idCol: String,
      maxDist: Int, q: Int = 2,
      maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame = {
    require(maxDist >= 0 && q >= 1, s"bad maxDist=$maxDist q=$q")
    val prefixLen = q * maxDist + 1
    // NULL strings can participate in no pair (levenshtein(null, x) is
    // null) — drop them; reaching the assert below they would abort
    // the whole job with a NULL condition AND a NULL error message
    val base = df.where(col(strCol).isNotNull)
      .select(col(idCol).as("id"), col(strCol).as("s"))
      // completeness guard: < q·(maxDist+1) chars → fewer than
      // prefixLen grams → a true pair could share zero grams. The
      // assert rides a filter so the optimizer cannot prune it.
      .where(coalesce(
        assert_true(length(col("s")) >= q * (maxDist + 1),
          concat(lit(s"editDistancePairs: string shorter than " +
            s"q*(maxDist+1) = ${q * (maxDist + 1)} breaks the q-gram " +
            "completeness bound — filter or broadcast-join short " +
            "strings upstream (got '"), col("s"), lit("')"))),
        lit(true)))
    val grams = base
      .select(col("id"), col("s"), explode(qgrams(col("s"), q)).as("g"))
    // global gram frequencies make "rarest" well-defined and stable
    val freq = grams.groupBy(col("g")).agg(count(lit(1)).as("f"))
    // per string: the prefixLen rarest grams (freq, then gram, then a
    // per-string duplicate-occurrence rank keeps the choice total)
    val w = Window.partitionBy(col("id"))
      .orderBy(col("f"), col("g"))
    val prefix = grams.join(freq, "g")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= prefixLen)
      .select(col("id"), col("s"), col("g"))
    // degenerate-gram cap (post-prefix — prefixes are rare by
    // construction, so this is a pathology guard, not a filter)
    val small = prefix.groupBy(col("g")).agg(count(lit(1)).as("n"))
      .where(col("n") <= maxBucket).select(col("g"))
    val kept = prefix.join(small, "g")
    val a = kept.toDF("g", "id_a", "s_a")
    val b = kept.toDF("g", "id_b", "s_b")
    a.join(b, "g")
      .where(col("id_a") < col("id_b") &&
        abs(length(col("s_a")) - length(col("s_b"))) <= maxDist)
      .select(col("id_a"), col("id_b"), col("s_a"), col("s_b"))
      .distinct()
      .select(col("id_a"), col("id_b"),
        levenshtein(col("s_a"), col("s_b")).as("dist"))
      .where(col("dist") <= maxDist)
  }
}
