package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Phoenix date ROUND / CEIL / FLOOR to a time unit.
  *
  * Reference semantics (phoenix-core-client
  * .../expression/function/RoundDateExpression.java:147 — fixed-width
  * units; RoundWeekExpression.java:40 / RoundMonthExpression.java:40 /
  * RoundYearExpression — Joda-field units):
  *
  *  - SECOND..DAY are fixed-width: ROUND is half-UP in epoch space
  *    ((t + unit/2) / unit * unit), CEIL snaps up unless already exact,
  *    FLOOR truncates. The division is Java TRUNCATING division
  *    (reference roundTime), so pre-1970 (negative-epoch) inputs snap
  *    TOWARD zero — e.g. FLOOR('1969-12-31 18:00', 'DAY') is
  *    1970-01-01, exactly as the reference computes it. Spark's `%`
  *    carries the dividend's sign (Java semantics), so
  *    `t - (t % unit)` reproduces the truncating grid; pmod's
  *    floor-mod would diverge on every negative-epoch input.
  *  - WEEK / MONTH / YEAR are calendar-width: candidates are the unit
  *    start at-or-before t (L) and the next start (U); ROUND picks the
  *    nearer, resolving an exact midpoint tie to the candidate whose
  *    field value (ISO week number / month / year) is EVEN — Joda's
  *    roundHalfEvenCopy, which Phoenix inherits. WEEK starts Monday.
  *
  * Everything is composed from built-in expressions over integer epoch
  * micros (pmod for floor-to-multiple), so the whole family stays inside
  * whole-stage codegen — no UDFs, no CodegenFallback.
  *
  * Input tolerance: the entry points cast their argument to TIMESTAMP
  * first, so TIMESTAMP_NTZ (what a parquet TIMESTAMP(isAdjustedToUTC=
  * false) column reads as), DATE, and string inputs all work — the
  * engine runs a UTC session, where the NTZ wall clock IS the GMT
  * instant the reference rounds in (`unix_micros` alone rejects NTZ).
  * The cast is a no-op on TimestampType and optimized away.
  */
object DateRound {

  private def asTs(c: Column): Column = c.cast(TimestampType)

  private val MICROS: Map[String, Long] = Map(
    "MILLISECOND" -> 1000L,
    "SECOND" -> 1000000L,
    "MINUTE" -> 60L * 1000000L,
    "HOUR" -> 3600L * 1000000L,
    "DAY" -> 86400L * 1000000L)

  /** Unit names the SQL-name dispatch recognizes as the date form of
    * ROUND/CEIL/FLOOR/TRUNC (reference parse TimeUnit values). */
  val Units: Set[String] = MICROS.keySet ++ Set("WEEK", "MONTH", "YEAR")

  private def isCalendarUnit(u: String) =
    u == "WEEK" || u == "MONTH" || u == "YEAR"

  private def truncName(u: String): String = u.toLowerCase

  private def fixedWidth(u: String, mult: Int): Option[Long] = {
    require(mult >= 1, s"unit multiplier must be >= 1, got $mult")
    val m = MICROS.get(u)
    if (m.isEmpty)
      require(isCalendarUnit(u) && mult == 1,
        if (isCalendarUnit(u))
          s"unit multiplier is only supported for fixed-width units, not $u"
        else s"unknown unit $u")
    m.map(_ * mult)
  }

  /** Unit start at-or-before ts (DAY → 00:00, WEEK → Monday, …). The
    * `mult` form floors to a multiple of the fixed-width unit, e.g.
    * FLOOR(ts, 'MINUTE', 15) — reference RoundDateExpression's divBy. */
  def floorDate(ts0: Column, unit: String, mult: Int = 1): Column = {
    val ts = asTs(ts0)
    val u = unit.toUpperCase(java.util.Locale.ROOT)
    fixedWidth(u, mult) match {
      // ALL fixed-width units go through epoch-micros arithmetic — the
      // same grid ceil/round use. A date_trunc here would snap to
      // SESSION-TIMEZONE boundaries, so in a non-UTC session
      // floor(ts,'DAY') could differ from the day ceil/round snap to
      // (the reference rounds every fixed unit in GMT epoch space).
      case Some(m) =>
        val t = unix_micros(ts)
        timestamp_micros(t - (t % lit(m)))
      case _ => date_trunc(truncName(u), ts)
    }
  }

  /** Next unit start strictly after ts unless ts is already exact. */
  def ceilDate(ts0: Column, unit: String, mult: Int = 1): Column = {
    val ts = asTs(ts0)
    val u = unit.toUpperCase(java.util.Locale.ROOT)
    fixedWidth(u, mult) match {
      case Some(m) =>
        // floor(t + unit - 1µs) to a multiple of unit
        val t = unix_micros(ts) + lit(m - 1)
        timestamp_micros(t - (t % lit(m)))
      case None =>
        val l = date_trunc(truncName(u), ts)
        when(l === ts, ts).otherwise(nextStart(l, u))
    }
  }

  /** Nearest unit boundary; fixed units half-up, calendar units half-even
    * (see object doc). */
  def roundDate(ts0: Column, unit: String, mult: Int = 1): Column = {
    val ts = asTs(ts0)
    val u = unit.toUpperCase(java.util.Locale.ROOT)
    fixedWidth(u, mult) match {
      case Some(m) =>
        val t = unix_micros(ts) + lit(m / 2)
        timestamp_micros(t - (t % lit(m)))
      case None =>
        val l = date_trunc(truncName(u), ts)
        val up = nextStart(l, u)
        val dLo = unix_micros(ts) - unix_micros(l)
        val dHi = unix_micros(up) - unix_micros(ts)
        val loFieldEven = pmod(fieldOf(l, u), lit(2)) === 0
        when(dLo < dHi, l)
          .when(dLo > dHi, up)
          .otherwise(when(loFieldEven, l).otherwise(up))
    }
  }

  private def nextStart(unitStart: Column, u: String): Column = u match {
    case "WEEK" => unitStart + expr("INTERVAL 7 DAYS")
    case "MONTH" => add_months(unitStart.cast(DateType), 1)
      .cast(TimestampType)
    case "YEAR" => add_months(unitStart.cast(DateType), 12)
      .cast(TimestampType)
  }

  private def fieldOf(boundary: Column, u: String): Column = u match {
    case "WEEK" => weekofyear(boundary) // ISO week, matches Joda weekOfWeekyear
    case "MONTH" => month(boundary)
    case "YEAR" => year(boundary)
  }
}
