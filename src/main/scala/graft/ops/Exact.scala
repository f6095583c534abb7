package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine exact-arithmetic helpers.
  *
  * Two facts drive these:
  *  1. Double summation is order-dependent; Spark's partial aggregation
  *     order differs from any single-threaded oracle, so money totals are
  *     summed as exact integer cents (inputs carry 2 decimals, so
  *     `round(x*100)` is unambiguous — integers up to 2^53 are exact and
  *     addition is associative).
  *  2. Spark's `round(double, n)` rounds the shortest decimal string repr
  *     HALF_UP (`BigDecimal.valueOf`), while DuckDB rounds the binary
  *     value — they disagree exactly on decimal halves. [[sparkRoundSql]]
  *     reproduces Spark's semantics inside DuckDB.
  */
object Exact {

  /** Money column → exact integer cents (Spark side). */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Money expression → exact integer cents (DuckDB oracle side). */
  def centsSql(e: String): String = s"CAST(round(($e)*100) AS BIGINT)"

  // NOTE: do not try to replicate Spark's round(double, n) in the oracle
  // via CAST(x AS VARCHAR) — DuckDB's double→VARCHAR is not Java's
  // shortest round-trip repr, so the replica diverges on halves too.
  // All portable rounding goes through halfUpDiv below instead.

  /** Integer floor division (positive divisor). Kept in long range —
    * the double round-trip is exact below 2^53. A zero divisor yields
    * NULL — the same thing DuckDB's `//` does — instead of the ANSI
    * DIVIDE_BY_ZERO error Spark 4 would raise from `pmod` (an empty
    * document's `length(text)` denominator must not kill the query on
    * one engine while the oracle NULLs it on the other). */
  def floorDiv(a: Column, b: Column): Column =
    when(b === 0, lit(null).cast("long"))
      .otherwise(((a - pmod(a, b)) / b).cast("long"))

  /** round(num/den) HALF_UP in exact integer space (den > 0), i.e.
    * java.math HALF_UP: halves round AWAY from zero. Computed
    * sign-symmetrically from |num| — floor((2·|num| + den)/(2·den))
    * with the sign re-applied — because the two engines' integer
    * division disagree below zero (Spark's pmod-based floorDiv FLOORS,
    * DuckDB's `//` TRUNCATES toward zero: −949900//200 is −4749 there,
    * −4750 here), so a direct formula would silently diverge on every
    * negative amount. Double `round()` is not portable either (Spark
    * rounds the shortest decimal string repr, DuckDB the binary
    * value; they disagree on decimal halves). */
  def halfUpDiv(num: Column, den: Column): Column = {
    val q = floorDiv(abs(num) * 2 + den, den * 2)
    when(num < 0, -q).otherwise(q)
  }

  /** DuckDB mirror of [[halfUpDiv]] (|num| keeps `//` in the
    * nonnegative range where truncation and floor agree). */
  def halfUpDivSql(num: String, den: String): String =
    s"(CASE WHEN ($num) < 0 " +
      s"THEN -((abs($num)*2 + ($den)) // (($den)*2)) " +
      s"ELSE ((($num)*2 + ($den)) // (($den)*2)) END)"

  // --------------------------------------- fixed-format STRING output
  // Raw doubles are a cross-engine hash hazard even when the VALUE is
  // exact: a hasher that stringifies sees Java shortest-repr on one side
  // and DuckDB's own double→VARCHAR on the other (round-1 q06 failed the
  // driver's hash on exactly this while matching bit-for-bit locally).
  // Pinned DECIMAL output is ALSO a hash hazard — the driver reads the
  // oracle side via DuckDB `.df()` (DECIMAL → float64, shortest repr
  // "0.9") but the Spark parquet side via pyarrow (DECIMAL →
  // decimal.Decimal, scale-preserving "0.9000"), so any decimal cell
  // with a trailing zero hashes differently even when numerically equal
  // (round-2: all 23 hash failures were exactly this). Presentation
  // therefore renders a fixed-format STRING on both engines: exact
  // integer units × an exact decimal literal, cast to a pinned
  // DECIMAL(p,s), then to string — "123.45" byte-identical on both
  // sides regardless of how the comparing harness loads each one.
  // (q52_column_profile shipped this pattern in round 2 and passed.)

  private val Hundredth = new java.math.BigDecimal("0.01")
  private val TenThousandth = new java.math.BigDecimal("0.0001")

  /** Exact integer cents → fixed 2-decimal string dollars (Spark side). */
  def dec2(cents: Column): Column =
    (cents * lit(Hundredth)).cast(DecimalType(18, 2)).cast("string")

  /** DuckDB mirror of [[dec2]] (inner BIGINT cast collapses HUGEINT sums
    * so the decimal multiply can't exceed DuckDB's width-38 cap). */
  def dec2Sql(cents: String): String =
    s"CAST(CAST(CAST(($cents) AS BIGINT) * 0.01 AS DECIMAL(18,2)) AS VARCHAR)"

  /** Exact integer 1e-4 units → fixed 4-decimal string (Spark side). */
  def dec4(units: Column): Column =
    (units * lit(TenThousandth)).cast(DecimalType(18, 4)).cast("string")

  /** DuckDB mirror of [[dec4]]. */
  def dec4Sql(units: String): String =
    s"CAST(CAST(CAST(($units) AS BIGINT) * 0.0001 AS DECIMAL(18,4)) AS VARCHAR)"

  /** Computed double → fixed 4-decimal string (Spark side).
    *
    * For genuinely real-valued computed doubles (cosine similarity, RMS
    * norms) where no exact integer representation exists upstream. The
    * input double is bit-identical across engines (same IEEE ops in the
    * same order), so `floor(x*10000 + 0.5)` — identical primitive
    * arithmetic on both — lands on the same integer; `round(x, 4)` would
    * NOT be portable (Spark rounds the shortest decimal string repr,
    * DuckDB the binary value). */
  def dbl4(c: Column): Column =
    dec4(floor(c * 10000 + lit(0.5)).cast("long"))

  /** DuckDB mirror of [[dbl4]]. */
  def dbl4Sql(e: String): String =
    dec4Sql(s"CAST(FLOOR(($e)*10000 + 0.5) AS BIGINT)")
}
