package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism kit (SURVEY.md §7.1 M1, §7.3). Every oracle-checked query is
  * written through these helpers so its parquet dump hash-matches DuckDB:
  *
  *  - doubles: engines differ in the last ulps of float aggregation; both
  *    sides round to 4 decimals (`r4`) so ulp noise collapses.
  *  - timestamps: `events.ts` is ns in the fixture; Spark truncates to µs
  *    on read while DuckDB keeps ns, so raw `ts` must never be output —
  *    emit epoch seconds (`epochS`) or second-truncated values instead.
  *  - int32 aggregates: Spark widens sums to BIGINT; oracle SQL must cast
  *    explicitly. (SQL-side discipline; nothing to do here.)
  *  - row order: the compare is order-sensitive; every query ends in a
  *    total order over a unique tie-break key.
  */
object Det {
  /** Round a double expression to 4 decimals — REQUIRED on every double
    * output column (SURVEY.md §7.3 item 1).
    *
    * NOT the built-in `round`: Spark rounds via BigDecimal HALF_UP on the
    * shortest decimal repr, DuckDB via `std::round(x*10^4)/10^4` — they
    * disagree on .xxxx5-boundary doubles (seen empirically: 33187.24395 →
    * .244 vs .2439). Both sides instead evaluate the identical IEEE
    * expression floor(x*10000 + 0.5)/10000 (`r4Sql` is the oracle twin),
    * so rounding is engine-independent. x*10000 stays < 2^53 for every
    * magnitude in the fixtures → exact. */
  def r4(c: Column): Column = floor(c * 10000 + lit(0.5)) / 10000

  /** Timestamp → epoch seconds as BIGINT. Safe across the ns(µs) divide:
    * both engines agree once sub-second precision is dropped. */
  def epochS(c: Column): Column = unix_timestamp(c)

  /** Average computed as round(sum/count) — more stable across engines
    * than rounding a built-in avg of a long chain (SURVEY.md §7.3). */
  def avgR4(c: Column): Column = r4(sum(c) / count(c))

  /** Oracle-SQL twin of `r4` — splice into DuckDB strings. */
  def r4Sql(e: String): String = s"floor(($e) * 10000 + 0.5) / 10000"

  /** Driver-side twin of `r4` for plain doubles (same IEEE expression). */
  def r4d(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000

  /** Exact engine-independent SUM for money-scale aggregates. Rounding the
    * final double sum is NOT enough once |sum| reaches ~1e10: the two
    * engines accumulate in different orders and drift by more than the
    * 1e-4 rounding step (seen at sf0.1: 12478115489.07 vs …489.0701).
    * Recipe: pre-round each value with `r4` (bit-identical in both
    * engines), convert to DECIMAL(18,4) (the double is within an ulp of
    * k/10⁴, so both engines recover the same integer k regardless of
    * rounding mode), sum exactly in integer arithmetic (order-independent),
    * and emit the decimal — ≤ 4 fractional digits, exact — as a double. */
  def sumR4(c: Column): Column =
    sum(r4(c).cast("decimal(18,4)")).cast("double")

  /** Oracle-SQL twin of `sumR4`. */
  def sumR4Sql(e: String): String =
    s"CAST(sum(CAST(${r4Sql(e)} AS DECIMAL(18,4))) AS DOUBLE)"

  /** Wide twin of `sumR4` for magnitudes past DECIMAL(18,4)'s ~1e14
    * ceiling (4th-power sums, weighted squares at stress scale): the
    * same pre-round-then-exact-integer-sum recipe over DECIMAL(38,4)
    * (int128 in both engines). The final cast to double rounds the SAME
    * exact decimal on both sides → identical IEEE doubles. */
  def sumR4W(c: Column): Column =
    sum(r4(c).cast("decimal(38,4)")).cast("double")

  /** Oracle-SQL twin of `sumR4W`. */
  def sumR4WSql(e: String): String =
    s"CAST(sum(CAST(${r4Sql(e)} AS DECIMAL(38,4))) AS DOUBLE)"

  /** Fine-grain (8-decimal) twin of `r4` for probability-scale values
    * (PageRank masses, per-edge contributions ~1e-4..1e-2) where the 1e-4
    * grain would destroy the signal. Same engine-independence argument:
    * x·1e8 is exact for |x| < 2^53/1e8 ≈ 9e7 — every probability-scale
    * magnitude — and floor + the long→double divide are IEEE-identical
    * in both engines. */
  def r8(c: Column): Column = floor(c * 100000000L + lit(0.5)) / 100000000L

  /** Oracle-SQL twin of `r8`. */
  def r8Sql(e: String): String =
    s"floor(($e) * 100000000 + 0.5) / 100000000"

  /** Exact order-free SUM of r8'd values — the `sumR4` recipe at the
    * 8-decimal grain over DECIMAL(38,8) (int128 both engines): pre-round
    * each value with `r8` (bit-identical), recover the exact scaled
    * integer via the decimal cast, sum exactly, emit as double. */
  def sumR8(c: Column): Column =
    sum(r8(c).cast("decimal(38,8)")).cast("double")

  /** Oracle-SQL twin of `sumR8`. */
  def sumR8Sql(e: String): String =
    s"CAST(sum(CAST(${r8Sql(e)} AS DECIMAL(38,8))) AS DOUBLE)"
}
