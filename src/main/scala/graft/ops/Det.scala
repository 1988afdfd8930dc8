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
}
