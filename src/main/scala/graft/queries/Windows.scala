package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Det._

/** Window functions — SURVEY.md §2.5.
  *
  * Scale shape: one shuffle on the partition key, then a per-partition
  * sort — Spark's WindowExec streams frames without materializing the
  * whole partition for ranking/running frames. Partition keys here
  * (nation, customer) have bounded per-key row counts; at 100 TB a
  * skewed key would need salting, noted per query where relevant.
  *
  * Determinism: every ORDER BY inside a window carries a unique tie-break
  * column whenever row identity matters (row_number, ntile, lag/lead,
  * running frames); rank/dense_rank deliberately order by the coarse key
  * alone — their results depend only on key values, not row order.
  */
object Windows {

  /** win_rank — row_number / rank / dense_rank / ntile(4) per nation over a
    * coarse balance bucket (real ties exercise rank vs dense_rank). */
  val winRank: Q = (s, d) => {
    val base = Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .withColumn("bal_k", floor(col("c_acctbal") / 1000))
    val unique = Window.partitionBy("n_name").orderBy(col("bal_k").desc, col("c_custkey"))
    val ties   = Window.partitionBy("n_name").orderBy(col("bal_k").desc)
    base.select(
        col("n_name"), col("c_custkey"), col("bal_k"),
        row_number().over(unique).cast("long").as("rn"),
        rank().over(ties).cast("long").as("rnk"),
        dense_rank().over(ties).cast("long").as("drnk"),
        ntile(4).over(unique).cast("long").as("nt"))
      .orderBy("n_name", "rn")
  }

  /** win_lag_lead — previous/next order price per customer by date. */
  val winLagLead: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate").cast("date").as("o_date"),
        col("o_totalprice"),
        lag("o_totalprice", 1).over(w).as("prev_price"),
        lead("o_totalprice", 1).over(w).as("next_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** win_running — cumulative spend per customer (ROWS unbounded-preceding
    * frame; both engines fold the same row order → identical sums). */
  val winRunning: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate").cast("date").as("o_date"),
        r4(sum("o_totalprice").over(w)).as("run_total"),
        count(lit(1)).over(w).as("run_n"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** win_range_frame — trailing-30-day moving spend per customer: RANGE
    * frame over a numeric day key (ties on the same day all included). */
  val winRangeFrame: Q = (s, d) => {
    val withDay = Tables.orders(s, d)
      .withColumn("day", datediff(col("o_orderdate"), lit("1970-01-01")).cast("long"))
    val w = Window.partitionBy("o_custkey").orderBy(col("day")).rangeBetween(-30, 0)
    withDay
      .select(
        col("o_custkey"), col("o_orderkey"), col("day"),
        r4(sum("o_totalprice").over(w)).as("mov_sum"),
        count(lit(1)).over(w).as("mov_n"))
      .orderBy("o_custkey", "day", "o_orderkey")
  }

  /** win_first_last — first/last value over the full partition with an
    * explicit unbounded frame (default frame would cut last_value at the
    * current row — the classic trap, pinned explicitly on both sides). */
  val winFirstLast: Q = (s, d) => {
    val w = Window.partitionBy("n_name")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .select(
        col("n_name"), col("c_custkey"),
        first("c_name").over(w).as("top_name"),
        last("c_name").over(w).as("bottom_name"))
      .orderBy("n_name", "c_custkey")
  }

  /** win_scd2 — slowly-changing-dimension (type 2) build: the versioned
    * per-customer priority dimension derived from the orders change
    * stream. The canonical warehouse delivery transform — change
    * detection (lag ≠ current under the strict (eff_date, o_orderkey)
    * order) keeps only version-opening rows, then valid_to = the NEXT
    * version's valid_from (lead over the filtered frame) and
    * is_current = no successor. Same-day re-changes are legal and
    * deterministic: the o_orderkey tie-break orders them, the earlier
    * version closes at its own date (a zero-length interval, the
    * standard SCD2 intraday convention).
    *
    * Scale shape: ONE hash exchange on o_custkey serves BOTH windows —
    * the change filter preserves the first window's partitioning and
    * (eff_date, o_orderkey) sort, so the lead window's requirements
    * are already satisfied and the planner elides its exchange and
    * sort (PlanSpec pins the single-window-exchange shape). Output is
    * versions, not orders: bounded by the change count. */
  val winScd2: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey").orderBy(col("eff_date"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("eff_date"), col("o_orderpriority"))
      .withColumn("prev_prio", lag("o_orderpriority", 1).over(w))
      .where(col("prev_prio").isNull || col("prev_prio") =!= col("o_orderpriority"))
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderpriority").as("prio"),
        col("eff_date").as("valid_from"),
        lead("eff_date", 1).over(
          Window.partitionBy("o_custkey").orderBy(col("eff_date"), col("o_orderkey"))
        ).as("succ"))
      // open versions close at the standard SCD2 far-future sentinel
      // (never NULL: range predicates like `d BETWEEN valid_from AND
      // valid_to` must hit the current version without IS NULL special
      // cases — and NULL dates are also the one value the oracle
      // compare can't total-order)
      .select(col("o_custkey"), col("o_orderkey"), col("prio"), col("valid_from"),
        coalesce(col("succ"), lit("9999-12-31").cast("date")).as("valid_to"),
        col("succ").isNull.as("is_current"))
      .orderBy("o_custkey", "valid_from", "o_orderkey")
  }

  /** win_rfm — RFM customer segmentation (recency / frequency /
    * monetary), the classic warehouse marketing transform: per customer
    * the days since last order, order count, and spend, each scored
    * into quintiles (5 = best: most recent, most frequent, highest
    * spend) and concatenated into the segment code. Scores use ntile(5)
    * under strict total orders (metric, custkey) so both engines bucket
    * identically; monetary is the r4'd exact-scaled sum BEFORE it
    * becomes a sort key (raw double sums order-flip across engines).
    *
    * Scale shape: orders collapse to the CUSTOMER DIMENSION first (one
    * map-side-combined agg), so the three ntile windows run over
    * |customers| rows — dimension-sized, not fact-sized. They are
    * deliberately UNPARTITIONED (RFM quintiles are global by
    * definition); at a customer dimension too large for one sort the
    * two-pass prefix-sum rewrite documented at llm_shard_balance
    * applies — same caveat win_ntile records. The reference date is the
    * corpus max order date (1-row broadcast), not wall clock, so the
    * result is a pure function of the corpus. */
  val winRfm: Q = (s, d) => {
    val o = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("od"),
        col("o_totalprice"))
    val ref = o.agg(max("od").as("ref_date"))
    val cust = o.groupBy("o_custkey")
      .agg(max("od").as("last_od"), count(lit(1)).as("freq"),
           sumR4(col("o_totalprice")).as("monetary"))
      .crossJoin(broadcast(ref))
      .select(col("o_custkey"),
        datediff(col("ref_date"), col("last_od")).cast("long").as("rec_days"),
        col("freq"), col("monetary"))
    val r = ntile(5).over(Window.orderBy(col("rec_days").desc, col("o_custkey")))
    val f = ntile(5).over(Window.orderBy(col("freq"), col("o_custkey")))
    val m = ntile(5).over(Window.orderBy(col("monetary"), col("o_custkey")))
    cust
      .withColumn("r_score", r.cast("long"))
      .withColumn("f_score", f.cast("long"))
      .withColumn("m_score", m.cast("long"))
      .withColumn("segment", concat(col("r_score"), col("f_score"), col("m_score")))
      .orderBy("o_custkey")
  }

  val queries: Map[String, Q] = Map(
    "win_rank"        -> winRank,
    "win_rfm"         -> winRfm,
    "win_lag_lead"    -> winLagLead,
    "win_running"     -> winRunning,
    "win_range_frame" -> winRangeFrame,
    "win_first_last"  -> winFirstLast,
    "win_scd2"        -> winScd2,
  )

  val oracle: Map[String, String] = Map(
    "win_rank" ->
      """SELECT n_name, c_custkey, CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_k,
        | row_number() OVER (PARTITION BY n_name ORDER BY floor(c_acctbal / 1000) DESC, c_custkey) AS rn,
        | rank() OVER (PARTITION BY n_name ORDER BY floor(c_acctbal / 1000) DESC) AS rnk,
        | dense_rank() OVER (PARTITION BY n_name ORDER BY floor(c_acctbal / 1000) DESC) AS drnk,
        | ntile(4) OVER (PARTITION BY n_name ORDER BY floor(c_acctbal / 1000) DESC, c_custkey) AS nt
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY n_name, rn""".stripMargin,
    "win_lag_lead" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date, o_totalprice,
        | lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
        | lead(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_running" ->
      s"""SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
        | ${r4Sql("sum(o_totalprice) OVER w")} AS run_total,
        | count(*) OVER w AS run_n
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_range_frame" ->
      s"""SELECT o_custkey, o_orderkey, day,
        | ${r4Sql("sum(o_totalprice) OVER w")} AS mov_sum,
        | count(*) OVER w AS mov_n
        |FROM (SELECT *, date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day FROM orders)
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY day RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, day, o_orderkey""".stripMargin,
    "win_first_last" ->
      """SELECT n_name, c_custkey,
        | first_value(c_name) OVER w AS top_name,
        | last_value(c_name) OVER w AS bottom_name
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WINDOW w AS (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY n_name, c_custkey""".stripMargin,
    "win_rfm" ->
      s"""WITH o AS (
        | SELECT o_custkey, CAST(o_orderdate AS DATE) AS od, o_totalprice
        | FROM orders),
        |ref AS (SELECT max(od) AS ref_date FROM o),
        |cust AS (
        | SELECT o_custkey,
        |  CAST(datediff('day', max(od), (SELECT ref_date FROM ref)) AS BIGINT) AS rec_days,
        |  count(*) AS freq,
        |  ${sumR4Sql("o_totalprice")} AS monetary
        | FROM o GROUP BY o_custkey),
        |sc AS (
        | SELECT *,
        |  CAST(ntile(5) OVER (ORDER BY rec_days DESC, o_custkey) AS BIGINT) AS r_score,
        |  CAST(ntile(5) OVER (ORDER BY freq, o_custkey) AS BIGINT) AS f_score,
        |  CAST(ntile(5) OVER (ORDER BY monetary, o_custkey) AS BIGINT) AS m_score
        | FROM cust)
        |SELECT o_custkey, rec_days, freq, monetary, r_score, f_score, m_score,
        | CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) || CAST(m_score AS VARCHAR) AS segment
        |FROM sc ORDER BY o_custkey""".stripMargin,
    "win_scd2" ->
      """WITH base AS (
        | SELECT o_custkey, o_orderkey,
        |  CAST(o_orderdate AS DATE) AS eff_date, o_orderpriority
        | FROM orders),
        |chg AS (
        | SELECT *, lag(o_orderpriority, 1) OVER
        |   (PARTITION BY o_custkey ORDER BY eff_date, o_orderkey) AS prev_prio
        | FROM base)
        |SELECT o_custkey, o_orderkey, o_orderpriority AS prio,
        | eff_date AS valid_from,
        | coalesce(lead(eff_date, 1) OVER w, DATE '9999-12-31') AS valid_to,
        | (lead(eff_date, 1) OVER w IS NULL) AS is_current
        |FROM chg
        |WHERE prev_prio IS NULL OR prev_prio <> o_orderpriority
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY eff_date, o_orderkey)
        |ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin,
  )
}
