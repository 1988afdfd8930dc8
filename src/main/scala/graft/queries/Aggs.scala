package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Det._

/** Aggregation operators — SURVEY.md §2.4.
  *
  * All are two-phase hash aggregates in Spark (partial map-side combine,
  * then final agg after a shuffle on the group keys) — the scalable shape
  * for 100 TB: network traffic is one partial row per (partition, group),
  * not per input row. Group cardinalities here are tiny (≤ thousands), so
  * the final stage never skews.
  */
object Aggs {

  /** agg_hash — TPC-H Q1 shape: pricing summary per (returnflag, linestatus).
    * 6 output groups (FIXTURES.md §3). */
  val aggHash: Q = (s, d) =>
    Tables.lineitem(s, d)
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        r4(sum("l_quantity")).as("sum_qty"),
        r4(sum("l_extendedprice")).as("sum_base_price"),
        r4(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
        r4(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))).as("sum_charge"),
        avgR4(col("l_quantity")).as("avg_qty"),
        avgR4(col("l_extendedprice")).as("avg_price"),
        avgR4(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val queries: Map[String, Q] = Map(
    "agg_hash" -> aggHash,
  )

  val oracle: Map[String, String] = Map(
    "agg_hash" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 4) AS sum_qty,
        | round(sum(l_extendedprice), 4) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
        | round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
        | round(sum(l_quantity) / count(*), 4) AS avg_qty,
        | round(sum(l_extendedprice) / count(*), 4) AS avg_price,
        | round(sum(l_discount) / count(*), 4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
  )
}
