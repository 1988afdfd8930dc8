package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Det._

/** Sort / limit / top-k — SURVEY.md §2.6.
  *
  * Scale design: global `orderBy` is a range-partitioned distributed sort
  * (sampled boundaries, no single-node funnel); `orderBy.limit(k)` compiles
  * to TakeOrderedAndProject — per-partition top-k then a k-row merge on the
  * driver, which is THE scalable global-top-k shape; per-group top-k is a
  * windowed row_number, shuffling once on the group key.
  */
object Sorts {

  /** sort_multikey — TPC-H Q3-shape: revenue per order, globally ordered by
    * (revenue DESC, date ASC, key ASC). Sort key is the *rounded* revenue so
    * both engines order identical values. */
  val sortMultikey: Q = (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(r4(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
      .select(col("l_orderkey"), col("o_orderdate").cast("date").as("o_date"), col("revenue"))
      .orderBy(col("revenue").desc, col("o_date"), col("l_orderkey"))

  /** limit_topk — global top-100 orders by price (TakeOrderedAndProject;
    * asserted in SortSpec). Raw doubles: compared, never recomputed. */
  val limitTopk: Q = (s, d) =>
    Tables.orders(s, d)
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  /** topk_per_group — top-3 parts by revenue within each brand via
    * windowed row_number (oracle uses the same window, not QUALIFY, so the
    * tiebreak is definitionally identical). */
  val topkPerGroup: Q = (s, d) => {
    val rev = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_partkey")
      .agg(r4(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
    val w = Window.partitionBy("p_brand").orderBy(col("revenue").desc, col("p_partkey"))
    rev.withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= 3)
      .select("p_brand", "p_partkey", "revenue", "rn")
      .orderBy("p_brand", "rn")
  }

  val queries: Map[String, Q] = Map(
    "sort_multikey"  -> sortMultikey,
    "limit_topk"     -> limitTopk,
    "topk_per_group" -> topkPerGroup,
  )

  val oracle: Map[String, String] = Map(
    "sort_multikey" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_date,
        | floor((sum(l_extendedprice * (1 - l_discount))) * 10000 + 0.5) / 10000 AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_date, l_orderkey""".stripMargin,
    "limit_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "topk_per_group" ->
      """SELECT p_brand, p_partkey, revenue, rn FROM (
        | SELECT p_brand, p_partkey,
        |  floor((sum(l_extendedprice * (1 - l_discount))) * 10000 + 0.5) / 10000 AS revenue,
        |  row_number() OVER (PARTITION BY p_brand
        |    ORDER BY floor((sum(l_extendedprice * (1 - l_discount))) * 10000 + 0.5) / 10000 DESC, p_partkey) AS rn
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | GROUP BY p_brand, p_partkey)
        |WHERE rn <= 3 ORDER BY p_brand, rn""".stripMargin,
  )
}
