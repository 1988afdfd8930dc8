package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Det._

/** Projection / filter / predicate operators — SURVEY.md §2.2.
  *
  * Pure map-side work: no shuffle except the final presentation sort. At
  * 100 TB these run as a single WholeStageCodegen pipeline fused onto the
  * vectorized Parquet scan, with both the predicate and the projection
  * pushed into the reader.
  */
object Filters {

  /** project_arith — derived pricing columns per row. */
  val projectArith: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        r4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        r4(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("charge"))
      // (l_orderkey, l_linenumber) is NOT unique in the fixture (fn_map
      // relies on that); the derived columns complete the total order so
      // tie rows cannot swap when the scan order changes (round-13
      // layout normalization made the latent tie-order dependence real)
      .orderBy("l_orderkey", "l_linenumber", "revenue", "charge")

  /** filter_pred — TPC-H Q6-shape compound predicate (range AND between AND
    * less-than); all three conjuncts reach PushedFilters. */
  val filterPred: Q = (s, d) =>
    Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
             col("l_shipdate") <  lit("1998-01-01").cast("timestamp") &&
             col("l_discount").between(0.02, 0.06) &&
             col("l_quantity") < 24)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_extendedprice")
      // full-tiebreak total order — see project_arith
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_extendedprice")

  /** filter_in_like — IN-list + LIKE prefix + IS NULL handling over part
    * (fixture p_type domain is single-word: FIXTURES.md §3). */
  val filterInLike: Q = (s, d) =>
    Tables.part(s, d)
      .where((col("p_type").like("PROMO%") || col("p_type").like("S%")) &&
             col("p_brand").isin("Brand#11", "Brand#22", "Brand#33") &&
             col("p_size").isNotNull)
      .select(
        col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
        coalesce(nullif(col("p_type"), lit("PROMO")), lit("NOT_PROMO")).as("promo_tag"))
      .orderBy("p_partkey")

  val queries: Map[String, Q] = Map(
    "project_arith"  -> projectArith,
    "filter_pred"    -> filterPred,
    "filter_in_like" -> filterInLike,
  )

  val oracle: Map[String, String] = Map(
    "project_arith" ->
      """SELECT l_orderkey, l_linenumber,
        | floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) / 10000 AS revenue,
        | floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 10000 + 0.5) / 10000 AS charge
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, revenue, charge""".stripMargin,
    "filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.02 AND 0.06
        |  AND l_quantity < 24
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount, l_extendedprice""".stripMargin,
    "filter_in_like" ->
      """SELECT p_partkey, p_name, p_brand, p_type, p_size,
        | coalesce(nullif(p_type, 'PROMO'), 'NOT_PROMO') AS promo_tag
        |FROM part
        |WHERE (p_type LIKE 'PROMO%' OR p_type LIKE 'S%')
        |  AND p_brand IN ('Brand#11', 'Brand#22', 'Brand#33')
        |  AND p_size IS NOT NULL
        |ORDER BY p_partkey""".stripMargin,
  )
}
