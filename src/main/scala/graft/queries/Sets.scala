package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Set operations — SURVEY.md §2.7. Two customer-key selections: the
  * BUILDING market segment vs account balance > 5000.
  *
  * Spark semantics match SQL: union = bag (UNION ALL), intersect/except =
  * distinct. All four shuffle on the full row — at scale that is the
  * correct (and only) shape; distinct variants get map-side partial
  * dedup for free from HashAggregate.
  *
  * The ALL (multiset) variants run over c_nationkey — a key with real
  * per-side duplicate multiplicity, so INTERSECT ALL's min(m_a, m_b) and
  * EXCEPT ALL's max(0, m_a − m_b) semantics are actually exercised
  * (custkey is unique per side, where ALL ≡ DISTINCT vacuously). Spark
  * plans both as a single count-compare aggregate (no join): one shuffle
  * on the value, per-key counted replication — the same shape a 100 TB
  * multiset difference needs.
  */
object Sets {

  private def building(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.customer(s, d).where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))

  private def rich(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.customer(s, d).where(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("custkey"))

  private def buildingNat(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.customer(s, d).where(col("c_mktsegment") === "BUILDING")
      .select(col("c_nationkey").as("nationkey"))

  private def richNat(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.customer(s, d).where(col("c_acctbal") > 5000)
      .select(col("c_nationkey").as("nationkey"))

  val queries: Map[String, Q] = Map(
    "set_union_all" -> ((s, d) => building(s, d).union(rich(s, d)).orderBy("custkey")),
    "set_union"     -> ((s, d) => building(s, d).union(rich(s, d)).distinct().orderBy("custkey")),
    "set_intersect" -> ((s, d) => building(s, d).intersect(rich(s, d)).orderBy("custkey")),
    "set_except"    -> ((s, d) => building(s, d).except(rich(s, d)).orderBy("custkey")),
    "set_intersect_all" ->
      ((s, d) => buildingNat(s, d).intersectAll(richNat(s, d)).orderBy("nationkey")),
    "set_except_all" ->
      ((s, d) => buildingNat(s, d).exceptAll(richNat(s, d)).orderBy("nationkey")),
  )

  private val a = "SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
  private val b = "SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000"
  private val an = "SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'"
  private val bn = "SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000"

  val oracle: Map[String, String] = Map(
    "set_union_all" -> s"$a UNION ALL $b ORDER BY custkey",
    "set_union"     -> s"$a UNION $b ORDER BY custkey",
    "set_intersect" -> s"$a INTERSECT $b ORDER BY custkey",
    "set_except"    -> s"$a EXCEPT $b ORDER BY custkey",
    "set_intersect_all" -> s"$an INTERSECT ALL $bn ORDER BY nationkey",
    "set_except_all"    -> s"$an EXCEPT ALL $bn ORDER BY nationkey",
  )
}
