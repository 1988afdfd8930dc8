package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Driver-contract invariants on SparkEntry itself. */
class ContractSpec extends AnyFunSuite with Matchers {

  test("every oracle entry has a query (no orphan oracle SQL)") {
    (SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet) shouldBe empty
  }

  test("exactly the four declared sketches lack oracle SQL") {
    (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet) shouldBe
      Set("agg_approx_distinct", "agg_approx_percentile", "llm_minhash", "llm_simhash")
  }

  test("inventory size matches the documented contract (update SURVEY/README on change)") {
    SparkEntry.queries.size shouldBe 131
    SparkEntry.oracleSql.size shouldBe 127
  }

  test("no duplicate keys across query modules (Map ++ would silently drop one)") {
    val all = Seq(
      queries.Scans.queries, queries.Filters.queries, queries.Joins.queries,
      queries.Aggs.queries, queries.Sorts.queries, queries.Sets.queries,
      queries.Windows.queries, queries.Scalars.queries, queries.Events.queries,
      queries.Llm.queries, queries.Sketches.queries, queries.Extras.queries,
      queries.Textops.queries, queries.Webops.queries).flatMap(_.keys)
    all.size shouldBe all.distinct.size
  }
}
