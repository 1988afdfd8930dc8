package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Driver-contract invariants on SparkEntry itself. */
class ContractSpec extends AnyFunSuite with Matchers with SparkFixture {

  test("every oracle entry has a query (no orphan oracle SQL)") {
    (SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet) shouldBe empty
  }

  test("exactly the eight declared sketches lack oracle SQL") {
    (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet) shouldBe
      Set("agg_approx_distinct", "agg_approx_percentile", "llm_minhash",
        "llm_simhash", "agg_hll_partial", "agg_cms_partial",
        "agg_bloom_partial", "llm_ann_pq")
  }

  test("inventory size matches the documented contract (update SURVEY/README on change)") {
    SparkEntry.queries.size shouldBe 184
    SparkEntry.oracleSql.size shouldBe 176
  }

  test("dq_delta's oracle schema pin matches the live orders fixture (ADVICE r7)") {
    // the dq_delta oracle SQL bakes ordersSchemaPin's names/dtypes into
    // its result literals while the Spark side derives them from the
    // live schema — if a driver testdata regeneration changes the orders
    // schema, this is the test that fails instead of Verify diverging
    val live = Tables.orders(spark, sfDir)
      .schema.fields.map(f => f.name -> f.dataType.simpleString).sortBy(_._1).toSeq
    queries.Extras.ordersSchemaPin.map { case (n, dt, _) => (n, dt) } shouldBe live
  }

  test("no duplicate keys across query modules (Map ++ would silently drop one)") {
    val all = Seq(
      queries.Scans.queries, queries.Filters.queries, queries.Joins.queries,
      queries.Aggs.queries, queries.Sorts.queries, queries.Sets.queries,
      queries.Windows.queries, queries.Scalars.queries, queries.Events.queries,
      queries.Llm.queries, queries.Sketches.queries, queries.Extras.queries,
      queries.Textops.queries, queries.Webops.queries,
      queries.Graphs.queries).flatMap(_.keys)
    all.size shouldBe all.distinct.size
  }
}
