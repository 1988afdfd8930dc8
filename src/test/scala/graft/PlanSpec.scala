package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.queries.{Joins, Scans, Sorts}

/** Physical-plan assertions (SURVEY.md §4): the scale-critical plan
  * properties must hold, not just the results. */
class PlanSpec extends AnyFunSuite with Matchers with SparkFixture {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("scan_pruned pushes the shipdate predicate and prunes columns") {
    val plan = planOf(Scans.scanPruned(spark, sfDir))
    plan should include("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate")
    plan should include("ReadSchema")
    // only the 4 selected columns reach the reader
    plan should not include "l_returnflag"
  }

  test("join_broadcast compiles to BroadcastHashJoin") {
    planOf(Joins.joinBroadcast(spark, sfDir)) should include("BroadcastHashJoin")
  }

  test("join_shuffle degrades to SortMergeJoin when neither side broadcasts") {
    // at fixture scale Spark rightly auto-broadcasts tiny orders; the
    // scale-relevant property is the large-large fallback plan
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      planOf(Joins.joinShuffle(spark, sfDir)) should include("SortMergeJoin")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
  }

  test("limit_topk compiles to TakeOrderedAndProject (no global sort)") {
    planOf(Sorts.limitTopk(spark, sfDir)) should include("TakeOrderedAndProject")
  }

  test("hot paths stay inside WholeStageCodegen") {
    // AQE hides codegen stages in executedPlan.toString; use codegen explain
    import org.apache.spark.sql.execution.CodegenMode
    Joins.joinShuffle(spark, sfDir).queryExecution.explainString(CodegenMode) should
      include("WholeStageCodegen")
    Scans.scanPruned(spark, sfDir).queryExecution.explainString(CodegenMode) should
      include("WholeStageCodegen")
  }
}
