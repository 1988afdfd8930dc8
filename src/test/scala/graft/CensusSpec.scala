package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-13 llm_cluster_sizes rewrite: the census derived from
  * the one-row-per-cluster size frame must be row-identical to the
  * census computed the pre-rewrite way — countDistinct(cluster) /
  * count(*) / a separate one-row total — over the full per-doc cluster
  * table (llm_dedup_cluster's output). The rewrite's soundness argument
  * ("sizes has exactly one row per cluster, so count ≡ countDistinct and
  * Σ csize ≡ per-doc count") is re-checked here against the data instead
  * of trusted. */
class CensusSpec extends AnyFunSuite with SparkFixture {

  test("cluster-size census ≡ the per-doc countDistinct form") {
    val fast = graft.queries.Extras.queries("llm_cluster_sizes")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val cl = graft.queries.Extras.queries("llm_dedup_cluster")(spark, sfDir)
    val tot = cl.agg(count(lit(1)).as("n_total"))
    val ref = cl.groupBy("csize")
      .agg(countDistinct("cluster").as("n_clusters"), count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(tot))
      .select(col("csize"), col("n_clusters"), col("n_docs"),
        graft.ops.Det.r4(col("n_docs") * lit(1.0) / col("n_total")).as("doc_share"))
      .orderBy("csize")
      .collect().map(_.toSeq).toSeq
    assert(fast == ref)
  }
}
