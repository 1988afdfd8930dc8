package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** pipelines.PqIndex — the ANN artifact. Pins: (1) search over an index
  * built from the fixture ≡ the in-query llm_ann_pq output row-for-row
  * (the artifact hop — pack → parquet → nested-table lookup — must be
  * lossless); (2) extend encodes against the STORED codebook so
  * extended-index search ≡ a from-scratch index of the union trained on
  * the SAME batch-0 corpus; (3) the search plan streams the codes with
  * the query tables broadcast — no SMJ, no per-(sub, code) shuffle;
  * (4) stamp/geometry guards fail loudly. */
class PqIndexSpec extends AnyFunSuite with Matchers with SparkFixture {

  private lazy val vecs = Tables.embeddings(spark, sfDir)
  private lazy val indexDir = {
    val d = java.nio.file.Files.createTempDirectory("graft_pqix").toString
    pipelines.PqIndex.build(spark, sfDir, d)
    d
  }
  private def queries10 = vecs.where(col("vec_id") < 10)

  test("search ≡ the in-query llm_ann_pq, row for row") {
    val viaIndex = pipelines.PqIndex.search(spark, queries10, indexDir, k = 3)
      .collect().toSeq
    val inQuery = queries.Sketches.llmAnnPq(spark, sfDir).collect().toSeq
    viaIndex should not be empty
    viaIndex shouldBe inQuery
  }

  test("extend encodes against the stored codebook; search sees both batches") {
    // split the fixture: batch 0 = vec_id < 70% cut, batch 1 = rest
    val cut = vecs.agg(expr("percentile(vec_id, 0.7)")).head().getDouble(0).toLong
    val oldV = vecs.where(col("vec_id") <= cut)
    val newV = vecs.where(col("vec_id") > cut)
    val d = java.nio.file.Files.createTempDirectory("graft_pqx2").toString
    pipelines.PqIndex.buildFrom(spark, oldV, sfDir, d)
    pipelines.PqIndex.extend(spark, newV, d, batchId = 1L)
    val got = pipelines.PqIndex.search(spark, queries10, d, k = 3).collect().toSeq
    // truth: one index whose codebook was trained on the SAME batch-0
    // corpus, but with all vectors encoded at build time
    val dAll = java.nio.file.Files.createTempDirectory("graft_pqx3").toString
    val (m, k, iters) = (16, 64, 2)
    graft.functions.VectorExprs.register(spark)
    val svOld = graft.ops.Lineage.cut(queries.Sketches.Pq.subvectors(oldV, m))
    val cb = queries.Sketches.Pq.train(svOld, k, iters)
    // write the truth index by hand: stored codebook + both batches
    cb.coalesce(1).write.mode("overwrite").parquet(s"$dAll/codebook.parquet")
    queries.Sketches.Pq.assign(
        graft.ops.Lineage.cut(queries.Sketches.Pq.subvectors(vecs, m)), cb)
      .groupBy("vec_id")
      .agg(expr("transform(sort_array(collect_list(struct(sub, code))), t -> t.code)").as("codes"))
      .withColumn("batch", lit(0L))
      .write.partitionBy("batch").mode("overwrite").parquet(s"$dAll/codes.parquet")
    // stamps (copy the real writer's contract)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dAll, "_graft_geom"), s"$m:$k:$iters")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dAll, "_graft_corpus"), sfDir)
    val truth = pipelines.PqIndex.search(spark, queries10, dAll, k = 3).collect().toSeq
    got should not be empty
    got shouldBe truth
    // and the extended index really holds two batch partitions
    new java.io.File(s"$d/codes.parquet/batch=0").isDirectory shouldBe true
    new java.io.File(s"$d/codes.parquet/batch=1").isDirectory shouldBe true
    // a retried extend overwrites exactly itself (idempotent)
    pipelines.PqIndex.extend(spark, newV, d, batchId = 1L)
    val again = pipelines.PqIndex.search(spark, queries10, d, k = 3).collect().toSeq
    again shouldBe got
  }

  test("the search plan streams the codes — query tables broadcast, no SMJ") {
    val plan = pipelines.PqIndex.search(spark, queries10, indexDir, k = 3)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastNestedLoopJoin") // the bounded ≤nq-row product
    plan should not include "SortMergeJoin"
    plan should not include "CartesianProduct"
    plan should not include "Window"
  }

  test("an unstamped dir and a foreign geometry both fail loudly") {
    val empty = java.nio.file.Files.createTempDirectory("graft_pqe").toString
    val e1 = intercept[Exception] {
      pipelines.PqIndex.search(spark, queries10, empty)
    }
    e1.getMessage should include("_graft_geom")
    val e2 = intercept[Exception] {
      pipelines.PqIndex.extend(spark, queries10, indexDir, batchId = 0L)
    }
    e2.getMessage should include("batchId")
  }
}
