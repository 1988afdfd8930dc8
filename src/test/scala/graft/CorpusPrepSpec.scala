package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.pipelines.CorpusPrep

/** End-to-end invariants of the composed corpus-prep pipeline
  * (clean → exact dedup → near-dup clustering → split). */
class CorpusPrepSpec extends AnyFunSuite with Matchers with SparkFixture {

  private lazy val out = CorpusPrep.run(spark, sfDir).cache()

  test("pipeline keeps a nonempty strict subset and dedups exactly") {
    val nDocs = Tables.documents(spark, sfDir).count()
    val n = out.count()
    n should be > 0L
    n should be < nDocs // fixture contains near-dups, so some must go
    // exact dedup on cleaned text: all surviving texts distinct
    out.select(countDistinct(sha2(col("clean_text").cast("binary"), 256)))
      .head().getLong(0) shouldBe n
  }

  test("every surviving row is its near-dup cluster's min-doc_id representative") {
    out.groupBy("cluster").agg(count(lit(1)).as("k"), min("doc_id").as("m"))
      .where(col("k") =!= 1 || col("m") =!= col("cluster"))
      .count() shouldBe 0L
  }

  test("lss clustering produces the identical pipeline output") {
    // spark.graft.cc.algo=lss swaps the min-label loop for large-star/
    // small-star; on a converging fixture both fixpoints are min-doc_id
    // per component, so the full pipeline output must be row-identical
    val key = "spark.graft.cc.algo"
    spark.conf.set(key, "lss")
    try {
      val lss = CorpusPrep.run(spark, sfDir).collect()
      lss should equal(out.collect())
    } finally spark.conf.unset(key)
  }

  test("no stopword survives cleaning") {
    val tok = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("token"))
    val stops = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(5)
      .collect().map(_.getString(0)).toSet
    val survivorTokens = out
      .select(explode(split(col("clean_text"), " ")).as("t"))
      .where(col("t") =!= "")
      .collect().map(_.getString(0)).toSet
    (survivorTokens & stops) shouldBe empty
  }

  test("8 label rounds reach the clustering fixpoint on the fixture (12 rounds agree)") {
    // validates the bounded-round declaration: if 8 rounds truncated the
    // propagation, extra rounds would reassign labels
    val at8 = out.select("doc_id", "cluster").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val at12 = CorpusPrep.run(spark, sfDir, labelRounds = 12)
      .select("doc_id", "cluster").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    at12 should equal(at8)
  }

  test("CorpusPrepMain CLI writes a split-partitioned corpus with a consistent manifest") {
    val tmp = java.nio.file.Files.createTempDirectory("prep_cli").toString
    val manifest = graft.pipelines.CorpusPrepMain.run(spark, sfDir, tmp)
    manifest should include(""""rows_in":500""")
    // partition pruning must work on the delivered layout
    val train = spark.read.parquet(s"$tmp/documents")
      .where(org.apache.spark.sql.functions.col("split") === "train")
    train.queryExecution.executedPlan.toString should
      include("PartitionFilters: [isnotnull(split")
    val total = spark.read.parquet(s"$tmp/documents").count()
    manifest should include(s""""rows_out":$total""")
    total shouldBe out.count()
  }

  test("split assignment is the reproducible md5-bucket rule") {
    val bad = out.withColumn("bucket",
        expr("conv(substring(md5(cast(doc_id AS string)), 1, 6), 16, 10)").cast("long") % 100)
      .withColumn("expected",
        when(col("bucket") < 80, "train").when(col("bucket") < 90, "val").otherwise("test"))
      .where(col("split") =!= col("expected"))
    bad.count() shouldBe 0L
  }
}
