package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** PairTable incremental refresh: yesterday's artifact + only the pairs
  * touching today's batch must equal a full rebuild (in the full-recall
  * blocking regime the fixture is pinned to). */
class PairTableSpec extends AnyFunSuite with Matchers with SparkFixture {

  private def bucketCol(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c.cast("string")), 1, 6), 16, 10).cast("long") % 100

  test("updateIncremental(prev, new batch) equals a full rebuild of the grown corpus") {
    val tmp = java.nio.file.Files.createTempDirectory("pt_incr").toString
    val docs = Tables.documents(spark, sfDir)
    // yesterday's corpus = the old (bucket < 80) docs; today adds the rest
    docs.where(bucketCol(col("doc_id")) < 80)
      .write.parquet(s"$tmp/old/documents.parquet")
    pipelines.PairTable.write(spark, s"$tmp/old", s"$tmp/prev")
    pipelines.PairTable.updateIncremental(
      spark, sfDir, s"$tmp/prev", s"$tmp/merged",
      id => bucketCol(id) >= 80)
    // Compare at the 0.8 OPERATOR threshold. The incremental contract:
    // the TOUCHING-NEW half must be exactly what a full rebuild finds
    // (that's the question the refresh answers); the old-old half is
    // FROZEN to the prev artifact by design — an incremental refresh
    // never revisits yesterday's pairs, and the prev run's blocking may
    // legitimately differ near-threshold from a rebuild's (measured
    // 4820/4822 old-old pairs on this fixture's 400-doc subset — the
    // corpus-dependent-blocking caveat in the scaladoc).
    def bucketOk(a: Long) = { // same rule as bucketCol, host-side
      val md5hex = java.security.MessageDigest.getInstance("MD5")
        .digest(a.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5hex.substring(0, 6), 16) % 100 >= 80
    }
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .where(col("jac") >= 0.8)
      .select("doc_a", "doc_b", "jac").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val merged = norm(spark.read.parquet(s"$tmp/merged"))
    val full = norm(pipelines.PairTable.build(spark, sfDir))
    val prev = norm(spark.read.parquet(s"$tmp/prev"))
    merged.nonEmpty shouldBe true
    // no pair may appear in both prev and the fresh delta (disjoint by
    // the endpoint rule) — a double-write would break consumers
    spark.read.parquet(s"$tmp/merged")
      .groupBy("doc_a", "doc_b").count().where(col("count") > 1)
      .count() shouldBe 0L
    def touchingNew(s: Set[(Long, Long, Double)]) =
      s.filter(p => bucketOk(p._1) || bucketOk(p._2))
    touchingNew(merged) should equal(touchingNew(full)) // exact for the delta
    (merged -- touchingNew(merged)) should equal(prev)  // old-old ≡ prev, untouched
    // and the frozen old-old half may only differ from a rebuild near
    // the blocking margin — pin the bound so a real recall regression
    // (not a 2-pair margin artifact) still fails loudly
    (full -- merged).size should be <= 5
    (merged -- full) shouldBe empty
  }

  test("artifact conf can neither poison the incremental refresh nor serve a foreign corpus") {
    val tmp = java.nio.file.Files.createTempDirectory("pt_guard").toString
    Tables.documents(spark, sfDir).where(bucketCol(col("doc_id")) < 80)
      .write.parquet(s"$tmp/old/documents.parquet")
    pipelines.PairTable.write(spark, s"$tmp/old", s"$tmp/prev")
    def refresh(out: String): Set[(Long, Long, Double)] = {
      pipelines.PairTable.updateIncremental(
        spark, sfDir, s"$tmp/prev", out, id => bucketCol(id) >= 80)
      spark.read.parquet(out).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    val clean = refresh(s"$tmp/m_clean")
    spark.conf.set("spark.graft.pairs.artifact", s"$tmp/prev")
    try {
      // the corpus stamp rejects serving a different dataset dir — the
      // conf is session-global, a foreign artifact must fail loudly
      intercept[IllegalArgumentException] {
        queries.Llm.llmJaccardPairs(spark, sfDir)
      }
      // and the refresh bypasses the conf: without the bypass, the
      // new-endpoint filter over YESTERDAY'S pairs is an empty delta
      // and the artifact silently never learns today's near-dups
      refresh(s"$tmp/m_conf") should equal(clean)
    } finally spark.conf.unset("spark.graft.pairs.artifact")
  }

  test("candidate-mode stamp: approximate artifacts never serve the exact contract") {
    val tmp = java.nio.file.Files.createTempDirectory("pt_mode").toString
    val (aKey, cKey) = ("spark.graft.pairs.artifact", "spark.graft.pairs.candidates")
    // build an artifact under the approximate minhash generator
    spark.conf.set(cKey, "minhash")
    val approxDirect = try {
      pipelines.PairTable.write(spark, sfDir, s"$tmp/mh")
      queries.Llm.llmJaccardPairs(spark, sfDir).collect().toSeq
    } finally spark.conf.unset(cKey)
    pipelines.PairTable.readCandMode(spark, s"$tmp/mh") shouldBe "minhash"
    spark.conf.set(aKey, s"$tmp/mh")
    try {
      // a default (exact-contract) session must refuse the approximate table
      val ex = intercept[IllegalArgumentException] {
        queries.Llm.llmJaccardPairs(spark, sfDir)
      }
      ex.getMessage should include("candidates='minhash'")
      // a session declaring the same mode is served, and the artifact
      // read equals the fresh minhash-mode compute (candidate banding is
      // threshold-independent, so the 0.6-floored table re-thresholded
      // at 0.8 is lossless for the 0.8 consumer)
      spark.conf.set(cKey, "minhash")
      try {
        queries.Llm.llmJaccardPairs(spark, sfDir).collect().toSeq should
          equal(approxDirect)
      } finally spark.conf.unset(cKey)
      // mixed-provenance merge: refreshing the minhash-built prev from a
      // rarity session fails loudly instead of mixing halves
      val ex2 = intercept[IllegalArgumentException] {
        pipelines.PairTable.updateIncremental(
          spark, sfDir, s"$tmp/mh", s"$tmp/mixed", id => id > 0L)
      }
      ex2.getMessage should include("mix exact and approximate")
    } finally spark.conf.unset(aKey)
  }
}
