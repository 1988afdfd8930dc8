package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The daily-refresh product story, end to end (r5 verdict item #1):
  * CorpusPrepMain.refreshFlow composes PairTable bootstrap/refresh +
  * CorpusPrep-over-the-artifact + Deliver.syncPartitions into one flow.
  * Day 1 bootstraps artifact and delivery; day 2 appends a batch (fresh
  * docs + near-dups of old docs), refreshes the pair table with ONLY
  * new-endpoint pairs, re-preps via the artifact, and ships only the
  * split partitions whose content moved. */
class DailyRefreshSpec extends AnyFunSuite with Matchers with SparkFixture {

  private def md5bucket(id: Long): Long = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(h.substring(0, 6), 16) % 100
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.select("doc_a", "doc_b", "jac").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("day-1 bootstrap then day-2 incremental refresh: exact delta, byte-stable splits, rebuild-equal output") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("daily").toString
    val (src, out, art) = (s"$tmp/src", s"$tmp/out", s"$tmp/pairs")
    val day1 = Tables.documents(spark, sfDir)
    day1.write.parquet(s"$src/documents.parquet")

    // ---- day 1: one command bootstraps the artifact AND the delivery
    val (c1, s1, r1) = pipelines.CorpusPrepMain.refreshFlow(
      spark, src, out, art, refresh = false)
    c1.toSet shouldBe Set("train", "val", "test")
    s1 shouldBe empty
    pipelines.PairTable.readCorpusMarker(spark, art) shouldBe src
    val wm = pipelines.PairTable.readWatermark(spark, art)
    wm shouldBe day1.agg(max("doc_id")).head().getLong(0)
    val prevPairs = pairSet(spark.read.parquet(art))

    // ---- construct day 2: the corpus GROWS in place (ids above the
    // watermark are the new batch, the refreshFlow contract)
    // (a) near-dups of old SINGLETON docs (no pair at the 0.6 artifact
    //     floor): the derived copy pairs ≥0.8 with its base and, because
    //     the base had no 0.6-neighbour, cannot bridge two old clusters —
    //     prep drops each copy, so they perturb NOTHING in the output
    val paired = spark.read.parquet(art)
      .select(explode(array(col("doc_a"), col("doc_b"))).as("id"))
      .distinct().collect().map(_.getLong(0)).toSet
    val singletons = day1.select("doc_id", "text", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .filterNot(t => paired.contains(t._1)).take(3)
    singletons.size shouldBe 3
    val nearDups = singletons.zipWithIndex.map { case ((_, text, lang), i) =>
      // drop the last token: jaccard = (n-1)/n ≈ 0.96 with the base
      val toks = text.split(" ")
      (wm + 1 + i, toks.dropRight(1).mkString(" "), lang, "synth", 0L)
    }
    // (b) fresh unique-token docs whose md5 bucket lands in TRAIN only:
    //     they survive the prep and must rewrite ONLY split=train
    val fresh = ((wm + 100) to (wm + 400))
      .filter(md5bucket(_) < 80).take(20)
      .map(id => (id, s"zq${id}a zq${id}b zq${id}c zq${id}d zq${id}e zq${id}f",
        "en", "synth", 0L))
    fresh.size shouldBe 20
    // the near-dup copies re-use old tokens (+1 count each); the corpus
    // stop list only moves if the top-5 margin is smaller than that
    // perturbation — assert the margin so this test is self-validating
    // rather than silently fragile
    val counts = day1.select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count().orderBy(col("count").desc, col("t"))
      .limit(6).collect().map(_.getLong(1))
    (counts(4) - counts(5)) should be > 3L
    val day2 = day1.union(
      (nearDups ++ fresh).toSeq.toDF("doc_id", "text", "lang", "source", "n_chars"))
    day2.write.mode("overwrite").parquet(s"$src/documents.parquet")

    val fs = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mtimes(p: String): Map[String, Long] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(p), true)
      val b = scala.collection.mutable.Map.empty[String, Long]
      while (it.hasNext) { val f = it.next(); b(f.getPath.toString) = f.getModificationTime }
      b.toMap
    }
    val before = mtimes(s"$out/documents")

    // ---- day 2: one command refreshes pairs incrementally and re-ships
    val (c2, s2, r2) = pipelines.CorpusPrepMain.refreshFlow(
      spark, src, out, art, refresh = true)

    // the artifact refreshed in place: watermark advanced, corpus stamp
    // still points at the (grown) src
    pipelines.PairTable.readCorpusMarker(spark, art) shouldBe src
    val wm2 = pipelines.PairTable.readWatermark(spark, art)
    wm2 shouldBe day2.agg(max("doc_id")).head().getLong(0)

    // ONLY new-endpoint pairs were computed: the delta over day-1's
    // artifact touches the new batch in every pair, and the old-old half
    // is EXACTLY yesterday's table (frozen, not recomputed)
    val merged = pairSet(spark.read.parquet(art))
    val delta = merged -- prevPairs
    delta.nonEmpty shouldBe true
    delta.foreach { case (a, b, _) => (a > wm || b > wm) shouldBe true }
    merged.filter { case (a, b, _) => a <= wm && b <= wm } shouldBe prevPairs
    // each near-dup copy found its base pair at ≥ 0.8
    val deltaIds = delta.flatMap { case (a, b, j) if j >= 0.8 => Seq(a, b); case _ => Nil }
    nearDups.foreach { nd => deltaIds should contain(nd._1) }

    // the prep DROPPED every near-dup copy and kept every fresh doc
    val delivered = spark.read.parquet(s"$out/documents")
    val deliveredIds = delivered.select("doc_id").collect().map(_.getLong(0)).toSet
    nearDups.foreach { nd => deliveredIds should not contain nd._1 }
    fresh.foreach { f => deliveredIds should contain(f._1) }

    // only split=train rewrote; val/test kept their files byte-for-byte
    c2 shouldBe Seq("train")
    s2 shouldBe empty
    r2.rows shouldBe r1.rows + fresh.size
    mtimes(s"$out/documents").filterNot(_._1.contains("split=train"))
      .filterNot(_._1.contains("_SUCCESS")) should equal(
      before.filterNot(_._1.contains("split=train")).filterNot(_._1.contains("_SUCCESS")))

    // and the refreshed delivery equals a from-scratch prep of day 2
    // (no artifact involved): the incremental path answered the same
    // question the full rebuild would
    val scratch = graft.ops.Lineage.cut(pipelines.CorpusPrep.run(spark, src))
    graft.delivery.Deliver.fingerprint(
      delivered.select(scratch.columns.map(col): _*)
        .withColumn("split", col("split").cast("string"))) shouldBe
      graft.delivery.Deliver.fingerprint(scratch)
  }

  test("refreshFlow without --refresh refuses an artifact stamped for another corpus") {
    val tmp = java.nio.file.Files.createTempDirectory("daily_guard").toString
    Tables.documents(spark, sfDir).limit(50)
      .write.parquet(s"$tmp/other/documents.parquet")
    pipelines.PairTable.write(spark, s"$tmp/other", s"$tmp/art")
    val e = intercept[IllegalArgumentException] {
      pipelines.CorpusPrepMain.refreshFlow(
        spark, sfDir, s"$tmp/out", s"$tmp/art", refresh = false)
    }
    e.getMessage should include(s"$tmp/other")
  }

  test("updateIncremental fails loudly on an unstamped prev and on in-place overwrite") {
    val tmp = java.nio.file.Files.createTempDirectory("daily_prev").toString
    // a hand-rolled parquet with the right SCHEMA but no corpus stamp
    // must not be laundered into a re-stamped artifact (ADVICE r5)
    import spark.implicits._
    Seq((1L, 2L, 0.9)).toDF("doc_a", "doc_b", "jac").write.parquet(s"$tmp/rogue")
    val e = intercept[IllegalArgumentException] {
      pipelines.PairTable.updateIncremental(
        spark, sfDir, s"$tmp/rogue", s"$tmp/out", id => id > 0)
    }
    e.getMessage should include("_graft_corpus")
    // a stamped prev still refuses out == prev (lazy read under overwrite)
    Tables.documents(spark, sfDir).limit(50)
      .write.parquet(s"$tmp/c/documents.parquet")
    pipelines.PairTable.write(spark, s"$tmp/c", s"$tmp/prev")
    intercept[IllegalArgumentException] {
      pipelines.PairTable.updateIncremental(
        spark, s"$tmp/c", s"$tmp/prev", s"$tmp/prev", id => id > 0)
    }.getMessage should include("in place")
  }
}
