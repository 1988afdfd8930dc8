package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.functions.{MinHashAgg, SimHashAgg}
import graft.queries.{Llm, Sketches}

/** MinHash/SimHash correctness vs exact Jaccard (SURVEY.md §5.1 layer 4,
  * §7.3 item 7: sketches are property-tested, not oracle-checked). */
class SketchSpec extends AnyFunSuite with Matchers with SparkFixture {

  private def exactJaccard(a: Set[String], b: Set[String]): Double =
    (a & b).size.toDouble / (a | b).size

  private def minhashSig(tokens: Set[String], agg: MinHashAgg): Array[Int] =
    tokens.foldLeft(agg.zero)((buf, t) => agg.reduce(buf, t))

  test("minhash agreement estimates jaccard within 4 sigma (deterministic examples)") {
    val agg = new MinHashAgg(128)
    val base = (1 to 60).map(i => s"tok$i").toSet
    for (overlap <- Seq(10, 30, 50, 58)) {
      val other = base.take(overlap) ++ (1 to (60 - overlap)).map(i => s"other$i")
      val (sa, sb) = (minhashSig(base, agg), minhashSig(other, agg))
      val est = sa.zip(sb).count { case (x, y) => x == y } / 128.0
      val exact = exactJaccard(base, other)
      val sigma = math.sqrt(exact * (1 - exact) / 128.0)
      math.abs(est - exact) should be <= math.max(4 * sigma, 0.02)
    }
  }

  test("minhash merge == reduce over union (partial aggregation correctness)") {
    val agg = new MinHashAgg(128)
    val a = Set("x", "y", "z"); val b = Set("z", "w")
    val merged = agg.merge(minhashSig(a, agg), minhashSig(b, agg))
    merged should equal(minhashSig(a ++ b, agg))
  }

  test("llm_minhash LSH finds every exact-jaccard>=0.9 pair at sf0.001") {
    val exact = Llm.llmJaccardPairs(spark, sfDir)
      .where(col("jac") >= 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = Sketches.llmMinhash(spark, sfDir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    exact.nonEmpty shouldBe true
    val recall = (exact & found).size.toDouble / exact.size
    recall should be >= 0.95
  }

  test("llm_minhash 16x8 banding false-negative rate matches the S-curve (xxHash64 digest)") {
    // Ties the band/row parameters to a MEASURED miss rate (VERDICT r3
    // #6): for a pair at exact jaccard j, the 16-band/8-row LSH detects
    // it with p(j) = 1 - (1 - j^8)^16 (0.947 at j=0.80, 0.9999 at
    // j=0.90); the est_jac >= 0.7 cut then removes < 1% of jac >= 0.8
    // pairs (>= 2.8 sigma at k=128). Assert measured recall per jaccard
    // bucket >= mean theoretical detection - 0.06 margin, so any digest
    // / seed / band-geometry change that shifts the S-curve fails here
    // instead of silently losing near-dups.
    val tok = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("token"))
      .distinct()
    val sets = tok.groupBy("doc_id", "lang").agg(collect_set("token").as("s"))
    val a = sets.select(col("doc_id").as("da"), col("lang").as("la"), col("s").as("sa"))
    val b = sets.select(col("doc_id").as("db"), col("lang").as("lb"), col("s").as("sb"))
    val truth = a.join(b, col("la") === col("lb") && col("da") < col("db"))
      .withColumn("ni", expr("size(array_intersect(sa, sb))"))
      .withColumn("jac", expr("cast(ni * 1.0 / (size(sa) + size(sb) - ni) as double)"))
      .where(col("jac") >= 0.8)
      .select("da", "db", "jac").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    truth.nonEmpty shouldBe true
    val found = Sketches.llmMinhash(spark, sfDir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def sCurve(j: Double): Double = 1.0 - math.pow(1.0 - math.pow(j, 8), 16)
    for ((lo, hi) <- Seq((0.8, 0.9), (0.9, 1.01))) {
      val bucket = truth.filter { case (_, j) => j >= lo && j < hi }
      if (bucket.nonEmpty) {
        val recall = bucket.count { case (p, _) => found.contains(p) }.toDouble / bucket.size
        val expected = bucket.map { case (_, j) => sCurve(j) }.sum / bucket.size
        info(f"jac [$lo,$hi): n=${bucket.size} recall=$recall%.4f s-curve=$expected%.4f")
        recall should be >= (expected - 0.06)
      }
    }
  }

  test("simhash: identical sets collide, disjoint sets are far") {
    val agg = new SimHashAgg
    def sig(tokens: Set[String]): Long =
      agg.finish(tokens.foldLeft(agg.zero)((b, t) => agg.reduce(b, t)))
    val a = (1 to 40).map(i => s"tok$i").toSet
    val b = (1 to 40).map(i => s"zzz$i").toSet
    sig(a) shouldBe sig(a)
    java.lang.Long.bitCount(sig(a) ^ sig(b)) should be > 10
    val aNear = a.take(38) ++ Set("n1", "n2")
    java.lang.Long.bitCount(sig(a) ^ sig(aNear)) should be < 12
  }

  test("llm_simhash returns near-dup pairs at sf0.001 and they have high exact jaccard") {
    val pairs = Sketches.llmSimhash(spark, sfDir)
    val exact = Llm.llmJaccardPairs(spark, sfDir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = pairs.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    found.length should be > 0
    // precision against jac>=0.8 ground truth: most hamming<=6 pairs are
    // real near-dups (measured 0.958 via SimhashCalibrate, xxHash64 digest)
    val precision = found.count(exact.contains).toDouble / found.length
    precision should be >= 0.8
  }

  test("agg_hll_partial estimates within 5% of exact; sketch union == full-scan sketch") {
    val rows = queries.Aggs.aggHllPartial(spark, sfDir).collect()
    rows.length shouldBe 3
    rows.foreach { r =>
      val (est, exact) = (r.getLong(1), r.getLong(2))
      math.abs(est - exact).toDouble / exact should be <= 0.05
    }
    // the merged estimate must equal what a single full-scan sketch
    // would say — union of partials is lossless for HLL by construction
    import org.apache.spark.sql.functions._
    val full = Tables.orders(spark, sfDir)
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("e"))
      .head().getLong(0)
    rows.find(_.getString(0) == "total_merged").get.getLong(1) shouldBe full
  }

  test("agg_cms_partial: est in [exact, exact + eps*N] per row; union == full-scan sketch") {
    import org.apache.spark.sql.functions._
    val rows = queries.Aggs.aggCmsPartial(spark, sfDir).collect()
    // 2 versions + total_merged, 5 priorities each
    rows.length shouldBe 15
    val nTotal = Tables.orders(spark, sfDir).count()
    rows.foreach { r =>
      val (est, exact) = (r.getLong(2), r.getLong(3))
      // the CMS guarantee, both sides: never under, over by at most
      // eps·N of the sketch's own population (nTotal bounds every
      // version's N) — with the fixed seed this is deterministic
      est should be >= exact
      (est - exact).toDouble should be <= 0.001 * nTotal
    }
    // union of the version sketches must estimate exactly what one
    // full-scan sketch does: CMS union is cell-wise addition, lossless
    graft.functions.VectorExprs.register(spark)
    val full = Tables.orders(spark, sfDir)
      .agg(expr("count_min_sketch(o_orderpriority, 0.001d, 0.99d, 42)").as("sk"))
    val fullEst = full.select(explode(lit(Array(
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))).as("p"), col("sk"))
      .select(col("p"), expr("graft_cms_est(sk, p)").as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.filter(_.getString(0) == "total_merged").foreach { r =>
      r.getLong(2) shouldBe fullEst(r.getString(1))
    }
  }

  test("agg_bloom_partial: no false negatives; measured FPR under 3x fpp; union == full-scan filter") {
    import org.apache.spark.sql.functions._
    val rows = queries.Aggs.aggBloomPartial(spark, sfDir).collect()
    // 2 versions + total_merged, 20 probe keys each
    rows.length shouldBe 60
    // the Bloom guarantee per row: a present key is NEVER missed
    rows.foreach { r => r.getLong(2) should be >= r.getLong(3) }
    // absent-by-domain keys (negative probes) may only hit as FPs —
    // with 1% fpp and 20 absent probes across 3 filters, more than a
    // couple of hits means the hashing/geometry broke, not bad luck
    val absentHits = rows.filter(r => r.getLong(1) < 0).map(_.getLong(2)).sum
    absentHits.toInt should be <= 2
    // probe the MERGED filter directly with 10k absent keys for a real
    // FPR measurement (test-side deserialize once, no per-row decode),
    // and pin union == full-scan filter on in-domain keys
    val bloomBuild = udaf(new graft.functions.BloomBuildAgg)
    val fullBytes = Tables.orders(spark, sfDir)
      .agg(bloomBuild(col("o_custkey")).as("sk")).head().getAs[Array[Byte]](0)
    val full = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(fullBytes))
    val fp = (1 to 10000).count(i => full.mightContainLong(-1000000L - i))
    fp.toDouble / 10000 should be <= 3 * graft.functions.BloomAggs.Fpp
    // union-vs-full-scan: identical answers on every probe key
    rows.filter(_.getString(0) == "total_merged").foreach { r =>
      r.getLong(2) shouldBe (if (full.mightContainLong(r.getLong(1))) 1L else 0L)
    }
    // in-domain probes 1..10 must be genuinely present in the fixture
    // (otherwise the no-false-negative gate tests nothing)
    rows.filter(r => r.getString(0) == "total_merged" && r.getLong(1) > 0)
      .map(_.getLong(3)).sum should be >= 5L
  }
}
