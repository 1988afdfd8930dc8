package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.functions.MinHashAgg

/** Algebraic laws over the engine's operators (SURVEY.md §5.1 layer 4).
  * Raw ScalaCheck Gens with fixed seeds (the scalatestplus bridge is not
  * in the offline cache); Spark-side laws are checked on the sf0.001
  * fixture, pure-function laws on generated data. */
class PropertySpec extends AnyFunSuite with Matchers with SparkFixture {

  /** Evaluate `gen` on 100 fixed seeds, run `body` on each sample. */
  private def forAllSeeded[A](gen: Gen[A])(body: A => Unit): Unit =
    (1 to 100).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  test("filter fusion: filter(p).filter(q) == filter(p && q) on lineitem") {
    val li = Tables.lineitem(spark, sfDir)
    val p = col("l_quantity") > 25
    val q = col("l_discount") < 0.05
    val fused = li.where(p && q)
    val chained = li.where(p).where(q)
    chained.count() shouldBe fused.count()
    chained.exceptAll(fused).count() shouldBe 0L
  }

  test("union-all counts are additive; distinct union is bounded") {
    val c = Tables.customer(spark, sfDir)
    val a = c.where(col("c_acctbal") > 5000).select("c_custkey")
    val b = c.where(col("c_mktsegment") === "BUILDING").select("c_custkey")
    a.union(b).count() shouldBe a.count() + b.count()
    val u = a.union(b).distinct().count()
    u should be <= a.count() + b.count()
    u should be >= math.max(a.count(), b.count())
    // inclusion-exclusion ties union to intersect
    u shouldBe a.count() + b.count() - a.intersect(b).count()
  }

  test("dedup idempotence: dropDuplicates twice == once") {
    val e = Tables.events(spark, sfDir).select("user_id", "event_type")
    val once = e.dropDuplicates()
    once.dropDuplicates().count() shouldBe once.count()
  }

  test("minhash estimate concentrates around exact jaccard (generated sets)") {
    val agg = new MinHashAgg(128)
    def sig(tokens: Set[String]): Array[Int] =
      tokens.foldLeft(agg.zero)((b, t) => agg.reduce(b, t))
    val genSets: Gen[(Set[String], Set[String])] = for {
      n <- Gen.choose(20, 80)
      overlap <- Gen.choose(0, n)
      base <- Gen.listOfN(n, Gen.alphaStr.suchThat(_.nonEmpty)).map(_.toSet)
      extra <- Gen.listOfN(n - overlap, Gen.numStr.suchThat(_.nonEmpty)).map(_.toSet)
    } yield (base, base.take(overlap) ++ extra.map("x" + _))
    forAllSeeded(genSets) { case (a, b) =>
      if (a.nonEmpty && b.nonEmpty) {
        val exact = (a & b).size.toDouble / (a | b).size
        val est = sig(a).zip(sig(b)).count { case (x, y) => x == y } / 128.0
        // 5 sigma + slack: flake probability < 1e-6 per case (fixed seeds)
        math.abs(est - exact) should be <= math.max(5 * math.sqrt(exact * (1 - exact) / 128.0), 0.05)
      }
    }
  }

  test("r4 is idempotent and order-independent on representable values") {
    import graft.ops.Det
    val df = spark.range(1000).select(
      (col("id") * 0.37 + 0.00005).as("x"))
    val once = df.select(Det.r4(col("x")).as("r")).collect().map(_.getDouble(0))
    val twice = df.select(Det.r4(Det.r4(col("x"))).as("r")).collect().map(_.getDouble(0))
    once should equal(twice)
  }
}
