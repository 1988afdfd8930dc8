package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev aid (round 9): PqIndex refresh economics — the ANN sibling of the
  * BloomScale (exact-dedup) and SignatureIndex (near-dup) rows. On a ×k
  * vectorStress corpus split 80/20 old/batch: time (a) extend = encode
  * the BATCH against the stored codebook, vs (b) the from-scratch anchor
  * = buildFrom over the full union (train + encode everything), and
  * time search against the extended index. The claim under test is the
  * production posture: a daily refresh pays encoding for the batch
  * only — never retraining, never re-encoding the corpus.
  *
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "Test/runMain graft.PqIndexScale 30"`
  */
object PqIndexScale {
  def main(args: Array[String]): Unit = {
    val mults = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(30)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def timed[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (m <- mults) {
      val dir = s"${sys.props("java.io.tmpdir")}/graft_vec_x$m"
      if (!new java.io.File(s"$dir/embeddings.parquet/_SUCCESS").exists)
        graft.tools.StressGen.vectorStress(spark, src, dir, m)
      val vecs = Tables.embeddings(spark, dir)
      val n = vecs.count()
      val cut = vecs.agg(expr("percentile(vec_id, 0.8)")).head().getDouble(0).toLong
      val oldV = vecs.where(col("vec_id") <= cut)
      val newV = vecs.where(col("vec_id") > cut)
      println(s"x$m: $n vectors, batch = ${newV.count()} (20%)")

      val ix = java.nio.file.Files.createTempDirectory(s"graft_pqis_x$m").toString
      timed(s"x$m build(old 80%) [setup, 1 pass]") {
        pipelines.PqIndex.buildFrom(spark, oldV, dir, ix)
      }
      timed(s"x$m extend(batch 20%) — the refresh arm") {
        pipelines.PqIndex.extend(spark, newV, ix, 1L)
      }
      val full = java.nio.file.Files.createTempDirectory(s"graft_pqif_x$m").toString
      timed(s"x$m buildFrom(union) — the from-scratch anchor [1 pass]") {
        pipelines.PqIndex.buildFrom(spark, vecs, dir, full)
      }
      val q = vecs.where(col("vec_id") < 10)
      val rows = timed(s"x$m search(10 queries) over the extended index") {
        pipelines.PqIndex.search(spark, q, ix, 3).count()
      }
      println(s"x$m search rows = $rows")

      // Round 10 (VERDICT r9 #6): the IVF+PQ composition A/B — probe-
      // limited search vs the exhaustive flat scan over the SAME index,
      // at the cluster-posture cell width bits(m) = 3+⌈log₂ m⌉ (cell
      // occupancy ≈ constant as the corpus grows; VectorScale posture).
      // The claim: ivf search scans only the ≤nprobe probe cells' codes
      // (file-level partition pruning), flat scans all of them, and the
      // two agree on almost every top-k pair (codes are codebook-
      // absolute, so surviving pairs carry IDENTICAL ADC integers).
      val bits = math.min(8, 3 + math.ceil(math.log(m.toDouble) / math.log(2)).toInt)
      spark.conf.set("spark.graft.ann.bits", bits.toString)
      val ivfIx = java.nio.file.Files.createTempDirectory(s"graft_pqivf_x$m").toString
      timed(s"x$m buildFrom(union, $bits-bit cells) [setup, 1 pass]") {
        pipelines.PqIndex.buildFrom(spark, vecs, dir, ivfIx)
      }
      spark.conf.unset("spark.graft.ann.bits")
      val codesAll = spark.read.parquet(s"$ivfIx/codes.parquet")
      val totalCodes = codesAll.count()
      spark.conf.set("spark.graft.ann.probeRadius", "2")
      val masks = queries.Ann.probeMasks(bits, 2)
      val probeCells = q
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
        .select(queries.Ann.cellExpr(bits).as("cell"))
        .collect().map(_.getInt(0)).toSet
        .flatMap((c: Int) => masks.map(c ^ _))
      val scanned = codesAll.where(col("cell").isin(probeCells.toSeq: _*)).count()
      println(f"x$m ivf candidate volume: $scanned of $totalCodes codes " +
        f"(${100.0 * scanned / totalCodes}%.1f%%, ${probeCells.size} probe cells of ${1 << bits})")
      def pairs() = pipelines.PqIndex.search(spark, q, ivfIx, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val flatPairs = { // pass 1 warms the codegen units, pass 2 is the number
        timed(s"x$m search FLAT pass1 [warm]")(pairs())
        timed(s"x$m search FLAT ($totalCodes codes)")(pairs())
      }
      spark.conf.set("spark.graft.pq.search", "ivf")
      val ivfPairs = {
        timed(s"x$m search IVF pass1 [warm]")(pairs())
        timed(s"x$m search IVF radius-2 ($scanned codes)")(pairs())
      }
      spark.conf.unset("spark.graft.pq.search")
      spark.conf.unset("spark.graft.ann.probeRadius")
      println(f"x$m ivf recall@3 vs flat = ${ivfPairs.intersect(flatPairs).size.toDouble / flatPairs.size}%.3f")
    }
    spark.stop()
  }
}
