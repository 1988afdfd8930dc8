package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object PropAB {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.queries.Aggs.aggHash(spark, d).queryExecution.toRdd.count()
    val pairs = graft.ops.Lineage.cut(
      graft.queries.Llm.jaccardPairsUnsorted(spark, d).select("doc_a", "doc_b"))
    val docs = Tables.documents(spark, d).select(col("doc_id"))
    def edgesDf() = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .union(docs.select(col("doc_id").as("src"), col("doc_id").as("dst")))
      .repartition(col("src"))
      .persist()
    def prop(edges: DataFrame, labels: DataFrame): DataFrame =
      edges.join(labels, col("dd") === col("src"))
        .groupBy(col("dst")).agg(min("lbl").as("lbl"))
        .select(col("dst").as("dd"), col("lbl"))
    def runBaseline(tag: String): java.math.BigDecimal = {
      val t0 = System.nanoTime()
      val edges = edgesDf()
      var labels = docs.select(col("doc_id").as("dd"), col("doc_id").as("lbl"))
      var prevSum: java.math.BigDecimal = null
      var converged = false
      var rounds = 0
      for (_ <- 1 to 8 if !converged) {
        rounds += 1
        labels = graft.ops.Lineage.cut(prop(edges, labels))
        val s = labels.agg(sum(col("lbl").cast("decimal(38,0)"))).head().getDecimal(0)
        converged = prevSum != null && s.compareTo(prevSum) == 0
        prevSum = s
      }
      val out = labels.agg(sum(col("lbl").cast("decimal(38,0)")), count(lit(1))).head().getDecimal(0)
      edges.unpersist()
      println(f"$tag%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s rounds=$rounds sig=$out")
      out
    }
    def runBatched(tag: String): java.math.BigDecimal = {
      val t0 = System.nanoTime()
      val edges = edgesDf()
      var labels = docs.select(col("doc_id").as("dd"), col("doc_id").as("lbl"))
      var prevSum: java.math.BigDecimal = null
      var converged = false
      var batches = 0
      for (_ <- 1 to 4 if !converged) {
        batches += 1
        val obs = org.apache.spark.sql.Observation()
        labels = graft.ops.Lineage.cut(
          prop(edges, prop(edges, labels))
            .observe(obs, sum(col("lbl").cast("decimal(38,0)")).as("s")))
        val s = obs.getAsJava.get("s").asInstanceOf[java.math.BigDecimal]
        converged = prevSum != null && s.compareTo(prevSum) == 0
        prevSum = s
      }
      val out = labels.agg(sum(col("lbl").cast("decimal(38,0)")), count(lit(1))).head().getDecimal(0)
      edges.unpersist()
      println(f"$tag%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s batches=$batches sig=$out")
      out
    }
    var b: java.math.BigDecimal = null; var c: java.math.BigDecimal = null
    for (i <- 1 to 3) { b = runBaseline(s"baseline $i"); c = runBatched(s"batched2+obs $i") }
    println(s"signatures equal: ${b.compareTo(c) == 0}")
    spark.stop()
  }
}
