package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev aid: time the internal stages of llm_dedup_cluster — pair
  * materialization, edge persist, per-round join+cut, per-round
  * convergence action, final census.
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "Test/runMain graft.ClusterProfile"` */
object ClusterProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def tm[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val out = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      out
    }
    // warmup
    graft.queries.Aggs.aggHash(spark, d).queryExecution.toRdd.count()

    val pairs = tm("pairs cut (jaccard pipe)") {
      graft.ops.Lineage.cut(
        graft.queries.Llm.jaccardPairsUnsorted(spark, d).select("doc_a", "doc_b"))
    }
    val docs = Tables.documents(spark, d).select(col("doc_id"))
    val edges = tm("edges persist+count") {
      val e = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
        .union(docs.select(col("doc_id").as("src"), col("doc_id").as("dst")))
        .repartition(col("src"))
        .persist()
      e.count()
      e
    }
    var labels = docs.select(col("doc_id").as("dd"), col("doc_id").as("lbl"))
    var prevSum: java.math.BigDecimal = null
    var converged = false
    for (i <- 1 to 8 if !converged) {
      labels = tm(s"round $i join+cut") {
        graft.ops.Lineage.cut(
          edges.join(labels, col("dd") === col("src"))
            .groupBy(col("dst")).agg(min("lbl").as("lbl"))
            .select(col("dst").as("dd"), col("lbl")))
      }
      val s = tm(s"round $i sum action") {
        labels.agg(sum(col("lbl").cast("decimal(38,0)"))).head().getDecimal(0)
      }
      converged = prevSum != null && s.compareTo(prevSum) == 0
      prevSum = s
    }
    tm("final census+order") {
      val sizes = labels.groupBy("lbl").agg(count(lit(1)).as("csize"))
      labels.join(sizes, "lbl")
        .select(col("dd").as("doc_id"), col("lbl").as("cluster"), col("csize"))
        .orderBy("doc_id").queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
