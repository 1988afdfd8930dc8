package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev aid: time the internal stages of the jaccard/dedup hot path.
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "Test/runMain graft.StageProfile"` */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t(name: String)(df: => DataFrame): DataFrame = {
      val t0 = System.nanoTime()
      val out = df
      val n = out.queryExecution.toRdd.count()
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
      out
    }
    // warmup
    graft.queries.Aggs.aggHash(spark, d).queryExecution.toRdd.count()

    val tokRaw = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("token"))
    t("tok distinct")(tokRaw.distinct())
    val tok = graft.ops.Lineage.cut(tokRaw.distinct())
    val dfTok = tok.groupBy("token").agg(count(lit(1)).as("df"))
    val wBlock = Window.partitionBy("doc_id").orderBy(col("df"), col("token"))
    t("block window")(
      tok.join(dfTok, "token")
        .withColumn("rn", row_number().over(wBlock)).where(col("rn") <= 4)
        .select(col("doc_id"), col("lang"), col("token").as("block_tok")))
    val block = tok.join(dfTok, "token")
      .withColumn("rn", row_number().over(wBlock)).where(col("rn") <= 4)
      .select(col("doc_id"), col("lang"), col("token").as("block_tok"))
    t("cand join+distinct")(
      block.as("a").join(block.as("b"),
          col("a.block_tok") === col("b.block_tok") &&
          col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct())
    t("full jaccard")(graft.queries.Llm.llmJaccardPairs(spark, d))
    t("full dedup_cluster")(graft.queries.Extras.llmDedupCluster(spark, d))
    spark.stop()
  }
}
