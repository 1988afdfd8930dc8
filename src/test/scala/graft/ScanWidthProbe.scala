package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (session tool, not a spec): measures whether fanning a
  * single-row-group fixture scan out to the session's cores before the
  * first compute stage pays for its exchange. The driver fixtures are ONE
  * parquet row group per table, so stage 1 of every query — scan + explode
  * + map-side partial aggregation — runs on ONE of the 32 local cores; at
  * production scale the same tables arrive as thousands of splittable
  * files and the scan stage parallelizes by itself.
  */
object ScanWidthProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    def run(df: org.apache.spark.sql.DataFrame): Unit = {
      df.queryExecution.toRdd.count(); ()
    }

    // token-stream shape: explode + two-level agg (llm family base)
    def tokAgg(fan: Boolean): org.apache.spark.sql.DataFrame = {
      val base0 = Tables.documents(spark, d)
      val base = if (fan) base0.repartition(32) else base0
      base.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        .groupBy("doc_id").agg(count(lit(1)).as("nd"), sum("tf").as("dl"))
        .agg(count(lit(1)).as("n"), sum("nd").as("snd"), sum("dl").as("sdl"))
    }

    // relational shape: wide numeric agg over lineitem (agg_skew_kurt-ish)
    def liAgg(fan: Boolean): org.apache.spark.sql.DataFrame = {
      val base0 = Tables.lineitem(spark, d)
      val base = if (fan) base0.repartition(32) else base0
      base.groupBy("l_returnflag")
        .agg(
          sum(col("l_quantity") * col("l_quantity") * col("l_quantity")).as("q3"),
          sum(col("l_extendedprice") * col("l_extendedprice")).as("p2"),
          avg("l_discount").as("ad"), count(lit(1)).as("n"),
          countDistinct("l_partkey").as("ndp"))
    }

    for (pass <- 1 to 3; fan <- Seq(false, true)) {
      time(s"tokAgg fan=$fan pass$pass") { run(tokAgg(fan)) }
      time(s"liAgg  fan=$fan pass$pass") { run(liAgg(fan)) }
    }
    spark.stop()
  }
}
