package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe (session tool): A/B the dq_profile metrics-frame shape.
  * A = one agg carrying 5 exact countDistincts (Catalyst compiles the
  * multi-distinct via Expand ×(n_distinct_cols+1) — 900k expanded rows
  * at sf0.1 orders through one wide shuffle). B = the non-distinct
  * metrics in one agg plus one two-level (groupBy col → count groups)
  * aggregate PER distinct column, all 1-row frames crossJoined — five
  * narrow self-contained subtrees instead of one Expand.
  */
object DqProfileProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val numCols = Seq("o_orderkey", "o_custkey", "o_totalprice")
    val strCols = Seq("o_orderstatus", "o_orderpriority")
    val all = numCols ++ strCols

    def a(): DataFrame = {
      val df = Tables.orders(spark, d)
      val aggs = Seq(count(lit(1)).as("n_rows")) ++ all.flatMap { c =>
        Seq(coalesce(sum(col(c).isNull.cast("long")), lit(0L)).as(s"null_$c"),
            countDistinct(col(c)).as(s"nd_$c"))
      }
      df.agg(aggs.head, aggs.tail: _*)
    }

    def b(): DataFrame = {
      val df = Tables.orders(spark, d)
      val base = df.agg(
        (Seq(count(lit(1)).as("n_rows")) ++ all.map { c =>
          coalesce(sum(col(c).isNull.cast("long")), lit(0L)).as(s"null_$c")
        }).head,
        (Seq(count(lit(1)).as("n_rows")) ++ all.map { c =>
          coalesce(sum(col(c).isNull.cast("long")), lit(0L)).as(s"null_$c")
        }).tail: _*)
      all.foldLeft(base) { (acc, c) =>
        acc.crossJoin(broadcast(
          df.select(col(c)).where(col(c).isNotNull).groupBy(col(c)).agg(lit(1))
            .agg(count(lit(1)).as(s"nd_$c"))))
      }
    }

    def time(tag: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime(); f.queryExecution.toRdd.count()
      println(f"$tag%-14s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    for (p <- 1 to 3) { time(s"expand p$p")(a()); time(s"perCol p$p")(b()) }
    println(a().collect().head.toString)
    println(b().select(("n_rows" +: all.flatMap(c => Seq(s"null_$c", s"nd_$c"))).map(col): _*).collect().head.toString)
    spark.stop()
  }
}
