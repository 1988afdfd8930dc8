package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev aid (round 11): attribute fn_try's wall to its component rails —
  * which of try_divide / try_cast / try_to_timestamp prices the query.
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "Test/runMain graft.FnTryProbe"` */
object FnTryProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t(name: String)(df: => DataFrame): Unit = {
      // min of 3 hermetic passes, same discipline as Bench
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        spark.sharedState.cacheManager.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s min ${ts.min}%6.2f s  (${ts.map(x => f"$x%.2f").mkString(" ")})")
    }
    val o = Tables.orders(spark, d)
    // every probe AGGREGATES the rail column, else Catalyst prunes the
    // projection away and the probe times an empty scan
    def agg(cols: (String, org.apache.spark.sql.Column)*) =
      o.select(col("o_orderstatus") +: cols.map { case (n, c) => c.as(n) }: _*)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          cols.map { case (n, _) => count(col(n)).as(s"n_$n") }: _*)
        .orderBy("o_orderstatus")
    // warmup
    agg().queryExecution.toRdd.count()
    t("baseline (no rails)")(agg())
    t("+try_divide")(agg("sdiv" -> expr("try_divide(o_totalprice, o_custkey % 3)")))
    t("+try_cast ok")(agg("pnum" -> expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)")))
    t("+try_cast bad")(agg("pbad" -> expr("try_cast(o_orderpriority AS INT)")))
    t("+try_to_timestamp bad")(agg("tbad" -> expr("try_to_timestamp(o_orderpriority)")))
    val rails = Seq(
      expr("try_divide(o_totalprice, o_custkey % 3)").as("sdiv"),
      expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").as("pnum"),
      expr("try_cast(o_orderpriority AS INT)").as("pbad"),
      expr("try_to_timestamp(o_orderpriority)").as("tbad"))
    t("all 4 rails, count agg")(agg("sdiv" -> rails(0), "pnum" -> rails(1),
      "pbad" -> rails(2), "tbad" -> rails(3)))
    def fullAgg(src: DataFrame) = src
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(when(col("sdiv").isNull, 1L).otherwise(0L)).as("div_nulls"),
        graft.ops.Det.sumR4(col("sdiv")).as("div_sum"),
        count(col("pnum")).as("cast_ok"),
        count(col("pbad")).as("cast_bad_survivors"),
        count(col("tbad")).as("ts_survivors"),
        min("pnum").cast("long").as("min_prio"),
        max("pnum").cast("long").as("max_prio"))
      .orderBy("o_orderstatus")
    t("4 rails + full 8-agg")(fullAgg(o.select(col("o_orderstatus") +: rails: _*)))
    val cheap = Seq(
      col("o_totalprice").as("sdiv"),
      lit(1).as("pnum"), lit(null).cast("int").as("pbad"),
      lit(null).cast("timestamp").as("tbad"))
    t("cheap rails + full 8-agg")(fullAgg(o.select(col("o_orderstatus") +: cheap: _*)))
    t("full fn_try query")(graft.queries.Scalars.fnTry(spark, d))
    spark.stop()
  }
}
