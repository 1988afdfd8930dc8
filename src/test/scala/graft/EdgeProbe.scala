package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object EdgeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def t(tag: String)(f: => Long): Unit = {
      for (i <- 1 to 3) { val t0 = System.nanoTime; val n = f
        println(f"$tag%-28s iter$i n=$n wall=${(System.nanoTime-t0)/1e9}%.2f s") }
    }
    val li = Tables.lineitem(spark, d)
    t("full edges (distinct)") {
      li.groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .select(explode(expr("""flatten(transform(ps, (x, i) ->
          transform(slice(ps, i + 2, size(ps) - i - 1), y ->
            struct(x AS src, y AS dst))))""")).as("e"))
        .select(col("e.src"), col("e.dst")).distinct().count()
    }
    t("pct10 early-filter distinct") {
      li.groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .select(explode(expr("""flatten(transform(ps, (x, i) ->
          transform(slice(ps, i + 2, size(ps) - i - 1), y ->
            struct(x AS src, y AS dst))))""")).as("e"))
        .select(col("e.src"), col("e.dst"))
        .where(conv(substring(md5(concat_ws("_", col("src"), col("dst"))), 1, 6),
          16, 10).cast("long") % 100 < 10)
        .distinct().count()
    }
    spark.stop()
  }
}
