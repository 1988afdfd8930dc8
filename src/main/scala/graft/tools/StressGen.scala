package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perf-stress data generator: replicates a fixture dir K× with shifted
  * primary keys (FKs to dimensions preserved) into a scratch dir. For
  * scale-behavior testing ONLY — correctness always runs against the
  * pristine driver fixtures. Usage:
  * runMain graft.tools.StressGen <srcSfDir> <dstDir> <k> [kDocs] [kEmb]
  */
object StressGen {
  private val OFF = 100000000L

  def main(args: Array[String]): Unit = {
    val src = args(0); val dst = args(1); val k = args(2).toInt
    val kDocs = args.lift(3).map(_.toInt).getOrElse(3)
    val kEmb = args.lift(4).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(name: String, times: Int, shifted: Seq[String]): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val out = (0 until times).map { i =>
        shifted.foldLeft(base)((df, c) => df.withColumn(c, col(c) + lit(i * OFF)))
      }.reduce(_ union _)
      out.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"stress: $name x$times -> ${out.count()} rows")
    }

    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(replicate(_, 1, Nil))
    replicate("orders", k, Seq("o_orderkey"))
    replicate("lineitem", k, Seq("l_orderkey"))
    replicate("events", k, Seq("event_id"))
    replicate("documents", kDocs, Seq("doc_id"))
    replicate("embeddings", kEmb, Seq("vec_id"))
    spark.stop()
  }
}
