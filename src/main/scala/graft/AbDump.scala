package graft
import org.apache.spark.sql.SparkSession
/** Temp A/B harness: dump a subset of SparkEntry.queries to parquet. */
object AbDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val keys = args.drop(2)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    keys.foreach { k =>
      SparkEntry.queries(k)(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$k")
    }
    spark.stop()
  }
}
