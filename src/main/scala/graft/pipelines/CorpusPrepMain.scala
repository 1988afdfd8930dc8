package graft.pipelines

import org.apache.spark.sql.SparkSession

/** CLI for the corpus-prep pipeline: read the documents table from
  * SRCDIR, run clean → exact dedup → near-dup cluster → split, write
  * the prepared corpus partitioned by split to OUTDIR, and print a
  * one-line JSON manifest (rows in/out, per-split counts).
  *
  * Usage: graft.pipelines.CorpusPrepMain SRCDIR OUTDIR [stopK]
  */
object CorpusPrepMain {
  /** Exposed for tests: run a prep delivery, return the manifest line. */
  def run(spark: SparkSession, src: String, dst: String, stopK: Int = 5): String = {
    val in = graft.Tables.documents(spark, src).count()
    val out = CorpusPrep.run(spark, src, stopK = stopK)
    // partition the delivered corpus by split so downstream training
    // readers prune train/val/test at the directory level
    out.write.mode("overwrite").partitionBy("split").parquet(s"$dst/documents")
    val bySplit = spark.read.parquet(s"$dst/documents")
      .groupBy("split").count().collect()
      .map(r => s""""${r.getString(0)}":${r.getLong(1)}""").sorted.mkString(",")
    val kept = spark.read.parquet(s"$dst/documents").count()
    s"""{"rows_in":$in,"rows_out":$kept,"splits":{$bySplit}}"""
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: CorpusPrepMain SRCDIR OUTDIR [stopK]")
    val Array(src, dst) = args.take(2)
    val stopK = args.lift(2).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try println(run(spark, src, dst, stopK))
    finally spark.stop()
  }
}
