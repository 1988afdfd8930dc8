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

  /** Partition-diff re-delivery of the prepared corpus (the daily
    * refresh shape): re-run the prep over the current source and ship
    * ONLY the split partitions whose content fingerprint moved —
    * unchanged splits keep their delivered files byte-for-byte. First
    * run into an empty OUTDIR delivers everything; a refresh that only
    * appends train-bucket docs rewrites only split=train
    * (CorpusPrepSpec pins this). Returns (changed, stale, manifest). */
  def sync(spark: SparkSession, src: String, dst: String, stopK: Int = 5)
      : (Seq[String], Seq[String], graft.delivery.DeliveryReport) = {
    // cut: syncPartitions executes its input twice (fingerprint +
    // rewrite) and the prep pipeline is the expensive part
    val out = graft.ops.Lineage.cut(CorpusPrep.run(spark, src, stopK = stopK))
    graft.delivery.Deliver.syncPartitions(
      spark, out, s"$dst/documents", "split", "parquet")
  }

  def main(args: Array[String]): Unit = {
    val (flags, pos) = args.partition(_.startsWith("--"))
    // reject unknown flags instead of letting a typo ('--synk') fall
    // through as a positional SRCDIR/OUTDIR — a misparsed OUTDIR is a
    // mode(overwrite) write into the wrong directory
    val unknown = flags.filterNot(_ == "--sync")
    require(unknown.isEmpty, s"unknown flag(s): ${unknown.mkString(" ")}; " +
      "usage: CorpusPrepMain [--sync] SRCDIR OUTDIR [stopK]")
    require(pos.length >= 2, "usage: CorpusPrepMain [--sync] SRCDIR OUTDIR [stopK]")
    val (src, dst) = (pos(0), pos(1))
    val stopK = pos.lift(2).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      if (flags.contains("--sync")) {
        val (changed, stale, rep) = sync(spark, src, dst, stopK)
        println(s"""{"changed":[${changed.map("\"" + _ + "\"").mkString(",")}],""" +
          s""""stale":[${stale.map("\"" + _ + "\"").mkString(",")}],""" +
          s""""rows":${rep.rows},"fingerprint":${rep.fingerprint}}""")
      } else println(run(spark, src, dst, stopK))
    } finally spark.stop()
  }
}
