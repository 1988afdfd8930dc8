package graft.delivery

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Integrity manifest for a delivered dataset: row count plus an
  * order-insensitive content fingerprint over per-row hashes of
  * name-sorted columns — stable under repartitioning, file splits and
  * column reordering. The combiner pairs XOR with a wrapping SUM: XOR
  * alone cancels any multiset difference of even multiplicity (e.g.
  * {A,A,B} vs {B,C,C}), while sum-mod-2^64 is multiplicity-sensitive;
  * both are associative+commutative, so map-side partials still work. */
case class DeliveryReport(rows: Long, files: Long, bytes: Long, fingerprint: Long)

/** The data-delivery surface (SURVEY.md §0: the reference's category is
  * Hadoop batch movement + transformation of files): read any supported
  * format, re-layout, write, and verify — all through the Hadoop
  * FileSystem API, so `file:/`, `hdfs://` and `s3a://` behave
  * identically. This is the Spark-native distcp+transform.
  *
  * Scale notes: the copy itself is a distributed scan→write with no
  * collect; layout controls (partitionBy / repartitionTo / maxRecords
  * PerFile) are how a 100 TB delivery shapes downstream read
  * parallelism and partition pruning; the fingerprint is a single
  * XOR-aggregate (associative + commutative → map-side partials, no
  * global sort needed to compare datasets).
  */
object Deliver {

  /** Order-insensitive, count-sensitive content fingerprint of a
    * DataFrame: xor ⊕ rot32(sum mod 2^64) of per-row xxhash64. The sum
    * runs in decimal(38,0) (exact, no ANSI long-overflow) and is reduced
    * mod 2^64 driver-side. */
  def fingerprint(df: DataFrame): Long = {
    val cols = df.columns.sorted.map(col)
    val hashed = df.select(xxhash64(to_json(struct(cols: _*))).as("h"))
    val r = hashed.agg(
      expr("bit_xor(h)").as("x"),
      sum(col("h").cast("decimal(38,0)")).as("s")).head()
    if (r.isNullAt(0)) 0L // empty dataset
    else {
      val sumMod = r.getDecimal(1).toBigInteger
        .mod(java.math.BigInteger.ONE.shiftLeft(64)).longValue()
      r.getLong(0) ^ java.lang.Long.rotateLeft(sumMod, 32)
    }
  }

  /** Read `src` with an explicit schema when the format needs one (CSV/
    * JSON at scale must never pay the inference scan). */
  def read(spark: SparkSession, src: String, format: String = "parquet",
           schema: Option[String] = None,
           options: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format(format).options(options)
    schema.fold(r)(s => r.schema(s)).load(src)
  }

  /** Copy src → dst with layout controls; returns the manifest of what
    * was written (re-read from dst, so it attests the delivered bytes,
    * not the intent). */
  def copy(spark: SparkSession, src: String, dst: String,
           srcFormat: String = "parquet", dstFormat: String = "parquet",
           schema: Option[String] = None,
           readOptions: Map[String, String] = Map.empty,
           writeOptions: Map[String, String] = Map.empty,
           partitionBy: Seq[String] = Nil,
           repartitionTo: Option[Int] = None): DeliveryReport = {
    val in = read(spark, src, srcFormat, schema, readOptions)
    val shaped = repartitionTo.fold(in)(n => in.repartition(n))
    val w = shaped.write.format(dstFormat).options(writeOptions).mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).save(dst)
    manifest(spark, dst, dstFormat,
      schema.filter(_ => dstFormat == "csv" || dstFormat == "json"), writeOptions)
  }

  /** Incremental delivery (distcp -update semantics, keyed): append to
    * `dst` only the `src` rows whose key is not yet present — an anti
    * join on the key column, so re-running after a partial/failed
    * delivery is idempotent and a daily top-up ships only the delta.
    * Returns (rows appended, manifest of dst AFTER the append). The
    * anti join shuffles on the key; at 100 TB partition both sides by
    * ingest date first so the delta join touches only fresh partitions. */
  def copyIncremental(spark: SparkSession, src: String, dst: String,
                      keyCol: String,
                      srcFormat: String = "parquet", dstFormat: String = "parquet",
                      schema: Option[String] = None,
                      readOptions: Map[String, String] = Map.empty,
                      writeOptions: Map[String, String] = Map.empty,
                      dstReadOptions: Option[Map[String, String]] = None): (Long, DeliveryReport) = {
    val s = read(spark, src, srcFormat, schema, readOptions)
    // Self-describing dst formats must not be forced to the src text
    // schema (same rule as copy()'s manifest read).
    val dstSchema = schema.filter(_ => dstFormat == "csv" || dstFormat == "json")
    // Reader and writer option namespaces are distinct: a write-only
    // option that also steers a reader (or a needed dst-read option the
    // caller couldn't supply) would silently mis-read the existing keys
    // and corrupt the anti-join delta (ADVICE r3). Defaults to
    // writeOptions, which is right for symmetric options like csv
    // header/sep.
    val dstRead = dstReadOptions.getOrElse(writeOptions)
    val fs = new Path(dst).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val delta =
      if (!fs.exists(new Path(dst))) s
      else {
        val existing = read(spark, dst, dstFormat, dstSchema, dstRead)
          .select(org.apache.spark.sql.functions.col(keyCol))
        s.join(existing, Seq(keyCol), "left_anti")
      }
    // Materialize the anti join ONCE: count() and the append write are two
    // actions, and a source that changes between them would make the
    // reported delta diverge from the rows actually shipped. persist()
    // pins the computed delta so both actions observe the same rows
    // (at cluster scale prefer MEMORY_AND_DISK — the delta of a daily
    // top-up is small relative to the corpus, this is not a full-corpus
    // cache).
    delta.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = delta.count()
      if (n > 0)
        delta.write.format(dstFormat).options(writeOptions).mode("append").save(dst)
      (n, manifest(spark, dst, dstFormat, dstSchema, dstRead))
    } finally delta.unpersist()
  }

  /** Per-partition content fingerprints: partition value (as string) →
    * the same xor ⊕ rot32(sum) combiner as `fingerprint`, one shuffle.
    * The collect is bounded by PARTITION count, not rows — the list a
    * 100 TB delivery reconciles is thousands of entries, not the data. */
  def partitionFingerprints(df: DataFrame, partCol: String): Map[String, Long] = {
    val cols = df.columns.sorted.map(col)
    df.select(col(partCol).cast("string").as("p"),
        xxhash64(to_json(struct(cols: _*))).as("h"))
      .groupBy("p")
      .agg(expr("bit_xor(h)").as("x"),
           sum(col("h").cast("decimal(38,0)")).as("s"))
      .collect().map { r =>
        val sumMod = r.getDecimal(2).toBigInteger
          .mod(java.math.BigInteger.ONE.shiftLeft(64)).longValue()
        r.getString(0) -> (r.getLong(1) ^ java.lang.Long.rotateLeft(sumMod, 32))
      }.toMap
  }

  /** Partition-diff re-delivery (the rsync shape for periodic refresh):
    * compare per-partition fingerprints of src and a previously
    * partitionBy(partCol)-delivered dst, rewrite ONLY the partitions
    * that are new or changed (dynamic partition overwrite — untouched
    * partition directories keep their files), and delete dst partitions
    * that vanished from src. At 100 TB this is the difference between
    * re-shipping a corpus and re-shipping the day's delta: unchanged
    * partitions cost one fingerprint scan, no write.
    * Returns (rewritten partition values, deleted partition values,
    * manifest of dst AFTER the sync). */
  def syncPartitions(spark: SparkSession, src: String, dst: String,
                     partCol: String,
                     srcFormat: String = "parquet", dstFormat: String = "parquet")
      : (Seq[String], Seq[String], DeliveryReport) = {
    val in = read(spark, src, srcFormat)
    val fs = new Path(dst).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dstFps: Map[String, Long] =
      if (!fs.exists(new Path(dst))) Map.empty
      else partitionFingerprints(read(spark, dst, dstFormat), partCol)
    val srcFps = partitionFingerprints(in, partCol)
    val changed = srcFps.filter { case (p, f) => dstFps.get(p) != Some(f) }.keys.toSeq.sorted
    val stale = (dstFps.keySet -- srcFps.keySet).toSeq.sorted
    if (changed.nonEmpty) {
      val mode = "spark.sql.sources.partitionOverwriteMode"
      val prev = spark.conf.getOption(mode)
      spark.conf.set(mode, "dynamic") // overwrite ONLY the written partitions
      try in.where(col(partCol).cast("string").isin(changed: _*))
        .write.format(dstFormat).partitionBy(partCol).mode("overwrite").save(dst)
      finally prev.fold(spark.conf.unset(mode))(spark.conf.set(mode, _))
    }
    stale.foreach { p =>
      fs.delete(new Path(dst, s"$partCol=$p"), true)
    }
    (changed, stale, manifest(spark, dst, dstFormat))
  }

  /** Manifest of a delivered directory: rows, files, bytes, fingerprint. */
  def manifest(spark: SparkSession, path: String, format: String = "parquet",
               schema: Option[String] = None,
               options: Map[String, String] = Map.empty): DeliveryReport = {
    val df = read(spark, path, format, schema, options)
    val fp = fingerprint(df)
    val rows = df.count()
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var files = 0L; var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) {
        files += 1; bytes += f.getLen
      }
    }
    DeliveryReport(rows, files, bytes, fp)
  }

  /** End-to-end delivery check: same rows and same content fingerprint on
    * both sides (bytes/files legitimately differ across formats and
    * layouts). */
  def verifyDelivery(spark: SparkSession,
                     src: String, srcFormat: String,
                     dst: String, dstFormat: String,
                     schema: Option[String] = None,
                     srcOptions: Map[String, String] = Map.empty,
                     dstOptions: Map[String, String] = Map.empty): Boolean = {
    val a = read(spark, src, srcFormat, schema, srcOptions)
    val b = read(spark, dst, dstFormat, schema, dstOptions)
    a.count() == b.count() && fingerprint(a) == fingerprint(b)
  }
}
