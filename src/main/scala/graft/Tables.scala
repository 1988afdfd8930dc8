package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md:13-15,
  * FIXTURES.md §1). One method per table so query bodies read as catalogs.
  *
  * Scale note: `spark.read.parquet` goes through the Hadoop FileSystem
  * API, so the same code serves `file:/`, `hdfs://` and `s3a://` paths
  * unchanged — this is the Spark-native realization of Hadoop data
  * delivery (SURVEY.md §1.3). At 100 TB the vectorized Parquet reader +
  * partition-level splits parallelize the scan; nothing here pins data
  * to a single node.
  */
object Tables {
  /** Cast every top-level column of type `from` to `to` — the ONE
    * timestamp-flavor normalization helper behind the loader (NTZ →
    * session-TZ), the Verify dump boundary (session-TZ → NTZ) and the
    * delivery fingerprint's one-typing-rule hash (NTZ → session-TZ).
    * A single definition so the three boundaries cannot drift apart
    * (e.g. a future nested-struct extension lands everywhere at once).
    * Pure projection — no shuffle, and column pruning still reaches the
    * scan through it; under the repo-pinned UTC session both directions
    * are value-preserving. */
  private[graft] def castTimestampCols(df: DataFrame,
      from: org.apache.spark.sql.types.DataType, to: String): DataFrame =
    df.schema.fields.collect {
      case f if f.dataType == from => f.name
    }.foldLeft(df)((d, c) =>
      d.withColumn(c, d.col(s"`${c.replace("`", "``")}`").cast(to)))

  /** The r7 driver data writes every timestamp as parquet µs with
    * isAdjustedToUTC=false, which Spark 4 infers as TIMESTAMP_NTZ (the
    * pre-r7 generation carried UTC-adjusted ms → TimestampType). DuckDB
    * reads both as its naive TIMESTAMP, so the oracle sees identical
    * values either way; on the Spark side we cast NTZ → TimestampType at
    * the loader so every downstream operator keeps the one shape it was
    * built and oracle-verified against. */
  private def normalizeNtz(df: DataFrame): DataFrame =
    castTimestampCols(df, org.apache.spark.sql.types.TimestampNTZType, "timestamp")

  /** Read a table bypassing layout normalization — for the two §2.1
    * queries whose CLAIM is the scan of the raw source file itself
    * (scan_parquet/scan_pruned price ingest, not serving). */
  def tableRaw(spark: SparkSession, sfDir: String, name: String): DataFrame =
    normalizeNtz(spark.read.parquet(s"$sfDir/$name.parquet"))

  /** Layout normalization (round 13, VERDICT r12 #1a): the driver
    * fixtures ship each table as ONE parquet file with ONE row group,
    * and a row group is the parquet split atom — so every scan of such
    * a file is ONE task, and every query's first stage (scan + partial
    * agg / filter / explode) runs single-threaded on a 32-core box.
    * ComputeProfile measured the whole non-llm compute tail at ≤ 0.26
    * CPU utilization with 3-11 mostly-sequential tasks per query; a
    * 32-row-group re-land of the same bytes cut the agg/join tail
    * 25-45% per query. A 100 TB warehouse does exactly this on ingest:
    * data lands ONCE into the serving layout (splittable row groups,
    * file counts matched to the cluster), and every later query reads
    * the landed copy — re-reading a hostile source layout per query is
    * the anti-pattern. So the loader re-lands a degenerate source once
    * per (session, dataset): single-file sources with ≥ 200k rows and
    * fewer row groups than max(2, cores/4) are rewritten (repartition
    * to ~50k-row splits, same rows, same types) into a scratch dir
    * with the graph-view publish discipline (process-unique tmp +
    * atomic rename; queries/Graphs.publish), and served from there.
    * Multi-file directories (every Spark-written corpus, StressGen ×k)
    * and small fixtures (sf0.001/sf0.01 — every table < 200k rows)
    * pass through untouched. `spark.graft.layout.normalize=false`
    * disables. Row ORDER of the landed copy is partition-arbitrary,
    * like any shuffle — every query's output carries its own total
    * order (the repo's determinism discipline), which the 184-query
    * oracle sweep re-verifies against DuckDB reading the RAW file.
    *
    * The threshold is 200k rows (≈ 10 MB at lineitem's width), not
    * lower, from a measured same-phase A/B: parallelizing the CHEAP
    * serial scans (orders 2.7 MB, events 2 MB) saved ~0.1 s per scan
    * but cost MORE than that in per-scan listing/open overhead on the
    * multi-scan queries (dq_referential read 7 tables 2× each and
    * regressed ~2×; dq_profile scans orders once per profiled column),
    * while the heavy lineitem scan (11 MB, 11 columns, the first stage
    * of ~40 queries) won 40-60% per query. At 100 TB every table
    * clears any threshold and ships multi-row-group anyway — this
    * gate only decides which of the BENCH FIXTURES are worth landing. */
  private val layoutDecision =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def normalizeLayout(s: SparkSession, sfDir: String, name: String): String = {
    val rawPath = s"$sfDir/$name.parquet"
    if (s.conf.get("spark.graft.layout.normalize", "true") != "true") return rawPath
    val key = s"${s.sparkContext.applicationId}|$sfDir|$name"
    val cached = layoutDecision.get(key)
    if (cached != null) return cached
    val f = new java.io.File(rawPath)
    val decided: String = if (!f.isFile) rawPath else {
      val cores = s.sparkContext.defaultParallelism
      val (rows, rowGroups) =
        try {
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.toString),
            s.sparkContext.hadoopConfiguration)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try (r.getRecordCount, r.getRowGroups.size) finally r.close()
        } catch { case _: Throwable => (0L, Int.MaxValue) } // unreadable → raw
      // Threshold conf'd + re-derived (round 13 optimization). The
      // original 200k gate was sized against the FIRST-cut split count
      // (cores flat = 32 files), where the 2-3 MB tables' multi-scan
      // queries lost more to per-scan open overhead than the parallel
      // scan bought (dq_referential 1.47 → 3.49 under 32-way orders).
      // Under the CURRENT ~50k-row sizing (orders → 3 files, events →
      // 2) the same-phase A/B flips decisively: fn_try 1.60 → 0.64,
      // dq_referential 1.64 → 1.41 (the old canary now WINS), agg_gini/
      // dq_profile/ev_session/ev_dedup/fn_struct/join_multiway −0.03..
      // −0.12 each, nothing worse. 100k keeps every measured-flat
      // sub-100k fixture (customer 15k, part 20k, documents 5k) raw.
      val minRows = s.conf.get("spark.graft.layout.minRows", "100000").toLong
      if (rows < minRows || rowGroups >= math.max(2, cores / 4)) rawPath
      else {
        val dKey = java.security.MessageDigest.getInstance("MD5")
          .digest(sfDir.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
        val root = s.conf.get("spark.graft.scratch.root", sys.props("java.io.tmpdir"))
        val dir = new java.io.File(root,
          s"graft_layout_${s.sparkContext.applicationId}_$dKey/$name")
        if (!dir.isDirectory) {
          // split count targets ~50k rows per file, capped at the core
          // count: enough to kill the serial-scan floor without paying
          // 32 task launches + file opens per scan of a 100k-row table
          // (the first cut used `cores` flat and the 2-3 MB tables'
          // cheap queries LOST more to per-task overhead than the
          // parallel scan bought back)
          val parts = math.min(cores.toLong, math.max(2L, rows / 50000L)).toInt
          val tmp = new java.io.File(dir.getParentFile,
            s"${dir.getName}.tmp.${java.util.UUID.randomUUID}")
          s.read.parquet(rawPath).repartition(parts)
            .write.mode("overwrite").parquet(tmp.toString)
          require(graft.queries.Graphs.publish(tmp, dir),
            s"layout-normalized copy publish failed at $dir")
        }
        dir.toString
      }
    }
    layoutDecision.put(key, decided)
    decided
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    normalizeNtz(spark.read.parquet(normalizeLayout(spark, sfDir, name)))

  /** The path a `table()` read actually scans (the layout-normalized
    * copy when one exists, else the raw file) — for delivery entry
    * points that take a PATH (Deliver.copyBucketed) but should source
    * from the serving layout like every other reader. */
  def servingPath(spark: SparkSession, sfDir: String, name: String): String =
    normalizeLayout(spark, sfDir, name)

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts has shipped in two parquet generations, so the loader is
    * schema-adaptive. Pre-r7 data declares TIMESTAMP(NANOS), which Spark 4
    * has no type for: read raw ns-since-epoch via nanosAsLong and truncate
    * to µs — the same truncation DuckDB applies on read, so both engines
    * see identical values (integer `div` keeps the full 63-bit range; a
    * double division would lose precision above 2^53 ns ≈ 104 days). The
    * r7 timestamp[us] generation needs nothing extra — `table()` already
    * normalized its NTZ read to the session-TZ TimestampType. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
