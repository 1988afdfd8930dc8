package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Det._

/** Scans, sources and sinks — SURVEY.md §2.1.
  *
  * Everything rides the Hadoop FileSystem API underneath (`file:/` here,
  * `hdfs://`/`s3a://` unchanged on a cluster). Scale design: Parquet scans
  * split per row-group across executors; the sink/source roundtrips write
  * through the distributed committers, so the same code shape moves 100 TB —
  * only the temp paths become cluster URIs.
  */
object Scans {

  /** Fixed per-(session, dataset, tag) scratch directory for the
    * roundtrip queries. A fresh `createTempDirectory` per invocation
    * strands one table copy per call (4 bench passes/round + Verify +
    * tests — review r8 fixed join_bucketed/dq_manifest/source_binary,
    * this back-ports the same discipline, VERDICT r8 #3); a FIXED dir
    * plus `mode("overwrite")` bounds the footprint to one copy per
    * (session, dataset) and the overwrite delete guarantees no stale
    * file from a larger prior corpus survives into the read-back.
    *
    * Root placement is a conf (`spark.graft.scratch.root`, default
    * `java.io.tmpdir` — VERDICT r11 #7): a multi-tenant box or a real
    * cluster points it at shared durable storage (an HDFS/S3A URI works
    * once the path math moves to Hadoop Path; here the local-FS form
    * covers the local[*] posture). The key embeds the Spark
    * applicationId, so two PROCESSES never share a scratch dir even
    * under a shared root — Graphs.publish()'s cross-writer rename
    * protocol is therefore defense-in-depth today; dropping the appId
    * from the key is the (supported) switch that would turn it into the
    * live cross-process view-sharing protocol. */
  private[queries] def scratchDir(s: org.apache.spark.sql.SparkSession,
                                  d: String, tag: String): String = {
    val dKey = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    val root = s.conf.get("spark.graft.scratch.root",
      sys.props("java.io.tmpdir"))
    val dir = new java.io.File(root,
      s"graft_${tag}_${s.sparkContext.applicationId}_$dKey")
    dir.mkdirs()
    dir.toString
  }

  /** Plain recursive unlink — commons-io's deleteQuietly walks with
    * per-file symlink/type checks that cost ~0.5 s over 5000 entries
    * (BinBisect). Shared by every roundtrip query that sweeps its
    * scratch children at entry. */
  private[queries] def rmRf(f: java.io.File): Unit = {
    val cs = f.listFiles; if (cs != null) cs.foreach(rmRf); f.delete(): Unit
  }

  /** scan_parquet — full vectorized scan of lineitem, totally ordered.
    * Raw columns only (no arithmetic) so doubles are bit-identical to the
    * oracle's read of the same file. tableRaw: this query's CLAIM is the
    * ingest scan of the source file itself, so it bypasses the loader's
    * layout normalization (Tables.normalizeLayout scaladoc). */
  val scanParquet: Q = (s, d) =>
    Tables.tableRaw(s, d, "lineitem").orderBy("l_orderkey", "l_linenumber")

  /** scan_pruned — column pruning + predicate pushdown: only 4 of 11 columns
    * reach ReadSchema and the shipdate range lands in PushedFilters
    * (asserted in ScanSpec). tableRaw, as scan_parquet. */
  val scanPruned: Q = (s, d) =>
    Tables.tableRaw(s, d, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice")
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
             col("l_shipdate") <  lit("1997-01-01").cast("timestamp"))
      .orderBy("l_orderkey", "l_linenumber")

  /** sink_parquet — write → read-back roundtrip through the parquet sink,
    * then aggregate; oracle aggregates the original table, so the roundtrip
    * must be lossless to match. */
  val sinkParquet: Q = (s, d) => {
    val tmp = scratchDir(s, d, "sink")
    Tables.lineitem(s, d).write.mode("overwrite").parquet(s"$tmp/lineitem")
    s.read.parquet(s"$tmp/lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sumR4(col("l_extendedprice")).as("sum_price"))
      .orderBy("l_returnflag")
  }

  /** source_csv — delivery-pipeline CSV ingest with explicit schema (no
    * inference pass — at 100 TB schema inference is a full extra scan).
    * Roundtrip: parquet → csv → explicit-schema read → aggregate. Java's
    * shortest-roundtrip double formatting makes the hop lossless. */
  val sourceCsv: Q = (s, d) => {
    val tmp = scratchDir(s, d, "csv")
    Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
      .write.mode("overwrite").option("header", "true").csv(s"$tmp/orders")
    val schema = "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, o_totalprice DOUBLE, o_orderpriority STRING"
    s.read.schema(schema).option("header", "true").csv(s"$tmp/orders")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), sumR4(col("o_totalprice")).as("sum_total"))
      .orderBy("o_orderstatus")
  }

  /** source_json — same shape over JSON-lines with explicit schema. */
  val sourceJson: Q = (s, d) => {
    val tmp = scratchDir(s, d, "json")
    Tables.events(s, d)
      .select("event_id", "user_id", "event_type", "value")
      .write.mode("overwrite").json(s"$tmp/events")
    val schema = "event_id LONG, user_id LONG, event_type STRING, value DOUBLE"
    s.read.schema(schema).json(s"$tmp/events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sumR4(col("value")).as("sum_value"))
      .orderBy("event_type")
  }

  /** copy_partitioned — distcp-style re-delivery: read → write partitioned by
    * a column → read back. On a cluster this is the layout step that makes
    * later partition pruning free; here the read-back aggregate proves the
    * copy was lossless. */
  val copyPartitioned: Q = (s, d) => {
    val tmp = scratchDir(s, d, "copy")
    Tables.lineitem(s, d)
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(s"$tmp/li")
    s.read.parquet(s"$tmp/li")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), r4(sum("l_quantity")).as("sum_qty"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** source_orc — ORC ingest through the same delivery surface:
    * parquet → orc → read → aggregate (DuckDB has no ORC reader, so the
    * oracle aggregates the original parquet — the roundtrip must be
    * lossless to match, same upgrade as source_csv/source_json). */
  val sourceOrc: Q = (s, d) => {
    val tmp = scratchDir(s, d, "orc")
    Tables.part(s, d).write.mode("overwrite").orc(s"$tmp/part")
    s.read.orc(s"$tmp/part")
      .groupBy("p_type")
      .agg(count(lit(1)).as("n"), sumR4(col("p_retailprice")).as("sum_price"))
      .orderBy("p_type")
  }

  /** source_text — raw-text ingest, the native LLM-corpus delivery
    * format (one document per line). Roundtrip: documents →
    * TAB-delimited lines (`doc_id \t lang \t text`; the fixture text is
    * single-line and tab-free — the documented contract of any
    * line-oriented corpus format) → `spark.read.text` → limit-3 split →
    * per-lang aggregate. The oracle aggregates the ORIGINAL table, so
    * token and char sums prove the text hop lossless, the same upgrade
    * as source_csv/orc. Scale: the text source splits by line across
    * executors like every Hadoop FileSystem format. */
  val sourceText: Q = (s, d) => {
    val tmp = scratchDir(s, d, "text")
    Tables.documents(s, d)
      .select(concat_ws("\t", col("doc_id"), col("lang"), col("text")).as("value"))
      .write.mode("overwrite").text(s"$tmp/docs")
    s.read.text(s"$tmp/docs")
      .select(split(col("value"), "\t", 3).as("p"))
      .select(element_at(col("p"), 1).cast("long").as("doc_id"),
              element_at(col("p"), 2).as("lang"),
              element_at(col("p"), 3).as("text"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
           sum(size(split(col("text"), " "))).as("n_tok"),
           sum(length(col("text"))).as("sum_chars"),
           min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .orderBy("lang")
  }

  /** source_binary — media-lake ingest through Spark's `binaryFile`
    * source: one object per asset (the layout image/audio/video corpora
    * actually ship in), read back as (path, length, content) rows. The
    * delivery half writes each doc's payload as its own `<doc_id>.bin`
    * via foreachPartition (distributed, one writer per partition — on a
    * cluster the temp dir becomes a shared-FS/objstore URI, the code
    * shape is unchanged); the ingest half is the real product surface:
    * `format("binaryFile")` splits per FILE across executors, so a
    * billion-asset bucket scans in parallel with no driver listing
    * bottleneck beyond the InMemoryFileIndex. Mime derives from the
    * multimodal column model's doc_id%3 rule (Multimodal
    * .attachFakePayload), and the per-mime census must reproduce the
    * SOURCE table's octet counts exactly — the roundtrip-lossless
    * upgrade pattern of source_csv/orc/text. */
  val sourceBinary: Q = (s, d) => {
    // fixed per-(session, dataset) PARENT with a fresh CHILD dir per
    // call, previous children swept at ENTRY: a bare fresh temp dir per
    // call would strand one file-per-doc payload copy per invocation
    // (4 bench passes/round + Verify/tests — review r8), while reusing
    // ONE fixed dir (the r9 form) measured 2.6× slower end-to-end
    // (BinBisect: 1.32 vs 0.50 s) because ext4 directory htrees never
    // shrink — 5000 unlink+create cycles bloat the inode and every
    // subsequent create/listing walks it. The parent bounds the
    // footprint to one corpus copy; the child gives each pass a compact
    // directory. The returned frame reads the path LAZILY, so the sweep
    // must never run at the END of this function.
    val parent = new java.io.File(scratchDir(s, d, "bin"))
    parent.listFiles.foreach(rmRf)
    val dir = new java.io.File(parent, java.lang.Long.toHexString(System.nanoTime()))
    dir.mkdirs()
    val tmp = dir.toString
    // delivery over the InternalRow RDD: Dataset.foreachPartition would
    // insert a whole extra deserialize-to-Row stage (~0.4 s at sf0.1 —
    // BinBisect) just to read two fields the unsafe row already exposes
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .queryExecution.toRdd.foreachPartition { it =>
        it.foreach { r =>
          // null text is in-domain (the collapse path builds null-text
          // docs): deliver it as a zero-byte object instead of NPE-ing
          // the writer; the oracle mirrors with coalesce(strlen,0)
          val bytes = if (r.isNullAt(1)) Array.empty[Byte] else r.getBinary(1)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(tmp, s"${r.getLong(0)}.bin"), bytes)
        }
      }
    // pathGlobFilter, not a glob path: a glob that matches zero files
    // (empty corpus) errors at resolution, while filtering an existing
    // directory yields the well-typed empty frame (binaryFile's schema
    // is fixed, nothing to infer)
    s.read.format("binaryFile").option("pathGlobFilter", "*.bin").load(tmp)
      .select(
        regexp_extract(col("path"), "([0-9]+)\\.bin$", 1).cast("long").as("doc_id"),
        length(col("content")).cast("long").as("nbytes"))
      .withColumn("mime",
        element_at(lit(Array("image/png", "audio/wav", "video/mp4")),
          (col("doc_id") % 3 + 1).cast("int")))
      .groupBy("mime")
      .agg(count(lit(1)).as("n_assets"),
           sum("nbytes").as("total_bytes"),
           max("nbytes").as("max_bytes"),
           min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .orderBy("mime")
  }

  /** copy_compact — the small-files compaction every long-lived lake
    * needs: a directory of many tiny parquet files (here 64, written by
    * an over-parallel upstream — the classic streaming/ingest footprint)
    * re-delivered as ceil(rows / 20 000) right-sized files. At 100 TB the
    * small-files problem is what kills NameNode/objstore listing and
    * per-file open cost; compaction is the layout op that fixes it.
    *
    * Shape: the target file count derives from ONE bounded count (the
    * row-count proxy for the production bytes/128 MB rule), then ONE
    * round-robin repartition writes evenly-sized files — distributed,
    * no single-writer coalesce(1) funnel. The query PROVES the layout:
    * both file counts come from a post-write FS listing, not the plan,
    * and the read-back aggregate proves content-losslessness (oracle
    * aggregates the original table and pins the expected file counts). */
  val copyCompact: Q = (s, d) => {
    val tmp = scratchDir(s, d, "compact")
    val src = Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    src.repartition(64)
      .write.mode("overwrite").parquet(s"$tmp/small")
    // explicit schema on both read-backs: an EMPTY upstream slice writes
    // no (or one schema-only) data file, and schema inference over a
    // fileless directory throws — the zero-row day is in-domain for a
    // compaction job
    val back = s.read.schema(src.schema).parquet(s"$tmp/small")
    val rows = back.count()
    val nFiles = math.max(1L, (rows + 19999) / 20000).toInt
    back.repartition(nFiles).write.mode("overwrite").parquet(s"$tmp/compact")
    val compacted = s.read.schema(src.schema).parquet(s"$tmp/compact")
    def dataFiles(p: String): Long = {
      val fs = new org.apache.hadoop.fs.Path(p)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(p))
        .count(_.getPath.getName.endsWith(".parquet")).toLong
    }
    val (before, after) = (dataFiles(s"$tmp/small"), dataFiles(s"$tmp/compact"))
    compacted
      .agg(count(lit(1)).as("n_rows"), sumR4(col("o_totalprice")).as("sum_total"))
      .select(col("n_rows"), col("sum_total"),
        lit(before).as("files_small"), lit(after).as("files_compacted"))
  }

  /** sink_stream — the Structured Streaming file-sink delivery surface:
    * readStream over the events parquet → project + day column →
    * writeStream (parquet sink, day-partitioned, checkpointed) under
    * Trigger.AvailableNow → read the delivered lake back and aggregate.
    * This is the incremental ingest shape of a 100 TB/day pipeline (new
    * files land, the checkpoint processes exactly the delta into the
    * partitioned lake); AvailableNow drains the backlog and stops, so
    * the batch contract holds. The read-back goes through the sink's
    * _spark_metadata exactly-once manifest, and the oracle aggregates
    * the ORIGINAL table — the streamed delivery must be lossless AND
    * exactly-once to match.
    *
    * Each call runs the stream fresh (checkpoint + output swept at
    * entry): a persistent checkpoint would no-op every pass after the
    * first — the zero-delta refresh cost, not the delivery cost this
    * query prices. */
  val sinkStream: Q = (s, d) => {
    val tmp = scratchDir(s, d, "stream")
    new java.io.File(tmp).listFiles.foreach(rmRf)
    // file streams need an explicit schema (no inference pass) and a
    // DIRECTORY source (a bare file path fails basePath validation):
    // stream the dataset dir with a glob filter for the events table —
    // exactly the "watch this landing directory" production shape.
    // Footer schema is RAW; the loader's one NTZ normalization applies
    // on top.
    //
    // Layout note (r12, caught by the ×10 scale-oracle arm): the
    // pristine fixtures ship events.parquet as a single FILE, which the
    // pathGlobFilter-over-dataset-dir form streams fine — but a
    // Spark-WRITTEN table is a DIRECTORY of part files whose leaf names
    // never match the filter, so that form silently streamed ZERO rows
    // (spark=0 vs oracle=5 at ×10). A directory is itself a valid
    // stream source, so route on the layout; both forms are the same
    // landing-zone contract.
    val raw = s.read.parquet(s"$d/events.parquet").schema
    val evSrc = new java.io.File(d, "events.parquet")
    val reader = s.readStream.schema(raw)
    val stream = graft.Tables.castTimestampCols(
      if (evSrc.isDirectory) reader.parquet(evSrc.getPath)
      else reader.option("pathGlobFilter", "events.parquet").parquet(d),
      org.apache.spark.sql.types.TimestampNTZType, "timestamp")
    val q = stream
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        to_date(col("ts")).as("day"))
      .writeStream.format("parquet")
      .option("checkpointLocation", s"$tmp/ckpt")
      .partitionBy("day")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(s"$tmp/out")
    q.awaitTermination()
    // explicit schema: a zero-event slice commits a batch with no data
    // files, and inference over the metadata-log-listed empty set throws
    val outSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id LONG, user_id LONG, event_type STRING, value DOUBLE, day DATE")
    s.read.schema(outSchema).parquet(s"$tmp/out")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sumR4(col("value")).as("sum_value"),
        countDistinct(col("day")).as("n_days"))
      .orderBy("event_type")
  }

  val queries: Map[String, Q] = Map(
    "source_binary"    -> sourceBinary,
    "source_text"      -> sourceText,
    "scan_parquet"     -> scanParquet,
    "scan_pruned"      -> scanPruned,
    "sink_parquet"     -> sinkParquet,
    "source_csv"       -> sourceCsv,
    "source_json"      -> sourceJson,
    "source_orc"       -> sourceOrc,
    "copy_partitioned" -> copyPartitioned,
    "copy_compact"     -> copyCompact,
    "sink_stream"      -> sinkStream,
  )

  val oracle: Map[String, String] = Map(
    "source_binary" ->
      """SELECT ['image/png','audio/wav','video/mp4'][CAST(doc_id % 3 + 1 AS INT)] AS mime,
        | count(*) AS n_assets,
        | CAST(sum(coalesce(strlen(text), 0)) AS BIGINT) AS total_bytes,
        | CAST(max(coalesce(strlen(text), 0)) AS BIGINT) AS max_bytes,
        | min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM documents GROUP BY mime ORDER BY mime""".stripMargin,
    "source_text" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tok,
        | CAST(sum(length(text)) AS BIGINT) AS sum_chars,
        | min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "scan_parquet" ->
      "SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "scan_pruned" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "sink_parquet" ->
      """SELECT l_returnflag, count(*) AS n, CAST(sum(CAST(floor((l_extendedprice) * 10000 + 0.5) / 10000 AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "source_csv" ->
      """SELECT o_orderstatus, count(*) AS n, CAST(sum(CAST(floor((o_totalprice) * 10000 + 0.5) / 10000 AS DECIMAL(18,4))) AS DOUBLE) AS sum_total
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "source_json" ->
      """SELECT event_type, count(*) AS n, CAST(sum(CAST(floor((value) * 10000 + 0.5) / 10000 AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "copy_partitioned" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, floor((sum(l_quantity)) * 10000 + 0.5) / 10000 AS sum_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "source_orc" ->
      """SELECT p_type, count(*) AS n, CAST(sum(CAST(floor((p_retailprice) * 10000 + 0.5) / 10000 AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM part GROUP BY p_type ORDER BY p_type""".stripMargin,
    "copy_compact" ->
      """SELECT count(*) AS n_rows,
        | CAST(sum(CAST(floor((o_totalprice) * 10000 + 0.5) / 10000 AS DECIMAL(18,4))) AS DOUBLE) AS sum_total,
        | CAST(64 AS BIGINT) AS files_small,
        | CAST(greatest(1, ceil(count(*) / 20000.0)) AS BIGINT) AS files_compacted
        |FROM orders""".stripMargin,
    "sink_stream" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CAST(floor((value) * 10000 + 0.5) / 10000 AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
        | count(DISTINCT CAST(ts AS DATE)) AS n_days
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
