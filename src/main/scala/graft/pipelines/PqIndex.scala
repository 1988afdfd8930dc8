package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Sketches.Pq

/** The ANN delivery artifact — the vector sibling of DigestIndex (exact
  * dedup) and SignatureIndex (near-dup): a delivered corpus's PQ state
  * reduced to the trained codebook (≤M·K rows) and the PACKED code
  * table — one row per vector, an M-element int array, the actual
  * M-bytes-per-vector layout a production PQ index ships; 64-d float32
  * compresses 16× even with int32 code cells, 32× in the byte-packed
  * parquet encoding. Search then costs O(corpus codes + queries):
  * per-query ADC tables come from the STORED codebook (bounded by
  * construction → broadcast), the code table streams ONCE computing
  * each candidate's approximate d² as M exact-integer array lookups
  * inside the row — no per-(sub, code) join, no exchange before the
  * bounded TopKAgg — and the corpus's float vectors are never reopened.
  *
  * Round 10 adds the IVF composition (VERDICT r9 #6): every code row is
  * stamped with its coarse-quantizer cell (the SHARED Ann.cellExpr sign
  * buckets) and the code table is PARTITIONED by (batch, cell), so
  * `spark.graft.pq.search=ivf` scans only the ≤nprobe cells each query
  * probes — file-level partition pruning, the IVFADC posture — while
  * the default `flat` mode keeps the exhaustive exact-ADC scan and all
  * parity pins. Cell bits freeze into the `_graft_ivf` stamp at build;
  * extend() re-reads them so one index never mixes cell geometries.
  *
  * Production posture on refresh: the codebook is trained ONCE at
  * build and new batches are ENCODED against it, never retrained —
  * retraining would silently re-key every stored code (a code is only
  * meaningful under its codebook), which is why extend() re-reads the
  * stored codebook and why the geometry/stamp guards fail loud. If the
  * vector distribution drifts, rebuild and re-encode — an explicit
  * decision, not an incremental surprise (PqSpec's ADC-error gate is
  * the drift monitor).
  *
  * Lifecycle mirrors DigestIndex/SignatureIndex: build (batch 0) /
  * search (read-only) / extend (a NEW batch partition via dynamic
  * partition overwrite — retry-safe). Stamps: `_graft_corpus`
  * provenance, `_graft_geom` pins M:K:iters so codes from one geometry
  * can never be looked up under another codebook's tables.
  *
  * Parity (PqIndexSpec): search over an index built from the fixture ≡
  * the in-query llm_ann_pq output row-for-row — both run the SHARED
  * Pq.train/assign/queryTables/topkOfSums construction on the same
  * exact scaled integers, so the artifact hop (pack → parquet → lookup)
  * must be lossless to pass. */
object PqIndex {
  private val MarkerFile = "_graft_corpus"
  private val GeomFile = "_graft_geom"
  // IVF coarse-quantizer width (sign bits) frozen at build time — a
  // SEPARATE stamp from _graft_geom so pre-IVF indexes (and the
  // hand-written truth indexes PqIndexSpec builds) stay readable by
  // flat search; ivf search REQUIRES it and fails loud without it.
  private val IvfFile = "_graft_ivf"

  private def fsFor(spark: SparkSession, path: org.apache.hadoop.fs.Path) =
    path.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeSmall(spark: SparkSession, dir: String, name: String,
                         content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, name)
    val os = fsFor(spark, p).create(p, true)
    try os.write(content.getBytes("UTF-8")) finally os.close()
  }

  private def readSmall(spark: SparkSession, dir: String, name: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir, name)
    require(fsFor(spark, p).exists(p),
      s"$dir has no $name — not a PqIndex-written artifact")
    val in = fsFor(spark, p).open(p)
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  // geometry defaults come from the ONE shared definition (Pq.geometry)
  // so the index and the in-query form can never train different
  // codebooks under identical confs — the parity pin's precondition
  private def geometry(spark: SparkSession): (Int, Int, Int) =
    Pq.geometry(spark)

  private def storedGeometry(spark: SparkSession, index: String): (Int, Int, Int) = {
    val Array(m, k, it) = readSmall(spark, index, GeomFile).trim.split(":").map(_.toInt)
    (m, k, it)
  }

  /** (vec_id, codes: array<int>) — assignment packed to the M-cell
    * layout (Pq.packCodes — the ONE packing every ADC consumer shares). */
  private def packed(sv: DataFrame, cb: DataFrame): DataFrame =
    Pq.packCodes(Pq.assign(sv, cb))

  /** (vec_id, cell) under the SHARED sign-bucket coarse quantizer
    * (queries.Ann.cellExpr) — the same cell id the ann_ivf query family
    * computes, so the IVF composition inherits AnnRecallSpec's measured
    * survival geometry. */
  private def cells(vecs: DataFrame, bits: Int): DataFrame =
    vecs.select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .select(col("vec_id"), graft.queries.Ann.cellExpr(bits).as("cell"))

  /** Codes land partitioned by (batch, cell): ivf search prunes to the
    * probe cells at the FILE level — the "probe ≤ nprobe cells" scan a
    * production IVF index does — while flat search and dynamic-overwrite
    * retry semantics are unchanged (a retried batch overwrites exactly
    * its own (batch, cell=*) leaves; cell assignment is deterministic).
    * The repartition bounds write amplification to one file per cell
    * instead of tasks × cells smalls — at scale, cells per batch track
    * 2^bits, which grows with the corpus (Ann.annBits scaladoc). */
  private def writeBatch(spark: SparkSession, codes: DataFrame, out: String,
                         batch: Long): Unit = {
    // dynamic overwrite only replaces (batch, cell) leaves PRESENT in
    // the new data: a re-run of the same batch with changed content
    // (fewer vectors, or embeddings whose cells moved) would leave the
    // old rows in cells the retry doesn't touch — ghost candidates in
    // every later search (review r10). Drop the whole batch=<id>
    // subtree first, restoring "a retried batch replaces exactly its
    // own batch" under the (batch, cell) layout; other batches stay
    // untouched either way.
    val batchDir = new org.apache.hadoop.fs.Path(s"$out/codes.parquet/batch=$batch")
    val fs = batchDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(batchDir)) { fs.delete(batchDir, true); () }
    codes.withColumn("batch", lit(batch))
      .repartition(col("cell"))
      .write.partitionBy("batch", "cell")
      .option("partitionOverwriteMode", "dynamic").mode("overwrite")
      .parquet(s"$out/codes.parquet")
  }

  /** Index the embeddings table of a delivered corpus dir (batch 0):
    * train the codebook, encode, stamp. */
  def build(spark: SparkSession, corpusDir: String, out: String): Unit =
    buildFrom(spark, graft.Tables.embeddings(spark, corpusDir), corpusDir, out)

  def buildFrom(spark: SparkSession, vecs: DataFrame, stamp: String,
                out: String): Unit = {
    graft.functions.VectorExprs.register(spark)
    val (m, k, iters) = geometry(spark)
    val bits = graft.queries.Ann.annBits(spark)
    val sv = graft.ops.Lineage.cut(Pq.subvectors(vecs, m))
    val cb = Pq.train(sv, k, iters, m)
    cb.coalesce(1).write.mode("overwrite").parquet(s"$out/codebook.parquet")
    // cell join: both sides hash-partition on vec_id (packed's groupBy
    // already did) — one extra (id, int) shuffle at build time buys
    // file-level probe pruning on every search thereafter
    writeBatch(spark, packed(sv, cb).join(cells(vecs, bits), Seq("vec_id")),
      out, 0L)
    writeSmall(spark, out, GeomFile, s"$m:$k:$iters")
    writeSmall(spark, out, IvfFile, bits.toString)
    writeSmall(spark, out, MarkerFile, stamp)
  }

  /** ADC top-k of query vectors (vec_id, embedding) against every code
    * in the index: (qid, vid, ad2, rn). The stored codebook builds the
    * per-query nested lookup tables (≤ queries·M·K cells by
    * construction → broadcast); the code table streams once, each row
    * paying M integer lookups — identical exact integers to the
    * in-query form, so results are comparable row-for-row. Self-pairs
    * (qid == vid) are excluded, matching llm_ann_pq. */
  def search(spark: SparkSession, queryVecs: DataFrame, index: String,
             k: Int = 3): DataFrame = {
    graft.functions.VectorExprs.register(spark)
    val (m, _, _) = storedGeometry(spark, index)
    val cb = spark.read.parquet(s"$index/codebook.parquet")
    // Positional ADC lookup (element_at by code) is only correct over a
    // DENSE 0..K'-1 code set per subspace. Pq.train guarantees density
    // by seed-rank remap (ADVICE r9), but an index is a durable artifact
    // — assert the invariant on the stored codebook rather than trust
    // its writer. Bounded: the check aggregates the ≤M·K-row codebook.
    val sparse = cb.groupBy("sub")
      .agg(max("code").as("mx"), countDistinct("code").as("nc"))
      .where(col("mx") =!= col("nc") - 1).count()
    require(sparse == 0,
      s"$index codebook has non-dense codes in $sparse subspace(s) — " +
      "positional ADC lookup would be silently wrong; rebuild the index")
    val qsv = Pq.subvectors(queryVecs, m)
    // nested per-query table: tab[sub][code] = p9, built from the same
    // queryTables integers the in-query form consumes (Pq.packQueryTables)
    val qtab = Pq.packQueryTables(Pq.queryTables(qsv, cb))
    // the ADC sum both modes share: M exact-integer lookups per
    // (query, candidate) row, no join on (sub, code) (Pq.adcExpr)
    val adc = Pq.adcExpr
    val mode = spark.conf.get("spark.graft.pq.search", "flat")
    val sums = mode match {
      case "flat" =>
        spark.read.parquet(s"$index/codes.parquet")
          // bounded broadcast product: one row per query vector — the
          // ≤B-row totals-table crossJoin class, never corpus × corpus
          .crossJoin(broadcast(qtab))
          .where(col("qid") =!= col("vec_id"))
          .select(col("qid"), col("vec_id").as("vid"), adc)
      case "ivf" =>
        // IVF+PQ: candidates come from the ≤nprobe coarse cells each
        // query probes (cells stamped at build/extend under the SHARED
        // Ann.cellExpr), so search scans probe-cell files only instead
        // of every code — the production coarse-quantizer + PQ-residual
        // composition (Jégou et al. IVFADC), minus the residual re-train
        // (codes stay codebook-absolute, so flat and ivf ADC integers
        // are IDENTICAL for every surviving candidate; only the
        // candidate set shrinks — PqIndexSpec pins subset semantics).
        val bits = readSmall(spark, index, IvfFile).trim.toInt
        val masks = graft.queries.Ann.probeMasks(
          bits, graft.queries.Ann.probeRadius(spark))
        val qcells = queryVecs
          .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
          .select(col("vec_id").as("qid"),
            graft.queries.Ann.cellExpr(bits).as("cell"))
        // distinct XOR masks ⇒ each (query, candidate-cell) pair matches
        // at most one probe row — the probe join stays an EQUI-join with
        // no dedup (Ann.withProbes contract)
        val qprobes = qcells.select(col("qid"), explode(array(
          masks.map(mk => col("cell").bitwiseXOR(lit(mk))): _*)).as("cell"))
        // driver-side probe-cell union for PARTITION pruning — bounded
        // ≤ 2^bits ≤ 65 536 ints (≤ 256 KB) by the annBits cap
        // (bounded-collect class)
        val probeSet = qprobes.select("cell").distinct().collect()
          .map(_.getInt(0)).toSeq
        spark.read.parquet(s"$index/codes.parquet")
          .where(col("cell").isin(probeSet: _*)) // file-level prune
          .join(broadcast(qprobes), Seq("cell")) // per-query cell match
          .join(broadcast(qtab), Seq("qid"))     // ADC table, not duplicated per probe
          .where(col("qid") =!= col("vec_id"))
          .select(col("qid"), col("vec_id").as("vid"), adc)
      case other => throw new IllegalArgumentException(
        s"spark.graft.pq.search must be flat|ivf, got '$other'")
    }
    Pq.topkOfSums(sums, k)
  }

  /** Roll the index forward: encode a new batch against the STORED
    * codebook (never retrain — see scaladoc) into its own partition via
    * dynamic partition overwrite; a retry overwrites exactly itself. */
  def extend(spark: SparkSession, newVecs: DataFrame, index: String,
             batchId: Long): Unit = {
    graft.functions.VectorExprs.register(spark)
    require(batchId > 0, s"batchId must be > 0 (0 is the build batch), got $batchId")
    val (m, _, _) = storedGeometry(spark, index)
    // cell bits come from the STAMP, never the live conf — a batch
    // stamped under different bits would land in cells the probe
    // geometry of the rest of the index can't reach
    val bits = readSmall(spark, index, IvfFile).trim.toInt
    val cb = spark.read.parquet(s"$index/codebook.parquet")
    val sv = Pq.subvectors(newVecs, m)
    writeBatch(spark, packed(sv, cb).join(cells(newVecs, bits), Seq("vec_id")),
      index, batchId)
  }
}
