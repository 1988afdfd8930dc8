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
    * layout; sort_array fixes collect_list's arrival order. */
  private def packed(sv: DataFrame, cb: DataFrame): DataFrame =
    Pq.assign(sv, cb)
      .groupBy("vec_id")
      .agg(expr("transform(sort_array(collect_list(struct(sub, code))), t -> t.code)")
        .as("codes"))

  private def writeBatch(spark: SparkSession, codes: DataFrame, out: String,
                         batch: Long): Unit =
    codes.withColumn("batch", lit(batch))
      .write.partitionBy("batch")
      .option("partitionOverwriteMode", "dynamic").mode("overwrite")
      .parquet(s"$out/codes.parquet")

  /** Index the embeddings table of a delivered corpus dir (batch 0):
    * train the codebook, encode, stamp. */
  def build(spark: SparkSession, corpusDir: String, out: String): Unit =
    buildFrom(spark, graft.Tables.embeddings(spark, corpusDir), corpusDir, out)

  def buildFrom(spark: SparkSession, vecs: DataFrame, stamp: String,
                out: String): Unit = {
    graft.functions.VectorExprs.register(spark)
    val (m, k, iters) = geometry(spark)
    val sv = graft.ops.Lineage.cut(Pq.subvectors(vecs, m))
    val cb = Pq.train(sv, k, iters)
    cb.coalesce(1).write.mode("overwrite").parquet(s"$out/codebook.parquet")
    writeBatch(spark, packed(sv, cb), out, 0L)
    writeSmall(spark, out, GeomFile, s"$m:$k:$iters")
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
    // queryTables integers the in-query join consumes
    val qtab = Pq.queryTables(qsv, cb)
      .groupBy("qid", "sub")
      .agg(expr("transform(sort_array(collect_list(struct(code, p9))), t -> t.p9)")
        .as("row"))
      .groupBy("qid")
      .agg(expr("transform(sort_array(collect_list(struct(sub, row))), t -> t.row)")
        .as("tab"))
    val sums = spark.read.parquet(s"$index/codes.parquet")
      // bounded broadcast product: one row per query vector — the
      // ≤B-row totals-table crossJoin class, never corpus × corpus
      .crossJoin(broadcast(qtab))
      .where(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("vid"),
        expr(s"aggregate(sequence(0, $m - 1), cast(0 as bigint), " +
          "(acc, i) -> acc + element_at(element_at(tab, i + 1), " +
          "element_at(codes, i + 1) + 1))").as("ad2_9"))
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
    val cb = spark.read.parquet(s"$index/codebook.parquet")
    val sv = Pq.subvectors(newVecs, m)
    writeBatch(spark, packed(sv, cb), index, batchId)
  }
}
