package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The exact-dedup DELIVERY ARTIFACT behind llm_dedup_bloom's 100 TB
  * posture: a corpus's dedup state reduced to (a) the distinct sha256
  * digest table and (b) one Bloom bitmap over the xxhash64 text keys —
  * so a daily refresh verdicts its batch WITHOUT touching the old
  * corpus at all: the bloom routes (miss = definitely new, join-free),
  * the digest table resolves the might-contain sliver exactly. The
  * query form (queries/Extras.llmDedupBloom) rebuilds both per run for
  * oracle hermeticity; this pipeline is what a production refresh
  * actually loads, and BloomDedupSpec/DigestIndexSpec pin the two
  * forms verdict-identical.
  *
  * Lifecycle:
  *   build  — index a delivered corpus (digests parquet + bloom bytes
  *            + stamps), one scan, never repeated;
  *   refresh — verdict an arbitrary new-batch frame against the index:
  *            cost is O(batch) + a digest-table join of the sliver,
  *            independent of corpus text size;
  *   extend — roll the index forward with the batch (digest union +
  *            bitmap OR — both lossless, the BloomMergeAgg property),
  *            out-of-place so a failed write never destroys the index.
  *
  * Stamp discipline mirrors pipelines.PairTable: `_graft_corpus` marks
  * provenance and the read path refuses unstamped directories;
  * `_graft_bloom_geom` pins the filter geometry so extend can only OR
  * like with like (mergeInPlace's own contract, surfaced early).
  * Underscore-prefixed files are invisible to parquet readers.
  *
  * Null text stays in-domain: its digest is null (dropped from the
  * digest table — null never equi-joins), its xxhash64 key is the
  * seed (Spark hash functions are null-tolerant), so null-text batch
  * rows route like any row and always verdict dup_exact = 0 — the
  * same null semantics as the query form and its oracle. */
object DigestIndex {
  private val MarkerFile = "_graft_corpus"
  private val GeomFile = "_graft_bloom_geom"
  private val BloomFile = "_graft_bloom"

  private def fsFor(spark: SparkSession, path: org.apache.hadoop.fs.Path) =
    path.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeBytes(spark: SparkSession, dir: String, name: String,
                         content: Array[Byte]): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, name)
    val os = fsFor(spark, p).create(p, true)
    try os.write(content) finally os.close()
  }

  private def readBytes(spark: SparkSession, dir: String, name: String): Array[Byte] = {
    val p = new org.apache.hadoop.fs.Path(dir, name)
    require(fsFor(spark, p).exists(p),
      s"$dir has no $name — not a DigestIndex-written artifact")
    val in = fsFor(spark, p).open(p)
    try in.readAllBytes() finally in.close()
  }

  /** Index the documents table of a delivered corpus dir. */
  def build(spark: SparkSession, corpusDir: String, out: String): Unit =
    buildFrom(spark, graft.Tables.documents(spark, corpusDir), corpusDir, out)

  /** Index an arbitrary docs frame (must carry `text`); `stamp` records
    * provenance. Geometry: spark.graft.dedup.bloomItems/.bloomFpp, with
    * items raised to the measured digest count when that is larger —
    * over-population only degrades FPR, but an index is built once and
    * sized right. */
  def buildFrom(spark: SparkSession, docs: DataFrame, stamp: String, out: String): Unit = {
    docs.select(sha2(col("text").cast("binary"), 256).as("h"))
      .where(col("h").isNotNull).distinct()
      .write.mode("overwrite").parquet(s"$out/digests.parquet")
    val n = spark.read.parquet(s"$out/digests.parquet").count()
    val fpp = spark.conf.get("spark.graft.dedup.bloomFpp", "0.01").toDouble
    val items = math.max(
      spark.conf.get("spark.graft.dedup.bloomItems", "100000").toLong, n)
    val bloomBuild = udaf(new graft.functions.BloomBuildAgg(items, fpp))
    val sketch = docs.select(xxhash64(col("text")).as("k")).where(col("k").isNotNull)
      .agg(bloomBuild(col("k")).as("sk")).head().getAs[Array[Byte]](0)
    writeBytes(spark, out, BloomFile, sketch)
    writeBytes(spark, out, GeomFile, s"$items:$fpp".getBytes("UTF-8"))
    writeBytes(spark, out, MarkerFile, stamp.getBytes("UTF-8"))
  }

  /** Verdict a new-batch frame (doc_id, text, …) against the index:
    * (doc_id, dup_exact, keep), doc_id-ordered — the same frame
    * llm_dedup_bloom computes, with the old corpus never read.
    *
    * The candidate resolution picks its join shape by the measured
    * sliver size (a physical choice only — the verdict is identical,
    * DigestIndexSpec pins both): at the normal refresh posture the
    * might-contain sliver is tiny (dup share + fpp of the batch), so
    * its distinct digests BROADCAST against a streamed single-column
    * digest scan — the index-side shuffle, the only O(index) cost in
    * the SMJ form, disappears entirely. Past
    * spark.graft.dedup.broadcastCandidates (default 1M — ~32 MB of
    * digest keys) the sliver stops being broadcast-sized and the plain
    * shuffle join takes over; at 100 TB the escalation beyond THAT is
    * delivering the digest table bucketed on h (the join_bucketed
    * lever), which this artifact's layout leaves open. */
  def refresh(spark: SparkSession, newDocs: DataFrame, index: String): DataFrame = {
    graft.functions.VectorExprs.register(spark)
    val sketch = readBytes(spark, index, BloomFile) // fails loudly unstamped
    val digests = spark.read.parquet(s"$index/digests.parquet")
      .withColumn("dup", lit(1L))
    val probed = graft.ops.Lineage.cut(
      newDocs.select(col("doc_id"), sha2(col("text").cast("binary"), 256).as("h"),
        coalesce(
          call_function("graft_bloom_probe", lit(sketch), xxhash64(col("text"))),
          lit(false)).as("might")))
    val fast = probed.where(!col("might"))
      .select(col("doc_id"), lit(0L).as("dup_exact"))
    val cand = probed.where(col("might"))
    val maxBcast = spark.conf
      .get("spark.graft.dedup.broadcastCandidates", "1000000").toLong
    val nCand = cand.count() // cheap: probed is already materialized
    val checked =
      if (nCand <= maxBcast) {
        // hits = the candidate digests that exist in the index: inner
        // join with the CANDIDATES broadcast, so the digest scan
        // streams map-side — no index-side exchange at all
        val hits = digests.join(
          broadcast(cand.select("h").distinct()), Seq("h"))
          .select(col("h"), col("dup"))
        cand.join(broadcast(hits), Seq("h"), "left")
          .select(col("doc_id"), coalesce(col("dup"), lit(0L)).as("dup_exact"))
      } else cand.join(digests, Seq("h"), "left")
        .select(col("doc_id"), coalesce(col("dup"), lit(0L)).as("dup_exact"))
    fast.unionByName(checked)
      .withColumn("keep", (col("dup_exact") === 0).cast("long"))
      .orderBy("doc_id")
  }

  /** Roll the index forward with a batch: digest union + bitmap OR,
    * both lossless, written OUT-OF-PLACE (a failed extend leaves the
    * source index intact — the fail-before-destroy delivery rule). The
    * geometry is inherited from the source index so the OR is always
    * like-with-like; the corpus stamp is carried forward with the
    * batch appended. */
  def extend(spark: SparkSession, newDocs: DataFrame, index: String,
             out: String): Unit = {
    // qualified-path comparison (ADVICE r9): raw Path.toString lets
    // equivalent spellings (file:/x vs /x, relative vs absolute) pass,
    // and the lazy digests read would then race mode("overwrite") on
    // the SAME directory — Spark deletes the source before reading,
    // destroying the very index the fail-before-destroy rule protects
    val idxP = new org.apache.hadoop.fs.Path(index)
    val fs = fsFor(spark, idxP)
    require(fs.makeQualified(new org.apache.hadoop.fs.Path(out)) !=
      fs.makeQualified(idxP),
      s"extend writes out-of-place; got out == index ($index)")
    val geom = new String(readBytes(spark, index, GeomFile), "UTF-8").split(":")
    val (items, fpp) = (geom(0).toLong, geom(1).toDouble)
    val oldSketch = readBytes(spark, index, BloomFile)
    val bloomBuild = udaf(new graft.functions.BloomBuildAgg(items, fpp))
    val newSketch = newDocs.select(xxhash64(col("text")).as("k")).where(col("k").isNotNull)
      .agg(bloomBuild(col("k")).as("sk")).head().getAs[Array[Byte]](0)
    val merged = {
      val a = org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(oldSketch))
      a.mergeInPlace(org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(newSketch)))
      val os = new java.io.ByteArrayOutputStream()
      a.writeTo(os)
      os.toByteArray
    }
    spark.read.parquet(s"$index/digests.parquet")
      .unionByName(newDocs
        .select(sha2(col("text").cast("binary"), 256).as("h"))
        .where(col("h").isNotNull))
      .distinct()
      .write.mode("overwrite").parquet(s"$out/digests.parquet")
    writeBytes(spark, out, BloomFile, merged)
    writeBytes(spark, out, GeomFile, s"$items:$fpp".getBytes("UTF-8"))
    val marker = new String(readBytes(spark, index, MarkerFile), "UTF-8")
    writeBytes(spark, out, MarkerFile, s"$marker+batch".getBytes("UTF-8"))
  }
}
