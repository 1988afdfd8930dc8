package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The materialized near-dup pair artifact (llm_pair_table as a
  * persisted table) — the cross-run sharing story for the jaccard
  * family: jaccard_pairs, dedup_cluster and dedup_incremental all
  * consume the same blocked/scored pair pipeline, and at 100 TB that
  * pipeline is computed ONCE per corpus version, persisted, and read
  * back by every downstream job instead of recomputed per query.
  *
  * Usage:
  * {{{
  *   PairTable.write(spark, sfDir, "/artifacts/pairs")     // once
  *   spark.conf.set("spark.graft.pairs.artifact", "/artifacts/pairs")
  *   // every jaccardPairsUnsorted consumer now short-circuits to a
  *   // parquet read + jac-threshold + predicate filter
  * }}}
  *
  * The artifact is floored at jac ≥ 0.6 (Llm.PairTableFloor*), strictly
  * below every consumer threshold (0.8 operator floor, 0.6 would need
  * its own table), so the re-applied threshold on read is lossless.
  * PropertySpec pins artifact-read ≡ recompute for both jaccard_pairs
  * and dedup_incremental.
  */
object PairTable {

  private val MarkerFile = "_graft_corpus"

  /** The builders below must COMPUTE, never read the artifact back —
    * with spark.graft.pairs.artifact set (the documented steady state),
    * an un-bypassed build would short-circuit to the stale table and
    * updateIncremental would "refresh" the artifact from itself. The
    * conf is consulted at plan-CONSTRUCTION time, so unsetting it just
    * around construction is sufficient and thread-visible state is
    * restored before returning. */
  private def bypassingArtifact[T](spark: SparkSession)(f: => T): T = {
    val key = "spark.graft.pairs.artifact"
    val prev = spark.conf.getOption(key)
    prev.foreach(_ => spark.conf.unset(key))
    try f finally prev.foreach(spark.conf.set(key, _))
  }

  /** Stamp the artifact with the corpus dir it was built from; the
    * read path refuses to serve any other dir (the conf is
    * session-global — without the stamp one artifact would silently
    * answer for every dataset the session touches). Underscore-prefixed
    * so parquet readers ignore it, like _SUCCESS. */
  private def writeCorpusMarker(spark: SparkSession, out: String, corpus: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(out, MarkerFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(p, true)
    try os.write(corpus.getBytes("UTF-8")) finally os.close()
  }

  /** The corpus dir an artifact was stamped with; fails loudly on an
    * unstamped directory (only PairTable-produced tables qualify). */
  def readCorpusMarker(spark: SparkSession, artifact: String): String = {
    val p = new org.apache.hadoop.fs.Path(artifact, MarkerFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"$artifact has no $MarkerFile stamp — not a PairTable-written artifact")
    val in = fs.open(p)
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  /** The artifact frame (unsorted; jac ≥ 0.6), always computed fresh. */
  def build(spark: SparkSession, sfDir: String): DataFrame =
    bypassingArtifact(spark) {
      graft.queries.Llm.jaccardPairsUnsorted(
        spark, sfDir, None,
        graft.queries.Llm.PairTableFloorNum, graft.queries.Llm.PairTableFloorDen)
    }

  /** Persist the artifact. Partitioned only by parquet row groups —
    * consumers filter on jac (min/max row-group pruning applies) and
    * join on doc ids; there is no low-cardinality partition key worth a
    * directory layout here. */
  def write(spark: SparkSession, sfDir: String, out: String): Unit = {
    build(spark, sfDir).write.mode("overwrite").parquet(out)
    writeCorpusMarker(spark, out, sfDir)
  }

  /** Incremental artifact refresh — the daily-batch shape: `prev` is
    * the pair table of yesterday's (immutable) corpus, `sfDir` now
    * contains old + new docs, and `isNewAttr`/`isNewPred` identify the
    * new batch (same CandPred contract as jaccardPairsUnsorted, e.g.
    * the md5-bucket rule or a doc_id watermark). Only pairs with AT
    * LEAST ONE new endpoint are computed — old-old pairs are exactly
    * `prev`, because Jaccard between two docs depends only on the two
    * docs, never on the rest of the corpus. The union is disjoint by
    * construction (every new pair has a new endpoint; no prev pair
    * does), so no dedup pass is needed.
    *
    * Exactness contract (PairTableSpec pins all three clauses at the
    * 0.8 operator threshold): (1) the touching-new half of the merged
    * artifact is EXACTLY what a full rebuild finds — the refresh is
    * exact for the question it answers; (2) the old-old half is frozen
    * to `prev`, untouched — an incremental refresh never revisits
    * yesterday's verdicts; (3) consequently a rebuild may differ from
    * the merge only in old-old pairs at the blocking margin (candidate
    * BLOCKING uses corpus-wide token df, so yesterday's 4-rarest-token
    * choices are not today's; measured 2 of 4822 old-old pairs on the
    * fixture's 80% subset). If bit-identical-to-rebuild matters more
    * than stability of shipped verdicts, run `write` instead — the
    * incremental path is for pipelines where re-judging yesterday's
    * corpus daily is exactly what you are avoiding. */
  def updateIncremental(spark: SparkSession, sfDir: String,
                        prev: String, out: String,
                        isNewAttr: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : Unit = {
    val touchingNew: graft.queries.Llm.CandPred = (isNewAttr,
      (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) => a || b)
    // bypassingArtifact: with the artifact conf pointing at `prev` (the
    // steady state this method exists for), an un-bypassed call would
    // filter YESTERDAY'S pairs by the new-endpoint rule — an empty
    // delta, a silently stale artifact
    val fresh = bypassingArtifact(spark) {
      graft.queries.Llm.jaccardPairsUnsorted(
        spark, sfDir, Some(touchingNew),
        graft.queries.Llm.PairTableFloorNum, graft.queries.Llm.PairTableFloorDen)
    }
    spark.read.parquet(prev).unionByName(fresh)
      .write.mode("overwrite").parquet(out)
    writeCorpusMarker(spark, out, sfDir)
  }
}
