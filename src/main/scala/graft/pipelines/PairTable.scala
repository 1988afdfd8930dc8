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
  * The artifact is floored at jac ≥ 0.5 (Llm.PairTableFloor*), strictly
  * below every consumer threshold (0.8 operator floor, 0.6 would need
  * its own table), so the re-applied threshold on read is lossless.
  * PropertySpec pins artifact-read ≡ recompute for both jaccard_pairs
  * and dedup_incremental.
  */
object PairTable {

  /** The artifact frame (unsorted; jac ≥ 0.5). */
  def build(spark: SparkSession, sfDir: String): DataFrame =
    graft.queries.Llm.jaccardPairsUnsorted(
      spark, sfDir, None,
      graft.queries.Llm.PairTableFloorNum, graft.queries.Llm.PairTableFloorDen)

  /** Persist the artifact. Partitioned only by parquet row groups —
    * consumers filter on jac (min/max row-group pruning applies) and
    * join on doc ids; there is no low-cardinality partition key worth a
    * directory layout here. */
  def write(spark: SparkSession, sfDir: String, out: String): Unit =
    build(spark, sfDir).write.mode("overwrite").parquet(out)
}
