package graft.ops

import org.apache.spark.sql.DataFrame

/** Eager lineage cut for subtrees referenced more than once downstream
  * (Spark re-executes a subtree per reference — signatures, token sets,
  * funnel stages, label-propagation rounds all hit this).
  *
  * `spark.graft.checkpoint` selects durability: `local` (default) uses
  * localCheckpoint — fast, but blocks live with executors, so a lost
  * executor kills the job; `reliable` uses checkpoint() to
  * `sparkContext.setCheckpointDir` (HDFS/S3 on a cluster) and survives
  * executor loss — the right setting for any long 100 TB run. Either
  * way the cut is eager: exactly one materialization, deterministic.
  */
object Lineage {
  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.get("spark.graft.checkpoint", "local") == "reliable")
      df.checkpoint(true)
    else df.localCheckpoint(true)
}
