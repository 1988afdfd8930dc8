package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** A named query body: (session, scale-factor dir) => result.
    * Matches the driver contract in SparkEntry.scala:8-9. */
  type Q = (SparkSession, String) => DataFrame

  /** Spread the STREAMED side of a quadratic (cross-join / broadcast-
    * nested-loop) scorer across the session's cores. The N² stage is
    * pipelined off a broadcast — no exchange of its own — so its
    * parallelism is whatever the probe frame's scan happened to have; a
    * single-row-group source (every bench fixture, and any small dimension
    * snapshot in production) makes the whole quadratic stage ONE task
    * (measured round 13: the dense top-k family ran 2.6-3.7 task-seconds
    * serially on a 32-core box at 0.03 CPU utilization). One narrow
    * hash exchange of the probe rows — O(N), trivially dominated by the
    * O(N²) stage it parallelizes — buys cores-wide execution. Width =
    * defaultParallelism (scales with the session's cores, never a local
    * constant); explicit numPartitions so AQE's byte-based coalescing
    * (blind to per-row compute) cannot fold the tiny-bytes exchange back
    * to one partition. Keyed by the caller's unique id (deterministic
    * hash distribution — never round-robin, which draws fresh assignments
    * on task retry). Results are row-identical: every consumer aggregates
    * with merge-order-free aggregates or re-sorts. */
  def spreadProbe(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, key)
}
