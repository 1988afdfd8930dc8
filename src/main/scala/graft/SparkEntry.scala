package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` aggregate the per-family modules under
  * graft.queries; SURVEY.md §2 is the key inventory they must cover.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape (agg_hash) — scan, filter, two-phase hash aggregate. */
  def entry(spark: SparkSession): DataFrame =
    Aggs.aggHash(spark, "/root/testdata/sf0.001")

  private val modules: Seq[(Map[String, Q], Map[String, String])] = Seq(
    (Scans.queries, Scans.oracle),
    (Filters.queries, Filters.oracle),
    (Joins.queries, Joins.oracle),
    (Aggs.queries, Aggs.oracle),
    (Sorts.queries, Sorts.oracle),
    (Sets.queries, Sets.oracle),
    (Windows.queries, Windows.oracle),
    (Scalars.queries, Scalars.oracle),
    (Events.queries, Events.oracle),
    (Llm.queries, Llm.oracle),
    (Sketches.queries, Sketches.oracle),
    (Extras.queries, Extras.oracle),
    (Textops.queries, Textops.oracle),
    (Webops.queries, Webops.oracle),
    (Graphs.queries, Graphs.oracle),
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
