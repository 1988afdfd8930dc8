package graft.delivery

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality validation for delivered datasets: each rule is a
  * predicate counted over the data, plus referential checks via anti
  * joins. Everything is an aggregation — one pass per ruleset, no
  * collect — so a 100 TB validation is a handful of scans with map-side
  * partial counts (and the FK checks are standard shuffled anti joins).
  */
object Validate {

  /** Count rows violating each (name, violation-predicate) rule. */
  def counts(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val aggs = rules.map { case (name, pred) =>
      sum(when(pred, 1L).otherwise(0L)).as(name)
    }
    df.agg(aggs.head, aggs.tail: _*)
      .unpivot(Array.empty[Column], rules.map(r => col(r._1)).toArray, "rule", "n_viol")
  }

  /** Orphan count: child rows whose key has no match in parent. */
  def fkOrphans(child: DataFrame, key: String, parent: DataFrame, pkey: String): Long =
    child.join(parent, child(key) === parent(pkey), "left_anti").count()

  /** Orphan count as a 1-row DataFrame, for unioning into a report. */
  def fkOrphanRow(rule: String, child: DataFrame, key: String,
                  parent: DataFrame, pkey: String): DataFrame = {
    val spark = child.sparkSession
    import spark.implicits._
    child.join(parent, child(key) === parent(pkey), "left_anti")
      .agg(count(lit(1)).as("n_viol"))
      .select(lit(rule).as("rule"), $"n_viol")
  }
}
