package graft

import org.apache.spark.sql.SparkSession

/** Dev aid: dump executed plans of named queries (all if no args).
  * `sbt "Test/runMain graft.PlanDump ev_funnel join_salted"` — the
  * .explain iteration loop the build guide asks for, without spinning
  * up a REPL. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, d).queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
