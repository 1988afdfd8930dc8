package graft.tools

import org.apache.spark.sql.SparkSession

/** Proves the production registration path: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` resolves graft_dot /
  * graft_agree from plain SQL with no runtime registration call.
  * Usage: runMain graft.tools.ExtensionsDemo */
object ExtensionsDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dot = spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    val agree = spark.sql("SELECT graft_agree(array(1, 2, 3), array(1, 9, 3)) AS a")
      .head().getInt(0)
    println(s"extensions-demo: graft_dot=$dot graft_agree=$agree")
    require(dot == 11.0 && agree == 2, "extension-registered expressions misbehaved")
    spark.stop()
  }
}
