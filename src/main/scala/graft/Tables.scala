package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md:13-15,
  * FIXTURES.md §1). One method per table so query bodies read as catalogs.
  *
  * Scale note: `spark.read.parquet` goes through the Hadoop FileSystem
  * API, so the same code serves `file:/`, `hdfs://` and `s3a://` paths
  * unchanged — this is the Spark-native realization of Hadoop data
  * delivery (SURVEY.md §1.3). At 100 TB the vectorized Parquet reader +
  * partition-level splits parallelize the scan; nothing here pins data
  * to a single node.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS) (FIXTURES.md) which Spark 4 has
    * no type for: read it as raw ns-since-epoch via nanosAsLong, then
    * normalize to a µs timestamp — the same truncation DuckDB applies when
    * it reads the file, so both engines see identical values. Integer
    * `div` keeps the full 63-bit range (a double division would lose
    * precision above 2^53 ns ≈ 104 days). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
