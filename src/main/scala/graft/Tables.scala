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
  /** Cast every top-level column of type `from` to `to` — the ONE
    * timestamp-flavor normalization helper behind the loader (NTZ →
    * session-TZ), the Verify dump boundary (session-TZ → NTZ) and the
    * delivery fingerprint's one-typing-rule hash (NTZ → session-TZ).
    * A single definition so the three boundaries cannot drift apart
    * (e.g. a future nested-struct extension lands everywhere at once).
    * Pure projection — no shuffle, and column pruning still reaches the
    * scan through it; under the repo-pinned UTC session both directions
    * are value-preserving. */
  private[graft] def castTimestampCols(df: DataFrame,
      from: org.apache.spark.sql.types.DataType, to: String): DataFrame =
    df.schema.fields.collect {
      case f if f.dataType == from => f.name
    }.foldLeft(df)((d, c) =>
      d.withColumn(c, d.col(s"`${c.replace("`", "``")}`").cast(to)))

  /** The r7 driver data writes every timestamp as parquet µs with
    * isAdjustedToUTC=false, which Spark 4 infers as TIMESTAMP_NTZ (the
    * pre-r7 generation carried UTC-adjusted ms → TimestampType). DuckDB
    * reads both as its naive TIMESTAMP, so the oracle sees identical
    * values either way; on the Spark side we cast NTZ → TimestampType at
    * the loader so every downstream operator keeps the one shape it was
    * built and oracle-verified against. */
  private def normalizeNtz(df: DataFrame): DataFrame =
    castTimestampCols(df, org.apache.spark.sql.types.TimestampNTZType, "timestamp")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    normalizeNtz(spark.read.parquet(s"$sfDir/$name.parquet"))

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts has shipped in two parquet generations, so the loader is
    * schema-adaptive. Pre-r7 data declares TIMESTAMP(NANOS), which Spark 4
    * has no type for: read raw ns-since-epoch via nanosAsLong and truncate
    * to µs — the same truncation DuckDB applies on read, so both engines
    * see identical values (integer `div` keeps the full 63-bit range; a
    * double division would lose precision above 2^53 ns ≈ 104 days). The
    * r7 timestamp[us] generation needs nothing extra — `table()` already
    * normalized its NTZ read to the session-TZ TimestampType. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
