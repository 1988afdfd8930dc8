package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // Dump µs-int64 timestamps (not INT96) so the DuckDB-side compare
      // reads identical values (SURVEY.md §7.3 item 3).
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // Hold the whole suite's generated classes (static conf; default
      // 100 churns at 153 queries — rationale and measurement in
      // Bench.scala's twin setting).
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dump-boundary timestamp normalization: the r7 driver data carries
    // naive (isAdjustedToUTC=false) parquet timestamps, which DuckDB reads
    // as its naive TIMESTAMP, while the engine standardizes on session-TZ
    // TimestampType internally (Tables.normalizeNtz). Cast any timestamp
    // output back to TIMESTAMP_NTZ here so the dumped dtype matches the
    // oracle's; under the pinned UTC session the cast is the identity on
    // values. Engine internals and specs keep the one proven type.
    def naiveTs(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      Tables.castTimestampCols(df,
        org.apache.spark.sql.types.TimestampType, "timestamp_ntz")
    SparkEntry.queries.foreach { case (name, fn) =>
      try naiveTs(fn(spark, sfDir)).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // TESTDATA.md lists only the eight star-schema/events tables, so a
    // DuckDB harness may not register views for documents/embeddings.
    // Substitute direct parquet paths for those two (valid DuckDB FROM
    // targets, alias-compatible) so the oracle SQL is self-contained.
    def inline(sql: String): String = sql
      .replaceAll("\\bdocuments\\b", s"'$sfDir/documents.parquet'")
      .replaceAll("\\bembeddings\\b", s"'$sfDir/embeddings.parquet'")
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(inline(v))}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
