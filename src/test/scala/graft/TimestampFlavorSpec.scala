package graft

import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Timestamp-generation adaptivity pin (VERDICT r7 #6): the driver has
  * regenerated /root/testdata twice with different parquet timestamp
  * flavors — TIMESTAMP(NANOS) naive first, then µs naive
  * (isAdjustedToUTC=false → Spark's TIMESTAMP_NTZ) — and each change
  * only surfaced in the driver's Verify run. These fixtures (committed
  * tiny parquets, one per flavor, regenerable via
  * scripts/gen_ts_fixtures.py) put every flavor the loader claims to
  * absorb — plus the plausible NEXT one (UTC-adjusted µs) — under
  * `sbt test`: a third regeneration that the one shared normalization
  * boundary (Tables.castTimestampCols / Tables.events) does NOT absorb
  * fails here first, not silently in a correctness artifact.
  *
  * All three fixtures encode the same three instants
  * (2024-03-01T00:00:00.123456Z + i hours); under the repo-pinned UTC
  * session every flavor must normalize to TimestampType with identical
  * values and µs precision intact.
  */
class TimestampFlavorSpec extends AnyFunSuite with Matchers with SparkFixture {

  private def flavorDir(flavor: String): String =
    // via toURI, not URL.getPath: getPath keeps %-escapes, so a checkout
    // under a directory with a space would break the fixture lookup
    java.nio.file.Paths.get(
      getClass.getResource(s"/tsflavors/$flavor/events.parquet").toURI)
      .getParent.toString

  private val expected = (0 until 3).map(i =>
    java.sql.Timestamp.from(java.time.Instant.parse("2024-03-01T00:00:00.123456Z")
      .plusSeconds(i * 3600L)))

  for (flavor <- Seq("ns", "us_naive", "us_utc")) {
    test(s"Tables.events normalizes the $flavor parquet flavor to session-TZ µs timestamps") {
      val df = Tables.events(spark, flavorDir(flavor))
      df.schema("ts").dataType shouldBe TimestampType
      // full events schema shape survives the flavor-specific read path
      df.columns.toSeq shouldBe Seq("event_id", "ts", "user_id", "event_type", "value", "props")
      val got = df.orderBy("event_id").collect().map(_.getTimestamp(1)).toSeq
      got shouldBe expected
    }
  }

  test("Tables.table normalizes naive-µs (NTZ) timestamps for non-events tables too") {
    // the r7 regeneration changed EVERY table's timestamp flavor at once
    // (orders.o_orderdate included); table() is the shared boundary
    val df = Tables.table(spark, flavorDir("us_naive"), "events")
    df.schema("ts").dataType shouldBe TimestampType
    df.orderBy("event_id").collect().map(_.getTimestamp(1)).toSeq shouldBe expected
  }
}
