package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** GraftExtensions — the `spark.sql.extensions` deployment path: a session
  * built with the conf must expose graft_dot/graft_agree to pure-SQL
  * callers with no register() call on the user side. */
class ExtensionsSpec extends AnyFunSuite with Matchers {

  test("a session built with GraftExtensions exposes graft functions to SQL") {
    // the conf-string path (`--conf spark.sql.extensions=...`) is read from
    // the SparkContext's conf at context creation, which in-JVM already
    // exists without it (verified: a plain new session does NOT resolve
    // graft_dot) — so exercise the same injection through the public
    // builder.withExtensions hook over the shared context, and separately
    // prove the class loads the way spark-submit loads it (reflection,
    // no-arg constructor, SparkSessionExtensions => Unit)
    val base = SparkFixture.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = Class.forName("graft.functions.GraftExtensions")
        .getDeclaredConstructor().newInstance()
        .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
      val s = SparkSession.builder()
        .master("local[4]")
        .withExtensions(ext)
        .getOrCreate()
      try {
        s.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
          .head.getDouble(0) shouldBe 11.0
        s.sql("SELECT graft_agree(array(1, 2, 3), array(1, 9, 3)) AS c")
          .head.getInt(0) shouldBe 2
        s.sql("SELECT graft_icount(array(1L, 3L, 7L), array(2L, 3L, 7L, 9L)) AS c")
          .head.getInt(0) shouldBe 2
        // injected as a catalog function, not a temp function: visible in
        // DESCRIBE (ExpressionInfo carried through)
        val desc = s.sql("DESCRIBE FUNCTION graft_dot")
          .collect().map(_.getString(0)).mkString("\n")
        desc should include("graft_dot")
      } finally {
        // do NOT stop s — it shares the fixture's SparkContext
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
