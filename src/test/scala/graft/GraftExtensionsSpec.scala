package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite with SparkSpec {

  test("a session built with GraftExtensions resolves graft functions") {
    // force the shared session into existence first so the new session
    // reuses its SparkContext rather than starting a second one. NOTE:
    // `spark.sql.extensions` as a conf string is only read when the
    // SparkContext itself is created, so this spec exercises the same
    // injection through the public `.withExtensions` builder hook — the
    // conf-string path calls the identical applyExtensions machinery.
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      assert(s2 ne base) // a genuinely new session (fresh function registry)
      // no register() call anywhere on this path — resolution comes from
      // the injected extension
      val hash = s2.sql("SELECT graft_md5_60('abc') AS h").head().getLong(0)
      val viaRegister = {
        graft.functions.VectorExpressions.register(base)
        base.sql("SELECT graft_md5_60('abc') AS h").head().getLong(0)
      }
      assert(hash == viaRegister)
      val dot = s2.sql(
        "SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
          "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
        .head().getDouble(0)
      assert(dot == 11.0)
      // hyperplane family rides the same injection list
      assert(s2.sql("SELECT graft_hyperplane_bucket(" +
        "array(CAST(1.0 AS FLOAT)), 4, 1) AS b").head().getLong(0) >= 0)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
