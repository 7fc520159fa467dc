package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions path must make custom functions SQL-visible in a fresh
  * session with no imperative registration. */
class ExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=graft.GraftExtensions installs vec_dot + py_*") {
    // force a NEW SparkSession: its per-session function registry is
    // fresh, so the assertions below can only pass via the extension
    // mechanism (imperative register() calls on other sessions don't
    // leak in). spark.sql.extensions is STATIC — getOrCreate reads it
    // from the SparkContext conf, not the builder — so the shared test
    // context (SparkTestSession) must carry it. Do NOT stop() after:
    // the context is shared.
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val dot = spark.sql(
        "SELECT vec_dot(array(CAST(1 AS BIGINT), 2, 3), array(CAST(4 AS BIGINT), 5, 6))")
        .head().getLong(0)
      assert(dot == 32)
      assert(spark.sql("SELECT py_title(\"parkinson's disease\")")
        .head().getString(0) == "Parkinson'S Disease")
      assert(spark.sql("SELECT py_capitalize('USA')").head().getString(0) == "Usa")
      assert(spark.sql("SELECT py_cap_words(' united  kingdom ')")
        .head().getString(0) == "United Kingdom")
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
