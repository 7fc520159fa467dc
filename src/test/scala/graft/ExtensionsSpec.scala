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
      // rule tier: the injected optimizer rule collapses the idempotent
      // double application to ONE NfcNormalize in the optimized plan.
      // The input must be a COLUMN \u2014 over a literal, ConstantFolding
      // would evaluate the whole chain away and prove nothing.
      // ...and ConvertToLocalRelation would eagerly evaluate a projection
      // over the local relation, leaving zero nodes to count \u2014 exclude it
      // so the attribute-input projection survives into the optimized plan
      import spark.implicits._
      spark.conf.set("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
      try {
        Seq("cafe\u0301").toDF("s").createOrReplaceTempView("nfc_t")
        val doubled = spark.sql("SELECT nfc_normalize(nfc_normalize(s)) AS n FROM nfc_t")
        assert(doubled.head().getString(0) == "caf\u00e9")
        val nNodes = doubled.queryExecution.optimizedPlan.expressions
          .map(_.collect { case e: graft.functions.NfcNormalize => e }.size).sum
        assert(nNodes == 1,
          s"CollapseNfcNormalize did not fire: $nNodes nfc_normalize nodes remain")
      } finally spark.conf.unset("spark.sql.optimizer.excludedRules")
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
