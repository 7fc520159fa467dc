package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB variants of the exact aggregates the engine uses at small
  * scale: HLL distinct counts and t-digest quantiles. These cannot be
  * differential-oracle-checked (sketch internals differ per engine), so
  * the contract here is error-bound vs the exact computation on the
  * same data — the decision rule for when a pipeline should switch to
  * them (exact distinct shuffles every key; HLL ships one sketch per
  * partition).
  */
class ApproxSpec extends AnyFunSuite {
  import SparkTestSession._

  test("approx_count_distinct within 5% of exact on every orders key") {
    val df = Tables.orders(spark, "/root/testdata/sf0.01")
    val r = df.agg(
      countDistinct(col("o_custkey")).as("exact"),
      approx_count_distinct(col("o_custkey"), 0.02).as("approx"),
      countDistinct(col("o_orderkey")).as("exact_ok"),
      approx_count_distinct(col("o_orderkey"), 0.02).as("approx_ok")).head()
    assert(math.abs(r.getLong(1) - r.getLong(0)).toDouble / r.getLong(0) < 0.05)
    assert(math.abs(r.getLong(3) - r.getLong(2)).toDouble / r.getLong(2) < 0.05)
  }

  test("approx_percentile within 1% of exact interpolated percentile") {
    val df = Tables.lineitem(spark, "/root/testdata/sf0.01")
    val r = df.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("approx")).head()
    val (e, a) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(a - e) / e < 0.01, s"approx $a vs exact $e")
  }
}
