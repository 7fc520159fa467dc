package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bucketing

/** Bucketed co-located join: after bucketing both fact tables on the
  * join key, the join plan must contain NO shuffle exchange on the data
  * path — the 100 TB win this technique exists for. */
class BucketingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("bucketed fact-fact join plans without a shuffle exchange") {
    Bucketing.writeBucketed(spark, sf)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val df = Bucketing.bucketedJoin(spark)
      val rows = df.collect()
      assert(rows.nonEmpty)
      // inspect the FINAL adaptive plan only (toString appends the
      // pre-AQE "Initial Plan" section, which still shows exchanges)
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(plan.contains("Bucketed: true"), "scan not bucketed")
      // the join keys must never be exchanged — the bucketed layout
      // already satisfies the join's required distribution
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey") &&
             !plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"bucketed join still shuffles join keys:\n$plan")
      // cross-check values against the plain (shuffling) join
      val plain = Tables.orders(spark, sf)
        .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(graft.util.Exact.exactSum(col("l_extendedprice")).as("revenue"),
             count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus")).collect()
      assert(rows.map(_.toString).toSeq == plain.map(_.toString).toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("j16: runtime DPP plants a dynamicpruning filter and prunes to the quarter") {
    val df = operators.Bucketing.j16DynamicPruning(spark, "/root/testdata/sf0.01")
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the fact scan must carry a runtime IN-subquery on the partition
    // column — no static filter mentions the fact table at all
    assert(plan.contains("dynamicpruning"), s"no DPP expression in plan:\n$plan")
    // pruned result == statically-filtered recomputation
    val want = Tables.orders(spark, "/root/testdata/sf0.01")
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
              col("o_orderdate") < lit("1996-04-01"))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("o_month"))
      .agg(count(lit(1)).as("n_orders"),
           graft.util.Exact.exactSum(col("o_totalprice")).as("revenue"))
      .orderBy(col("o_month")).collect()
    assert(rows.map(_.toString).toSeq == want.map(_.toString).toSeq)
    assert(rows.length == 3, "1996-Q1 spans three month partitions")
  }
}
