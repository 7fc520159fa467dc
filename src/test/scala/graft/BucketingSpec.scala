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

  test("AQE splits a skewed join partition (the automatic dual of j09/j10 salting)") {
    import org.apache.spark.sql.functions._
    // funnel ~97% of lineitem onto ONE join key: the classic hot-key
    // shape. AQE splits a skewed REDUCER by map-output ranges, so the
    // input must span several map tasks (at 100 TB it spans thousands;
    // this 2 MB parquet reads as one) — fan it out first.
    val skewed = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .repartition(16)
      .select(when(col("l_orderkey") % 30 =!= 0, lit(0L))
        .otherwise(col("l_orderkey")).as("k"), col("l_extendedprice"))
    val dim = Tables.orders(spark, "/root/testdata/sf0.01")
      .select(col("o_orderkey").as("k"), col("o_orderpriority"))
    val conf = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",       // force the shuffle path
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      // the hot partition is ~58k rows but compresses hard (one repeated
      // key) — the byte thresholds must sit BELOW its compressed size
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB")
    val saved = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // sum(price) keeps a poorly-compressible column in the shuffled
      // rows so the skew is visible in bytes, not just row counts
      val joined = skewed.join(dim, "k")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("s"))
      val rows = joined.collect()
      assert(rows.map(_.getLong(1)).sum == 60000L, "join lost rows")
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      // AQE marks the split join: SortMergeJoin ... (skew=true)
      assert(plan.contains("skew=true"),
        s"AQE did not split the hot partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
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
