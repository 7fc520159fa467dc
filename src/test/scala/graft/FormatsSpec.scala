package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Formats

class FormatsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("io01: json read-back prunes partitions instead of scanning them") {
    val df = Formats.io01JsonRoundtrip(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the status predicate must land in PartitionFilters (directory
    // pruning against the partitioned json layout), not survive as a
    // row-level Filter over a full scan
    assert(plan.contains("PartitionFilters: ["), s"no partition filters in:\n$plan")
    assert(plan.contains("o_orderstatus"), s"status not in partition filters:\n$plan")
  }

  test("io02: quantity predicate is pushed to the ORC reader") {
    val df = Formats.io02OrcRoundtrip(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThanOrEqual(l_quantity,25.0)]"),
      s"quantity filter not pushed:\n$plan")
  }
}
