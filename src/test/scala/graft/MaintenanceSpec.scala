package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Maintenance

class MaintenanceSpec extends AnyFunSuite {
  import SparkTestSession._

  test("a33: stored-partial merge == one-pass recompute, bit for bit") {
    val merged = Maintenance.a33IncrementalAgg(spark, sf).collect()
    val direct = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"),
           graft.util.Exact.exactSum(col("l_quantity")).as("sum_qty"),
           graft.util.Exact.exactAvg(col("l_quantity")).as("avg_qty"),
           min(col("l_extendedprice")).as("min_price"),
           max(col("l_extendedprice")).as("max_price"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
      .collect()
    assert(merged.length === direct.length)
    merged.zip(direct).foreach { case (m, d) =>
      assert(m.getString(0) === d.getString(0))
      assert(m.getString(1) === d.getString(1))
      assert(m.getLong(2) === d.getLong(2))       // n_rows
      assert(m.getDouble(3) === d.getDouble(3))   // sum_qty (exact decimal path)
      assert(m.getDouble(4) === d.getDouble(4))   // avg_qty
      assert(m.getDouble(5) === d.getDouble(5))
      assert(m.getDouble(6) === d.getDouble(6))
    }
  }

  test("a34: row-level suppression application == brute force, join broadcasts") {
    val k = 3 // sf0.001 has ~150 customers over 125 QI cells — k=10 would suppress all
    val audit = Maintenance.a34KAnonymity(spark, sf, k)
    val cust = Tables.customer(spark, sf)
    val kept = cust.join(
        broadcast(audit.filter(!col("suppress"))
          .select(col("c_mktsegment"), col("c_nationkey"))),
        Seq("c_mktsegment", "c_nationkey"), "left_semi")
    assert(kept.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    // brute force: per-row group size via driver-side map
    val sizes = cust.select(col("c_mktsegment"), col("c_nationkey")).collect()
      .groupBy(r => (r.getString(0), r.getInt(1))).view.mapValues(_.length).toMap
    val expect = cust.select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"))
      .collect().filter(r => sizes((r.getString(1), r.getInt(2))) >= k)
      .map(_.getLong(0)).toSet
    val got = kept.select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    assert(got === expect)
    assert(got.nonEmpty && got.size < sizes.values.sum, "k chose a trivial split")
  }

  test("w16: integer variance gate == BigInteger recompute; baseline broadcasts") {
    import java.math.BigInteger
    val out = Maintenance.w16SeasonalAnomaly(spark, sf)
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    val cutoffUs = 1705881600000000L
    val raw = Tables.events(spark, sf).filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"), expr("unix_micros(ts)"),
        expr("CAST(round(value * 100) AS BIGINT)"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val baseline = raw.filter(_._3 < cutoffUs)
      .groupBy { case (_, t, us, _) => (t, us / 86400000000L % 7, us / 3600000000L % 24) }
      .view.mapValues { rows =>
        val n = BigInteger.valueOf(rows.length.toLong)
        val s = rows.map(r => BigInteger.valueOf(r._4)).reduce(_ add _)
        val q = rows.map(r => BigInteger.valueOf(r._4).pow(2)).reduce(_ add _)
        (n, s, q)
      }.toMap
    val expect = raw.filter(_._3 >= cutoffUs).map { case (id, t, us, c) =>
      val flag = baseline.get((t, us / 86400000000L % 7, us / 3600000000L % 24)) match {
        case Some((n, s, q)) if n.longValue >= 2 =>
          val x = BigInteger.valueOf(c)
          val lhs = x.multiply(n).subtract(s).pow(2)
            .multiply(n.subtract(BigInteger.ONE))
          val rhs = n.multiply(q).subtract(s.pow(2))
            .multiply(n).multiply(BigInteger.valueOf(9))
          lhs.compareTo(rhs) > 0
        case _ => false
      }
      id -> flag
    }.toMap
    val got = out.collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(got === expect)
    assert(got.valuesIterator.contains(true) || sf.endsWith("sf0.001"),
      "gate should fire somewhere at oracle scale")
  }
}
