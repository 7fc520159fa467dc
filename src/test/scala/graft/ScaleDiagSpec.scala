package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ScaleDiag

class ScaleDiagSpec extends AnyFunSuite {
  import SparkTestSession._

  test("l01: every z-tile envelope is a 16x16 rectangle or smaller") {
    val rows = ScaleDiag.l01Zorder(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (minA, maxA) = (r.getLong(2), r.getLong(3))
      val (minB, maxB) = (r.getLong(4), r.getLong(5))
      assert(maxA - minA <= 15, s"tile ${r.getLong(0)}: a-envelope ${maxA - minA}")
      assert(maxB - minB <= 15, s"tile ${r.getLong(0)}: b-envelope ${maxB - minB}")
      // tile t covers exactly rows whose interleaved code div 256 == t,
      // so the envelope must also sit inside the tile's own 16x16 cell
      assert(minA / 16 === maxA / 16 && minB / 16 === maxB / 16,
        s"tile ${r.getLong(0)} spills its cell")
    }
  }

  test("l02: bins are contiguous and overflow by at most one file") {
    val target = 131072L
    val rows = operators.ScaleDiag.l02CompactionPlan(spark, sf, target).collect()
      .map(r => (r.getLong(3), r.getLong(4))) // (bytes, bin)
    assert(rows.nonEmpty)
    // bins non-decreasing in file order and starting at 0
    val bins = rows.map(_._2)
    assert(bins.head === 0L)
    assert(bins.sliding(2).forall(p => p(1) - p(0) >= 0))
    // contiguous packing bound: a bin's total is < target + its last
    // file's bytes (only the file that crosses the boundary overflows)
    rows.groupBy(_._2).foreach { case (bin, fs) =>
      val total = fs.map(_._1).sum
      assert(total < target + fs.last._1,
        s"bin $bin total $total exceeds the overflow bound")
    }
  }

  test("a31: histogram conserves mass, spans the extent, bounds are contiguous") {
    import org.apache.spark.sql.functions._
    val rows = ScaleDiag.a31Histogram(spark, sf).collect()
    assert(rows.length === 20)
    assert(rows.map(_.getLong(0)).toSeq === (0L until 20L))
    val (total, mn, mx) = {
      val r = Tables.lineitem(spark, sf)
        .agg(count(col("l_extendedprice")), min(col("l_extendedprice")),
             max(col("l_extendedprice"))).head()
      (r.getLong(0), r.getDouble(1), r.getDouble(2))
    }
    assert(rows.map(_.getLong(3)).sum === total, "bucket counts must sum to non-null rows")
    assert(rows.head.getDouble(1) === mn)
    // contiguity: each bucket's hi is the next bucket's lo, last hi = max
    rows.sliding(2).foreach(p => assert(p(0).getDouble(2) === p(1).getDouble(1)))
    assert(math.abs(rows.last.getDouble(2) - mx) < 1e-9 * math.abs(mx))
    assert(rows.map(_.getLong(3)).count(_ > 0) >= 2, "degenerate single-bucket histogram")
  }

  test("a24: top-k comes from a distributed TakeOrdered, stats are exact") {
    val df = ScaleDiag.a24SkewStats(spark, sf)
    val rows = df.collect()
    assert(rows.length === 5)
    // the heavy-hitter path must be sort+limit (TakeOrderedAndProject),
    // not a single-partition row_number window over every key
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("TakeOrderedAndProject"), s"no TakeOrdered in:\n$plan")
    val (nKeys, nRows) = (rows.head.getLong(3), rows.head.getLong(4))
    val maxCnt = rows.head.getLong(2) // rank 1 row IS the max key
    assert(rows.head.getLong(5) === 1000L * maxCnt * nKeys / nRows)
    // counts are non-increasing down the ranks
    assert(rows.sliding(2).forall(p => p(0).getLong(2) >= p(1).getLong(2)))
  }
}
