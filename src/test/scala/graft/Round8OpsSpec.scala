package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Maintenance, Similarity}

/** Round-8 additions: a50 KS test, v18 corpus-sized nlist. */
class Round8OpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("a50: CvM integral drift matches an in-memory recompute and is a valid statistic") {
    val row = Maintenance.a50CvmDrift(spark, sf).head()
    val (nR, nN, cvm, peakQty) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    // in-memory oracle over the same filtered frame, replaying the
    // defined quantization points (floor each ECDF to ppm FIRST)
    val rows = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag").isin("R", "N"))
      .select(col("l_quantity").cast("long"), col("l_returnflag"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val qtys = rows.map(_._1).distinct.sorted
    val (r, n) = rows.partition(_._2 == "R")
    assert(nR == r.length && nN == n.length)
    val scored = qtys.map { q =>
      val d = BigInt(1000000) * r.count(_._1 <= q) / r.length -
        BigInt(1000000) * n.count(_._1 <= q) / n.length
      val mass = BigInt(rows.count(_._1 == q))
      (q, mass * d * d)
    }
    val s = scored.map(_._2).sum
    assert(cvm == (s / BigInt(rows.length)).toLong)
    val mx = scored.map(_._2).max
    assert(peakQty == scored.filter(_._2 == mx).map(_._1).min)
    // mean squared ppm gap is bounded by (10^6)^2
    assert(cvm >= 0L && cvm <= 1000000000000L)
    // the cumulative window must run over the bounded histogram, never
    // the fact table: the window's input is an aggregate of lineitem
    val plan = Maintenance.a50CvmDrift(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("Window"), "expected the bounded-histogram window")
    assert(
      plan.indexOf("Aggregate") >= 0 &&
        plan.indexOf("Window") < plan.indexOf("Relation"),
      "window must sit above the histogram aggregate, not the scan")
  }

  test("v18: nlist derives from the corpus (defaultNlist of the footer count)") {
    val n = Tables.footerRowCount(spark, sf, "embeddings")
    val expected = Similarity.defaultNlist(n)
    assert(expected >= 16 && expected == math.max(16,
      math.ceil(math.sqrt(n.toDouble)).toInt))
    // the derived-nlist plan must equal the explicitly-passed one
    val derived = Similarity.v18IvfPqRerank(spark, sf).collect().map(_.toString)
    val explicit0 = Similarity.v18IvfPqRerank(spark, sf, nlist = expected)
      .collect().map(_.toString)
    assert(derived.toSeq == explicit0.toSeq)
    // and a different nlist genuinely changes the funnel (the parameter
    // is live, not dead like the old pinned 16)
    if (expected != 16) {
      val pinned16 = Similarity.v18IvfPqRerank(spark, sf, nlist = 16)
        .collect().map(_.toString)
      assert(pinned16.toSeq != derived.toSeq,
        "corpus-sized nlist should alter the probed-cell funnel on this corpus")
    }
  }
}
