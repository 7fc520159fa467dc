package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BitHistAgg
import graft.util.ScalableQuantile

/** ScalableQuantile must reproduce Spark's exact `percentile` BIT-FOR-BIT
  * — it replaces it on every global-quantile path (a12, a13, the health
  * ETL's five passes), so any deviation breaks the DuckDB oracles and the
  * pandas bit-exact ETL diff.
  */
class QuantileSpec extends AnyFunSuite {
  import SparkTestSession._

  private def sparkPercentile(df: org.apache.spark.sql.DataFrame,
      c: String, p: Double): Option[Double] = {
    val r = df.agg(expr(s"percentile(CAST(`$c` AS DOUBLE), ${p}D)")).head()
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("bit key is order-isomorphic and invertible") {
    val vals = Seq(Double.NegativeInfinity, -1e300, -2.5, -1.0, -Double.MinPositiveValue,
      -0.0, 0.0, Double.MinPositiveValue, 0.1, 1.0, 2.5, 1e300, Double.PositiveInfinity,
      Double.NaN)
    val keys = vals.map(BitHistAgg.keyOf)
    assert(keys.sliding(2).forall { case Seq(a, b) =>
      java.lang.Long.compareUnsigned(a, b) < 0 })
    vals.zip(keys).foreach { case (v, k) =>
      val back = BitHistAgg.keyToDouble(k)
      assert(java.lang.Double.doubleToLongBits(back) ==
        java.lang.Double.doubleToLongBits(v), s"round-trip $v")
    }
  }

  test("matches percentile bit-for-bit on real tables (nulls included)") {
    val li = graft.Tables.lineitem(spark, sf)
    val ev = graft.Tables.events(spark, sf)
    val probs = Seq(0.25, 0.5, 0.75)
    val got = ScalableQuantile.quantiles(li,
      Seq("l_quantity" -> probs, "l_extendedprice" -> probs))
    for (c <- Seq("l_quantity", "l_extendedprice"); p <- probs) {
      val want = sparkPercentile(li, c, p)
      assert(got((c, p)).map(java.lang.Double.doubleToLongBits) ==
        want.map(java.lang.Double.doubleToLongBits), s"$c @ $p: ${got((c, p))} vs $want")
    }
    // events.value has nulls — percentile ignores them
    val gotEv = ScalableQuantile.quantiles(ev, Seq("value" -> Seq(0.5)))
    assert(gotEv(("value", 0.5)).map(java.lang.Double.doubleToLongBits) ==
      sparkPercentile(ev, "value", 0.5).map(java.lang.Double.doubleToLongBits))
  }

  test("adversarial full-64-bit spread exercises the deep-refinement bound") {
    // values spanning ~2000 binades plus ULP-adjacent clusters: every
    // radix pass down to the last 12 bits must refine correctly (worst
    // case for the 4096-bucket histogram: the quantile sits inside a
    // cluster of bit-adjacent doubles, so early passes cannot isolate it)
    val s = spark
    import s.implicits._
    val base = java.lang.Double.doubleToLongBits(1.0)
    val cluster = (0 until 64).map(k => java.lang.Double.longBitsToDouble(base + k))
    val spread = Seq(-1e308, -1e300, -1.0, -1e-300, -Double.MinPositiveValue,
      -0.0, 0.0, Double.MinPositiveValue, 1e-300, 1e300, 1e308)
    val vs = (cluster ++ spread).map(Double.box)
    val df = vs.toDF("v")
    Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0).foreach { p =>
      val got = ScalableQuantile.quantiles(df, Seq("v" -> Seq(p)))(("v", p))
      val want = sparkPercentile(df, "v", p)
      assert(got.map(java.lang.Double.doubleToLongBits) ==
        want.map(java.lang.Double.doubleToLongBits), s"@ $p: $got vs $want")
    }
  }

  test("weighted lower median == brute-force expansion, and weights actually matter") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    // deterministic but irregular weights, including a 0-weight and a null value
    val rows: Seq[(java.lang.Double, java.lang.Long)] =
      (1 to 200).map(i => (Double.box(((i * 37) % 101).toDouble + i / 300.0),
                           Long.box(((i * 13) % 7 + (if (i % 11 == 0) 0 else 1)).toLong))) ++
      Seq((null: java.lang.Double, Long.box(5L)))
    val df = rows.toDF("v", "w")
    val got = ScalableQuantile.weightedLowerMedians(
      df, "v", "w", Seq("all" -> lit(true), "half" -> (col("w") >= 3)))
    // brute force: repeat each value by weight, sort, pick ceil(W/2)-1
    def brute(f: ((java.lang.Double, java.lang.Long)) => Boolean): Double = {
      val expanded = rows.filter(r => r._1 != null && r._2 > 0 && f(r))
        .flatMap { case (v, w) => Seq.fill(w.toInt)(v.doubleValue) }.sorted
      expanded(((expanded.size + 1) / 2 - 1).toInt)
    }
    assert(got("all") == Some(brute(_ => true)), s"all: ${got("all")}")
    assert(got("half") == Some(brute(_._2 >= 3)), s"half: ${got("half")}")
    // weighting must shift the answer vs the unweighted median on this data
    val unweighted = ScalableQuantile.medians(df, Seq("v"))("v").get
    assert(got("all").get != unweighted, "weights had no effect — test data too uniform")
    // all-zero-weight slice resolves to None, not an error
    val none = ScalableQuantile.weightedLowerMedians(df, "v", "w", Seq("z" -> lit(false)))
    assert(none("z").isEmpty)
  }

  test("edge cases: tiny n, duplicates, negatives, all-null") {
    val s = spark
    import s.implicits._
    val cases: Seq[Seq[java.lang.Double]] = Seq(
      Seq(42.0),                                  // n = 1
      Seq(1.0, 2.0),                              // n = 2, interpolation
      Seq(-5.0, -1.0, 3.5, 3.5, 3.5, 100.0),      // duplicates + negatives
      Seq(0.0, -0.0, 1.0, null),                  // signed zero + null
      Seq(null, null),                            // all null -> None
      Seq(2.0, 2.0, 2.0, 2.0))                    // all equal
    cases.foreach { vs =>
      val df = vs.toDF("v")
      Seq(0.0, 0.25, 0.5, 0.75, 1.0).foreach { p =>
        val got = ScalableQuantile.quantiles(df, Seq("v" -> Seq(p)))(("v", p))
        val want = sparkPercentile(df, "v", p)
        assert(got.map(java.lang.Double.doubleToLongBits) ==
          want.map(java.lang.Double.doubleToLongBits), s"$vs @ $p: $got vs $want")
      }
    }
  }
}
