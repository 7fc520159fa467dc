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

  test("w16: stays exact at magnitudes where the naive DECIMAL(38,0) products overflow") {
    import java.math.BigInteger
    import spark.implicits._
    // cents = ±9e17 (value ±9e15 — exactly representable doubles), n = 3:
    // the naive rhs (nQ − S²)·n·9 ≈ 1.75e38 exceeds DECIMAL(38,0), so the
    // pre-centering formulation THROWS under ANSI. Centered operands stay
    // ≤ ~2e37. Planted cases cover all three verdict paths: an obvious
    // non-anomaly (suffFalse), an obvious anomaly (suffTrue), and a value
    // near the 3σ boundary (exact branch).
    val day0 = 1705276800000000L // 2024-01-15 00:00 UTC (a Monday) < cutoff
    val week = 7L * 86400000000L
    val min = 60000000L
    // same (weekday, hour) cell: minutes apart inside Monday 00:xx
    val hugeBase = (1 to 3).map { i =>
      (i.toLong, "huge", day0 + (i - 1) * min, if (i == 2) -9.0e15 else 9.0e15)
    }
    // modest cell for the boundary case: cents {900, 1000, 1100} → μ=1000
    val modestBase = Seq((11L, "modest", day0, 9.0), (12L, "modest", day0 + min, 10.0),
      (13L, "modest", day0 + 2 * min, 11.0))
    // recent probes: two Mondays later (past the 2024-01-22 cutoff), hour 0
    val recent = Seq(
      (101L, "huge", day0 + 2 * week, 9.0e15),      // within spread → false via suffFalse
      (102L, "huge", day0 + 2 * week + min, -9.0e15), // also inside → false
      (111L, "modest", day0 + 2 * week + 2 * min, 10.35), // near boundary → exact branch
      (112L, "modest", day0 + 2 * week + 3 * min, 1000.0)) // wildly out → true via suffTrue
    val dir = util.Scratch.dir("w16ovf")
    (hugeBase ++ modestBase ++ recent)
      .toDF("event_id", "event_type", "us", "value")
      .select(col("event_id"), col("event_type"),
        // Tables.events reads ts as a nanos long (TIMESTAMP(NANOS) via
        // nanosAsLong) and rescales with `ts div 1000` — store nanos
        (col("us") * 1000).as("ts"), col("value"),
        lit(7L).as("user_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Maintenance.w16SeasonalAnomaly(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    // BigInteger ground truth for every probe
    def verdict(cell: Seq[Long], x: Long): Boolean = {
      val n = BigInteger.valueOf(cell.length.toLong)
      val s = cell.map(BigInteger.valueOf).reduce(_ add _)
      val q = cell.map(c => BigInteger.valueOf(c).pow(2)).reduce(_ add _)
      val lhs = BigInteger.valueOf(x).multiply(n).subtract(s).pow(2)
        .multiply(n.subtract(BigInteger.ONE))
      val rhs = n.multiply(q).subtract(s.pow(2))
        .multiply(n).multiply(BigInteger.valueOf(9))
      lhs.compareTo(rhs) > 0
    }
    val huge = Seq(9e17.toLong, -9e17.toLong, 9e17.toLong)
    val modest = Seq(900L, 1000L, 1100L)
    val expect = Map(
      101L -> verdict(huge, 9e17.toLong), 102L -> verdict(huge, -9e17.toLong),
      111L -> verdict(modest, 1035L), 112L -> verdict(modest, 100000L))
    assert(got === expect, s"got $got, ground truth $expect")
    assert(expect(112L) && !expect(101L), "planted cases must span both verdicts")
  }

  test("a35: union of stored daily sketches == direct one-pass sketch, and bands hold") {
    val out = Maintenance.a35SketchRollup(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.nonEmpty && out.forall(_._4), s"sketch rollup out of band: ${out.toSeq}")
    // mergeability is EXACT, not approximate: HLL union keeps register
    // maxima, so merging per-day sketches must reproduce the direct
    // whole-stream sketch estimate bit-for-bit
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
    val direct = ev.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).cast("long").as("n_direct"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val mergedEst = ev.groupBy(col("event_type"), col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sketch"))
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).cast("long").as("n_merged"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mergedEst === direct,
      s"sketch union is not lossless: merged $mergedEst vs direct $direct")
    // the rollup must aggregate more than one stored cell per type
    assert(out.forall(_._2 > 1), "fixture should span multiple days per event type")
  }

  test("a36: CMS == driver-built sketch exactly, and est >= true always") {
    // sf0.01: 150 users in 64 buckets — all-4-row collisions are certain,
    // so the overcount column is exercised (sf0.001's ~15 users never
    // collide across all four rows and would vacuously pass)
    val sf01 = "/root/testdata/sf0.01"
    val got = Maintenance.a36CmsHeavyHitters(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val counts = Tables.events(spark, sf01).groupBy(col("user_id"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val P = 2147483647L; val W = 64L
    val hs = Seq((31L, 17L), (37L, 19L), (41L, 23L), (43L, 29L))
    def bucket(u: Long, a: Long, b: Long): Long = ((a * (u % P) + b) % P) % W
    val cms = Array.fill(4, W.toInt)(0L)
    for ((u, c) <- counts; ((a, b), i) <- hs.zipWithIndex)
      cms(i)(bucket(u, a, b).toInt) += c
    def est(u: Long): Long =
      hs.zipWithIndex.map { case ((a, b), i) => cms(i)(bucket(u, a, b).toInt) }.min
    val expect = counts.map { case (u, c) => (u, c, est(u), est(u) - c) }
      .sortBy { case (u, c, _, _) => (-c, u) }.take(20).toSeq
    assert(got.toSeq === expect)
    // the deterministic CMS guarantee, for EVERY key, not just the top 20
    assert(counts.forall { case (u, c) => est(u) >= c }, "CMS undercounted")
    // with 150 keys in 64 buckets collisions are certain: the audit must
    // actually show a nonzero overcount somewhere, or it proves nothing
    assert(counts.exists { case (u, c) => est(u) > c }, "no collision observed")
  }

  test("a37: sketch algebra == brute force, and the KMV union theorem holds") {
    val P = 2147483647L; val K = 16
    def hash(u: Long): Long = (48271L * (u % P)) % P
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) { // exact path + estimate path
      val got = Maintenance.a37KmvSetOps(spark, dir).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      val sets = Tables.events(spark, dir)
        .select(col("event_type"), col("user_id")).distinct().collect()
        .map(r => (r.getString(0), hash(r.getLong(1))))
        .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSet }
      def bottomK(s: Set[Long]) = s.toSeq.sorted.take(K)
      def est(mins: Seq[Long]) =
        if (mins.size < K) mins.size.toLong else (K - 1).toLong * P / mins(K - 1)
      val expect = (for {
        (ta, a) <- sets; (tb, b) <- sets if ta < tb
        mg = bottomK(a ++ b)
        inter = (a & b).size.toLong
        common = mg.count(h => bottomK(a).contains(h) && bottomK(b).contains(h)).toLong
      } yield (ta, tb, est(bottomK(a)), est(bottomK(b)), est(mg), common,
        common * 1000000L / mg.size, inter * 1000000L / (a ++ b).size))
        .toSeq.sortBy(r => (r._1, r._2))
      assert(got.toSeq === expect, s"mismatch at $dir")
      // the union theorem that makes the sketch mergeable: bottom-k of the
      // two SKETCHES equals bottom-k of the full union, for every pair
      for ((ta, a) <- sets; (tb, b) <- sets if ta < tb)
        assert(bottomK(bottomK(a).toSet ++ bottomK(b).toSet) === bottomK(a ++ b),
          s"KMV union theorem violated for ($ta, $tb) at $dir")
    }
    // the estimate path must actually be exercised somewhere
    val big = Tables.events(spark, "/root/testdata/sf0.01")
      .select(col("event_type"), col("user_id")).distinct()
      .groupBy(col("event_type")).count().collect()
    assert(big.exists(_.getLong(1) > K), "no type exceeded k: estimator untested")
  }

  test("a38: KS statistic matches a sequential CDF walk") {
    val sf01 = "/root/testdata/sf0.01"
    val rows = Tables.events(spark, sf01).filter(col("value").isNotNull)
      .select(col("event_type"), expr("unix_micros(ts)").as("us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = rows.groupBy(_._1).map { case (t, xs) =>
      val mid = (xs.map(_._2).min + xs.map(_._2).max) / 2
      val (s1, s2) = xs.partition(_._2 < mid)
      val (n1, n2) = (s1.length.toLong, s2.length.toLong)
      val values = xs.map(_._3).distinct.sorted
      val dmax = values.map { v =>
        val c1 = s1.count(_._3 <= v).toLong
        val c2 = s2.count(_._3 <= v).toLong
        math.abs(c1 * n2 - c2 * n1)
      }.max
      t -> (n1, n2, dmax * 1000000L / (n1 * n2))
    }
    val got = Maintenance.a38KsDrift(spark, sf01).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === expect)
    // same-distribution halves of a synthetic uniform stream must sit well
    // under the 10% drift gate — a degenerate all-zero statistic would too,
    // so also require it nonzero (sampling noise is never exactly zero here)
    val ks = got.values.map(_._3)
    assert(ks.forall(_ < 100000), s"false drift alarm: $got")
    assert(ks.exists(_ > 0), "KS identically zero — statistic not computed")
  }
}
