package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Joins, Maintenance, Multimodal, ScaleDiag}

/** Round-9 additions: a62 Poisson bootstrap, j23 AGMS join-size sketch,
  * m15 Merkle payload audit, l13 manifest zone-map pruning, d17 b-bit
  * MinHash. Each test checks the operator against an INDEPENDENT
  * derivation (in-memory recompute, direct join, or pure-JVM hash tree),
  * not a replay of the plan under test.
  */
class Round9OpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("a62: resample components are internally consistent and Poisson(1)-shaped") {
    val rows = Maintenance.a62PoissonBootstrap(spark, sf).collect()
    assert(rows.length == 16)
    val nTotal = rows.head.getLong(3)
    val sumTotal = rows.head.getLong(4)
    rows.foreach { r =>
      val (nB, sumB, dev) = (r.getLong(1), r.getLong(2), r.getLong(5))
      // E[w] under the truncated pmf = .367880 + 2*.183940 + 3*.080301
      // ≈ 0.977 — resample sizes concentrate near n (Poisson(1) means
      // the bootstrap keeps the sample size in expectation)
      assert(nB > (nTotal * 80) / 100 && nB < (nTotal * 115) / 100,
        s"resample ${r.getInt(0)} size $nB vs $nTotal out of Poisson(1) range")
      // dev_ppm identity: sign-aware floored from the exact components
      val num = BigInt(sumB) * nTotal - BigInt(sumTotal) * nB
      val den = BigInt(sumTotal) * nB
      val expected =
        if (num >= 0) (num * 1000000 / den).toLong
        else -((-num) * 1000000 / den).toLong
      assert(dev == expected, s"dev_ppm mismatch for b=${r.getInt(0)}")
      // CLT sanity: a mean over thousands of rows cannot drift 20%
      assert(math.abs(dev) < 200000L, s"resample mean drifted $dev ppm")
    }
    // resamples must actually differ from each other (the hash images work)
    assert(rows.map(_.getLong(1)).distinct.length > 8)
  }

  test("j23: exact join sizes match a direct events self-join; sketch is in range") {
    val got = Joins.j23JoinSizeSketch(spark, sf).collect()
    assert(got.length == 10) // C(5,2) type pairs
    // independent exact: join the raw event stream against itself
    val ev = Tables.events(spark, sf).select(col("event_type"), col("user_id"))
    val direct = ev.as("a").join(ev.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type"), col("b.event_type")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    got.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(direct(k) == r.getLong(2), s"exact_rows mismatch for $k")
      // err_ppm identity from the emitted columns
      val (exact, est, err) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val num = BigInt(est) - BigInt(exact)
      val expected =
        if (num >= 0) (num * 1000000 / exact).toLong
        else -((-num) * 1000000 / exact).toLong
      assert(err == expected, s"err_ppm mismatch for $k")
    }
    // the 16-estimator mean must carry signal: median relative error
    // across the 10 pairs well under 100% (AGMS variance ~ F2a*F2b/16)
    val errs = got.map(r => math.abs(r.getLong(4))).sorted
    assert(errs(errs.length / 2) < 1000000L,
      s"median AGMS error ${errs(errs.length / 2)} ppm ~ no signal")
  }

  test("m15: pure-JVM Merkle recompute matches; corruption localized to its leaf") {
    val rows = Multimodal.m15MerkleAudit(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(7), s"doc ${r.getLong(0)}: corruption undetected")
      assert(r.getInt(3) == r.getInt(4),
        s"doc ${r.getLong(0)}: bad_leaf ${r.getInt(4)} != planted block ${r.getInt(3)}")
    }
    // independent root: MessageDigest tree over the same char blocks
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .orderBy(col("doc_id")).limit(5).collect()
    val byId = rows.map(r => r.getLong(0) -> r.getString(5)).toMap
    docs.foreach { d =>
      val p = "IMG0" + d.getString(1)
      val blocks = (0 until 8).map(i =>
        if (i * 128 < p.length) p.substring(i * 128, math.min((i + 1) * 128, p.length))
        else "")
      val leaves = blocks.map(md5hex)
      val n1 = leaves.grouped(2).map(g => md5hex(g(0) + g(1))).toSeq
      val n2 = n1.grouped(2).map(g => md5hex(g(0) + g(1))).toSeq
      val root = md5hex(n2(0) + n2(1))
      assert(byId(d.getLong(0)) == root, s"doc ${d.getLong(0)} root mismatch")
    }
  }

  test("l13: pruned read answers the full-scan query; skipping is real") {
    val r = ScaleDiag.l13ManifestPruning(spark, sf).head()
    val (filesTotal, filesRead) = (r.getLong(0), r.getLong(1))
    val (rowsScanned, rowsMatched, sumCents) = (r.getLong(2), r.getLong(3), r.getLong(4))
    assert(filesRead < filesTotal, s"no files skipped: $filesRead of $filesTotal")
    assert(filesRead >= 1 && rowsMatched <= rowsScanned)
    // independent full-scan answer over the same band arithmetic
    val cents = Tables.orders(spark, sf)
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val extRow = cents.agg(min(col("cents")), max(col("cents"))).head()
    val (lo, hi) = (extRow.getLong(0), extRow.getLong(1))
    val a = lo + ((hi - lo + 1) * 8) / 20
    val b = lo + ((hi - lo + 1) * 11) / 20
    val full = cents.filter(col("cents") >= a && col("cents") < b)
      .agg(count(lit(1)), sum(col("cents"))).head()
    assert(rowsMatched == full.getLong(0), "pruned read lost rows")
    assert(sumCents == full.getLong(1), "pruned read changed the aggregate")
  }

  test("d17: 2-bit agreement dominates full agreement; estimators track exact Jaccard") {
    val rows = Dedup.d17BbitMinhash(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // a full 64-bit match is a fortiori a 2-bit match
      assert(r.getLong(3) >= r.getLong(2),
        s"pair (${r.getLong(0)},${r.getLong(1)}): k_2bit < k_full")
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 60)
    }
    // on the high-similarity pairs the full-width estimator must be
    // close; the 2-bit corrected one unbiased but noisier — compare
    // mean absolute errors (strictly larger variance by construction)
    val hi = rows.filter(_.getLong(4) >= 800000L)
    assert(hi.nonEmpty, "no high-Jaccard candidate pairs at this sf")
    def mae(f: org.apache.spark.sql.Row => Long): Double =
      hi.map(r => math.abs(f(r) - r.getLong(4)).toDouble).sum / hi.length
    val (maeFull, mae2) = (mae(_.getLong(5)), mae(_.getLong(6)))
    info(s"d17 MAE over ${hi.length} high-J pairs: full=$maeFull 2bit=$mae2")
    assert(maeFull < 200000.0, s"full-width estimator off by $maeFull ppm")
    assert(mae2 >= maeFull * 0.5,
      "2-bit error implausibly below full-width - estimator wiring suspect")
  }
}
