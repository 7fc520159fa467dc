package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bucketing, Components, Dedup, Formats, Joins, LinkRank, Maintenance, Multimodal, Sampling, ScaleDiag, Similarity, TextOps}

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

  test("io15: nested pruning reaches the leaf level; nested predicate pushes down") {
    val df = Formats.io15NestedPruning(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scanLine = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(scanLine.contains("cents") && scanLine.contains("priority"),
      s"needed leaves missing from ReadSchema: $scanLine")
    assert(!scanLine.contains("tax_cents"),
      s"untouched struct leaf read - nested pruning off: $scanLine")
    assert(!scanLine.contains("status"),
      s"untouched struct leaf read - nested pruning off: $scanLine")
    assert(plan.contains("PushedFilters") && plan.contains("priority"),
      s"nested predicate not pushed: $plan")
  }

  test("g17: walk counts match an in-memory BFS recompute") {
    val rows = LinkRank.g17KatzCentrality(spark, sf).collect()
    assert(rows.nonEmpty)
    // independent edge set from the documented generator rule
    val n = rows.length.toLong
    val edges = rows.map(_.getLong(0)).flatMap { id =>
      (1 to 3).map(k => (id, (id * id * 31 + k * 17) % n))
    }.filter { case (s, d) => s != d }.distinct
    val in: Map[Long, Seq[Long]] =
      edges.groupBy(_._2).view.mapValues(_.map(_._1).toSeq).toMap
    val w1: Map[Long, Long] = rows.map(r => r.getLong(0) ->
      in.getOrElse(r.getLong(0), Seq.empty[Long]).size.toLong).toMap
    def next(w: Map[Long, Long]): Map[Long, Long] =
      rows.map { r =>
        val v = r.getLong(0)
        v -> in.getOrElse(v, Seq.empty[Long]).map(u => w.getOrElse(u, 0L)).sum
      }.toMap
    val (w2, w3) = (next(w1), next(next(w1)))
    rows.foreach { r =>
      val v = r.getLong(0)
      assert(r.getLong(1) == w1(v) && r.getLong(2) == w2(v) && r.getLong(3) == w3(v),
        s"walk counts diverge at node $v")
      assert(r.getLong(4) == 16 * w1(v) + 4 * w2(v) + w3(v))
    }
  }

  test("t45: TextRank top-20 matches an in-memory power-iteration recompute") {
    val got = TextOps.t45TextrankKeywords(spark, sf).collect()
    assert(got.length == 20)
    assert(got.map(_.getInt(0)).toSeq == (1 to 20).toSeq)
    // independent recompute with plain Scala maps over the same corpus
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
    val tokens = docs.map(d => d.getString(1).trim.toLowerCase.split("\\s+").toSeq)
    val freq = tokens.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val edges = tokens.flatMap(ws => ws.zip(ws.drop(1)))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => if (a < b) (a, b) else (b, a) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val adj = edges.toSeq.flatMap { case ((u, v), e) => Seq((u, v, e), (v, u, e)) }
    val wdeg = adj.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    def step(r: Map[String, Long]): Map[String, Long] = {
      val s = adj.groupBy(_._2).view.mapValues(_.map { case (u, _, e) =>
        r(u) * e / wdeg(u) }.sum).toMap
      freq.keys.map(w => w -> (150000L + 850L * s.getOrElse(w, 0L) / 1000L)).toMap
    }
    val r2 = step(step(freq.keys.map(_ -> 1000000L).toMap))
    val expected = r2.toSeq.sortBy { case (w, r) => (-r, w) }.take(20)
    got.zip(expected).foreach { case (row, (w, r)) =>
      assert(row.getString(1) == w && row.getLong(3) == r,
        s"rank ${row.getInt(0)}: got (${row.getString(1)},${row.getLong(3)}) want ($w,$r)")
    }
  }

  test("v33: descent pool dominates the seed shortlist; ranks dense") {
    val rows = Similarity.v33NnDescent(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to rs.length).toSeq, s"ranks for $qid")
      val cs = sorted.map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, s"cosine order for $qid")
    }
    // the two-hop round must surface at least one neighbor the LSH seed
    // missed somewhere in the corpus (else the descent is wired wrong)
    val newFinds = rows.count(_.getLong(4) == -1L)
    info(s"v33 descent-only neighbors in final top-3: $newFinds/${rows.length}")
    assert(newFinds > 0, "no descent-only finds - two-hop join suspect")
  }

  test("io16: bucket pruning opens only the hashed buckets; answer matches full scan") {
    val df = Bucketing.io16BucketPruning(spark, sf)
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val sel = plan.linesIterator.filter(_.contains("SelectedBucketsCount")).mkString
    assert(sel.nonEmpty, s"no bucket pruning in plan:\n$plan")
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(sel).get
    assert(m.group(1).toInt <= 5 && m.group(2).toInt == 8,
      s"expected <=5 of 8 buckets, got $sel")
    val want = Tables.orders(spark, sf)
      .filter(col("o_orderkey").isin(1L, 7L, 19L, 403L, 977L))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)), sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")))
      .orderBy(col("o_orderkey")).collect()
    assert(rows.map(_.toString).toSeq == want.map(_.toString).toSeq)
  }

  test("a63: lifetable ties out to a driver-side censoring replay") {
    val rows = Maintenance.a63SurvivalLifetable(spark, sf).collect()
    assert(rows.nonEmpty)
    // independent replay: per user, first purchase >= signup day, censor
    // at the global horizon
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts) div 86400000000")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val horizon = ev.map(_._3).max
    val su = ev.filter(_._2 == "signup").groupBy(_._1)
      .view.mapValues(_.map(_._3).min).toMap
    val obs = su.toSeq.map { case (u, s) =>
      val p = ev.filter(e => e._1 == u && e._2 == "purchase" && e._3 >= s)
        .map(_._3).sorted.headOption
      (p.map(_ - s).getOrElse(horizon - s), p.isDefined)
    }
    val table = obs.groupBy(_._1).view.mapValues { g =>
      (g.count(_._2).toLong, g.count(!_._2).toLong)
    }.toMap
    assert(rows.length == table.size)
    var atRisk = obs.size.toLong
    rows.sortBy(_.getLong(0)).foreach { r =>
      val t = r.getLong(0)
      val (d, c) = table(t)
      assert(r.getLong(1) == atRisk, s"n_risk at t=$t")
      assert(r.getLong(2) == d && r.getLong(3) == c, s"d/c at t=$t")
      assert(r.getLong(4) == 1000000L * d / atRisk, s"hazard at t=$t")
      atRisk -= (d + c)
    }
    assert(atRisk == 0, "lifetable lost observations")
  }

  test("s18: floor-sqrt is exact; both allocations are valid apportionments") {
    val rows = Sampling.s18NeymanAllocation(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = BigInt(r.getString(3))
      val sd = BigInt(r.getLong(4))
      assert(sd * sd <= d && (sd + 1) * (sd + 1) > d,
        s"isqrt wrong for stratum ${r.getString(0)}: sd=$sd d=$d")
    }
    assert(rows.map(_.getLong(5)).sum == 1000L, "Neyman seats must sum to the budget")
    assert(rows.map(_.getLong(6)).sum == 1000L, "proportional seats must sum to the budget")
    // the two policies genuinely differ on this corpus (variance is not
    // uniform across priorities)
    assert(rows.exists(r => r.getLong(5) != r.getLong(6)),
      "Neyman == proportional everywhere - variance weighting inert")
  }

  test("d18: incremental merge equals a from-scratch component audit") {
    val got = Components.d18IncrementalComponents(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    // from-scratch: full-graph CC + old-only CC, replayed driver-side
    val pairs = Dedup.d03NgramJaccard(spark, sf)
      .select(col("ida"), col("idb")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val docs = Tables.documents(spark, sf).select(col("doc_id"))
      .collect().map(_.getLong(0))
    def cc(es: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      docs.map(d => d -> find(d)).toMap
    }
    val full = cc(pairs.toSeq)
    val old = cc(pairs.filter { case (a, b) => a % 10 != 7 && b % 10 != 7 }.toSeq)
    val touched = docs.filter(_ % 10 == 7).map(full).distinct
    val want = touched.map { comp =>
      val members = docs.filter(full(_) == comp)
      val nNew = members.count(_ % 10 == 7).toLong
      val olds = members.filter(_ % 10 != 7)
      (comp, nNew, olds.length.toLong,
        olds.map(old).distinct.length.toLong, members.length.toLong)
    }.sortBy(_._1)
    assert(got.toSeq == want.toSeq,
      s"incremental audit diverges from from-scratch: first diff ${
        got.toSeq.zipAll(want.toSeq, null, null).find { case (a, b) => a != b }}")
  }

  test("io17: footer-derived stats equal the data-derived truth") {
    val r = Formats.io17FooterStats(spark, sf).head()
    val cents = Tables.orders(spark, sf)
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val extRow = cents.agg(min(col("cents")), max(col("cents")), count(lit(1))).head()
    val (lo, hi, n) = (extRow.getLong(0), extRow.getLong(1), extRow.getLong(2))
    assert(r.getLong(0) == 8L, s"expected the 8-bin layout, got ${r.getLong(0)} files")
    assert(r.getLong(1) == n, "footer row counts lost rows")
    assert(r.getLong(2) == lo && r.getLong(3) == hi, "footer min/max diverge from data")
    // per-file envelopes from the bin rule, independently
    val widths = cents
      .withColumn("g", expr(
        s"least(CAST(7 AS BIGINT), ((cents - $lo) * 8) div (${hi} - $lo + 1))"))
      .groupBy(col("g")).agg((max(col("cents")) - min(col("cents"))).as("w"))
      .agg(sum(col("w"))).head().getLong(0)
    assert(r.getLong(4) == widths, "envelope widths diverge from data")
  }

  test("m16: savings_ppm survives the int64 wrap region (DECIMAL(38,0) numerator)") {
    // sf test data never enters the wrap region (~9.2e12 logical bytes
    // per sharing class); drive the EXACT production expression with a
    // synthetic class well past it. 1e6 * (2e13 - 1e12) = 1.9e19 > 2^63:
    // an int64 numerator wraps (or throws under ANSI); the DECIMAL(38,0)
    // lift must yield the exact quotient.
    val df = spark.range(1).selectExpr(
      "CAST(20000000000000 AS BIGINT) AS logical_bytes",
      "CAST(1000000000000 AS BIGINT) AS stored_bytes")
    val ppm = df.selectExpr(s"${Multimodal.m16SavingsPpm} AS p").head().getLong(0)
    assert(ppm == 950000L, s"overflow-region savings_ppm wrong: $ppm")
    // a second point at the extreme: a full-dedup class of 9e15 logical
    // bytes (the 100 TB corpus scale) with 1 byte stored
    val df2 = spark.range(1).selectExpr(
      "CAST(9000000000000000 AS BIGINT) AS logical_bytes",
      "CAST(1 AS BIGINT) AS stored_bytes")
    val ppm2 = df2.selectExpr(s"${Multimodal.m16SavingsPpm} AS p").head().getLong(0)
    assert(ppm2 == 999999L, s"extreme-region savings_ppm wrong: $ppm2")
  }

  test("m16: class identity is exact - logical == stored * degree and classes tie out to the chunk stream") {
    val rows = Multimodal.m16CdcDedupRatio(spark, sf).collect()
    assert(rows.nonEmpty)
    // the degree-1 class saves nothing by definition
    rows.find(_.getLong(0) == 1L).foreach(r =>
      assert(r.getLong(4) == 0L, "unshared chunks cannot save bytes"))
    rows.foreach { r =>
      val (deg, n, logical, stored) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      // every chunk in the degree-d class has occ == d, so the class
      // identity is EXACT: logical = sum(bytes*occ) = d * sum(bytes)
      assert(logical == stored * deg, s"class $deg: logical $logical != stored $stored * $deg")
      assert(n > 0)
    }
    // total logical bytes across classes == every chunk occurrence's bytes,
    // recomputed independently from the m07 per-doc audit
    val totalLogical = rows.map(_.getLong(2)).sum
    val m07Total = Multimodal.m07CdcChunks(spark, sf)
      .agg(sum(col("n_bytes"))).head().getLong(0)
    assert(totalLogical == m07Total,
      s"store accounting lost bytes: $totalLogical vs $m07Total")
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
