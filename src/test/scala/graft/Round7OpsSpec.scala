package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LinkRank, Maintenance, Similarity, TextOps, Windows}

/** Property/parity tests for the round-7 operators. Where the operator is
  * cheap to re-derive exactly (integer arithmetic end to end), the test IS
  * an independent single-threaded Scala recompute over the collected
  * rows — a second implementation, not a tautology.
  */
class Round7OpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("w26: max drawdown equals a single-threaded fold over the sorted series") {
    val got = Windows.w26MaxDrawdown(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val raw = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("event_type"), unix_micros(col("ts")).as("us"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = raw.groupBy(_._1).map { case (typ, rows) =>
      var cum = 0L; var peak = Long.MinValue; var dd = 0L
      rows.sortBy(r => (r._2, r._3)).foreach { r =>
        cum += r._4
        if (cum > peak) peak = cum
        if (peak - cum > dd) dd = peak - cum
      }
      typ -> (rows.length.toLong, dd, peak, cum)
    }
    assert(got == expected)
  }

  test("t34: growth curves are monotone and the last checkpoint covers the corpus") {
    val rows = TextOps.t34VocabGrowth(spark, sf).collect()
    assert(rows.length == 10)
    val docs = rows.map(_.getLong(2)); val toks = rows.map(_.getLong(3))
    val vocab = rows.map(_.getLong(4))
    Seq(docs, toks, vocab).foreach { c =>
      assert(c.zip(c.tail).forall { case (a, b) => a <= b }, "curve must be monotone")
    }
    // decile 10 == full-corpus totals, recomputed directly
    val texts = Tables.documents(spark, sf).select("text").collect().map(_.getString(0))
    val allToks = texts.flatMap(_.trim.split("\\s+"))
    assert(docs.last == texts.length.toLong)
    assert(toks.last == allToks.length.toLong)
    assert(vocab.last == allToks.distinct.length.toLong)
  }

  test("t35: Flesch milli-score matches a direct regex recompute per doc") {
    val got = TextOps.t35Readability(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))
      .toMap
    Tables.documents(spark, sf).select("doc_id", "text").collect().foreach { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      val words = "[A-Za-z]+".r.findAllIn(text).length.toLong
      val sents = math.max(1L, "[.!?]+".r.findAllIn(text).length.toLong)
      val sylls = "[aeiouy]+".r.findAllIn(text.toLowerCase).length.toLong
      val w = math.max(1L, words)
      val fre = 206835L - (1015L * w) / sents - (84600L * sylls) / w
      val band =
        if (fre >= 90000) "very_easy" else if (fre >= 60000) "standard"
        else if (fre >= 30000) "difficult" else "very_confusing"
      assert(got(id) == ((words, sents, sylls, fre, band)), s"doc $id")
    }
  }

  test("g10: personalized rank equals an exact in-memory power iteration") {
    val got = LinkRank.g10PersonalizedRank(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ids = Tables.documents(spark, sf).select("doc_id").collect().map(_.getLong(0))
    val n = ids.length.toLong
    val edges = ids.flatMap(src => Seq(1L, 2L, 3L).map(k =>
      src -> ((src * src * 31 + k * 17) % n)))
    def step(r: Map[Long, Long]): Map[Long, Long] = {
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(e => r.getOrElse(e._1, 0L) / 3).sum
      }
      ids.map { id =>
        val seed = if (id % 50 == 0) 150000L else 0L
        id -> (seed + (850L * contrib.getOrElse(id, 0L)) / 1000L)
      }.toMap
    }
    val r0 = ids.map(id => id -> (if (id % 50 == 0) 1000000L else 0L)).toMap
    val expected = step(step(step(r0)))
    assert(got == expected)
    // personalization property: teleport mass reaches ONLY the seeds
    ids.filter(_ % 50 == 0).foreach(s => assert(got(s) >= 150000L))
  }

  test("a46: chi-square matches an exact BigInt recompute over the full grid") {
    val row = Maintenance.a46ChiSquare(spark, sf).collect().head
    val obs = Tables.events(spark, sf)
      .select(col("event_type"), expr("CAST(hour(ts) AS INT)").as("h"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    val nn = BigInt(obs.length)
    val nx = obs.groupBy(_._1).view.mapValues(v => BigInt(v.length)).toMap
    val ny = obs.groupBy(_._2).view.mapValues(v => BigInt(v.length)).toMap
    val nxy = obs.groupBy(identity).view.mapValues(v => BigInt(v.length)).toMap
    val chi2 = (for { (t, r) <- nx; (h, c) <- ny } yield {
      val o = nxy.getOrElse((t, h), BigInt(0))
      val d = nn * o - r * c
      (d * d * 1000000) / (r * c * nn)
    }).sum
    assert(row.getLong(0) == obs.length.toLong)
    assert(row.getLong(1) == nx.size.toLong && row.getLong(2) == ny.size.toLong)
    assert(row.getLong(3) == (nx.size - 1).toLong * (ny.size - 1))
    assert(BigInt(row.getLong(4)) == chi2)
  }

  test("v19: MaxSim dominates the aligned single-vector dot for every reported pair") {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val rows = Similarity.v19MaxsimTopK(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (qid, rank, cid, score) = (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))
      assert(rank >= 1 && rank <= 3 && qid % 25 == 0 && qid != cid)
      val (q, c) = (vecs(qid), vecs(cid))
      val aligned = q.indices.map(i => q(i) * c(i)).sum
      // choosing t = s in every subspace is one feasible assignment, so
      // MaxSim >= the plain full-dimension dot product
      assert(score >= aligned, s"pair ($qid,$cid): maxsim $score < aligned dot $aligned")
      // and each subspace max is a real sub-dot: recompute exactly
      val exact = (0 until 8).map { s =>
        (0 until 8).map { t =>
          (0 until 8).map(i => q(s * 8 + i) * c(t * 8 + i)).sum
        }.max
      }.sum
      assert(score == exact, s"pair ($qid,$cid)")
    }
  }

  test("a47: Welch statistics match an exact BigInt recompute of the quantized formula") {
    val row = Maintenance.a47WelchTtest(spark, sf).collect().head
    val xs = Tables.events(spark, sf)
      .filter(col("value").isNotNull && col("event_type").isin("click", "error"))
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("x"))
      .collect().map(r => (r.getString(0), BigInt(r.getLong(1))))
    val g1 = xs.filter(_._1 == "click").map(_._2)
    val g2 = xs.filter(_._1 == "error").map(_._2)
    val (n1, n2) = (BigInt(g1.length), BigInt(g2.length))
    val (s1, s2) = (g1.sum, g2.sum)
    val (q1, q2) = (g1.map(x => x * x).sum, g2.map(x => x * x).sum)
    val dNum = s1 * n2 - s2 * n1
    val dmic = if (dNum >= 0) (dNum * 1000000) / (n1 * n2)
               else -((-dNum * 1000000) / (n1 * n2))
    val v1 = (1000000 * (n1 * q1 - s1 * s1)) / (n1 * n1 * (n1 - 1))
    val v2 = (1000000 * (n2 * q2 - s2 * s2)) / (n2 * n2 * (n2 - 1))
    val (a, b) = (v1 / n1, v2 / n2)
    val t2 = (dmic * dmic) / (a + b).max(1)
    val dof = (1000 * (a + b) * (a + b)) / (a * a / (n1 - 1) + b * b / (n2 - 1)).max(1)
    assert((row.getLong(0), row.getLong(1)) == (g1.length.toLong, g2.length.toLong))
    assert(BigInt(row.getLong(2)) == dmic)
    assert(BigInt(row.getLong(3)) == a + b)
    assert(BigInt(row.getLong(4)) == t2)
    assert(BigInt(row.getLong(5)) == dof)
    // Welch dof must sit between min(n1,n2)-1 and n1+n2-2
    assert(row.getLong(5) >= 1000L * (math.min(g1.length, g2.length) - 1))
    assert(row.getLong(5) <= 1000L * (g1.length + g2.length - 2))
  }

  test("w27: breach flags match a sliding-window fold over each sorted series") {
    val got = Windows.w27BollingerBreach(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val raw = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("event_type"), unix_micros(col("ts")).as("us"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = raw.groupBy(_._1).map { case (typ, rows) =>
      val xs = rows.sortBy(r => (r._2, r._3)).map(_._4)
      val frames = xs.sliding(20).filter(_.length == 20).toSeq
      val breaches = frames.count { f =>
        val x = f.last; val s = f.sum; val q = f.map(v => v * v).sum
        (20 * x - s) * (20 * x - s) * 19 > 80 * (20 * q - s * s)
      }
      typ -> (frames.length.toLong, breaches.toLong,
        1000000L * breaches / math.max(frames.length, 1))
    }
    assert(got == expected.filter(_._2._1 > 0))
  }

  test("g11: reciprocity matches a set-based recompute; formula graph has no mutual pair unless constructed") {
    val row = LinkRank.g11Reciprocity(spark, sf).collect().head
    val ids = Tables.documents(spark, sf).select("doc_id").collect().map(_.getLong(0))
    val n = ids.length.toLong
    val raw = ids.flatMap(src => Seq(1L, 2L, 3L).map(k =>
      (src, (src * src * 31 + k * 17) % n)))
    val loops = raw.filter(e => e._1 == e._2)
    val edges = raw.filter(e => e._1 != e._2).distinct
    val eset = edges.toSet
    val recip = edges.count(e => eset.contains((e._2, e._1)))
    assert(row.getLong(0) == edges.length.toLong)
    assert(row.getLong(1) == recip.toLong)
    assert(row.getLong(2) == 1000000L * recip / edges.length)
    assert(row.getLong(3) == loops.length.toLong)
    assert(row.getLong(4) == loops.map(_._1).distinct.length.toLong)
  }

  test("t36: OOV mass matches a direct frequency-rank recompute and is anti-monotone in budget") {
    val rows = TextOps.t36VocabCoverage(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(4L, 8L, 16L, 32L, 64L))
    val oov = rows.map(_.getLong(4))
    assert(oov.zip(oov.tail).forall { case (hi, lo) => lo <= hi },
      "OOV mass must shrink as the budget grows")
    val toks = Tables.documents(spark, sf).select("text").collect()
      .flatMap(_.getString(0).trim.split("\\s+"))
    val byRank = toks.groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .map { case (t, c) => (t, c) }.sortBy { case (t, c) => (-c, t) }
    rows.foreach { r =>
      val budget = r.getLong(0).toInt
      val oovTokens = byRank.drop(budget).map(_._2).sum
      assert(r.getLong(1) == byRank.length.toLong)
      assert(r.getLong(2) == toks.length.toLong)
      assert(r.getLong(3) == math.max(byRank.length - budget, 0).toLong)
      assert(r.getLong(4) == oovTokens, s"budget $budget")
      assert(r.getLong(5) == 1000000L * oovTokens / toks.length)
    }
  }

  test("d13: sweep rows are consistent, anti-monotone, and agree with exact Jaccard at 0.7") {
    val rows = operators.Dedup.d13ThresholdSweep(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq ==
      Seq(700000L, 750000L, 800000L, 850000L, 900000L))
    val pairs = rows.map(_.getLong(1))
    assert(pairs.zip(pairs.tail).forall { case (lo, hi) => hi <= lo },
      "pair count must shrink as the threshold rises")
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1),
      "flagged docs cannot exceed qualifying pairs"))
    // exact brute-force bigram Jaccard at the 0.7 floor over the corpus
    val sets = Tables.documents(spark, sf).select("doc_id", "text").collect().map { r =>
      val ws = r.getString(1).trim.split("\\s+")
      r.getLong(0) -> ws.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSet
    }
    var exact = 0L
    for (i <- sets.indices; j <- (i + 1) until sets.length) {
      val (a, b) = (sets(i)._2, sets(j)._2)
      val inter = (a & b).size.toLong
      if (1000000L * inter / (a.size + b.size - inter) >= 700000L) exact += 1
    }
    assert(rows.head.getLong(1) == exact,
      "LSH-verified 0.7 pair count must equal brute force (recall contract)")
  }

  test("st10: dedup ledger proves duplicates existed and totals match the clean corpus") {
    val rows = graft.streaming.EventStream.st10RedeliveryDedup(spark, sf).collect()
    val clean = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val (typ, delivered, unique, cents) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(delivered > unique, s"$typ: redelivery must inflate the delivered count")
      assert((unique, cents) == clean(typ), s"$typ: dedup must restore the clean totals")
    }
  }

  test("w28: rolling cross-correlation matches a BigInt sliding recompute of joint hours") {
    val got = Windows.w28RollingCorr(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    val raw = Tables.events(spark, sf)
      .filter(col("value").isNotNull && col("event_type").isin("click", "error"))
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("hour"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def hourly(t: String) = raw.filter(_._1 == t).groupBy(_._2).view
      .mapValues(rs => Math.floorDiv(rs.map(_._3).sum, rs.length)).toMap
    val (ha, hb) = (hourly("click"), hourly("error"))
    val joint = ha.keySet.intersect(hb.keySet).toSeq.sorted
      .map(h => (h, BigInt(ha(h)), BigInt(hb(h))))
    val expected = joint.sliding(24).filter(_.length == 24).map { win =>
      val (h, _, _) = win.last
      val (sa, sb) = (win.map(_._2).sum, win.map(_._3).sum)
      val cov = 24 * win.map(w => w._2 * w._3).sum - sa * sb
      val vx = 24 * win.map(w => w._2 * w._2).sum - sa * sa
      val vy = 24 * win.map(w => w._3 * w._3).sum - sb * sb
      val mag = (1000000 * cov * cov) / (vx * vy).max(1)
      h -> (cov.toLong, vx.toLong, vy.toLong,
        (if (cov >= 0) mag else -mag).toLong)
    }.toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("a48: two-digit Benford pairs are in 10-99, ppms consistent, counts match a recompute") {
    val rows = Maintenance.a48BenfordAudit(spark, sf).collect()
    val digits = rows.map(_.getLong(0))
    assert(digits.forall(d => d >= 10L && d <= 99L))
    assert(digits.length > 50, "order totals should populate most two-digit buckets")
    val cents = Tables.orders(spark, sf)
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).collect().map(_.getLong(0))
    val n = cents.length.toLong
    val byDigit = cents.groupBy(c => c.toString.take(2).toLong).view.mapValues(_.length.toLong)
    rows.foreach { r =>
      val (d, cnt, obs, ex, dev, chi) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(cnt == byDigit(d))
      assert(obs == 1000000L * cnt / n)
      assert(BigInt(ex) == BigInt(math.floor(1e6 * math.log10(1.0 + 1.0 / d)).toLong))
      assert(dev == obs - ex)
      assert(chi == dev * dev / ex)
    }
    // second-order Benford ppms over ALL 90 pairs must sum to ~1e6
    val all = (10 to 99).map(d => math.floor(1e6 * math.log10(1.0 + 1.0 / d)).toLong).sum
    assert(Math.abs(all - 1000000L) <= 90)
  }

  test("a49: Gini matches the classic sorted-rank formula recomputed in BigInt") {
    val row = Maintenance.a49GiniConcentration(spark, sf).collect().head
    val rev = Tables.orders(spark, sf).groupBy(col("o_custkey"))
      .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT))").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sorted = rev.sortBy(r => (r._2, r._1)).map(r => BigInt(r._2))
    val n = BigInt(sorted.length)
    val t = sorted.sum
    val s = sorted.zipWithIndex.map { case (x, i) => (BigInt(i) + 1) * x }.sum
    val gini = (1000000 * (2 * s - (n + 1) * t)) / (n * t)
    assert(row.getLong(0) == sorted.length.toLong)
    assert(BigInt(row.getLong(1)) == t)
    assert(BigInt(row.getLong(2)) == gini)
    assert(row.getLong(2) > 0 && row.getLong(2) < 1000000L)
  }

  test("t37: only the planted garbage probe flags; its tracer counts are exact") {
    val rows = TextOps.t37GarbageScore(spark, sf).collect()
    val flagged = rows.filter(_.getLong(2) > 0)
    assert(flagged.map(_.getString(0)).toSeq == Seq("garbage_probe"))
    val probe = flagged.head
    val planted = Tables.documents(spark, sf)
      .filter(col("doc_id") < 30).select("text").collect().map(_.getString(0))
    assert(probe.getLong(1) == planted.length.toLong)
    assert(probe.getLong(2) == planted.length.toLong) // every probe doc flags
    val fffd = planted.map(_.take(80).count(_ == 'e').toLong).sum
    assert(probe.getLong(3) == fffd)
    assert(probe.getLong(5) == 1000000L)
  }

  test("f12: only the planted spoof probe is confusable; char counts are exact") {
    val rows = operators.Functions2.f12ConfusableAudit(spark, sf).collect()
    val spoofed = rows.filter(_.getLong(2) > 0)
    assert(spoofed.map(_.getString(0)).toSeq == Seq("spoof_probe"))
    val probe = spoofed.head
    val planted = Tables.documents(spark, sf)
      .filter(col("doc_id") < 25).select("text").collect().map(_.getString(0))
    assert(probe.getLong(1) == planted.length.toLong)
    val confusable = planted.map(_.take(100).count(c => "aeo".contains(c)).toLong).sum
    assert(probe.getLong(3) == confusable)
  }

  test("st12: CDC image equals a per-user fold and tombstoned users are absent") {
    val got = graft.streaming.EventStream.st12CdcApply(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val ops = Tables.events(spark, sf)
      .filter(col("event_type").isin("signup", "purchase", "error"))
      .select(col("user_id"), expr("unix_micros(ts)").as("us"), col("event_id"),
        col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
    val expected = ops.groupBy(_._1).flatMap { case (uid, rows) =>
      val last = rows.maxBy(r => (r._2, r._3))
      if (last._4 == "error") None
      else Some(uid -> (rows.length.toLong, last._2, last._5))
    }
    assert(got == expected)
    // tombstones must exist in the log for the filter to mean anything
    assert(expected.size < ops.groupBy(_._1).size)
  }

  test("l05: vacuum keeps exactly the live snapshot and loses no data") {
    val rows = operators.ScaleDiag.l05RetentionVacuum(spark, sf).collect()
    val direct = Tables.orders(spark, sf).groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("k"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      assert((r.getLong(1), r.getLong(2)) == direct(r.getString(0)))
      assert((r.getLong(3), r.getLong(4), r.getLong(5)) == (10L, 8L, 2L))
    }
  }

  test("io08: every codec round-trips identical checksums") {
    // sizes are codec-version/data-dependent and deliberately NOT in the
    // contract row (ADVICE r7) — they are logged, only content is pinned
    val rows = operators.Formats.io08CodecRoundtrip(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("gzip", "lz4", "none", "snappy", "zstd"))
    assert(rows.head.schema.fieldNames.toSeq ==
      Seq("codec", "n_rows", "key_sum", "cents_sum"))
    val sums = rows.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).distinct
    assert(sums.length == 1, "codec must never change content")
  }

  test("t38: divergence matches an exact ppm recompute and self-blend diverges least") {
    val got = operators.TextOps.t38SourceDivergence(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val toks = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).trim.toLowerCase.split("\\s+").map(r.getString(0) -> _))
    val cSt = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cT = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val tS = toks.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val tAll = toks.length.toLong
    val expected = cSt.keys.toSeq.groupBy(_._1).map { case (s, keys) =>
      val chi = keys.map { k =>
        val obs = 1000000L * cSt(k) / tS(s)
        val ex = 1000000L * cT(k._2) / tAll
        (obs - ex) * (obs - ex) / math.max(ex, 1L)
      }.sum
      s -> (keys.size.toLong, tS(s), chi)
    }
    assert(got == expected)
  }

  test("d14: planted template families exist; char accounting is conserved") {
    val rows = operators.Dedup.d14TemplateDedup(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // the 40 planted pairs guarantee >= 40 two-member families
    assert(rows.contains(2L) && rows(2L)._1 >= 40L)
    // singleton families reclaim nothing
    rows.get(1L).foreach { case (_, _, reclaim) => assert(reclaim == 0L) }
    // total docs across the histogram = corpus + 80 planted
    val nDocs = rows.map { case (m, (nt, _, _)) => m * nt }.sum
    assert(nDocs == Tables.documents(spark, sf).count() + 80)
  }

  test("w29: churn matches a direct per-day top-5 set recompute") {
    val got = Windows.w29TopkChurn(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val daily = Tables.events(spark, sf)
      .select(expr("unix_micros(ts) div 86400000000").as("day"), col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.map { case ((d, u), n) => (d, u, n) }
    val tops = daily.groupBy(_._1).view.mapValues(rs =>
      rs.sortBy(r => (-r._3, r._2)).take(5).map(_._2).toSet).toMap
    val expected = tops.keys.filter(d => tops.contains(d - 1)).map { d =>
      val (cur, prev) = (tops(d), tops(d - 1))
      val common = (cur & prev).size.toLong
      d -> (cur.size.toLong, prev.size.toLong, common,
        1000000L * (cur.size - common) / cur.size)
    }.toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("m13: shard manifest is contiguous, byte-conserving, and checksum-exact") {
    val rows = operators.Multimodal.m13ShardManifest(spark, sf).collect()
    val items = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), ("IMG0" + r.getString(1)).getBytes("UTF-8")))
      .sortBy(_._1)
    val totalBytes = items.map(_._2.length.toLong).sum
    assert(rows.map(_.getLong(2)).sum == totalBytes)
    // contiguity: each shard starts where byte math says it must
    rows.sortBy(_.getLong(0)).foldLeft(0L) { case (off, r) =>
      assert(r.getLong(3) == off)
      off + r.getLong(2)
    }
    // id ranges must not overlap across shards
    val ranges = rows.sortBy(_.getLong(0)).map(r => (r.getLong(4), r.getLong(5)))
    ranges.sliding(2).foreach {
      case Array((_, lastA), (firstB, _)) => assert(lastA < firstB)
      case _ =>
    }
    // checksum = xor of 60-bit md5 images, recomputed in plain Scala
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(b: Array[Byte]): Long = {
      md.reset()
      val d = md.digest(b)
      var v = 0L
      (0 until 7).foreach(i => v = (v << 8) | (d(i) & 0xffL))
      (v << 4) | ((d(7) & 0xffL) >>> 4)
    }
    var cum = 0L
    val byShard = items.map { case (id, b) =>
      val start = cum; cum += b.length; (start / 65536L, h60(b))
    }.groupBy(_._1).view.mapValues(_.map(_._2).reduce(_ ^ _)).toMap
    rows.foreach(r => assert(r.getLong(6) == byShard(r.getLong(0))))
  }

  test("v21: centroid drift matches an in-memory assignment recompute; halves conserve") {
    val rows = Similarity.v21CentroidDrift(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.round(x.toDouble * 1000)).toArray)
      .sortBy(_._1)
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val cents = vecs.filter(_._1 < 16)
    val n = vecs.length.toLong
    val assigned = vecs.map { case (id, q) =>
      val cell = cents.map { case (cid, cq) =>
        cid -> dot(q, cq).toDouble / math.sqrt(dot(q, q).toDouble * dot(cq, cq).toDouble)
      }.maxBy { case (cid, c) => (c, -cid) }._1
      (cell, id * 2 < n)
    }
    val counts = assigned.groupBy(_._1).view.mapValues { rs =>
      (rs.count(_._2).toLong, rs.count(!_._2).toLong)
    }.toMap
    val (tOld, tNew) = (counts.values.map(_._1).sum, counts.values.map(_._2).sum)
    assert(tOld + tNew == n)
    counts.foreach { case (cell, (no, nn)) =>
      val so = 1000000L * no / tOld
      val sn = 1000000L * nn / tNew
      val drift = (so - sn) * (so - sn) / math.max(so + sn, 1L)
      assert(rows(cell) == (no, nn, so, sn, drift), s"cell $cell")
    }
    assert(rows.keySet == counts.keySet)
  }

  test("a51: seasonality strength matches a BigInt ANOVA recompute at the floored means") {
    val rows = Maintenance.a51SeasonalityStrength(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val raw = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("event_type"), expr("(unix_micros(ts) div 3600000000) % 168").as("how"),
        expr("CAST(round(value * 100) AS BIGINT)").as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // FLOOR division like both engines (BigInt / truncates toward zero)
    def fdiv(a: BigInt, b: BigInt): BigInt =
      if (a.signum >= 0) a / b else -((-a + b - 1) / b)
    val expected = raw.groupBy(_._1).map { case (t, rs) =>
      val n = BigInt(rs.length)
      val s = rs.map(r => BigInt(r._3)).sum
      val q = rs.map(r => BigInt(r._3) * r._3).sum
      val m = fdiv(s, n)
      val cells = rs.groupBy(_._2).values.toSeq
      val ssb = cells.map { g =>
        val ng = BigInt(g.length); val sg = g.map(r => BigInt(r._3)).sum
        val mg = fdiv(sg, ng)
        ng * (mg - m) * (mg - m)
      }.sum
      val sst = q - 2 * m * s + n * m * m
      t -> (rs.length.toLong, cells.length.toLong,
        ((1000000 * ssb) / sst.max(1)).toLong)
    }
    assert(rows == expected)
    rows.values.foreach { case (_, cells, strength) =>
      assert(cells >= 100L && cells <= 168L)
      assert(strength >= 0L && strength <= 1010000L)
    }
  }

  test("w05: rank-identity ntile/percent_rank equals the global-window form exactly") {
    import org.apache.spark.sql.expressions.{Window => W}
    val got = Windows.w05Distribution(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val w = W.orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    val want = Tables.customer(spark, sf)
      .select(col("c_custkey"),
        ntile(10).over(w).cast("int").as("decile"),
        round(percent_rank().over(w), 6).as("pct_rank"))
      .orderBy(col("c_custkey")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
    // and the plan must contain no unpartitioned Window operator
    val plan = Windows.w05Distribution(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), "w05 must not plan a global window")
  }

  test("w05 closed form: front-loaded NTILE on cardinalities NOT divisible by k") {
    // TPC-H customer is always a multiple of 10, so the contract run can
    // never see the n mod k != 0 tiles — this property test covers every
    // residue class. SQL NTILE front-loads the oversized tiles: n=12, k=10
    // puts row 4 in tile 2 (the even-spread form ((r-1)*k) div n + 1
    // wrongly yields 3).
    import org.apache.spark.sql.expressions.{Window => W}
    import spark.implicits._
    for (n <- Seq(1, 3, 7, 10, 11, 12, 19, 57, 101)) {
      val df = (1 to n).map(_.toLong).toDF("r")
        .crossJoin(broadcast(Seq(n.toLong).toDF("n")))
      val got = df.select(col("r"),
          expr(Windows.ntileClosedForm("r", "n", 10)).as("decile"))
        .orderBy("r").collect().map(_.getInt(1)).toSeq
      val want = (1 to n).map(_.toLong).toDF("r")
        .select(col("r"), ntile(10).over(W.orderBy(col("r"))).as("decile"))
        .orderBy("r").collect().map(_.getInt(1)).toSeq
      assert(got == want, s"NTILE(10) mismatch at n=$n: got $got want $want")
    }
    // spot-check the documented divergence example directly
    assert(Seq(12L).toDF("n").crossJoin(Seq(4L).toDF("r"))
      .select(expr(Windows.ntileClosedForm("r", "n", 10)))
      .head().getInt(0) == 2)
  }

  test("g12: degree profile matches a set-based recompute; CCDF and mass are monotone") {
    val rows = LinkRank.g12DegreeProfile(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    val ids = Tables.documents(spark, sf).select("doc_id").collect().map(_.getLong(0))
    val n = ids.length.toLong
    val edges = ids.flatMap(src => Seq(1L, 2L, 3L).map(k =>
      (src, (src * src * 31 + k * 17) % n))).filter(e => e._1 != e._2).distinct
    val indeg = edges.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val degs = ids.map(i => indeg.getOrElse(i, 0L))
    val hist = degs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val totalMass = hist.map { case (d, c) => d * c }.sum
    val expected = hist.keys.toSeq.sorted.map { d =>
      val ge = hist.filter(_._1 >= d)
      d -> (hist(d), ge.values.sum,
        1000000L * ge.map { case (dd, c) => dd * c }.sum / totalMass)
    }
    assert(rows.toSeq == expected)
    // CCDF counts shrink and hub mass shrinks as the degree floor rises
    val ccdf = rows.map(_._2._2)
    assert(ccdf.zip(ccdf.tail).forall { case (a, b) => b < a })
    assert(rows.head._2._2 == n)
  }

  test("v20: RRF fusion equals an independent dense+lexical rank recompute") {
    val got = Similarity.v20RrfFusion(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // dense ranking: quantized cosine, v01 convention
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.round(x.toDouble * 1000)).toArray)
      .sortBy(_._1)
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val nrm = vecs.toMap.view.mapValues(q => dot(q, q)).toMap
    val qids = vecs.map(_._1).filter(_ % 25 == 0)
    def denseTop(q: Long): Seq[Long] = {
      val qv = vecs.toMap.apply(q)
      vecs.filter(_._1 != q).map { case (c, cv) =>
        c -> dot(qv, cv).toDouble / math.sqrt(nrm(q).toDouble * nrm(c).toDouble)
      }.sortBy { case (c, cos) => (-cos, c) }.take(10).map(_._1).toSeq
    }
    // lexical ranking: distinct word-bigram jaccard ppm, shared-bigram only
    val bgs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map { r =>
        val ws = r.getString(1).trim.split("\\s+")
        r.getLong(0) -> ws.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSet
      }.toMap
    def lexTop(q: Long): Seq[Long] =
      bgs.toSeq.filter(_._1 != q).flatMap { case (c, s) =>
        val inter = (bgs(q) & s).size.toLong
        if (inter == 0) None
        else Some(c -> 1000000L * inter / (bgs(q).size + s.size - inter))
      }.sortBy { case (c, j) => (-j, c) }.take(10).map(_._1)
    qids.foreach { q =>
      val d = denseTop(q).zipWithIndex.map { case (c, i) => c -> (i + 1L) }.toMap
      val l = lexTop(q).zipWithIndex.map { case (c, i) => c -> (i + 1L) }.toMap
      val fused = (d.keySet ++ l.keySet).toSeq.map { c =>
        val rrf = d.get(c).map(r => 1000000L / (60 + r)).getOrElse(0L) +
          l.get(c).map(r => 1000000L / (60 + r)).getOrElse(0L)
        (c, rrf)
      }.sortBy { case (c, s) => (-s, c) }.take(5)
      fused.zipWithIndex.foreach { case ((c, rrf), i) =>
        assert(got((q, i + 1)) ==
          (c, rrf, d.getOrElse(c, -1L), l.getOrElse(c, -1L)),
          s"query $q fused rank ${i + 1}")
      }
    }
  }

  test("s13: split boundaries, user counts, and warm/cold audit match a direct recompute") {
    val rows = operators.Sampling.s13TimeSplit(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (lo, hi) = (ev.map(_._2).min, ev.map(_._2).max)
    def split(us: Long): String =
      if ((us - lo) * 100 < (hi - lo) * 70) "train"
      else if ((us - lo) * 100 < (hi - lo) * 85) "val"
      else "test"
    val tagged = ev.map { case (u, us) => (split(us), u) }
    val trainUsers = tagged.filter(_._1 == "train").map(_._2).toSet
    val expected = tagged.groupBy(_._1).map { case (s, rs) =>
      val users = rs.map(_._2).distinct
      val warm = users.count(trainUsers.contains).toLong
      s -> (rs.length.toLong, users.length.toLong, warm,
        users.length - warm, 1000000L * warm / users.length)
    }
    assert(rows == expected)
    // the split must actually separate: test has cold users OR warm < all
    assert(rows("test")._2 > 0 && rows("train")._5 == 1000000L)
  }
}
