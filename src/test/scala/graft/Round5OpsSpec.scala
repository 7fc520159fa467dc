package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Functions2, LinkRank, Maintenance, Multimodal, Sampling, ScaleDiag, Similarity, Windows}

/** Invariant specs for the round-5 additions (v12, g07, a39, w19, w20,
  * w21, f11). Cross-engine value equality is the DuckDB oracle's job;
  * these pin the semantic claims the oracles can't see — recall floors,
  * brute-force re-derivations, and structural invariants.
  */
class Round5OpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("v12: binary codes round-trip the sign pattern and recall the exact top-3") {
    val got = Similarity.v12BinaryTopK(spark, sf).collect()
    assert(got.nonEmpty)
    // hamming must be consistent with a from-scratch sign comparison for
    // one spot-checked pair (qid 0, its rank-1 neighbor)
    val top = got.filter(r => r.getLong(0) == 0L && r.getInt(1) == 1).head
    val cid = top.getLong(2)
    val embs = Tables.embeddings(spark, sf)
      .filter(col("vec_id").isin(0L, cid))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val ham = embs(0L).zip(embs(cid)).count { case (a, b) => (a > 0) != (b > 0) }
    assert(top.getLong(3) == ham.toLong,
      s"packed hamming ${top.getLong(3)} != recomputed $ham")
    // measured recall@3 of the hamming-shortlist path vs the exact
    // brute-force ranking — an honest floor for this corpus, asserted
    // so a packing/shortlist regression shows up as a recall drop
    val exact = Similarity.v01CosineTopK(spark, sf).collect()
      .filter(_.getInt(1) <= 3).map(r => (r.getLong(0), r.getLong(2))).toSet
    val ours = got.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.count(ours.contains).toDouble / exact.size
    assert(recall >= 0.5, s"binary-shortlist recall@3 $recall < 0.5")
  }

  test("g07: predictions are non-edges at distance 2 with consistent scores") {
    val rows = LinkRank.g07LinkPredict(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pairs must be ordered a < b")
      assert(r.getLong(2) >= 2, "common-neighbor floor")
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000L, "jaccard ppm range")
    }
    // no predicted pair may be an existing edge of the g01 graph
    val n = Tables.documents(spark, sf).count()
    val edges = Tables.documents(spark, sf).select(col("doc_id")).collect()
      .map(_.getLong(0)).flatMap { s =>
        (1 to 3).map(k => (s, (s * s * 31 + k * 17) % n)) }
      .filter { case (a, b) => a != b }
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    rows.foreach { r =>
      assert(!edges.contains((r.getLong(0), r.getLong(1))),
        s"predicted pair (${r.getLong(0)},${r.getLong(1)}) is already an edge")
    }
  }

  test("a39: digit shares sum to ~1e6 per type and digits stay in 1..9") {
    val rows = Maintenance.a39Benford(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(1) >= 1 && r.getInt(1) <= 9))
    rows.groupBy(_.getString(0)).foreach { case (et, rs) =>
      val share = rs.map(_.getLong(4)).sum
      // floor division loses at most (digits-1) ppm units
      assert(share > 1000000L - 9 && share <= 1000000L,
        s"$et obs_ppm sums to $share")
      assert(rs.map(_.getLong(2)).sum == rs.head.getLong(3), s"$et n vs n_total")
    }
  }

  test("w19: rolling median is a frame member and shrugs off a planted spike") {
    val rows = Windows.w19RollingMedian(spark, sf).collect()
    assert(rows.nonEmpty)
    // re-derive per-user frames from the raw table and check the pick
    val raw = Tables.events(spark, sf).filter(col("value").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byUser = raw.groupBy(_._1).map { case (u, rs) =>
      u -> rs.sortBy(r => (r._2, r._3)) }
    val medians = byUser.flatMap { case (_, rs) =>
      rs.indices.map { i =>
        val frame = rs.slice(math.max(0, i - 4), i + 1).map(_._4).sorted
        rs(i)._3 -> frame((frame.length + 1) / 2 - 1)
      }
    }
    rows.foreach { r =>
      assert(r.getLong(4) == medians(r.getLong(0)),
        s"event ${r.getLong(0)}: median ${r.getLong(4)} != ${medians(r.getLong(0))}")
      assert(r.getLong(5) >= 1 && r.getLong(5) <= 5)
    }
  }

  test("w20: sweep peak equals a brute-force interval overlap count") {
    val rows = Windows.w20Concurrency(spark, sf).collect()
    assert(rows.nonEmpty)
    val iv = Tables.events(spark, sf).filter(col("value").isNotNull)
      .select(col("event_type"), unix_micros(col("ts")).as("s"),
        expr("unix_micros(ts) + (CAST(round(value * 100) AS BIGINT) div 10) * 1000000").as("e"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { r =>
      val mine = iv.filter(_._1 == r.getString(0))
      // end-exclusive: an interval is open at t iff s <= t < e
      val brute = mine.map(x => mine.count(y => y._2 <= x._2 && x._2 < y._3)).max
      assert(r.getLong(1) == brute.toLong,
        s"${r.getString(0)}: sweep says ${r.getLong(1)}, brute force $brute")
    }
  }

  test("w20/w21: the sweep and the percentile rank run on ONE hash exchange") {
    // the docstring claims: every window + the final aggregate share a
    // single hashpartitioning(event_type) exchange — pin it in the plan
    for ((name, df) <- Seq("w20" -> Windows.w20Concurrency(spark, sf),
                           "w21" -> Windows.w21LatencyPercentiles(spark, sf))) {
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val hashEx = plan.linesIterator
        .count(l => l.contains("Exchange hashpartitioning"))
      assert(hashEx == 1, s"$name expected exactly 1 hash exchange, got $hashEx:\n$plan")
    }
  }

  test("w21: nearest-rank percentiles match a sorted-array re-derivation") {
    val rows = Windows.w21LatencyPercentiles(spark, sf).collect()
    assert(rows.length >= 9, "at least 3 pcts x 3 types")
    val cents = Tables.events(spark, sf).filter(col("value").isNotNull)
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
    rows.foreach { r =>
      val xs = cents(r.getString(0))
      val idx = (r.getInt(1) * xs.length + 99) / 100
      assert(r.getLong(2) == xs(idx - 1),
        s"${r.getString(0)} p${r.getInt(1)}: ${r.getLong(2)} != ${xs(idx - 1)}")
      assert(r.getLong(3) == xs.length.toLong)
    }
  }

  test("m12: planted mismatches land in off-diagonal cells, 2% of each modality") {
    val rows = Multimodal.m12MagicSniff(spark, sf).collect()
    val n = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == n, "confusion cells must cover every doc")
    val mismatched = rows.filter(_.getBoolean(4))
    assert(mismatched.nonEmpty, "the planted corruption must surface")
    mismatched.foreach { r =>
      assert(r.getString(0) != r.getString(1))
      assert(r.getLong(3) % 50 == 0, "every planted doc_id is a multiple of 50")
    }
    // diagonal + off-diagonal per declared modality must reconstruct n/3-ish
    val byDecl = rows.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum)
    byDecl.foreach { case (_, c) => assert(math.abs(c - n / 3) <= 2) }
  }

  test("a40: gini matches a direct rational computation and orders dispersion") {
    val rows = Maintenance.a40Gini(spark, sf).collect()
    assert(rows.nonEmpty)
    val cents = Tables.events(spark, sf).filter(col("value").isNotNull)
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1))).filter(_._2 >= 0)
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    rows.foreach { r =>
      val xs = cents(r.getString(0))
      val n = BigInt(xs.length); val s = xs.map(BigInt(_)).sum
      val ixs = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
      val want = (BigInt(1000000) * (2 * ixs - (n + 1) * s)) / (n * s)
      assert(BigInt(r.getLong(3)) == want,
        s"${r.getString(0)}: gini ${r.getLong(3)} != $want")
      assert(r.getLong(3) >= 0 && r.getLong(3) < 1000000)
    }
  }

  test("l03: clustered layout prunes to 1 file per probe, arrival cannot") {
    val rows = ScaleDiag.l03SkippingAudit(spark, sf).collect()
    assert(rows.length == 24, "2 layouts x 12 probes")
    val clustered = rows.filter(_.getString(0) == "clustered")
    assert(clustered.forall(_.getLong(2) == 1L),
      "equal-width day bins must pin every point probe to exactly one file")
    val arrival = rows.filter(_.getString(0) == "arrival")
    // interior probes see every file under the hash layout
    assert(arrival.map(_.getLong(2)).max == arrival.head.getLong(3),
      "arrival layout must force a full-file fan-out somewhere")
    rows.foreach(r => assert(r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(3)))
  }

  test("s10: grouped split leaks zero users, row split leaks, rows conserve") {
    val rows = Sampling.s10GroupSplit(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val byUser = rows("by_user"); val byEvent = rows("by_event")
    assert(byUser.getLong(4) == 0L, "grouped split must never leak a user")
    assert(byEvent.getLong(4) > 0L, "row-level split must demonstrate leakage")
    val n = Tables.events(spark, sf).count()
    Seq(byUser, byEvent).foreach { r =>
      assert(r.getLong(2) == n, "every event lands in exactly one side")
      assert(r.getLong(3) > 0 && r.getLong(3) < r.getLong(2), "both sides non-empty")
    }
  }

  test("w22: dyadic EWMA equals a direct per-user replay") {
    val rows = Windows.w22Ewma(spark, sf).collect()
    assert(rows.nonEmpty)
    val raw = Tables.events(spark, sf).filter(col("value").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expect = raw.groupBy(_._1).flatMap { case (_, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._3))
      sorted.indices.map { i =>
        val frame = sorted.slice(math.max(0, i - 15), i + 1).map(_._4)
        val wsum = frame.zipWithIndex.map { case (x, j) => x << j }.sum
        sorted(i)._3 -> ((wsum, (1L << frame.length) - 1))
      }
    }
    rows.foreach { r =>
      val (wsum, wtotal) = expect(r.getLong(0))
      assert(r.getLong(4) == wsum && r.getLong(5) == wtotal,
        s"event ${r.getLong(0)}: (${r.getLong(4)},${r.getLong(5)}) != ($wsum,$wtotal)")
      assert(r.getLong(6) == 1000 * wsum / wtotal)
    }
  }

  test("j18: point-in-time join matches every event to exactly one version") {
    val rows = operators.Joins.j18Scd2Join(spark, sf).collect()
    val matched = rows.map(_.getLong(2)).sum
    val total = Tables.events(spark, sf).filter(col("value").isNotNull).count()
    assert(matched == total,
      s"PIT join must cover each event once: $matched != $total")
    // validity intervals tile the timeline per user, so the plan keeps
    // an equi-key hash join — never a nested-loop over intervals
    val df = operators.Joins.j18Scd2Join(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"interval join degenerated to a nested loop:\n$plan")
  }

  test("io07: sink commit leaves only final part files; overwrite replaces them") {
    val dir = util.Scratch.dir("lines_sink_spec_")
    val df = Tables.documents(spark, sf).limit(50)
      .select(concat(col("doc_id").cast("string"), lit("\t"), col("text")).as("line"))
    df.repartition(3).write.format("graft-lines").mode("overwrite").save(dir)
    // ignore dot-files: the local ChecksumFileSystem adds .crc siblings,
    // and the reader skips ./_ prefixes by contract
    def files() = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted.toSeq
    val first = files()
    val partName = "part-\\d{5}-[0-9a-f]{8}\\.txt"
    assert(first.nonEmpty && first.forall(_.matches(partName)),
      s"only committed part files may remain: $first")
    // a second overwrite with different parallelism must fully replace
    df.repartition(2).write.format("graft-lines").mode("overwrite").save(dir)
    val second = files()
    assert(second.length == 2 && second.forall(_.matches(partName)),
      s"overwrite must truncate the old layout: $second")
    // content survives the round trip regardless of topology
    val back = spark.read.format("graft-lines").load(dir).count()
    assert(back == 50L)
    // append into the non-empty directory: job-unique names mean no
    // rename collision — commit is all-or-nothing, content accumulates
    df.repartition(2).write.format("graft-lines").mode("append").save(dir)
    val third = files()
    assert(third.length == 4 && third.forall(_.matches(partName)),
      s"append must add files without clobbering: $third")
    assert(spark.read.format("graft-lines").load(dir).count() == 100L)
  }

  test("j19: bucketed fan-out estimate equals the actual self-join row count") {
    val rows = operators.Joins.j19FanoutAudit(spark, sf).collect()
    val estimated = rows.map(_.getLong(2)).sum
    val li = Tables.lineitem(spark, sf).select(col("l_partkey"))
    val actual = li.as("a").join(li.as("b"),
      col("a.l_partkey") === col("b.l_partkey")).count()
    assert(estimated == actual,
      s"fan-out audit priced $estimated rows, the join produced $actual")
  }

  test("st09/t29: sweep curves are monotone in their thresholds") {
    // more watermark → fewer drops; higher surprisal cutoff → more kept
    val late = streaming.EventStream.st09LatenessAudit(spark, sf).collect()
      .groupBy(_.getString(0))
    late.foreach { case (et, rs) =>
      val curve = rs.sortBy(_.getLong(1)).map(_.getLong(2))
      assert(curve.zip(curve.tail).forall { case (a, b) => a >= b },
        s"$et: drop counts must not increase with watermark: ${curve.toSeq}")
    }
    val kept = operators.TextOps.t29PplThresholdSweep(spark, sf).collect()
      .groupBy(_.getString(0))
    kept.foreach { case (lang, rs) =>
      val curve = rs.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(curve.zip(curve.tail).forall { case (a, b) => a <= b },
        s"$lang: retention must not decrease with threshold: ${curve.toSeq}")
    }
  }

  test("g09: assortativity is a valid correlation and its pieces agree") {
    val r = LinkRank.g09Assortativity(spark, sf).collect().head
    val (num, den, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
    assert(den > 0, "variance denominator must be positive")
    assert(math.abs(ppm) <= 1000000L, s"correlation out of range: $ppm")
    // sign-aware floor: |ppm| == (1e6*|num|) / den exactly
    assert(math.abs(ppm) == (BigInt(1000000) * BigInt(num).abs / BigInt(den)).toLong)
    assert((ppm >= 0) == (num >= 0))
  }

  test("d11: survivor accounting conserves docs and components") {
    val rows = operators.Components.d11SourceDedupMix(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1), "kept docs cannot exceed docs")
      assert(r.getLong(4) <= r.getLong(2), "kept tokens cannot exceed tokens")
    }
    val totalKept = rows.map(_.getLong(3)).sum
    val nComponents = operators.Components.d06CcClusters(spark, sf)
      .select(col("component_id")).distinct().count()
    val nDocs = Tables.documents(spark, sf).count()
    val nClustered = operators.Components.d06CcClusters(spark, sf).count()
    // every component elects exactly one survivor; singletons keep themselves
    assert(totalKept == nComponents + (nDocs - nClustered),
      s"$totalKept survivors vs $nComponents components + ${nDocs - nClustered} singletons")
  }

  test("f11: bucket counts conserve tokens and signs bound the counts") {
    val rows = Functions2.f11FeatureHash(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) < 64, "bucket range")
      val n = r.getLong(2); val s = r.getLong(3)
      assert(math.abs(s) <= n && (((n - s) % 2) == 0),
        s"signed sum $s incompatible with count $n")
    }
    val perDoc = rows.groupBy(_.getLong(0)).map { case (d, rs) => d -> rs.map(_.getLong(2)).sum }
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("nt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    perDoc.foreach { case (d, n) =>
      assert(n == toks(d), s"doc $d: hashed $n tokens, raw has ${toks(d)}")
    }
  }
}
