package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Sampling, Similarity, TextOps}

class Round6OpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("t33: winnowing guarantee — a shared substring of length >= k+w-1 shares a fingerprint") {
    import spark.implicits._
    // two documents that agree ONLY on one 20-char substring
    // (>= k+w-1 = 12, so winnowing MUST select a common fingerprint)
    val shared = "the quick brown fox!"
    val a = "zzzzqqqqwwwweeeerrrr" + shared + "ttttyyyyuuuuiiiioooo"
    val b = "mmmmnnnnbbbbvvvvcccc" + shared + "xxxxddddffffgggghhhh"
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val fps = TextOps.winnow(docs).select($"doc_id", $"fps").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty,
      "winnowing guarantee violated: no shared fingerprint for a 20-char shared substring")
    // and two documents with NO shared 5-gram share no fingerprint
    val c = "aaaabbbbccccddddeeee"
    val d = "ffffgggghhhhiiiijjjj"
    val fp2 = TextOps.winnow(Seq((1L, c), (2L, d)).toDF("doc_id", "text"))
      .select($"doc_id", $"fps").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fp2(1L) & fp2(2L)).isEmpty, "disjoint texts must not share fingerprints")
  }

  test("t33: selection density stays in the winnowing band") {
    val rows = TextOps.t33Winnowing(spark, sf).collect()
    // theoretical density for random text is 2/(w+1) ~ 222k ppm;
    // repeated n-grams (array_distinct) pull real text below it
    rows.foreach { r =>
      val d = r.getLong(4)
      assert(d > 50000 && d <= 400000, s"doc ${r.getLong(0)} density $d ppm out of band")
    }
  }

  test("s12: quotas are an exact Hamilton apportionment of the budget, sqrt-tempered") {
    val rows = Sampling.s12TemperatureMix(spark, sf).collect()
    val quotaSum = rows.map(_.getLong(2)).sum
    assert(quotaSum == 500L, s"quotas must sum exactly to the budget, got $quotaSum")
    rows.foreach { r =>
      assert(r.getLong(3) == math.min(r.getLong(2), r.getLong(1)),
        s"kept must be min(quota, n_docs) for ${r.getString(0)}")
    }
    // temperature property: vs PROPORTIONAL shares, sqrt weighting gives
    // the smallest source at least the share the largest loses
    val n = rows.map(_.getLong(1))
    val q = rows.map(_.getLong(2))
    if (n.max > n.min) {
      val iMin = n.indexOf(n.min); val iMax = n.indexOf(n.max)
      val totN = n.sum.toDouble
      assert(q(iMin) / 500.0 >= n(iMin) / totN - 1e-9,
        "temperature sampling must not give a small source less than proportional")
      assert(q(iMax) / 500.0 <= n(iMax) / totN + 1e-9,
        "temperature sampling must not give the largest source more than proportional")
    }
  }

  test("v18: funnel shape contract + recall beats random by an order of magnitude") {
    val out = Similarity.v18IvfPqRerank(spark, sf).collect()
    out.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3), s"ranks for $qid")
      val cs = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (x, y) => x >= y }, s"cosine order for $qid")
    }
    val exact = Similarity.v01CosineTopK(spark, sf)
      .filter(col("rank") <= 3).select(col("qid"), col("neighbor_id"))
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val got = out.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    // every query that reaches the funnel answers; cell misses may drop
    // a query entirely only if its probed cells are empty (can't happen:
    // the query itself is a member), so the query sets must match
    assert(got.keySet == exact.keySet, "query sets differ")
    val mean = exact.map { case (qid, e) => (e & got(qid)).size.toDouble / e.size }
      .sum / exact.size
    info(s"v18 funnel recall@3 vs exact: $mean")
    assert(mean > 0.05, s"IVF-PQ recall $mean indistinguishable from random")
  }

  test("a45: uniform categorical entropy lands at ln(k) in micro-nats") {
    val rows = operators.Maintenance.a45EntropyProfile(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // event_type is uniform-ish over its distinct values: H should sit
    // within a few percent of ln(k)
    val (n, k, ent) = rows("events.event_type")
    val h = ent.toDouble / (n * 1e6)
    val lnK = math.log(k.toDouble)
    assert(h <= lnK + 1e-9, s"entropy $h cannot exceed ln(k)=$lnK")
    assert(h > 0.9 * lnK, s"event_type should be near-uniform: H=$h ln(k)=$lnK")
    // a constant column has zero entropy contribution; all entropies non-negative
    rows.values.foreach { case (_, _, e) => assert(e >= 0L, "negative entropy") }
  }
}
