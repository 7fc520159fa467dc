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
}
