package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior specs for the graph / sampling / retrieval operators added
  * after the r03 snapshot (g02, s09, t17, v06, w10, io05) — each checked
  * against an independent in-memory brute-force recomputation, the
  * invariant the DuckDB oracle proves only end-to-end.
  */
class GraphSamplingSpec extends AnyFunSuite {
  import SparkTestSession._

  private val sf001 = "/root/testdata/sf0.01"

  test("g02: triangle census matches an in-memory brute force of the same graph") {
    val ids = Tables.documents(spark, sf).select(col("doc_id")).collect()
      .map(_.getLong(0))
    val n = ids.length.toLong
    val edges = ids.toSeq.flatMap { src =>
      (1 to 3).map(k => (src, (src * src * 31 + k * 17) % n))
    }.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toSet
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      .withDefaultValue(Set.empty[Long])
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val wedges = deg.values.map(d => d * (d - 1) / 2).sum
    val triangles = edges.toSeq.map { case (a, b) =>
      (adj(a) - b).count(c => b < c && edges.contains((b, c)))
    }.sum.toLong
    val row = operators.LinkRank.g02TriangleCount(spark, sf).collect().head
    assert(row.getLong(0) == deg.size, "n_nodes")
    assert(row.getLong(1) == edges.size, "n_edges")
    assert(row.getLong(2) == wedges, "n_wedges")
    assert(row.getLong(3) == triangles, "n_triangles")
    assert(row.getLong(4) == (if (wedges > 0) 1000000L * 3 * triangles / wedges else 0L))
  }

  test("g05: two HITS rounds match an in-memory brute force, hubs != authorities") {
    val ids = Tables.documents(spark, sf).select(col("doc_id")).collect()
      .map(_.getLong(0)).sorted
    val n = ids.length.toLong
    val edges = ids.toSeq.flatMap { src =>
      (1 to 3).map(k => (src, (src * src * 31 + k * 17) % n))
    } // multiset, self-loops kept — same convention as g01
    def push(scores: Map[Long, Long], hubPass: Boolean): Map[Long, Long] = {
      val raw = ids.map { v =>
        v -> edges.collect {
          case (s, d) if hubPass && s == v => scores(d)
          case (s, d) if !hubPass && d == v => scores(s)
        }.sum
      }.toMap
      val tot = raw.values.sum
      raw.map { case (k, v) => k -> v * 1000000L / tot }
    }
    val h0 = ids.map(_ -> 1000000L).toMap
    val a1 = push(h0, hubPass = false)
    val h1 = push(a1, hubPass = true)
    val a2 = push(h1, hubPass = false)
    val h2 = push(a2, hubPass = true)
    val got = operators.LinkRank.g05Hits(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq === ids.toSeq)
    got.foreach { case (id, hub, auth) =>
      assert(hub === h2(id), s"hub mismatch at $id")
      assert(auth === a2(id), s"auth mismatch at $id")
    }
    // the split must carry signal: the two rankings cannot coincide
    assert(got.exists { case (_, hub, auth) => hub != auth },
      "hub and authority scores identical everywhere — degenerate graph")
  }

  test("g06: unrolled peeling matches a sequential k-core and hits the fixpoint") {
    val ids = Tables.documents(spark, sf).select(col("doc_id")).collect()
      .map(_.getLong(0)).sorted
    val n = ids.length.toLong
    val edges = ids.toSeq.flatMap { src =>
      (1 to 3).map(kk => (src, (src * src * 31 + kk * 17) % n))
    }.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    def degs(alive: Set[Long]): Map[Long, Int] =
      edges.filter { case (a, b) => alive(a) && alive(b) }
        .flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (v, o) => v -> o.size }
    val k = 4
    var alive = ids.toSet
    val rounds = (1 to 3).map { _ =>
      val d = degs(alive); alive = alive.filter(v => d.getOrElse(v, 0) >= k); alive
    }
    val deg0 = degs(ids.toSet)
    val got = operators.LinkRank.g06KCore(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getBoolean(3)))
    assert(got.map(_._1).toSeq === ids.toSeq)
    got.foreach { case (id, d0, surv, core) =>
      assert(d0 === deg0.getOrElse(id, 0).toLong, s"deg0 at $id")
      assert(surv === rounds.count(_(id)), s"survived at $id")
      assert(core === rounds(2)(id), s"in_core at $id")
    }
    // non-degenerate: peeling removed someone, a core remains, and the
    // third round reached the fixpoint (so in_core is the true 4-core)
    assert(rounds(0).size < ids.length && rounds(2).nonEmpty)
    val d3 = degs(rounds(2))
    assert(rounds(2).forall(v => d3.getOrElse(v, 0) >= k),
      "round 3 did not converge — in_core would be a truncation artifact")
  }

  test("s09: picks are exactly the k smallest integer priorities per stratum") {
    val docs = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("source"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = docs.groupBy(_._2).toSeq.flatMap { case (src, rows) =>
      rows.map { case (id, _, w) =>
        (src, (id * 48271L % 2147483647L) * 1000000L / math.max(w, 1L), id)
      }.sortBy(t => (t._2, t._3)).take(10).zipWithIndex
        .map { case ((s, _, id), i) => (s, i + 1L, id) }
    }.toSet
    val got = operators.Sampling.s09WeightedSample(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    // heavier docs must be overrepresented relative to uniform: the mean
    // n_chars of the sample exceeds the corpus mean (weights ARE n_chars)
    val sampleIds = got.map(_._3)
    val byId = docs.map(d => d._1 -> d._3).toMap
    val sampleMean = sampleIds.toSeq.map(byId).sum.toDouble / sampleIds.size
    val corpusMean = docs.map(_._3).sum.toDouble / docs.length
    assert(sampleMean > corpusMean,
      s"weighted sample not length-biased: $sampleMean <= $corpusMean")
  }

  test("t17: bigram top-20 equals an in-memory count with the same tie-break") {
    val texts = Tables.documents(spark, sf001).select(col("text")).collect()
      .map(_.getString(0))
    val counts = collection.mutable.Map.empty[String, Long]
    texts.foreach { t =>
      val ws = t.trim.toLowerCase.split("\\s+")
      ws.sliding(2).filter(_.length == 2)
        .foreach(p => counts(p.mkString(" ")) = counts.getOrElse(p.mkString(" "), 0L) + 1)
    }
    val want = counts.toSeq.sortBy { case (b, c) => (-c, b) }.take(20)
    val got = operators.TextOps.t17NgramTopK(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
  }

  test("v06: inner-product ranking matches brute force and is magnitude-sensitive") {
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray
        .map(x => math.round(x.toDouble * 1000))))
    val got = operators.Similarity.v06MipsTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    got.groupBy(_._1).foreach { case (qid, rows) =>
      val q = vecs.find(_._1 == qid).get._2
      val want = vecs.filter(_._1 != qid)
        .map { case (cid, v) => (cid, q.zip(v).map { case (a, b) => a * b }.sum) }
        .sortBy { case (cid, d) => (-d, cid) }.take(5)
      assert(rows.sortBy(_._2).map(r => (r._3, r._4)).toSeq == want.toSeq,
        s"qid $qid MIPS ranking")
    }
  }

  test("w10: filled value equals the latest non-view reading at or before each event") {
    val rows = operators.Windows.w10LocfFill(spark, sf).collect()
    val events = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    val byUser = events.groupBy(_._2)
    rows.foreach { r =>
      val (eid, uid, us) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val prior = byUser(uid)
        .filter(e => (e._3 < us || (e._3 == us && e._1 <= eid)) && e._4 != "view")
        .sortBy(e => (e._3, e._1)).lastOption
      prior match {
        case Some(e) => assert(!r.isNullAt(3) && r.getDouble(3) == e._5, s"event $eid")
        case None    => assert(r.isNullAt(3), s"event $eid should be unfilled")
      }
      // was_gap marks exactly the filled 'view' rows
      val isView = events.find(_._1 == eid).get._4 == "view"
      assert(r.getBoolean(4) == (isView && !r.isNullAt(3)), s"was_gap of $eid")
    }
  }

  test("io05: backfill read prunes partitions and touches only the target day") {
    val df = operators.Formats.io05PartitionOverwrite(spark, sf)
    val got = df.collect().map(r => (r.getString(0), r.getLong(2))).toMap
    val base = Tables.events(spark, sf)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("c"),
           count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    base.foreach { case (day, cents, n) =>
      val want = if (day == "2024-01-15") cents + 7L * n else cents
      assert(got(day) == want, s"day $day")
    }
    // and a filtered read over the written layout must prune directories
    val out = graft.util.Scratch.dir("graft_io05_spec_")
    Tables.events(spark, sf)
      .select(col("event_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .write.mode("overwrite").partitionBy("day").parquet(out)
    val pruned = spark.read.parquet(out).filter(col("day") === "2024-01-15")
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(scan.contains("PartitionFilters: [isnotnull(day"),
      s"partition filter not pushed:\n$scan")
  }
}
