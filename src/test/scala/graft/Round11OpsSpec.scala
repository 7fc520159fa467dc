package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Round-11 additions: the d19 LSH layout chooser and d01's re-tuned
  * band route. Derivations are pure JVM — signatures, bands, candidate
  * sets and exact Jaccard recomputed from raw text with MessageDigest
  * and plain collections, no Spark expressions shared with the
  * implementation.
  */
class Round11OpsSpec extends AnyFunSuite {
  import SparkTestSession._

  private val P = 2038074743L
  private val coeffs: IndexedSeq[(Long, Long)] = {
    // the engine-neutral seed-42 family (Dedup.minhashCoeffs's public
    // construction), re-derived here rather than imported
    val rng = new scala.util.Random(42)
    IndexedSeq.fill(60)((1L + rng.nextInt((P - 1).toInt), rng.nextInt(P.toInt).toLong))
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def shingleSet(text: String): Set[Long] = {
    val n = math.max(1, text.length - 4)
    (1 to n).map { i =>
      java.lang.Long.parseLong(
        md5Hex(text.substring(i - 1, math.min(i - 1 + 5, text.length))).take(15), 16)
    }.toSet
  }

  private def signature(hs: Set[Long]): IndexedSeq[Long] =
    coeffs.map { case (a, b) => hs.map(h => (a * (h % P) + b) % P).min }

  test("d19: every layout row matches a pure-JVM replay (signatures, bands, truth)") {
    val got = Dedup.d19LshRetune(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap

    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sets = docs.map { case (id, t) => id -> shingleSet(t) }.toMap
    val sigs = sets.map { case (id, hs) => id -> signature(hs) }
    def inSample(id: Long): Boolean = id % 10 == 0 && id < 500
    val sample = docs.map(_._1).filter(inSample).sorted

    // exact truth: sample-vs-all pairs at hash-set Jaccard >= 0.8,
    // with each pair's exact jaccard (the floor feeds the chooser rule)
    val truthJac: Map[(Long, Long), Double] = (for {
      s <- sample; (o, _) <- docs; if o != s
      if !inSample(o) || o > s
      a = sets(s); b = sets(o)
      inter = (a & b).size
      if inter * 5 >= (a.size + b.size - inter) * 4
    } yield (math.min(s, o), math.max(s, o)) ->
        inter.toDouble / (a.size + b.size - inter)).toMap
    val truth = truthJac.keySet

    Seq(3, 4, 5, 6, 10, 12).foreach { r =>
      val nB = 60 / r
      def bands(id: Long): Seq[String] = (0 until nB).map { bi =>
        (bi +: (0 until r).map(j => sigs(id)(bi * r + j))).mkString(",")
      }
      val bandIndex = docs.map(_._1).flatMap(id => bands(id).map(_ -> id))
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val cands = (for {
        s <- sample; bk <- bands(s); o <- bandIndex(bk); if o != s
      } yield (math.min(s, o), math.max(s, o))).toSet
      val caught = truth.count(cands)
      val (nTrue, nCaught, nCand, _) = got(r)
      assert(nTrue == truth.size.toLong, s"r=$r n_true: $nTrue vs ${truth.size}")
      assert(nCaught == caught.toLong, s"r=$r n_caught: $nCaught vs $caught")
      assert(nCand == cands.size.toLong, s"r=$r n_candidates: $nCand vs ${cands.size}")
    }
    // the chosen layout: LARGEST r with full sample coverage AND
    // analytic miss <= 1e-3 at the observed true-pair floor under the
    // 5% finite-sample shrinkage (the two-layer rule); the stored
    // default r=5 when no truth exists
    val chosen = got.collect { case (r, (_, _, _, true)) => r }
    val floor = if (truthJac.isEmpty) 0.0 else truthJac.values.min
    val eligible = got.collect {
      case (r, (t, c, _, _))
        if t == c && ((t > 0 &&
            math.pow(1.0 - math.pow(floor * 0.95, r), 60 / r) <= 0.001) ||
          (t == 0 && r == 5)) => r
    }
    val want2 = if (eligible.nonEmpty) eligible.max else 5
    assert(chosen.size == 1 && chosen.head == want2,
      s"chosen=$chosen eligible=$eligible floor=$floor")
    // candidate volume is why the chooser exists: the chosen layout must
    // not generate more candidates than the stored 12x5 default
    assert(got(chosen.head)._3 <= got(5)._3)
    // the analytic layer is LOAD-BEARING on this corpus: some fully-
    // covering layout must be rejected by the floor bound alone
    val coverOnly = got.collect { case (r, (t, c, _, _)) if t == c && t > 0 => r }
    assert(coverOnly.nonEmpty && coverOnly.max > want2,
      s"analytic bound rejected nothing (coverOnly=$coverOnly chosen=$want2)")
  }

  test("d01 re-tuned route: candidates re-banded at the chosen r reproduce d01's values exactly") {
    val chosen = Dedup.d19LshRetune(spark, sf).collect()
      .find(_.getBoolean(5)).get.getInt(0)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq
    val stored = rows(Dedup.d01MinHashLsh(spark, sf))
    val retuned = rows(Dedup.d01MinHashLsh(spark, sf, rowsPerBand = chosen))
    assert(retuned == stored,
      s"re-tuned r=$chosen near-dup pairs diverge from the stored 12x5 layout")
  }
}
