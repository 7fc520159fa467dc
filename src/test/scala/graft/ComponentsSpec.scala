package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Components, Dedup}

class ComponentsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("connectedComponents labels a 5-chain (diameter forces multiple rounds)") {
    import spark.implicits._
    // 1-2-3 chain, isolated pair, and a 5-chain 20..24 whose min label
    // needs >1 propagation round to reach the far end — proves the loop
    // actually iterates to a fixed point rather than stopping after one
    // neighbour hop.
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 23L), (23L, 24L)).toDF("ida", "idb")
    val got = Components.connectedComponents(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Set(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (10L, 10L, 2L), (11L, 10L, 2L),
      (20L, 20L, 5L), (21L, 20L, 5L), (22L, 20L, 5L),
      (23L, 20L, 5L), (24L, 20L, 5L))
    assert(got === want)
  }

  test("d06: components cover the d03 pair graph with min-id labels") {
    val pairs = Dedup.d03NgramJaccard(spark, sf)
      .select(col("ida"), col("idb"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "corpus must contain near-dup pairs")
    val comp = Components.d06CcClusters(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // every edge endpoint is labelled, endpoints agree, and the label is
    // the min doc_id of its member set
    pairs.foreach { case (a, b) =>
      assert(comp.contains(a) && comp.contains(b), s"missing node from ($a,$b)")
      assert(comp(a)._1 === comp(b)._1, s"edge ($a,$b) crosses components")
    }
    val byComp = comp.groupBy(_._2._1)
    byComp.foreach { case (cid, members) =>
      assert(members.keys.min === cid, s"component $cid label is not the min member")
      val sizes = members.values.map(_._2).toSet
      assert(sizes === Set(members.size.toLong),
        s"component $cid reports sizes $sizes for ${members.size} members")
    }
    // and the labelling matches a driver-side union-find ground truth
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    comp.foreach { case (node, (cid, _)) =>
      assert(find(node) === cid, s"node $node: spark=$cid union-find=${find(node)}")
    }
  }

  test("g04: recursive-CTE hop distances == driver-side BFS") {
    import SparkTestSession._
    val out = operators.Components.g04ContaminationSpread(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = operators.Dedup.d09FuzzyPairs(spark, sf)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val seeds = Tables.customer(spark, sf).select("c_custkey").collect()
      .map(_.getLong(0)).filter(_ % 100 == 0)
    // plain BFS to depth 2
    val dist = scala.collection.mutable.Map(seeds.map(_ -> 0L): _*)
    var frontier = seeds.toSet
    for (d <- 1L to 2L) {
      frontier = frontier.flatMap(n => adj.getOrElse(n, Array.empty[Long]))
        .filterNot(dist.contains)
      frontier.foreach(n => dist(n) = d)
    }
    assert(out === dist.toMap)
    // the recursion must actually stratify: at least seeds + one hop
    assert(out.values.toSet.contains(0L))
    assert(out.values.exists(_ > 0L), "no spread beyond seeds — graph/seed mismatch")
  }
}
