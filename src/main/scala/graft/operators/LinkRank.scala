package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Link-graph authority scoring — the web-graph quality signal corpus
  * curation pipelines weight documents by (OPIC / PageRank-family
  * centrality over the crawl graph). The engine contributes the
  * distributed shape: a rank table iterated through join + aggregate
  * rounds against an edge table.
  */
object LinkRank {

  /** The deterministic synthetic link graph's RAW directed edge rows —
    * (src, dst) with multiplicity and self-loops intact: every doc
    * links to (src²·31 + 17k) mod N for k ∈ {1, 2, 3}. This is the ONE
    * builder all the graph operators derive from (each applies its own
    * loop/dedup/orientation policy on top), and the one place to widen
    * the arithmetic if doc ids ever approach the src²·31 int64 ceiling
    * (~5.4·10⁸ ids).
    */
  private def rawLinkEdges(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val n = docs.agg(count(lit(1)).as("n"))
    docs.crossJoin(broadcast(n))
      .select(col("doc_id").as("src"),
        explode(expr("array(1, 2, 3)")).as("k"), col("n"))
      .select(col("src"),
        ((col("src") * col("src") * 31 + col("k") * 17) % col("n")).as("dst"))
  }


  /** g01 — three damped power-iteration steps over a deterministic
    * synthetic link graph (each doc links to `(id²·31 + 17k) mod N`,
    * k=1..3 — in-query generation, same convention as d04's planted
    * rows; the quadratic map makes in-degrees non-uniform, so ranks
    * actually differentiate — a linear map is a permutation per k and
    * every rank collapses to the same value). All arithmetic is scaled-integer (micro-rank units) with
    * floor division, so every engine computes bit-identical ranks:
    * r₀ = 1e6; rᵢ₊₁(v) = 150000 + (850 · Σ_{u→v} (rᵢ(u) div 3)) div 1000.
    *
    * Scale shape: the edge table shuffles once per iteration on dst (the
    * same partitioning every round — at cluster scale pre-partition both
    * tables by node and the join becomes exchange-free), contributions
    * pre-divide at the source so the aggregate is a plain partial+final
    * sum, and dangling/no-inlink nodes rejoin via a left join against
    * the node table. A fixed iteration count keeps the whole thing ONE
    * lazy plan — no driver loop, no actions — which is why convergence
    * isn't tested here (d06 demonstrates the loop-to-fixpoint pattern).
    */
  def g01LinkRank(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val n = docs.agg(count(lit(1)).as("n"))
    val edges = rawLinkEdges(spark, dir)
    def step(ranks: DataFrame): DataFrame = {
      val contrib = edges.join(ranks, edges("src") === ranks("node"))
        .groupBy(col("dst")).agg(sum(expr("r div 3")).as("s"))
      docs.join(contrib, docs("doc_id") === contrib("dst"), "left")
        .select(col("doc_id").as("node"),
          (lit(150000L) + expr("coalesce((850 * s) div 1000, CAST(0 AS BIGINT))")).as("r"))
    }
    val r0 = docs.select(col("doc_id").as("node"), lit(1000000L).as("r"))
    step(step(step(r0)))
      .select(col("node").as("doc_id"), col("r").as("rank_micro"))
      .orderBy(col("doc_id"))
  }

  private val g01Sql =
    """WITH n AS (SELECT COUNT(*) n FROM documents),
      |e AS (
      |  SELECT doc_id src, (doc_id * doc_id * 31 + k * 17) % n.n dst
      |  FROM documents CROSS JOIN n, (SELECT unnest([1, 2, 3]) k)),
      |r0 AS (SELECT doc_id node, CAST(1000000 AS BIGINT) r FROM documents),
      |r1 AS (
      |  SELECT d.doc_id node,
      |    150000 + COALESCE((850 * s) // 1000, 0) r
      |  FROM documents d LEFT JOIN (
      |    SELECT dst, SUM(r // 3) s FROM e JOIN r0 ON e.src = r0.node GROUP BY dst) c
      |  ON d.doc_id = c.dst),
      |r2 AS (
      |  SELECT d.doc_id node,
      |    150000 + COALESCE((850 * s) // 1000, 0) r
      |  FROM documents d LEFT JOIN (
      |    SELECT dst, SUM(r // 3) s FROM e JOIN r1 ON e.src = r1.node GROUP BY dst) c
      |  ON d.doc_id = c.dst),
      |r3 AS (
      |  SELECT d.doc_id node,
      |    150000 + COALESCE((850 * s) // 1000, 0) r
      |  FROM documents d LEFT JOIN (
      |    SELECT dst, SUM(r // 3) s FROM e JOIN r2 ON e.src = r2.node GROUP BY dst) c
      |  ON d.doc_id = c.dst)
      |SELECT node AS doc_id, CAST(r AS BIGINT) AS rank_micro
      |FROM r3 ORDER BY doc_id""".stripMargin

  /** g02 — triangle census over the same deterministic link graph as
    * g01 (undirected form: id-normalized, self-loops dropped, distinct).
    * Triangles + wedge counts give global transitivity — the
    * link-farm / spam-cluster signal crawl curation reads next to
    * PageRank.
    *
    * The Spark plan uses DEGREE-ORDERED edge orientation (each edge
    * points from its lower-(degree, id) endpoint to the higher): every
    * triangle then has exactly ONE vertex with out-edges to the other
    * two, so enumerating out-neighbor pairs per vertex counts each
    * triangle once, and — the scale property — the wedge-join fan-out
    * is Σ C(outdeg, 2) with outdeg bounded by O(√m) under this
    * orientation, the classic O(m^{3/2}) bound. A hub with degree 10⁶
    * generates ZERO wedges from its own out-list beyond √m — the naive
    * id-ordered join would square it. The closure check is an
    * orientation-free semi-join against the undirected edge set, so the
    * oracle can verify with the simple a<b<c formulation: same
    * triangle set, engine-independent counts. `n_wedges` reported is
    * Σ C(deg, 2) (orientation-independent), and transitivity is the
    * exact integer ppm of 3·triangles / wedges.
    */
  def g02TriangleCount(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val nRow = docs.agg(count(lit(1)).as("n"))
    val directed = rawLinkEdges(spark, dir)
    // The edge set feeds FIVE consumers (degrees, two orientation joins,
    // the closure semi-join, the edge count) and Catalyst does not share
    // common subplans across a DAG — without pinning, the scan+distinct
    // runs once per consumer. RDD-level persist (not DataFrame.persist:
    // CacheManager pins InMemoryRelations until explicit unpersist; the
    // ContextCleaner DOES collect RDD caches once the result frame is
    // dropped — same reasoning as ScaleOps.denseIds) materializes the
    // edge list exactly once, which is also the 100 TB shape: an edge
    // table is built once and served to every downstream graph pass.
    val undRaw = directed.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val undRdd = undRaw.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val und = spark.createDataFrame(undRdd, undRaw.schema)
    val deg = und.select(col("a").as("v")).unionAll(und.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    val lowFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = und
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(when(lowFirst, col("a")).otherwise(col("b")).as("x"),
              when(lowFirst, col("b")).otherwise(col("a")).as("y"))
    // out-neighbor pairs of each lowest-rank vertex, id-normalized so the
    // closure semi-join hits the undirected set's (a < b) layout
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.x") === col("e2.x") && col("e1.y") < col("e2.y"))
      .select(col("e1.y").as("p"), col("e2.y").as("q"))
    val tri = wedges.join(und,
      wedges("p") === und("a") && wedges("q") === und("b"), "left_semi")
    deg.agg(count(lit(1)).as("n_nodes"),
        sum(expr("d * (d - 1) div 2")).as("n_wedges"))
      .crossJoin(und.agg(count(lit(1)).as("n_edges")))
      .crossJoin(tri.agg(count(lit(1)).as("n_triangles")))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
        expr("CASE WHEN n_wedges > 0 THEN (1000000 * 3 * n_triangles) div n_wedges ELSE CAST(0 AS BIGINT) END")
          .as("transitivity_ppm"))
  }

  private val g02Sql =
    """WITH nn AS (SELECT COUNT(*) n FROM documents),
      |e0 AS (
      |  SELECT doc_id src, (doc_id * doc_id * 31 + k * 17) % nn.n dst
      |  FROM documents CROSS JOIN nn, (SELECT unnest([1, 2, 3]) k)),
      |e AS (SELECT DISTINCT LEAST(src, dst) a, GREATEST(src, dst) b
      |      FROM e0 WHERE src <> dst),
      |deg AS (SELECT v, COUNT(*) d
      |        FROM (SELECT a v FROM e UNION ALL SELECT b v FROM e) GROUP BY v),
      |w AS (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) nw FROM deg),
      |tri AS (SELECT COUNT(*) t
      |        FROM e e1 JOIN e e2 ON e1.b = e2.a
      |                  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
      |SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
      |  (SELECT COUNT(*) FROM e) AS n_edges,
      |  (SELECT nw FROM w) AS n_wedges,
      |  (SELECT t FROM tri) AS n_triangles,
      |  CAST(CASE WHEN (SELECT nw FROM w) > 0
      |    THEN (1000000 * 3 * (SELECT t FROM tri)) // (SELECT nw FROM w)
      |    ELSE 0 END AS BIGINT) AS transitivity_ppm""".stripMargin

  /** g05 — HITS hubs & authorities, two mutual-reinforcement rounds
    * over g01's deterministic link graph, all scaled-integer: each
    * round computes a_raw(v) = Σ_{u→v} h(u) then h_raw(u) = Σ_{u→v} a(v),
    * each renormalized to micro-units by floor division with the global
    * sum (aᵢ = a_raw·10⁶ div Σa_raw) so both engines produce identical
    * longs — HITS's usual L2 normalization is a square root, which
    * cannot cross engines exactly, but the sum-normalized fixpoint
    * direction is the same and the ranking it induces is identical.
    *
    * PageRank (g01) scores a page by WHO links to it; HITS splits the
    * signal: hubs (link out to good authorities) vs authorities (linked
    * from good hubs) — the curation-relevant split when link farms are
    * hub-shaped. Scale shape: per round, one shuffle of the edge table
    * on dst (authority pass) and one on src (hub pass), each a plain
    * partial+final sum; normalization totals ride along as 1-row
    * broadcasts. Fixed rounds keep it ONE lazy plan, no driver loop.
    * Headroom: a_raw ≤ indeg·10⁶ and the ·10⁶ renormalization bounds
    * intermediates by 3n·10¹² — longs overflow only past n ≈ 3·10⁶
    * docs; beyond that drop to per-1000 units (same argument as w16's
    * decimal bound, documented not silent: ANSI mode throws).
    */
  def g05Hits(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val n = docs.agg(count(lit(1)).as("n"))
    val edges = rawLinkEdges(spark, dir)

    // one normalized update: scores(node, s) × edges summed on `agg` side,
    // re-attached to every doc (0 for sinks), renormalized to micro-units
    def push(scores: DataFrame, joinOn: String, aggTo: String): DataFrame = {
      val contrib = edges.join(scores, edges(joinOn) === scores("node"))
        .groupBy(col(aggTo).as("node")).agg(sum(col("s")).as("raw"))
      val raw = docs.join(contrib, docs("doc_id") === contrib("node"), "left")
        .select(col("doc_id").as("node"),
          coalesce(col("raw"), lit(0L)).as("raw"))
      raw.crossJoin(broadcast(raw.agg(sum(col("raw")).as("tot"))))
        .select(col("node"), expr("raw * 1000000 div tot").as("s"))
    }

    val h0 = docs.select(col("doc_id").as("node"), lit(1000000L).as("s"))
    val a1 = push(h0, "src", "dst")
    val h1 = push(a1, "dst", "src")
    val a2 = push(h1, "src", "dst")
    val h2 = push(a2, "dst", "src")
    docs
      .join(h2.select(col("node"), col("s").as("hub_micro")),
        docs("doc_id") === col("node")).drop("node")
      .join(a2.select(col("node"), col("s").as("auth_micro")),
        docs("doc_id") === col("node")).drop("node")
      .orderBy(col("doc_id"))
  }

  private val g05Sql =
    """WITH n AS (SELECT COUNT(*) n FROM documents),
      |e AS (
      |  SELECT doc_id src, (doc_id * doc_id * 31 + k * 17) % n.n dst
      |  FROM documents CROSS JOIN n, (SELECT unnest([1, 2, 3]) k)),
      |h0 AS (SELECT doc_id node, CAST(1000000 AS BIGINT) s FROM documents),
      |a1r AS (SELECT d.doc_id node, COALESCE(c.s, 0) raw FROM documents d
      |        LEFT JOIN (SELECT dst, SUM(s) s FROM e JOIN h0 ON e.src = h0.node
      |                   GROUP BY 1) c ON d.doc_id = c.dst),
      |a1 AS (SELECT node, CAST(raw * 1000000 // (SELECT SUM(raw) FROM a1r) AS BIGINT) s
      |       FROM a1r),
      |h1r AS (SELECT d.doc_id node, COALESCE(c.s, 0) raw FROM documents d
      |        LEFT JOIN (SELECT src, SUM(s) s FROM e JOIN a1 ON e.dst = a1.node
      |                   GROUP BY 1) c ON d.doc_id = c.src),
      |h1 AS (SELECT node, CAST(raw * 1000000 // (SELECT SUM(raw) FROM h1r) AS BIGINT) s
      |       FROM h1r),
      |a2r AS (SELECT d.doc_id node, COALESCE(c.s, 0) raw FROM documents d
      |        LEFT JOIN (SELECT dst, SUM(s) s FROM e JOIN h1 ON e.src = h1.node
      |                   GROUP BY 1) c ON d.doc_id = c.dst),
      |a2 AS (SELECT node, CAST(raw * 1000000 // (SELECT SUM(raw) FROM a2r) AS BIGINT) s
      |       FROM a2r),
      |h2r AS (SELECT d.doc_id node, COALESCE(c.s, 0) raw FROM documents d
      |        LEFT JOIN (SELECT src, SUM(s) s FROM e JOIN a2 ON e.dst = a2.node
      |                   GROUP BY 1) c ON d.doc_id = c.src),
      |h2 AS (SELECT node, CAST(raw * 1000000 // (SELECT SUM(raw) FROM h2r) AS BIGINT) s
      |       FROM h2r)
      |SELECT d.doc_id, h2.s AS hub_micro, a2.s AS auth_micro
      |FROM documents d JOIN h2 ON d.doc_id = h2.node JOIN a2 ON d.doc_id = a2.node
      |ORDER BY d.doc_id""".stripMargin

  /** g06 — k-core decomposition, three unrolled peeling rounds at
    * k = 4 over g02's undirected graph (id-normalized, self-loops
    * dropped, distinct): each round recomputes degrees on the subgraph
    * INDUCED by the previous survivors and drops nodes under k. The
    * k-core is the classic link-farm/community-density signal — a node's
    * `survived` count (0–3) is how deep it sits; on this graph the
    * peeling converges by round 3 (232/3/1 peeled, then a fixpoint),
    * so `in_core` is the true 4-core, not a truncation artifact.
    *
    * Scale shape: a round is one semi-join of the symmetric edge list
    * against the alive set on EACH endpoint (hash joins on node id — at
    * cluster scale both sides pre-partition by node) plus a count
    * aggregate; fixed unrolled rounds keep it one lazy plan, no driver
    * loop (d06 demonstrates loop-to-fixpoint when the depth is not
    * known). Peeling is monotone — alive sets only shrink — so each
    * round's join inputs are strictly smaller than the last.
    */
  def g06KCore(spark: SparkSession, dir: String, k: Int = 4): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val n = docs.agg(count(lit(1)).as("n"))
    val und = rawLinkEdges(spark, dir)
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
              greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val sym = und.select(col("a").as("u"), col("b").as("v"))
      .unionAll(und.select(col("b").as("u"), col("a").as("v")))

    def degrees(alive: DataFrame): DataFrame = sym
      .join(alive.select(col("node").as("u")), Seq("u"), "left_semi")
      .join(alive.select(col("node").as("v")), Seq("v"), "left_semi")
      .groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))

    def peel(alive: DataFrame): DataFrame = alive
      .join(degrees(alive), Seq("node"), "left")
      .filter(coalesce(col("deg"), lit(0L)) >= k)
      .select(col("node"))

    val all = docs.select(col("doc_id").as("node"))
    val deg0 = all.join(degrees(all), Seq("node"), "left")
      .select(col("node"), coalesce(col("deg"), lit(0L)).as("deg0"))
    val a1 = peel(all)
    val a2 = peel(a1)
    val a3 = peel(a2)
    deg0
      .join(a1.withColumn("s1", lit(1)), Seq("node"), "left")
      .join(a2.withColumn("s2", lit(1)), Seq("node"), "left")
      .join(a3.withColumn("s3", lit(1)), Seq("node"), "left")
      .select(col("node").as("doc_id"), col("deg0"),
        (coalesce(col("s1"), lit(0)) + coalesce(col("s2"), lit(0)) +
         coalesce(col("s3"), lit(0))).cast("int").as("survived"),
        col("s3").isNotNull.as("in_core"))
      .orderBy(col("doc_id"))
  }

  private val g06Sql =
    """WITH n AS (SELECT COUNT(*) n FROM documents),
      |e0 AS (
      |  SELECT doc_id src, (doc_id * doc_id * 31 + k * 17) % n.n dst
      |  FROM documents CROSS JOIN n, (SELECT unnest([1, 2, 3]) k)),
      |u AS (SELECT DISTINCT least(src, dst) a, greatest(src, dst) b
      |      FROM e0 WHERE src <> dst),
      |s AS (SELECT a u, b v FROM u UNION ALL SELECT b, a FROM u),
      |deg0 AS (SELECT d.doc_id node, COALESCE(c.deg, 0) deg0 FROM documents d
      |         LEFT JOIN (SELECT u, COUNT(*) deg FROM s GROUP BY 1) c
      |         ON d.doc_id = c.u),
      |a1 AS (SELECT node FROM deg0 WHERE deg0 >= 4),
      |d1 AS (SELECT s.u node, COUNT(*) deg FROM s
      |       JOIN a1 x ON s.u = x.node JOIN a1 y ON s.v = y.node GROUP BY 1),
      |a2 AS (SELECT a1.node FROM a1 LEFT JOIN d1 ON a1.node = d1.node
      |       WHERE COALESCE(d1.deg, 0) >= 4),
      |d2 AS (SELECT s.u node, COUNT(*) deg FROM s
      |       JOIN a2 x ON s.u = x.node JOIN a2 y ON s.v = y.node GROUP BY 1),
      |a3 AS (SELECT a2.node FROM a2 LEFT JOIN d2 ON a2.node = d2.node
      |       WHERE COALESCE(d2.deg, 0) >= 4)
      |SELECT g.node doc_id, CAST(g.deg0 AS BIGINT) AS deg0,
      |  CAST((CASE WHEN x1.node IS NULL THEN 0 ELSE 1 END) +
      |       (CASE WHEN x2.node IS NULL THEN 0 ELSE 1 END) +
      |       (CASE WHEN x3.node IS NULL THEN 0 ELSE 1 END) AS INTEGER) AS survived,
      |  x3.node IS NOT NULL AS in_core
      |FROM deg0 g
      |LEFT JOIN a1 x1 ON g.node = x1.node
      |LEFT JOIN a2 x2 ON g.node = x2.node
      |LEFT JOIN a3 x3 ON g.node = x3.node
      |ORDER BY doc_id""".stripMargin

  /** g07 — link prediction over the g01 graph: for every non-adjacent
    * pair at distance 2, the three classic topology scores — common
    * neighbors, Jaccard of neighbor sets (exact integer ppm — the count
    * ratio (1e6·|∩|) div (da+db−|∩|) needs no floats), and preferential
    * attachment (deg·deg) — the candidate-edge ranking used for crawl
    * frontier expansion and related-document suggestion.
    *
    * Scale shape: candidate generation is the wedge join (adjacency
    * self-joined on the shared middle node) — the same Σdeg² frame g02
    * bounds with degree orientation; here both orientations are needed
    * (the pair (x,y) is the output, not the wedge), so the wedge
    * MIDDLE is degree-capped at `maxHubDeg`: a hub of degree 10⁶
    * would alone contribute 10¹² wedge pairs, and the standard
    * practice (and this operator's contract) is that hubs above the
    * cap contribute no wedges — common neighbors THROUGH a massive hub
    * carry no signal anyway (everyone shares them). Cost is therefore
    * Σ min(deg, cap)² ≤ n·cap². The cap is a no-op on this corpus
    * (max degree ≪ 64), so the oracle checks the capped and uncapped
    * semantics as one. The `common >= 2` floor prunes the long tail
    * before the degree joins, existing edges leave via a left_anti
    * join on the symmetric edge list (no NOT IN / driver set), and
    * every score is an int64 — one shuffle on the pair key,
    * partial-aggregated map-side.
    */
  def g07LinkPredict(spark: SparkSession, dir: String,
                     maxHubDeg: Long = 64L): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val n = docs.agg(count(lit(1)).as("n"))
    val directed = rawLinkEdges(spark, dir)
      .filter(col("src") =!= col("dst"))
    val und = directed.select(col("src").as("a"), col("dst").as("b"))
      .union(directed.select(col("dst").as("a"), col("src").as("b")))
      .distinct()
    val deg = und.groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
    // wedge middles above the hub cap contribute nothing: the semi-join
    // prunes them from BOTH adjacency copies before the Σdeg² join
    val lowDeg = deg.filter(col("deg") <= maxHubDeg).select(col("node").as("m"))
    val viaLow = und.select(col("a").as("x"), col("b").as("m"))
      .join(lowDeg, Seq("m"), "left_semi")
    val wedges = viaLow
      .join(und.select(col("a").as("y"), col("b").as("m")), Seq("m"))
      .filter(col("x") < col("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("cn"))
    val cand = wedges
      .join(und.select(col("a").as("x"), col("b").as("y")), Seq("x", "y"), "left_anti")
      .filter(col("cn") >= 2)
    cand
      .join(deg.select(col("node").as("x"), col("deg").as("dx")), Seq("x"))
      .join(deg.select(col("node").as("y"), col("deg").as("dy")), Seq("y"))
      .select(col("x").as("a"), col("y").as("b"), col("cn").as("common_neighbors"),
        expr("(1000000 * cn) div (dx + dy - cn)").as("jaccard_ppm"),
        (col("dx") * col("dy")).as("pref_attach"))
      .orderBy(col("a"), col("b"))
  }

  private val g07Sql =
    """WITH n AS (SELECT COUNT(*) n FROM documents),
      |d0 AS (
      |  SELECT doc_id src, (doc_id * doc_id * 31 + k * 17) % n.n dst
      |  FROM documents CROSS JOIN n, (SELECT unnest([1, 2, 3]) k)),
      |und AS (
      |  SELECT DISTINCT a, b FROM (
      |    SELECT src a, dst b FROM d0 WHERE src <> dst
      |    UNION ALL SELECT dst a, src b FROM d0 WHERE src <> dst)),
      |deg AS (SELECT a node, COUNT(*) deg FROM und GROUP BY a),
      |w AS (
      |  SELECT e1.a x, e2.a y, COUNT(*) cn
      |  FROM und e1 JOIN und e2 ON e1.b = e2.b AND e1.a < e2.a
      |  GROUP BY e1.a, e2.a),
      |cand AS (
      |  SELECT x, y, cn FROM w
      |  WHERE cn >= 2 AND NOT EXISTS (
      |    SELECT 1 FROM und WHERE und.a = w.x AND und.b = w.y))
      |SELECT c.x AS a, c.y AS b, c.cn AS common_neighbors,
      |  (1000000 * c.cn) // (dx.deg + dy.deg - c.cn) AS jaccard_ppm,
      |  dx.deg * dy.deg AS pref_attach
      |FROM cand c JOIN deg dx ON c.x = dx.node JOIN deg dy ON c.y = dy.node
      |ORDER BY a, b""".stripMargin

  /** g08 — two synchronous label-propagation rounds over the g01 graph:
    * every node adopts its neighbors' MAJORITY label (count desc, then
    * MIN label — the deterministic tie-break that makes sync LPA
    * reproducible; vanilla LPA breaks ties randomly and is famously
    * unstable). Where d06 finds connected components (pure
    * reachability), LPA finds denser community structure inside them —
    * the dedup/curation use is grouping near-duplicate clusters into
    * source families. Fixed 2 rounds keeps it ONE lazy plan, the g01
    * convention (d06 demonstrates loop-to-fixpoint).
    *
    * Scale shape: each round is one join of the edge list against the
    * label table (both keyed on node — at cluster scale pre-partition
    * both by node and the join is exchange-free) + a majority vote
    * that partial-aggregates map-side; the vote's window runs over the
    * per-(node, label) aggregate, already shrunk to ≤deg rows per node.
    */
  /** The g08 label-propagation machinery, shared with g16's modularity
    * audit: the simple undirected edge rows (symmetric, self-loops and
    * multiplicity removed) and the round-1/round-2 label tables under
    * the deterministic majority-vote (count desc, min label) rule.
    */
  private def lpaLabelFrames(spark: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val directed = rawLinkEdges(spark, dir)
      .filter(col("src") =!= col("dst"))
    val und = directed.select(col("src").as("a"), col("dst").as("b"))
      .union(directed.select(col("dst").as("a"), col("src").as("b")))
      .distinct()
    def lpaRound(labels: DataFrame): DataFrame = {
      val msgs = und.join(labels.select(col("node").as("b"), col("lbl")), Seq("b"))
        .select(col("a").as("node"), col("lbl"))
      val wVote = Window.partitionBy(col("node"))
        .orderBy(col("c").desc, col("lbl").asc)
      val winners = msgs.groupBy(col("node"), col("lbl"))
        .agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(wVote))
        .filter(col("rn") === 1).select(col("node"), col("lbl"))
      docs.select(col("doc_id").as("node"))
        .join(winners, Seq("node"), "left")
        .select(col("node"), coalesce(col("lbl"), col("node")).as("lbl"))
    }
    val l0 = docs.select(col("doc_id").as("node"), col("doc_id").as("lbl"))
    val l1 = lpaRound(l0)
    (und, l1, lpaRound(l1))
  }

  def g08LpaCommunities(spark: SparkSession, dir: String): DataFrame = {
    val (_, l1, l2) = lpaLabelFrames(spark, dir)
    val sizes = l2.groupBy(col("lbl")).agg(count(lit(1)).as("community_size"))
    l1.select(col("node"), col("lbl").as("label_r1"))
      .join(l2.select(col("node"), col("lbl").as("label_r2")), Seq("node"))
      .join(sizes.select(col("lbl").as("label_r2"), col("community_size")),
            Seq("label_r2"))
      .select(col("node").as("doc_id"), col("label_r1"), col("label_r2"),
        col("community_size"))
      .orderBy(col("doc_id"))
  }

  private val g08Sql =
    """WITH n AS (SELECT COUNT(*) n FROM documents),
      |d0 AS (
      |  SELECT doc_id src, (doc_id * doc_id * 31 + k * 17) % n.n dst
      |  FROM documents CROSS JOIN n, (SELECT unnest([1, 2, 3]) k)),
      |und AS (
      |  SELECT DISTINCT a, b FROM (
      |    SELECT src a, dst b FROM d0 WHERE src <> dst
      |    UNION ALL SELECT dst a, src b FROM d0 WHERE src <> dst)),
      |l0 AS (SELECT doc_id node, doc_id lbl FROM documents),
      |c1 AS (SELECT und.a node, l0.lbl, COUNT(*) c
      |       FROM und JOIN l0 ON und.b = l0.node GROUP BY und.a, l0.lbl),
      |w1 AS (SELECT node, lbl FROM (
      |         SELECT node, lbl,
      |           ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, lbl ASC) rn
      |         FROM c1) WHERE rn = 1),
      |l1 AS (SELECT d.doc_id node, COALESCE(w1.lbl, d.doc_id) lbl
      |       FROM documents d LEFT JOIN w1 ON d.doc_id = w1.node),
      |c2 AS (SELECT und.a node, l1.lbl, COUNT(*) c
      |       FROM und JOIN l1 ON und.b = l1.node GROUP BY und.a, l1.lbl),
      |w2 AS (SELECT node, lbl FROM (
      |         SELECT node, lbl,
      |           ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, lbl ASC) rn
      |         FROM c2) WHERE rn = 1),
      |l2 AS (SELECT d.doc_id node, COALESCE(w2.lbl, d.doc_id) lbl
      |       FROM documents d LEFT JOIN w2 ON d.doc_id = w2.node),
      |sz AS (SELECT lbl, COUNT(*) community_size FROM l2 GROUP BY lbl)
      |SELECT l1.node AS doc_id, l1.lbl AS label_r1, l2.lbl AS label_r2,
      |       sz.community_size
      |FROM l1 JOIN l2 ON l1.node = l2.node JOIN sz ON l2.lbl = sz.lbl
      |ORDER BY doc_id""".stripMargin

  /** g09 — degree assortativity of the g01 graph, computed EXACTLY:
    * over the symmetric directed edge list the endpoint-degree
    * marginals are identical, so Pearson's r collapses to the rational
    * (n·Σxy − (Σx)²) / (n·Σx² − (Σx)²) — four integer sums lifted to
    * DECIMAL(38,0) (the w16 convention), no mean, no sqrt, no float
    * anywhere. Assortative crawl graphs (r > 0: hubs link hubs) are
    * the link-farm smell; disassortative (r < 0) is the organic-web
    * shape — the one-number summary read next to g02's transitivity.
    * The ppm emission floors MAGNITUDE and reapplies sign, because
    * Spark's `div` truncates toward zero while DuckDB's `//` floors —
    * they disagree on negative operands.
    *
    * Scale shape: two node-keyed joins to attach degrees (the same
    * partitioning the degree aggregate just produced), then ONE
    * partial-aggregated scalar pass. No quadratic anything.
    */
  def g09Assortativity(spark: SparkSession, dir: String): DataFrame = {
    val D = org.apache.spark.sql.types.DecimalType(38, 0)
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val n = docs.agg(count(lit(1)).as("n"))
    val directed = rawLinkEdges(spark, dir)
      .filter(col("src") =!= col("dst"))
    val und = directed.select(col("src").as("a"), col("dst").as("b"))
      .union(directed.select(col("dst").as("a"), col("src").as("b")))
      .distinct()
    val deg = und.groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
    und
      .join(deg.select(col("node").as("a"), col("deg").as("x")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("y")), Seq("b"))
      .agg(count(lit(1)).cast(D).as("n"),
           sum(col("x").cast(D)).as("sx"),
           sum(col("x").cast(D) * col("y").cast(D)).as("sxy"),
           sum(col("x").cast(D) * col("x").cast(D)).as("sx2"))
      .select(col("n").cast(org.apache.spark.sql.types.LongType)
          .as("n_directed_edges"),
        expr("CAST(n * sxy - sx * sx AS DECIMAL(38,0))").as("num"),
        expr("CAST(n * sx2 - sx * sx AS DECIMAL(38,0))").as("den"))
      .select(col("n_directed_edges"),
        col("num").cast(org.apache.spark.sql.types.LongType).as("num"),
        col("den").cast(org.apache.spark.sql.types.LongType).as("den"),
        expr("CASE WHEN num >= 0 THEN CAST((1000000 * num) div den AS BIGINT) " +
             "ELSE -CAST((1000000 * (-num)) div den AS BIGINT) END")
          .as("assort_ppm"))
  }

  private val g09Sql =
    """WITH nn AS (SELECT COUNT(*) n FROM documents),
      |d0 AS (
      |  SELECT doc_id src, (doc_id * doc_id * 31 + k * 17) % nn.n dst
      |  FROM documents CROSS JOIN nn, (SELECT unnest([1, 2, 3]) k)),
      |und AS (
      |  SELECT DISTINCT a, b FROM (
      |    SELECT src a, dst b FROM d0 WHERE src <> dst
      |    UNION ALL SELECT dst a, src b FROM d0 WHERE src <> dst)),
      |deg AS (SELECT a node, COUNT(*) deg FROM und GROUP BY a),
      |xy AS (
      |  SELECT dx.deg x, dy.deg y FROM und
      |  JOIN deg dx ON und.a = dx.node JOIN deg dy ON und.b = dy.node),
      |s AS (SELECT CAST(COUNT(*) AS HUGEINT) n, CAST(SUM(x) AS HUGEINT) sx,
      |        CAST(SUM(x * y) AS HUGEINT) sxy, CAST(SUM(x * x) AS HUGEINT) sx2
      |      FROM xy)
      |SELECT CAST(n AS BIGINT) AS n_directed_edges,
      |  CAST(n * sxy - sx * sx AS BIGINT) AS num,
      |  CAST(n * sx2 - sx * sx AS BIGINT) AS den,
      |  CASE WHEN n * sxy - sx * sx >= 0
      |    THEN CAST((1000000 * (n * sxy - sx * sx)) // (n * sx2 - sx * sx) AS BIGINT)
      |    ELSE -CAST((1000000 * (sx * sx - n * sxy)) // (n * sx2 - sx * sx) AS BIGINT)
      |  END AS assort_ppm
      |FROM s""".stripMargin

  /** g10 — personalized PageRank: the restart distribution concentrates
    * on a SEED set (doc_id % 50 == 0 — trusted/curated documents)
    * instead of spreading uniformly, so rank mass measures proximity to
    * the seeds. The crawl-frontier / seed-expansion primitive: "which
    * documents does the trusted core endorse" — used to prioritize
    * ingest and to propagate quality labels. Same deterministic link
    * graph, integer micro-unit arithmetic, and 3 unrolled synchronous
    * steps as [[g01LinkRank]]; the only change is the teleport term
    * (150000 per seed, 0 elsewhere), which keeps every step a
    * broadcast-free join + one aggregate on dst — the iteration shape
    * that survives a 1000-executor graph.
    */
  def g10PersonalizedRank(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val n = docs.agg(count(lit(1)).as("n"))
    val edges = rawLinkEdges(spark, dir)
    val seedTerm = when(col("doc_id") % 50 === 0, 150000L).otherwise(0L)
    def step(ranks: DataFrame): DataFrame = {
      val contrib = edges.join(ranks, edges("src") === ranks("node"))
        .groupBy(col("dst")).agg(sum(expr("r div 3")).as("s"))
      docs.join(contrib, docs("doc_id") === contrib("dst"), "left")
        .select(col("doc_id").as("node"),
          (seedTerm + expr("coalesce((850 * s) div 1000, CAST(0 AS BIGINT))")).as("r"))
    }
    val r0 = docs.select(col("doc_id").as("node"),
      when(col("doc_id") % 50 === 0, 1000000L).otherwise(0L).as("r"))
    step(step(step(r0)))
      .select(col("node").as("doc_id"), col("r").as("ppr_micro"))
      .orderBy(col("doc_id"))
  }

  private val g10Sql =
    """WITH n AS (SELECT COUNT(*) n FROM documents),
      |e AS (
      |  SELECT doc_id src, (doc_id * doc_id * 31 + k * 17) % n.n dst
      |  FROM documents CROSS JOIN n, (SELECT unnest([1, 2, 3]) k)),
      |r0 AS (SELECT doc_id node,
      |         CAST(CASE WHEN doc_id % 50 = 0 THEN 1000000 ELSE 0 END AS BIGINT) r
      |       FROM documents),
      |r1 AS (
      |  SELECT d.doc_id node,
      |    CASE WHEN d.doc_id % 50 = 0 THEN 150000 ELSE 0 END
      |      + COALESCE((850 * s) // 1000, 0) r
      |  FROM documents d LEFT JOIN (
      |    SELECT dst, SUM(r // 3) s FROM e JOIN r0 ON e.src = r0.node GROUP BY dst) c
      |  ON d.doc_id = c.dst),
      |r2 AS (
      |  SELECT d.doc_id node,
      |    CASE WHEN d.doc_id % 50 = 0 THEN 150000 ELSE 0 END
      |      + COALESCE((850 * s) // 1000, 0) r
      |  FROM documents d LEFT JOIN (
      |    SELECT dst, SUM(r // 3) s FROM e JOIN r1 ON e.src = r1.node GROUP BY dst) c
      |  ON d.doc_id = c.dst),
      |r3 AS (
      |  SELECT d.doc_id node,
      |    CASE WHEN d.doc_id % 50 = 0 THEN 150000 ELSE 0 END
      |      + COALESCE((850 * s) // 1000, 0) r
      |  FROM documents d LEFT JOIN (
      |    SELECT dst, SUM(r // 3) s FROM e JOIN r2 ON e.src = r2.node GROUP BY dst) c
      |  ON d.doc_id = c.dst)
      |SELECT node AS doc_id, CAST(r AS BIGINT) AS ppr_micro
      |FROM r3 ORDER BY doc_id""".stripMargin

  /** g11 — directed-graph reciprocity + loop audit over the deterministic
    * link graph: what fraction of distinct edges are mutual (u→v AND
    * v→u)? Reciprocity separates link-graph SHAPES — citation-like DAGs
    * (≈0) from social/forum graphs (high) — which drives whether
    * crawl-frontier expansion or PageRank damping assumptions hold on a
    * new corpus; the self-loop count is the degenerate-edge audit that
    * runs alongside. Shape: build the edge list, split off loops,
    * `distinct`, then ONE self-join keyed on the reversed pair — a
    * shuffle on (src,dst) both sides, no broadcast needed because both
    * sides are the same frame. The three scalar aggregates compose via
    * broadcast crossJoin (1-row frames).
    */
  def g11Reciprocity(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val n = docs.agg(count(lit(1)).as("n"))
    val raw = rawLinkEdges(spark, dir)
    val loops = raw.filter(col("src") === col("dst"))
      .agg(count(lit(1)).as("n_loop_refs"),
           countDistinct(col("src")).as("n_loop_nodes"))
    val edges = raw.filter(col("src") =!= col("dst")).distinct()
    val nEdges = edges.agg(count(lit(1)).as("n_edges"))
    val recip = edges.as("a")
      .join(edges.as("b"),
        col("a.src") === col("b.dst") && col("a.dst") === col("b.src"))
      .agg(count(lit(1)).as("n_reciprocal"))
    nEdges.crossJoin(broadcast(recip)).crossJoin(broadcast(loops))
      .select(col("n_edges"), col("n_reciprocal"),
        expr("(1000000 * n_reciprocal) div n_edges").as("reciprocity_ppm"),
        col("n_loop_refs"), col("n_loop_nodes"))
  }

  private val g11Sql =
    """WITH n AS (SELECT COUNT(*) n FROM documents),
      |raw AS (
      |  SELECT doc_id src, (doc_id * doc_id * 31 + k * 17) % n.n dst
      |  FROM documents CROSS JOIN n, (SELECT unnest([1, 2, 3]) k)),
      |loops AS (
      |  SELECT COUNT(*) n_loop_refs, COUNT(DISTINCT src) n_loop_nodes
      |  FROM raw WHERE src = dst),
      |e AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
      |ne AS (SELECT COUNT(*) n_edges FROM e),
      |r AS (
      |  SELECT COUNT(*) n_reciprocal
      |  FROM e a JOIN e b ON a.src = b.dst AND a.dst = b.src)
      |SELECT CAST(ne.n_edges AS BIGINT) AS n_edges,
      |  CAST(r.n_reciprocal AS BIGINT) AS n_reciprocal,
      |  CAST((1000000 * r.n_reciprocal) // ne.n_edges AS BIGINT)
      |    AS reciprocity_ppm,
      |  CAST(loops.n_loop_refs AS BIGINT) AS n_loop_refs,
      |  CAST(loops.n_loop_nodes AS BIGINT) AS n_loop_nodes
      |FROM ne CROSS JOIN r CROSS JOIN loops""".stripMargin

  /** g12 — in-degree distribution + hub-tail profile of the link graph:
    * the first diagnostic a graph job runs before choosing partitioning
    * (a heavy hub tail means vertex-cut / salting; a flat profile means
    * plain hash partitioning is fine — the g07 hub-cap and j09/j10
    * salting decisions start from exactly this table). Per observed
    * in-degree d: node count, the CCDF count of nodes with degree ≥ d,
    * and the ppm of ALL edge mass landing on those ≥d nodes — "what
    * fraction of traffic do the hubs absorb". Zero-in-degree nodes are
    * counted via the left join (a distribution that silently drops
    * sinks misreports the tail).
    *
    * Scale shape: one edge aggregate on dst (shuffle on the vertex
    * key), one left join onto the vertex table, then windows over the
    * DEGREE HISTOGRAM — whose row count is the number of distinct
    * degrees, a bounded diagnostic table, never the vertex table.
    */
  def g12DegreeProfile(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val n = docs.agg(count(lit(1)).as("n"))
    val edges = rawLinkEdges(spark, dir)
      .filter(col("src") =!= col("dst")).distinct()
    val indeg = docs.join(
        edges.groupBy(col("dst")).agg(count(lit(1)).as("d")),
        docs("doc_id") === col("dst"), "left")
      .select(coalesce(col("d"), lit(0L)).as("in_degree"))
    val hist = indeg.groupBy(col("in_degree"))
      .agg(count(lit(1)).as("n_nodes"))
      .withColumn("edge_mass", col("in_degree") * col("n_nodes"))
    val wDesc = Window.orderBy(col("in_degree").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    hist
      .withColumn("nodes_ge", sum(col("n_nodes")).over(wDesc))
      .withColumn("mass_ge", sum(col("edge_mass")).over(wDesc))
      .withColumn("total_mass", sum(col("edge_mass")).over(wAll))
      .select(col("in_degree"), col("n_nodes"), col("nodes_ge"),
        expr("(1000000 * mass_ge) div total_mass").as("tail_mass_ppm"))
      .orderBy(col("in_degree"))
  }

  private val g12Sql =
    """WITH nn AS (SELECT COUNT(*) n FROM documents),
      |raw AS (
      |  SELECT doc_id src, (doc_id * doc_id * 31 + k * 17) % nn.n dst
      |  FROM documents, nn, (SELECT unnest([1, 2, 3]) k)),
      |e AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
      |ind AS (
      |  SELECT d.doc_id, CAST(COALESCE(cnt.d, 0) AS BIGINT) in_degree
      |  FROM documents d
      |  LEFT JOIN (SELECT dst, COUNT(*) d FROM e GROUP BY dst) cnt
      |    ON d.doc_id = cnt.dst),
      |h AS (
      |  SELECT in_degree, CAST(COUNT(*) AS BIGINT) n_nodes,
      |    CAST(in_degree * COUNT(*) AS BIGINT) edge_mass
      |  FROM ind GROUP BY in_degree)
      |SELECT in_degree, n_nodes,
      |  CAST(SUM(n_nodes) OVER (ORDER BY in_degree DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS nodes_ge,
      |  CAST((1000000 * SUM(edge_mass) OVER (ORDER BY in_degree DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |    // SUM(edge_mass) OVER () AS BIGINT) AS tail_mass_ppm
      |FROM h ORDER BY in_degree""".stripMargin

  /** g13 — local clustering-coefficient histogram: per-node closure
    * c(v) = 2·t(v) / (d(v)·(d(v)−1)) binned into deciles, the LOCAL
    * dual of [[g02TriangleCount]]'s single global transitivity number.
    * The curation read: a corpus whose link graph shows a bimodal
    * coefficient histogram (many c≈1 nodes) is dominated by cliquey
    * template families — exactly the structure d14/g08 then dig into —
    * while global transitivity can average that signal away.
    *
    * Mechanism: g02's degree-oriented wedge enumeration (each wedge
    * materialized once, at its lowest-degree corner — the standard
    * bound that keeps hub nodes from exploding the join), with the
    * closing semi-join upgraded to keep the wedge CORNERS: each closed
    * triangle credits all three vertices via one explode, and the
    * per-node counts divide by the exact pair count. Output is ten
    * decile rows + exact ppm sums regardless of corpus size.
    */
  def g13ClusteringCoeff(spark: SparkSession, dir: String): DataFrame = {
    val directed = rawLinkEdges(spark, dir)
    val undRaw = directed.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    // one materialization serving degrees, both wedge sides, and the
    // closure probe — the g02 RDD-persist convention
    val undRdd = undRaw.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val und = spark.createDataFrame(undRdd, undRaw.schema)
    val deg = und.select(col("a").as("v")).unionAll(und.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    val lowFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = und
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(when(lowFirst, col("a")).otherwise(col("b")).as("x"),
              when(lowFirst, col("b")).otherwise(col("a")).as("y"))
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.x") === col("e2.x") && col("e1.y") < col("e2.y"))
      .select(col("e1.x").as("x"), col("e1.y").as("p"), col("e2.y").as("q"))
    val tri = wedges.join(und,
      wedges("p") === und("a") && wedges("q") === und("b"), "left_semi")
    val perNode = tri
      .select(explode(array(col("x"), col("p"), col("q"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("t"))
    deg.filter(col("d") >= 2)
      .join(perNode, Seq("v"), "left")
      .withColumn("t", coalesce(col("t"), lit(0L)))
      .withColumn("coeff_ppm", expr("(1000000 * 2 * t) div (d * (d - 1))"))
      .withColumn("bin", least(expr("coeff_ppm div 100000"), lit(9L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("coeff_ppm")).as("sum_coeff_ppm"))
      .orderBy(col("bin"))
  }

  private val g13Sql =
    """WITH nn AS (SELECT COUNT(*) n FROM documents),
      |d0 AS (
      |  SELECT doc_id src, (doc_id * doc_id * 31 + k * 17) % nn.n dst
      |  FROM documents CROSS JOIN nn, (SELECT unnest([1, 2, 3]) k)),
      |und AS (
      |  SELECT DISTINCT LEAST(src, dst) a, GREATEST(src, dst) b
      |  FROM d0 WHERE src <> dst),
      |deg AS (
      |  SELECT v, CAST(COUNT(*) AS BIGINT) d
      |  FROM (SELECT a v FROM und UNION ALL SELECT b v FROM und) GROUP BY 1),
      |ori AS (
      |  SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
      |              THEN u.a ELSE u.b END x,
      |         CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
      |              THEN u.b ELSE u.a END y
      |  FROM und u JOIN deg da ON u.a = da.v JOIN deg db ON u.b = db.v),
      |w AS (
      |  SELECT e1.x x, e1.y p, e2.y q
      |  FROM ori e1 JOIN ori e2 ON e1.x = e2.x AND e1.y < e2.y),
      |tri AS (
      |  SELECT w.x, w.p, w.q FROM w
      |  WHERE EXISTS (SELECT 1 FROM und WHERE und.a = w.p AND und.b = w.q)),
      |corners AS (
      |  SELECT x v FROM tri UNION ALL SELECT p v FROM tri
      |  UNION ALL SELECT q v FROM tri),
      |tc AS (SELECT v, CAST(COUNT(*) AS BIGINT) t FROM corners GROUP BY 1),
      |cc AS (
      |  SELECT deg.v, deg.d, COALESCE(tc.t, 0) t
      |  FROM deg LEFT JOIN tc USING (v) WHERE deg.d >= 2),
      |co AS (SELECT (1000000 * 2 * t) // (d * (d - 1)) coeff FROM cc)
      |SELECT LEAST(coeff // 100000, 9) AS bin,
      |  CAST(COUNT(*) AS BIGINT) AS n_nodes,
      |  CAST(SUM(coeff) AS BIGINT) AS sum_coeff_ppm
      |FROM co GROUP BY 1 ORDER BY bin""".stripMargin

  /** g14 — the neighborhood function N(d) by Flajolet–Martin sketch
    * propagation (ANF/HyperBall, Palmer et al. KDD'02 / Boldi–Vigna):
    * per-node out-ball sizes at depths 0..2, summarized per depth
    * WITHOUT ever running a BFS per node. Every node carries R = 4
    * one-bit FM registers (register k's mask starts as the lowest set
    * bit of a shared md5-int64 image of `k:id` — `h & -h`, so both
    * engines plant the identical bit), and one ball step is
    * `ball(v) ← ball(v) | OR over out-edges v→w of ball(w)` — the
    * whole frontier advances in ONE edge join + bit_or aggregate.
    * That is the 100 TB story: exact per-node k-hop sets are
    * quadratic-ish (g04 bounds them by flagged seeds for that reason);
    * a fixed-width OR-monoid sketch per node makes the global
    * distance distribution two linear shuffles per depth, the same
    * contract as one [[g01LinkRank]] iteration.
    *
    * Emitted per (depth, register): Σ_v 2^(lowest-zero-bit of mask) —
    * the integer FM estimator numerator ((-m-1) & (m+1)) summed in
    * DECIMAL(38,0) — plus the global OR. No floats, no φ-correction:
    * the contract pins the sketch algebra, and the Φ-scaled size
    * estimate is one driver-side division away. Masks at each depth
    * are RDD-persisted once (the g02 convention): depth d's table
    * feeds both its summary and depth d+1's join.
    */
  def g14NeighborhoodFunction(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val edges = rawLinkEdges(spark, dir)
      .filter(col("src") =!= col("dst")).distinct()
    def pin(df: DataFrame): DataFrame = {
      val rdd = df.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      spark.createDataFrame(rdd, df.schema)
    }
    val m0 = pin(Tables.documents(spark, dir)
      .select(col("doc_id").as("node"),
        explode(expr("array(1, 2, 3, 4)")).as("k"))
      .withColumn("h", expr(
        "CAST(conv(substring(md5(concat(CAST(k AS STRING), ':', " +
          "CAST(node AS STRING))), 1, 15), 16, 10) AS BIGINT)"))
      .select(col("node"), col("k"), expr("h & -h").as("m")))
    def step(cur: DataFrame): DataFrame = {
      val nbr = edges.join(cur, edges("dst") === cur("node"))
        .groupBy(edges("src").as("node"), col("k"))
        .agg(expr("bit_or(m)").as("om"))
      pin(cur.join(nbr, Seq("node", "k"), "left")
        .select(col("node"), col("k"),
          coalesce(expr("m | om"), col("m")).as("m")))
    }
    val m1 = step(m0)
    val m2 = step(m1)
    def summary(df: DataFrame, depth: Int): DataFrame = df
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(expr("CAST(((-m - 1) & (m + 1)) AS DECIMAL(38,0))")).as("sum_pow"),
        expr("bit_or(m)").as("or_all"))
      .select(lit(depth).as("depth"), col("k"), col("n_nodes"),
        // STRING output: each FM term can be as large as 2⁶², so the
        // sum exceeds int64 on adversarial masks — the decimal is the
        // point — and decimal output columns hash-diverge across the
        // two engines' client layers (the r8 class).
        col("sum_pow").cast("string").as("sum_pow"), col("or_all"))
    summary(m0, 0).unionByName(summary(m1, 1)).unionByName(summary(m2, 2))
      .orderBy(col("depth"), col("k"))
  }

  private val g14Sql = {
    val md5fold =
      """list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, 16),
        |        i -> CAST(strpos('0123456789abcdef',
        |               substr(md5(concat(CAST(k AS VARCHAR), ':', CAST(doc_id AS VARCHAR))), CAST(i AS INTEGER), 1)) - 1 AS BIGINT))),
        |      (a, b) -> a * 16 + b)""".stripMargin
    s"""WITH nn AS (SELECT COUNT(*) n FROM documents),
      |e0 AS (
      |  SELECT doc_id src, (doc_id * doc_id * 31 + k * 17) % nn.n dst
      |  FROM documents CROSS JOIN nn, (SELECT unnest([1, 2, 3]) k)),
      |e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
      |m0 AS (
      |  SELECT doc_id node, k, (h & -h) m
      |  FROM (SELECT doc_id, k, $md5fold h
      |        FROM documents, (SELECT unnest([1, 2, 3, 4]) k))),
      |m1 AS (
      |  SELECT c.node, c.k, CASE WHEN b.om IS NULL THEN c.m ELSE c.m | b.om END m
      |  FROM m0 c LEFT JOIN (
      |    SELECT e.src node, m0.k k, bit_or(m0.m) om
      |    FROM e JOIN m0 ON e.dst = m0.node GROUP BY e.src, m0.k) b
      |  ON c.node = b.node AND c.k = b.k),
      |m2 AS (
      |  SELECT c.node, c.k, CASE WHEN b.om IS NULL THEN c.m ELSE c.m | b.om END m
      |  FROM m1 c LEFT JOIN (
      |    SELECT e.src node, m1.k k, bit_or(m1.m) om
      |    FROM e JOIN m1 ON e.dst = m1.node GROUP BY e.src, m1.k) b
      |  ON c.node = b.node AND c.k = b.k),
      |s AS (
      |  SELECT 0 depth, k, COUNT(*) n_nodes,
      |    SUM(CAST(((-m - 1) & (m + 1)) AS DECIMAL(38,0))) sum_pow, bit_or(m) or_all
      |  FROM m0 GROUP BY k
      |  UNION ALL
      |  SELECT 1, k, COUNT(*),
      |    SUM(CAST(((-m - 1) & (m + 1)) AS DECIMAL(38,0))), bit_or(m) FROM m1 GROUP BY k
      |  UNION ALL
      |  SELECT 2, k, COUNT(*),
      |    SUM(CAST(((-m - 1) & (m + 1)) AS DECIMAL(38,0))), bit_or(m) FROM m2 GROUP BY k)
      |SELECT CAST(depth AS INTEGER) depth, CAST(k AS INTEGER) k,
      |  CAST(n_nodes AS BIGINT) n_nodes,
      |  CAST(CAST(sum_pow AS DECIMAL(38,0)) AS VARCHAR) sum_pow,
      |  CAST(or_all AS BIGINT) or_all
      |FROM s ORDER BY depth, k""".stripMargin
  }

  /** g15 — deterministic random-walk sampling (the DeepWalk/node2vec
    * corpus generator): one 3-step walk starts at EVERY node, and each
    * step moves to an out-neighbor chosen by a shared md5-int64 image
    * of (walk, position, step) mod out-degree — so the "random" walk is
    * a pure function of the graph, reproducible on any engine and any
    * partitioning (the s05 determinism rule), which is what makes
    * walk-generated training corpora auditable. Dead ends (no
    * out-edges) terminate the walk; the contract emits the per-step
    * frontier audit — walks alive, distinct nodes occupied, and an
    * order-invariant XOR checksum of (walk, node) images that pins
    * every individual transition without materializing n·steps rows in
    * the contract.
    *
    * Scale shape: neighbor selection is rank-indexed — neighbors get a
    * dense rank within their source (one window partitioned BY src,
    * shuffle-local), and each step is ONE equi-join of the frontier
    * against the ranked edge table on (node, chosen-rank): at 100 TB,
    * three hash joins co-partitioned on node, never a per-walk loop or
    * a collect. The walk-id rides in the frontier row, so fan-out is
    * exactly one row per live walk per step.
    */
  def g15RandomWalks(spark: SparkSession, dir: String): DataFrame = {
    val edges = rawLinkEdges(spark, dir)
      .filter(col("src") =!= col("dst")).distinct()
    val wRank = Window.partitionBy(col("src")).orderBy(col("dst"))
    val ranked = edges
      .withColumn("rn", row_number().over(wRank))
      .withColumn("outdeg", count(lit(1)).over(Window.partitionBy(col("src"))))
    def img(c1: String, c2: String) =
      expr(s"CAST(conv(substring(md5(concat(CAST($c1 AS STRING), ':', " +
        s"CAST($c2 AS STRING))), 1, 15), 16, 10) AS BIGINT)")
    val start = Tables.documents(spark, dir)
      .select(col("doc_id").as("walk"), col("doc_id").as("node"))
    def step(frontier: DataFrame, t: Int): DataFrame = frontier
      .join(ranked, frontier("node") === ranked("src"))
      .withColumn("pick",
        expr(s"pmod(CAST(conv(substring(md5(concat(CAST(walk AS STRING), ':', " +
          s"CAST(node AS STRING), ':', $t)), 1, 15), 16, 10) AS BIGINT), outdeg) + 1"))
      .filter(col("rn") === col("pick"))
      .select(col("walk"), col("dst").as("node"))
    val f1 = step(start, 1)
    val f2 = step(f1, 2)
    val f3 = step(f2, 3)
    def audit(f: DataFrame, t: Int): DataFrame = f
      .select(col("walk"), col("node"), img("walk", "node").as("i"))
      .agg(count(lit(1)).as("n_alive"),
        countDistinct(col("node")).as("n_occupied"),
        coalesce(expr("bit_xor(i)"), lit(0L)).as("transition_checksum"))
      .select(lit(t).as("step"), col("n_alive"), col("n_occupied"),
        col("transition_checksum"))
    audit(start, 0).unionByName(audit(f1, 1))
      .unionByName(audit(f2, 2)).unionByName(audit(f3, 3))
      .orderBy(col("step"))
  }

  private val g15Sql = {
    def md5i(a: String, b: String) =
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(1, 16),
         |        i -> CAST(strpos('0123456789abcdef',
         |               substr(md5(concat(CAST($a AS VARCHAR), ':', CAST($b AS VARCHAR))), CAST(i AS INTEGER), 1)) - 1 AS BIGINT))),
         |      (a, b) -> a * 16 + b)""".stripMargin
    def md5i3(a: String, b: String, t: Int) =
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(1, 16),
         |        i -> CAST(strpos('0123456789abcdef',
         |               substr(md5(concat(CAST($a AS VARCHAR), ':', CAST($b AS VARCHAR), ':', '$t')), CAST(i AS INTEGER), 1)) - 1 AS BIGINT))),
         |      (a, b) -> a * 16 + b)""".stripMargin
    def stepSql(prev: String, t: Int) =
      s"""SELECT f.walk, r.dst node
         |  FROM $prev f JOIN ranked r ON f.node = r.src
         |  WHERE r.rn = ${md5i3("f.walk", "f.node", t)} % r.outdeg + 1""".stripMargin
    s"""WITH nn AS (SELECT COUNT(*) n FROM documents),
      |e0 AS (
      |  SELECT doc_id src, (doc_id * doc_id * 31 + k * 17) % nn.n dst
      |  FROM documents CROSS JOIN nn, (SELECT unnest([1, 2, 3]) k)),
      |e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
      |ranked AS (
      |  SELECT src, dst,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS BIGINT) rn,
      |    CAST(COUNT(*) OVER (PARTITION BY src) AS BIGINT) outdeg
      |  FROM e),
      |f0 AS (SELECT doc_id walk, doc_id node FROM documents),
      |f1 AS (${stepSql("f0", 1)}),
      |f2 AS (${stepSql("f1", 2)}),
      |f3 AS (${stepSql("f2", 3)}),
      |s AS (
      |  SELECT 0 step, COUNT(*) n_alive, COUNT(DISTINCT node) n_occupied,
      |    COALESCE(bit_xor(${md5i("walk", "node")}), 0) c FROM f0
      |  UNION ALL SELECT 1, COUNT(*), COUNT(DISTINCT node),
      |    COALESCE(bit_xor(${md5i("walk", "node")}), 0) FROM f1
      |  UNION ALL SELECT 2, COUNT(*), COUNT(DISTINCT node),
      |    COALESCE(bit_xor(${md5i("walk", "node")}), 0) FROM f2
      |  UNION ALL SELECT 3, COUNT(*), COUNT(DISTINCT node),
      |    COALESCE(bit_xor(${md5i("walk", "node")}), 0) FROM f3)
      |SELECT CAST(step AS INTEGER) step, CAST(n_alive AS BIGINT) n_alive,
      |  CAST(n_occupied AS BIGINT) n_occupied,
      |  CAST(c AS BIGINT) transition_checksum
      |FROM s ORDER BY step""".stripMargin
  }

  /** g16 — Newman modularity audit of g08's LPA partition: per community
    * Q_c = m_c/m − (D_c/2m)², emitted as exact integer components plus a
    * sign-aware floored ppm term so Σ q_term_ppm / 10⁶ ≈ Q. Over the
    * symmetric simple edge rows (|rows| = 2m) the identity used is
    *
    *   Q_c = (2m·intra_rows_c − degree_sum_c²) / (2m)²
    *
    * with intra_rows_c the SYMMETRIC intra-community row count (= 2·m_c)
    * and degree_sum_c = Σ_{v∈c} deg(v) — every operand an exact int64
    * lifted to DECIMAL(38,0) for the ppm quotient (the g09/w16
    * convention: magnitude-floored, sign reapplied, because Spark `div`
    * truncates toward zero while DuckDB `//` floors on negatives). This
    * is the acceptance metric for a community detector: LPA labels with
    * Q ≈ 0 are noise, Q materially above the null model's 0 means the
    * near-dup families g08 feeds downstream are real structure.
    *
    * Scale shape: degrees and labels key on node (one shuffle each,
    * shareable), the edge table joins its two endpoint labels (node-keyed
    * — exchange-free when pre-partitioned by node), and everything
    * aggregates to the community-bounded table before any arithmetic.
    * No quadratic step anywhere.
    */
  def g16Modularity(spark: SparkSession, dir: String): DataFrame = {
    val D = org.apache.spark.sql.types.DecimalType(38, 0)
    val (und, _, l2) = lpaLabelFrames(spark, dir)
    val deg = und.groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
    val twoM = und.agg(count(lit(1)).as("two_m"))
    val ds = l2.join(deg, Seq("node"), "left")
      .groupBy(col("lbl"))
      .agg(count(lit(1)).as("community_size"),
        coalesce(sum(col("deg")), lit(0L)).as("degree_sum"))
    val intra = und
      .join(l2.select(col("node").as("a"), col("lbl").as("la")), Seq("a"))
      .join(l2.select(col("node").as("b"), col("lbl").as("lb")), Seq("b"))
      .filter(col("la") === col("lb"))
      .groupBy(col("la").as("lbl")).agg(count(lit(1)).as("intra_rows"))
    ds.join(intra, Seq("lbl"), "left")
      .withColumn("intra_rows", coalesce(col("intra_rows"), lit(0L)))
      .crossJoin(broadcast(twoM))
      .withColumn("num",
        col("two_m").cast(D) * col("intra_rows") - col("degree_sum").cast(D) * col("degree_sum"))
      .withColumn("q_term_ppm", expr(
        "CAST(CASE WHEN num >= 0 THEN " +
          "(CAST(1000000 AS DECIMAL(38,0)) * num) div (CAST(two_m AS DECIMAL(38,0)) * two_m) " +
          "ELSE -((CAST(1000000 AS DECIMAL(38,0)) * (-num)) div (CAST(two_m AS DECIMAL(38,0)) * two_m)) " +
          "END AS BIGINT)"))
      .select(col("lbl").as("community"), col("community_size"),
        col("degree_sum"), col("intra_rows"), col("two_m"), col("q_term_ppm"))
      .orderBy(col("community"))
  }

  private val g16Sql =
    """WITH n AS (SELECT COUNT(*) n FROM documents),
      |d0 AS (
      |  SELECT doc_id src, (doc_id * doc_id * 31 + k * 17) % n.n dst
      |  FROM documents CROSS JOIN n, (SELECT unnest([1, 2, 3]) k)),
      |und AS (
      |  SELECT DISTINCT a, b FROM (
      |    SELECT src a, dst b FROM d0 WHERE src <> dst
      |    UNION ALL SELECT dst a, src b FROM d0 WHERE src <> dst)),
      |l0 AS (SELECT doc_id node, doc_id lbl FROM documents),
      |c1 AS (SELECT und.a node, l0.lbl, COUNT(*) c
      |       FROM und JOIN l0 ON und.b = l0.node GROUP BY und.a, l0.lbl),
      |w1 AS (SELECT node, lbl FROM (
      |         SELECT node, lbl,
      |           ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, lbl ASC) rn
      |         FROM c1) WHERE rn = 1),
      |l1 AS (SELECT d.doc_id node, COALESCE(w1.lbl, d.doc_id) lbl
      |       FROM documents d LEFT JOIN w1 ON d.doc_id = w1.node),
      |c2 AS (SELECT und.a node, l1.lbl, COUNT(*) c
      |       FROM und JOIN l1 ON und.b = l1.node GROUP BY und.a, l1.lbl),
      |w2 AS (SELECT node, lbl FROM (
      |         SELECT node, lbl,
      |           ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, lbl ASC) rn
      |         FROM c2) WHERE rn = 1),
      |l2 AS (SELECT d.doc_id node, COALESCE(w2.lbl, d.doc_id) lbl
      |       FROM documents d LEFT JOIN w2 ON d.doc_id = w2.node),
      |deg AS (SELECT a node, CAST(COUNT(*) AS BIGINT) deg FROM und GROUP BY 1),
      |m AS (SELECT CAST(COUNT(*) AS BIGINT) two_m FROM und),
      |ds AS (SELECT l2.lbl, CAST(COUNT(*) AS BIGINT) community_size,
      |         CAST(COALESCE(SUM(deg.deg), 0) AS BIGINT) degree_sum
      |       FROM l2 LEFT JOIN deg ON l2.node = deg.node GROUP BY 1),
      |intra AS (SELECT la.lbl, CAST(COUNT(*) AS BIGINT) intra_rows
      |          FROM und JOIN l2 la ON und.a = la.node
      |                   JOIN l2 lb ON und.b = lb.node
      |          WHERE la.lbl = lb.lbl GROUP BY 1),
      |j AS (SELECT ds.lbl community, ds.community_size, ds.degree_sum,
      |        CAST(COALESCE(intra.intra_rows, 0) AS BIGINT) intra_rows, m.two_m,
      |        CAST(m.two_m AS HUGEINT) * COALESCE(intra.intra_rows, 0)
      |          - CAST(ds.degree_sum AS HUGEINT) * ds.degree_sum num
      |      FROM ds LEFT JOIN intra ON ds.lbl = intra.lbl, m)
      |SELECT community, community_size, degree_sum, intra_rows, two_m,
      |  CAST(CASE WHEN num >= 0 THEN CAST(1000000 AS HUGEINT) * num
      |              // (CAST(two_m AS HUGEINT) * two_m)
      |            ELSE -(CAST(1000000 AS HUGEINT) * (-num)
      |              // (CAST(two_m AS HUGEINT) * two_m)) END AS BIGINT) q_term_ppm
      |FROM j ORDER BY community""".stripMargin

  /** g17 — Katz centrality, EXACT bounded-walk form: x(v) = Σ_k β^k ·
    * (# directed walks of length k ending at v), truncated at k = 3
    * with β = 1/4, so the whole statistic is integer algebra —
    * katz_scaled64 = 16·w₁ + 4·w₂ + w₃ (the β^k weights cleared by
    * 4³ = 64). Distinct from [[g01LinkRank]] (damped FIXED-POINT with
    * per-step quantization — convergence semantics) and [[g05Hits]]
    * (mutually-recursive hub/authority): Katz counts bounded walks
    * exactly, the form a curation pipeline uses when it needs a
    * centrality that is reproducible to the last bit across engines
    * and runs (no iteration-order or quantization variance at all).
    *
    * Recursion: w₀ ≡ 1, w_k(v) = Σ_{u→v} w_{k−1}(u) over the DISTINCT
    * loop-free edge set (the g09/g14 graph convention). Walk counts
    * stay tiny (avg out-degree ~3 ⇒ w₃ ~ 27), far inside int64.
    *
    * Scale shape: three hash joins co-partitioned on the node key +
    * one left join back to documents — exactly one [[g01LinkRank]]
    * iteration's cost per depth, never a transitive closure.
    */
  def g17KatzCentrality(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val edges = rawLinkEdges(spark, dir)
      .filter(col("src") =!= col("dst")).distinct()
    // walks ENDING at v: propagate along reversed edges — equivalently
    // join on src and credit dst
    def stepIn(w: DataFrame): DataFrame =
      edges.join(w, edges("src") === w("node"))
        .groupBy(col("dst")).agg(sum(col("wk")).as("s"))
        .select(col("dst").as("node"), col("s").as("wk"))
    val w0 = docs.select(col("doc_id").as("node"), lit(1L).as("wk"))
    val w1 = stepIn(w0)
    val w2 = stepIn(w1)
    val w3 = stepIn(w2)
    docs
      .join(w1.select(col("node"), col("wk").as("w1")),
        docs("doc_id") === col("node"), "left").drop("node")
      .join(w2.select(col("node"), col("wk").as("w2")),
        docs("doc_id") === col("node"), "left").drop("node")
      .join(w3.select(col("node"), col("wk").as("w3")),
        docs("doc_id") === col("node"), "left").drop("node")
      .select(col("doc_id"),
        coalesce(col("w1"), lit(0L)).as("w1"),
        coalesce(col("w2"), lit(0L)).as("w2"),
        coalesce(col("w3"), lit(0L)).as("w3"))
      .withColumn("katz_scaled64",
        lit(16L) * col("w1") + lit(4L) * col("w2") + col("w3"))
      .orderBy(col("doc_id"))
  }

  private val g17Sql =
    """WITH nn AS (SELECT COUNT(*) n FROM documents),
      |e0 AS (
      |  SELECT doc_id src, (doc_id * doc_id * 31 + k * 17) % nn.n dst
      |  FROM documents CROSS JOIN nn, (SELECT unnest([1, 2, 3]) k)),
      |e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
      |w1 AS (SELECT dst node, CAST(COUNT(*) AS BIGINT) wk FROM e GROUP BY 1),
      |w2 AS (SELECT e.dst node, CAST(SUM(w1.wk) AS BIGINT) wk
      |       FROM e JOIN w1 ON e.src = w1.node GROUP BY 1),
      |w3 AS (SELECT e.dst node, CAST(SUM(w2.wk) AS BIGINT) wk
      |       FROM e JOIN w2 ON e.src = w2.node GROUP BY 1)
      |SELECT d.doc_id,
      |  COALESCE(w1.wk, 0) w1, COALESCE(w2.wk, 0) w2, COALESCE(w3.wk, 0) w3,
      |  16 * COALESCE(w1.wk, 0) + 4 * COALESCE(w2.wk, 0)
      |    + COALESCE(w3.wk, 0) katz_scaled64
      |FROM documents d
      |LEFT JOIN w1 ON d.doc_id = w1.node
      |LEFT JOIN w2 ON d.doc_id = w2.node
      |LEFT JOIN w3 ON d.doc_id = w3.node
      |ORDER BY d.doc_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("g17_katz_centrality",
      "exact truncated Katz centrality: bounded-walk counts w1-w3 with dyadic beta=1/4, bit-reproducible",
      g17KatzCentrality, Some(g17Sql)),
    QueryDef("g16_modularity",
      "Newman modularity of the LPA partition: exact per-community integer components + sign-aware ppm terms",
      g16Modularity, Some(g16Sql)),
    QueryDef("g15_random_walks",
      "deterministic DeepWalk sampling: md5-indexed 3-step walks, per-step frontier audit",
      g15RandomWalks, Some(g15Sql)),
    QueryDef("g14_neighborhood_function",
      "ANF/HyperBall neighborhood function: FM-sketch OR-propagation, depths 0-2",
      g14NeighborhoodFunction, Some(g14Sql)),
    QueryDef("g13_clustering_coeff",
      "local clustering-coefficient decile histogram (per-node closure, corner-credited)",
      g13ClusteringCoeff, Some(g13Sql)),
    QueryDef("g12_degree_profile",
      "in-degree histogram + hub-tail CCDF/mass of the link graph",
      g12DegreeProfile, Some(g12Sql)),
    QueryDef("g11_reciprocity",
      "edge reciprocity + self-loop audit of the deterministic link graph",
      g11Reciprocity, Some(g11Sql)),
    QueryDef("g10_personalized_rank",
      "3-step integer personalized PageRank: teleport mass pinned to seeds",
      g10PersonalizedRank, Some(g10Sql)),
    QueryDef("g09_assortativity",
      "exact rational degree assortativity (sign-aware ppm floor)",
      g09Assortativity, Some(g09Sql)),
    QueryDef("g08_lpa_communities",
      "2-round deterministic label propagation (majority vote, min tie-break)",
      g08LpaCommunities, Some(g08Sql)),
    QueryDef("g07_link_predict",
      "common-neighbor / Jaccard-ppm / pref-attach link prediction",
      g07LinkPredict(_, _), Some(g07Sql)),
    QueryDef("g06_kcore",
      "3-round k-core peeling (k=4) with per-node survival depth",
      g06KCore(_, _), Some(g06Sql)),
    QueryDef("g01_link_rank",
      "3-step integer PageRank over a deterministic link graph",
      g01LinkRank, Some(g01Sql)),
    QueryDef("g02_triangle_count",
      "degree-oriented triangle census + exact transitivity ppm",
      g02TriangleCount, Some(g02Sql)),
    QueryDef("g05_hits",
      "2-round integer HITS hubs/authorities, sum-normalized micro-units",
      g05Hits, Some(g05Sql))
  )
}
