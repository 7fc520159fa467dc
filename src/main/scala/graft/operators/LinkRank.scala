package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Link-graph authority scoring — the web-graph quality signal corpus
  * curation pipelines weight documents by (OPIC / PageRank-family
  * centrality over the crawl graph). The engine contributes the
  * distributed shape: a rank table iterated through join + aggregate
  * rounds against an edge table.
  */
object LinkRank {

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
    val edges = docs.crossJoin(broadcast(n))
      .select(col("doc_id").as("src"),
        explode(expr("array(1, 2, 3)")).as("k"), col("n"))
      .select(col("src"),
        ((col("src") * col("src") * 31 + col("k") * 17) % col("n")).as("dst"))
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

  val defs: Seq[QueryDef] = Seq(
    QueryDef("g01_link_rank",
      "3-step integer PageRank over a deterministic link graph",
      g01LinkRank, Some(g01Sql))
  )
}
