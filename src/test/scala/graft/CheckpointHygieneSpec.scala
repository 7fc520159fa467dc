package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide tripwire for the d18/w29/v23 golden-flap class: a frame
  * feeding MULTIPLE consumers with its subtree left inline duplicates
  * that subtree per consumer, and when the duplicate contains an
  * exchange-inducing operator, WHICH copy AQE materializes (vs points at
  * with ReusedExchange) is a thread race — runtime stats then differ
  * between runs and join strategies flip. localCheckpoint collapses the
  * shared subtree to one LogicalRDD leaf; persist() does NOT (the
  * InMemoryRelation is still planned per consumer).
  *
  * The spec walks every registered query's OPTIMIZED logical plan and
  * reports the top-most duplicated subtrees that contain an Aggregate /
  * Join / Window (the exchange-inducing class). A query may carry such a
  * duplicate only if it is on the ALLOWLIST below — each entry is a
  * conscious decision ("deterministic at contract scale, golden verified
  * stable") — so any NEW multi-consumer shared frame forces its author
  * to either checkpoint it or allowlist it with a justification.
  */
class CheckpointHygieneSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Top-most duplicated heavy (exchange-inducing) subtrees of the
    * optimized logical plan, as canonicalized plan keys. */
  private[graft] def duplicatedHeavySubtrees(df: DataFrame): Seq[LogicalPlan] = {
    val counts = scala.collection.mutable.LinkedHashMap[LogicalPlan, Int]()
    def walk(p: LogicalPlan): Unit = {
      val key = p.canonicalized
      counts(key) = counts.getOrElse(key, 0) + 1
      p.children.foreach(walk)
    }
    walk(df.queryExecution.optimizedPlan)
    def heavy(p: LogicalPlan): Boolean = p.exists {
      case _: Aggregate | _: Join | _: Window | _: Distinct => true
      case _ => false
    }
    // leaves (scans, LogicalRDD checkpoints, one-row locals) are shared
    // by design; a duplicate matters only when it re-plans heavy work
    val dups = counts.collect {
      case (p, n) if n >= 2 && heavy(p) => p
    }.toSeq
    // keep only top-most: drop any duplicate contained in a kept one
    val bySize = dups.sortBy(-_.collect { case x => x }.size)
    bySize.foldLeft(Seq.empty[LogicalPlan]) { (kept, cand) =>
      if (kept.exists(k => k != cand && k.exists(_ == cand))) kept
      else kept :+ cand
    }
  }

  /** Queries that carry an inline duplicated heavy subtree on purpose.
    * Each is golden-verified stable: the duplicate is deterministic at
    * contract scale (no borderline broadcast-size decision inside it) or
    * the query has no plan golden to flap. Additions require the same
    * review as a golden regen.
    */
  private val allowlisted: Set[String] = Set(
    // The round-11 HEAD audit: every query below carries an inline
    // duplicated heavy subtree that is GOLDEN-VERIFIED STABLE across
    // rounds (most are the bounded 1-row scalar-aggregate crossJoin
    // idiom, or small per-branch rollups of an already-checkpointed or
    // deterministic base). The set is a RATCHET: a new query landing
    // here means its author chose not to checkpoint a multi-consumer
    // shared frame — review it like a golden regen before adding.
    "a31_histogram", "a32_market_basket", "a36_cms_heavy_hitters",
    "a37_kmv_set_ops", "a38_ks_drift", "a50_cvm_drift", "a57_t_closeness",
    "d02_simhash", "d03_ngram_jaccard", "d04_embedding_neardup",
    "d07_semantic_dedup", "d08_incremental_dedup", "d13_threshold_sweep",
    // d17 left the allowlist in r13: the merged participant artifact is
    // checkpointed, so no shared subtree duplicates any more
    "d15_source_similarity", "d16_prefix_filter_join",
    "d18_incremental_components",
    "g01_link_rank", "g02_triangle_count", "g05_hits", "g06_kcore",
    "g07_link_predict", "g08_lpa_communities", "g09_assortativity",
    "g10_personalized_rank", "g11_reciprocity", "g13_clustering_coeff",
    "g15_random_walks", "g16_modularity", "g17_katz_centrality",
    "j21_full_reducer", "j23_join_size_sketch",
    "l03_skipping_audit", "l06_retractable_refresh", "l11_snapshot_diff",
    "m10_avghash_pairs",
    "s12_temperature_mix", "s13_time_split", "s18_neyman_allocation",
    "st13_ingest_dedup",
    // t25 left the allowlist in r15: ingest/s3 are checkpointed, so the
    // six funnel branches read materialized frames — no duplicate left
    "t21_containment", "t22_bigram_lm",
    "t28_rake_keywords", "t31_pmi_pairs", "t34_vocab_growth",
    "t38_source_divergence", "t41_dsir_weights", "t45_textrank_keywords",
    "v14_centroid_outliers", "v15_prf_rerank", "v21_centroid_drift",
    "v26_lsh_recall", "v28_mmr_diversify", "v32_multiprobe_lsh",
    "v33_nndescent",
    "w29_topk_churn", "w31_mann_kendall", "w33_rescaled_range",
    "w35_theil_sen", "w36_cusum_alarm", "w37_kendall_tau", "w38_mase")

  test("seeded repro: an inline shared aggregate duplicates per consumer; checkpointing collapses it") {
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
    // the d18 shape pre-fix: one shared frame, two consumers, subtree inline
    val bad = base.agg(sum(col("n")).as("a"))
      .crossJoin(base.agg(max(col("n")).as("b")))
    assert(duplicatedHeavySubtrees(bad).nonEmpty,
      "detector missed the seeded inline multi-consumer aggregate")
    // the fix convention: localCheckpoint the shared frame
    val ck = base.localCheckpoint(false)
    val good = ck.agg(sum(col("n")).as("a"))
      .crossJoin(ck.agg(max(col("n")).as("b")))
    assert(duplicatedHeavySubtrees(good).isEmpty,
      "checkpointed shared frame still reports a duplicated heavy subtree")
  }

  test("every registered query either checkpoints its multi-consumer shared frames or is allowlisted") {
    val offenders = Registry.all.flatMap { d =>
      val dups =
        try duplicatedHeavySubtrees(frame(d.name))
        catch { case e: Throwable => fail(s"${d.name}: ${e.getMessage}") }
      if (dups.nonEmpty && !allowlisted(d.name))
        Some(s"${d.name} (${dups.size} duplicated heavy subtree(s))")
      else None
    }
    assert(offenders.isEmpty,
      "non-checkpointed multi-consumer shared frames (localCheckpoint them " +
        s"or allowlist consciously):\n  ${offenders.mkString("\n  ")}")
    // the allowlist must not rot: every entry still exists and still dups
    val stale = allowlisted.filter(n => Registry.byName.get(n) match {
      case None => true
      case Some(d) => duplicatedHeavySubtrees(frame(d.name)).isEmpty
    })
    assert(stale.isEmpty, s"stale allowlist entries (remove): $stale")
  }
}
