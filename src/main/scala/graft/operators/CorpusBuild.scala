package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{QueryDef, Tables}

/** The capstone: ONE orchestrated corpus-build job composing the engine's
  * already-proven stage families end-to-end — the deliverable the solo
  * operators exist for (reference: the end-to-end ETL pipeline shape of
  * Health_Jim.py:116-434 / notebook cell 28, scaled to the LLM-corpus
  * domain the engine extends it into).
  *
  * Stages (each reuses the named solo operator's kernel verbatim):
  *
  *   0 ingest     — the corpus flows in through the graft-lines DSv2
  *                  source (io06/io07 lifecycle): one staged write, read
  *                  back by byte-range splits.
  *   1 clean      — NFC normalize + control strip (t13) then
  *                  boilerplate/HTML strip + whitespace collapse (t42's
  *                  [[TextOps.stripExpr]]).
  *   2 langid     — keep lang == 'en' (t25's gate).
  *   3 length     — keep n_tok >= 50 (t25's gate).
  *   4 exact dedup— md5 fingerprint of the lowered cleaned text, keep
  *                  the lowest doc_id per fingerprint (t16/m05 family).
  *   5 near dedup — candidates from the STORED bucket-partitioned LSH
  *                  band index ([[Dedup.neutralLshIndex]], shared with
  *                  d01/d10/d12), exact-Jaccard verified at 0.8 via the
  *                  stored sorted shingle sets + the native two-pointer
  *                  intersect; drop every doc with a LOWER-id verified
  *                  neighbour among the survivors (d05/d07 keep rule).
  *                  Only docs present in the index participate — exactly
  *                  the production contract (signatures are built at
  *                  ingest; a doc outside the index cannot be probed).
  *   6 decontam   — 3-gram overlap vs the held-out eval set (docs ≡ 0
  *                  mod 50); drop when shared grams reach half of own
  *                  grams (t10/t25 majority rule).
  *   7 quality    — token-stat gate: not-too-short AND not-repetitive
  *                  (t32's rules over the survivor token stream).
  *   8 pack       — contiguous 512-token sequence packing via the
  *                  distributed prefix sum (t08; no single-partition
  *                  window anywhere).
  *   9 shard      — 32 packs per output shard (m13's manifest shape).
  *
  * Planted rows make every destructive stage observable: exact copies of
  * docs < 40 (+100000 — stage 4 must remove each one whose original is
  * in-corpus), and exact copies of the held-out eval docs (+200001,
  * forced 'en' — stage 6 must remove them, since their originals never
  * enter the pipeline), with every 5th ingest id HTML-wrapped (stage 1
  * must strip it or stage 4's fingerprints would miss the planted dups
  * of wrapped originals).
  *
  * Output: the per-stage accounting funnel in the t25 shape — one row
  * per stage with surviving (n_docs, n_tokens).
  *
  * Scale design — why this is ONE corpus pass per stage family:
  *
  *  - The parsed+cleaned corpus is localCheckpoint'd (lazy), as is each
  *    stage boundary that feeds BOTH the next stage and its accounting
  *    row (the d18/g04 multi-consumer lesson: persist() does not
  *    collapse the plan, only checkpointing does). The final plan
  *    therefore contains ZERO parquet re-scans of the corpus — every
  *    accounting branch reads a stage's materialized RDD once, which is
  *    what the plan golden pins.
  *  - Near-dedup probes the stored index restricted to survivor ids
  *    (the restriction joins BEFORE the band self-join, so bucket
  *    growth is bounded by survivor density, never corpus×corpus).
  *  - The eval-gram table is bounded (the held-out set), broadcast once.
  *  - Packing and sharding ride the two-pass distributed prefix sum —
  *    partition-parallel everywhere, O(#partitions) driver state.
  */
object CorpusBuild {

  def ep01CorpusBuild(spark: SparkSession, dir: String,
                      packBudget: Long = 512L,
                      packsPerShard: Long = 32L): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"))

    // ---- plants (t25/t42 conventions) ----
    val dupPlant = base.filter(col("doc_id") < 40)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"), col("lang"))
    val evalPlant = base.filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + 200001).as("doc_id"), col("text"),
        lit("en").as("lang"))
    // one repetitive doc (a single word 64×): long enough for the length
    // gate, unique, not near anything, gram-clean — only stage 7's
    // max_tf rule can reject it
    val repPlant = base.filter(col("doc_id") === 1)
      .select(lit(300001L).as("doc_id"),
        lit(Seq.fill(64)("pad").mkString(" ")).as("text"),
        lit("en").as("lang"))
    val ingestRows = base.filter(col("doc_id") % 50 =!= 0)
      .unionByName(dupPlant).unionByName(evalPlant).unionByName(repPlant)
      .withColumn("raw",
        when(col("doc_id") % 5 === 0,
          concat(lit(TextOps.templateOpen), col("text"),
            lit(TextOps.templateClose)))
          .otherwise(col("text")))
      .select(col("doc_id"), col("lang"), col("raw"))

    // ---- stage 0: ingest through the graft-lines source ----
    val scratch = graft.util.Scratch.dir("graft_ep01_")
    ingestRows
      .select(concat(col("doc_id").cast("string"), lit("\t"),
        col("lang"), lit("\t"), col("raw")).as("value"))
      .write.mode("overwrite").text(scratch)
    val parsed = spark.read.format("graft-lines").load(scratch)
      .select(split(col("line"), "\t", 3).as("f"))
      .select(col("f").getItem(0).cast(LongType).as("doc_id"),
        col("f").getItem(1).as("lang"),
        col("f").getItem(2).as("raw"))

    // ---- stage 1: clean (t13 NFC/control + t42 strip) ----
    // lazy localCheckpoint: every accounting branch and the whole
    // downstream cascade read ONE materialized copy of the corpus
    val corpus = parsed
      .withColumn("n_tok0",
        size(split(lower(trim(col("raw"))), "\\s+")).cast(LongType))
      .withColumn("norm0",
        regexp_replace(expr("nfc_normalize(raw)"), "[\\x00-\\x1f]", ""))
      .withColumn("cleaned", expr(TextOps.stripExpr("norm0")))
      .withColumn("n_tok",
        size(split(lower(col("cleaned")), "\\s+")).cast(LongType))
      .select(col("doc_id"), col("lang"), col("n_tok0"),
        col("cleaned"), col("n_tok"))
      .localCheckpoint(false)

    // ---- stages 2+3: language and length gates (narrow re-filters of
    // the checkpointed corpus — no re-scan, no shuffle) ----
    val s2 = corpus.filter(col("lang") === "en")
    val s3 = s2.filter(col("n_tok") >= 50)

    // ---- stage 4: exact dedup (one shuffle on the fingerprint) ----
    val wFp = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    val s4 = s3
      .withColumn("fp", md5(lower(col("cleaned"))))
      .withColumn("rn", row_number().over(wFp)).filter(col("rn") === 1)
      .select(col("doc_id"), col("cleaned"), col("n_tok"))
      .localCheckpoint(false)

    // ---- stage 5: near dedup from the stored LSH index, at the
    // d19-CHOSEN band layout ----
    // The chooser's decision (largest fully-covering r, measured on the
    // sampled exact-Jaccard truth — cached per corpus per JVM) drives
    // candidate generation: on this tiny-vocab corpus the fixed 12×5
    // layout's candidates grow super-linearly (d17 measured 20.7× at
    // 10×, and the first ep01 probe attributed ~150 MB of its 10× bytes
    // to the band self-join), while the tuned layout keeps them ~linear
    // with zero measured recall loss (Round11OpsSpec proves value
    // equality with the stored layout).
    val idx = Dedup.neutralLshIndex(spark, dir)
    val sets = spark.read.parquet(s"$idx/sets")
    val chosenR = Dedup.chosenRowsPerBand(spark, dir)
    val banded = Dedup.sigBandsAt(spark, dir, chosenR)
      .select(col("doc_id"), explode(col("bands")).as("bk"))
    val survivorBands = banded.join(s4.select(col("doc_id")), "doc_id")
    val pairs = survivorBands
      .select(col("doc_id").as("ida"), col("bk"))
      .join(survivorBands.select(col("doc_id").as("idb"), col("bk")), Seq("bk"))
      .filter(col("ida") < col("idb"))
      .select(col("ida"), col("idb")).distinct()
    // verify only the PAIR PARTICIPANTS' shingle sets: the tuned layout
    // bounds candidate volume, so the participant id-list broadcasts and
    // the big sets table is filtered MAP-SIDE instead of shuffled — at
    // 100x the unfiltered form shipped the full 1.3 GB sets table
    // through the exchange; this form ships only |participants| rows
    val members = pairs.select(col("ida").as("doc_id"))
      .unionByName(pairs.select(col("idb").as("doc_id"))).distinct()
    val slim = sets.join(broadcast(members), "doc_id")
    val drops = pairs
      .join(slim.select(col("doc_id").as("ida"), col("hs").as("ha")), "ida")
      .join(slim.select(col("doc_id").as("idb"), col("hs").as("hb")), "idb")
      .withColumn("inter",
        expr("CAST(sorted_intersect_count(ha, hb) AS DOUBLE)"))
      .filter(col("inter") /
        (size(col("ha")) + size(col("hb")) - col("inter")).cast("double")
        >= 0.8)
      .select(col("idb").as("doc_id")).distinct()
    val s5 = s4.join(drops, Seq("doc_id"), "left_anti")
      .localCheckpoint(false)

    // ---- stage 6: decontam vs the held-out eval set ----
    val grams3 = expr(
      "transform(sequence(1, size(w) - 2), i -> array_join(slice(w, i, 3), ' '))")
    val evalGrams = base.filter(col("doc_id") % 50 === 0)
      .withColumn("w", split(lower(trim(col("text"))), "\\s+"))
      .filter(size(col("w")) >= 3)
      .select(explode(grams3).as("gram")).distinct()
      .withColumn("hit", lit(true))
    val overlap = s5
      .withColumn("w", split(lower(col("cleaned")), "\\s+"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(grams3).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gram")).as("own"),
        countDistinct(when(col("hit"), col("gram"))).as("shared"))
    val s6 = s5.join(overlap, Seq("doc_id"))
      .filter(col("shared") * 2 < col("own"))
      .select(col("doc_id"), col("cleaned"), col("n_tok"))
      .localCheckpoint(false)

    // ---- stage 7: quality gate (t32 rules) ----
    val qstats = s6
      .select(col("doc_id"),
        explode(split(lower(col("cleaned")), "\\s+")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("nt"), max(col("tf")).as("mx"))
    val s7 = s6.join(qstats, Seq("doc_id"))
      .filter(!(col("nt") < 10) && !(col("mx") * 5 > col("nt")))
      .select(col("doc_id"), col("n_tok"))
      .localCheckpoint(false)

    // ---- stages 8+9: pack and shard (distributed prefix sum) ----
    val packed = ScaleOps.prefixSum(s7, Seq("doc_id"), "n_tok", "cum")
      .select(expr(s"(cum - n_tok) div $packBudget").as("pack_id"),
        col("n_tok"))

    def stage(name: String, df: DataFrame, tok: String): DataFrame =
      df.agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col(tok)), lit(0L)).cast(LongType).as("n_tokens"))
        .select(lit(name).as("stage"), col("n_docs"), col("n_tokens"))

    stage("0_ingest", corpus, "n_tok0")
      .unionByName(stage("1_clean", corpus, "n_tok"))
      .unionByName(stage("2_langid", s2, "n_tok"))
      .unionByName(stage("3_length", s3, "n_tok"))
      .unionByName(stage("4_exact_dedup", s4, "n_tok"))
      .unionByName(stage("5_near_dedup", s5, "n_tok"))
      .unionByName(stage("6_decontam", s6, "n_tok"))
      .unionByName(stage("7_quality", s7, "n_tok"))
      .unionByName(packed
        .agg(countDistinct(col("pack_id")).as("n_docs"),
          coalesce(sum(col("n_tok")), lit(0L)).cast(LongType).as("n_tokens"))
        .select(lit("8_packed").as("stage"), col("n_docs"), col("n_tokens")))
      .unionByName(packed
        .agg(countDistinct(expr(s"pack_id div $packsPerShard")).as("n_docs"),
          coalesce(sum(col("n_tok")), lit(0L)).cast(LongType).as("n_tokens"))
        .select(lit("9_sharded").as("stage"), col("n_docs"), col("n_tokens")))
      .orderBy(col("stage"))
  }

  private val ep01Sql = {
    val strip =
      """trim(regexp_replace(
        |      replace(replace(replace(replace(replace(
        |        regexp_replace(regexp_replace(nfc_normalize(raw), '[\x00-\x1f]', '', 'g'),
        |          '(?s)(<script[^>]*>.*?</script>|<style[^>]*>.*?</style>|<!--.*?-->|<[^>]*>)',
        |          ' ', 'g'),
        |        '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&amp;', '&'),
        |      '\s+', ' ', 'g'))""".stripMargin
    val tOpen = TextOps.templateOpen
    val tClose = TextOps.templateClose
    s"""WITH base AS (SELECT doc_id, text, lang FROM documents),
      |ing0 AS (
      |  SELECT doc_id, lang, text FROM base WHERE doc_id % 50 <> 0
      |  UNION ALL
      |  SELECT doc_id + 100000, lang, text FROM base WHERE doc_id < 40
      |  UNION ALL
      |  SELECT doc_id + 200001, 'en', text FROM base WHERE doc_id % 50 = 0
      |  UNION ALL
      |  SELECT 300001, 'en', trim(repeat('pad ', 64)) FROM base WHERE doc_id = 1),
      |ing AS (
      |  SELECT doc_id, lang,
      |    CASE WHEN doc_id % 5 = 0 THEN '$tOpen' || text || '$tClose'
      |         ELSE text END AS raw
      |  FROM ing0),
      |cln AS (
      |  SELECT doc_id, lang,
      |    CAST(len(string_split_regex(lower(trim(raw)), '\\s+')) AS BIGINT) n_tok0,
      |    $strip AS cleaned
      |  FROM ing),
      |c2 AS (
      |  SELECT *, CAST(len(string_split_regex(lower(cleaned), '\\s+')) AS BIGINT) n_tok
      |  FROM cln),
      |s2 AS (SELECT * FROM c2 WHERE lang = 'en'),
      |s3 AS (SELECT * FROM s2 WHERE n_tok >= 50),
      |s4 AS (
      |  SELECT doc_id, cleaned, n_tok FROM (
      |    SELECT *, ROW_NUMBER() OVER (
      |      PARTITION BY md5(lower(cleaned)) ORDER BY doc_id) rn
      |    FROM s3) WHERE rn = 1),
      |sh AS (
      |  SELECT doc_id, ${Dedup.oracleHashedSet(
        """list_transform(range(1, greatest(2, length(text) - 3)),
          |           i -> substr(text, CAST(i AS INTEGER), 5))""".stripMargin)} g
      |  FROM base),
      |nd AS (
      |  SELECT DISTINCT b.doc_id FROM s4 a
      |  JOIN s4 b ON a.doc_id < b.doc_id
      |  JOIN sh ga ON ga.doc_id = a.doc_id
      |  JOIN sh gb ON gb.doc_id = b.doc_id
      |  WHERE CAST(len(list_intersect(ga.g, gb.g)) AS DOUBLE)
      |      / (len(ga.g) + len(gb.g) - len(list_intersect(ga.g, gb.g))) >= 0.8),
      |s5 AS (SELECT * FROM s4 WHERE doc_id NOT IN (SELECT doc_id FROM nd)),
      |eg AS (
      |  SELECT DISTINCT array_to_string(w[CAST(i AS INTEGER):CAST(i + 2 AS INTEGER)], ' ') gram
      |  FROM (SELECT string_split_regex(lower(trim(text)), '\\s+') w
      |        FROM base WHERE doc_id % 50 = 0),
      |    LATERAL unnest(range(1, len(w) - 1)) u(i) WHERE len(w) >= 3),
      |sg AS (
      |  SELECT doc_id, array_to_string(w[CAST(i AS INTEGER):CAST(i + 2 AS INTEGER)], ' ') gram
      |  FROM (SELECT doc_id, string_split_regex(lower(cleaned), '\\s+') w FROM s5),
      |    LATERAL unnest(range(1, len(w) - 1)) u(i) WHERE len(w) >= 3),
      |ov AS (
      |  SELECT sg.doc_id, COUNT(DISTINCT sg.gram) own,
      |    COUNT(DISTINCT sg.gram) FILTER (WHERE eg.gram IS NOT NULL) shared
      |  FROM sg LEFT JOIN eg ON sg.gram = eg.gram GROUP BY 1),
      |s6 AS (
      |  SELECT s5.doc_id, s5.cleaned, s5.n_tok FROM s5 JOIN ov USING (doc_id)
      |  WHERE ov.shared * 2 < ov.own),
      |tf AS (
      |  SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) tf FROM (
      |    SELECT doc_id, unnest(string_split_regex(lower(cleaned), '\\s+')) w
      |    FROM s6) GROUP BY doc_id, w),
      |qs AS (
      |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) nt, CAST(MAX(tf) AS BIGINT) mx
      |  FROM tf GROUP BY doc_id),
      |s7 AS (
      |  SELECT s6.doc_id, s6.n_tok FROM s6 JOIN qs USING (doc_id)
      |  WHERE NOT (qs.nt < 10) AND NOT (qs.mx * 5 > qs.nt)),
      |packed AS (
      |  SELECT (cum - n_tok) // 512 pack_id, n_tok FROM (
      |    SELECT n_tok, SUM(n_tok) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum
      |    FROM s7)),
      |funnel AS (
      |  SELECT '0_ingest' stage, COUNT(*) n_docs,
      |    CAST(COALESCE(SUM(n_tok0), 0) AS BIGINT) n_tokens FROM cln
      |  UNION ALL SELECT '1_clean', COUNT(*), CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM c2
      |  UNION ALL SELECT '2_langid', COUNT(*), CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM s2
      |  UNION ALL SELECT '3_length', COUNT(*), CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM s3
      |  UNION ALL SELECT '4_exact_dedup', COUNT(*), CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM s4
      |  UNION ALL SELECT '5_near_dedup', COUNT(*), CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM s5
      |  UNION ALL SELECT '6_decontam', COUNT(*), CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM s6
      |  UNION ALL SELECT '7_quality', COUNT(*), CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM s7
      |  UNION ALL SELECT '8_packed', COUNT(DISTINCT pack_id),
      |    CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM packed
      |  UNION ALL SELECT '9_sharded', COUNT(DISTINCT pack_id // 32),
      |    CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM packed)
      |SELECT stage, n_docs, n_tokens FROM funnel ORDER BY stage""".stripMargin
  }

  /** ep02 — the INCREMENTAL build: a daily arrival batch processed
    * against an already-built corpus. Existing corpus E = docs with
    * doc_id % 10 ≠ 7 (and not held-out eval); arrivals B = docs ≡ 7
    * (mod 10) plus plants that make each batch-specific stage
    * observable: an exact copy of an E doc (+300001, orig ≡ 1 mod 100 —
    * stage 5 must reject it against the corpus fingerprints), an exact
    * copy of a batch doc (+500001, orig ≡ 7 mod 100 — stage 4's
    * within-batch dedup), a PERTURBED copy of an E doc (+400001, orig ≡
    * 2 mod 100, text + ' qzx' — survives both exact stages, caught only
    * by stage 6's near-dup probe of the stored index), and eval copies
    * (+200001 — stage 7's decontamination). Every 3rd arrival id comes
    * HTML-wrapped (arrivals are dirty; cleaning must strip before
    * fingerprints can match the corpus).
    *
    * The incremental near-dedup is the production asymmetry: the CORPUS
    * side reads the stored index (signatures re-banded at the d19-chosen
    * layout, sets for the verify), while the BATCH side — docs the index
    * has never seen — computes signatures IN-PLAN at the same layout
    * ([[Dedup.inPlanSigAndSets]]) and probes. Batch×corpus candidates
    * only; never corpus×corpus (the d08 contract). Packing APPENDS: new
    * pack ids continue from the existing corpus's packable token mass,
    * so the shard store grows monotonically.
    *
    * Scale shape: everything batch-sided is O(|batch|); the corpus is
    * touched only through the stored index (one re-band scan + the
    * verify layer's map-side-filtered sets) and one fingerprint/token
    * pass for the append offset and exact-dedup check — each one corpus
    * scan, each linear, none shuffled beyond the fingerprint join key.
    */
  def ep02IncrementalBuild(spark: SparkSession, dir: String,
                           packBudget: Long = 512L): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"))

    def cleanCols(df: DataFrame): DataFrame = df
      .withColumn("n_tok0",
        size(split(lower(trim(col("raw"))), "\\s+")).cast(LongType))
      .withColumn("norm0",
        regexp_replace(expr("nfc_normalize(raw)"), "[\\x00-\\x1f]", ""))
      .withColumn("cleaned", expr(TextOps.stripExpr("norm0")))
      .withColumn("n_tok",
        size(split(lower(col("cleaned")), "\\s+")).cast(LongType))

    // ---- the existing corpus (already built, already indexed) ----
    val existing = cleanCols(base
        .filter(col("doc_id") % 10 =!= 7 && col("doc_id") % 50 =!= 0)
        .withColumn("raw", col("text")))
      .select(col("doc_id"), col("cleaned"), col("n_tok"))
      .localCheckpoint(false) // two consumers: fingerprints + append offset
    val corpusFps = existing
      .select(md5(lower(col("cleaned"))).as("fp")).distinct()
    // the store's packable token mass — where appended packs continue
    val packedOffset = existing
      .join(base.select(col("doc_id"), col("lang")), "doc_id")
      .filter(col("lang") === "en" && col("n_tok") >= 50)
      .agg(coalesce(sum(col("n_tok")), lit(0L)).as("off"))

    // ---- arrivals + plants ----
    val exactVsCorpus = base.filter(col("doc_id") % 100 === 1)
      .select((col("doc_id") + 300001).as("doc_id"), col("text"), col("lang"))
    val exactInBatch = base.filter(col("doc_id") % 100 === 7)
      .select((col("doc_id") + 500001).as("doc_id"), col("text"), col("lang"))
    val nearVsCorpus = base.filter(col("doc_id") % 100 === 2)
      .select((col("doc_id") + 400001).as("doc_id"),
        concat(col("text"), lit(" qzx")).as("text"), lit("en").as("lang"))
    val evalPlant = base.filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + 200001).as("doc_id"), col("text"),
        lit("en").as("lang"))
    val arrivals = base.filter(col("doc_id") % 10 === 7)
      .unionByName(exactVsCorpus).unionByName(exactInBatch)
      .unionByName(nearVsCorpus).unionByName(evalPlant)
      .withColumn("raw",
        when(col("doc_id") % 3 === 0,
          concat(lit(TextOps.templateOpen), col("text"),
            lit(TextOps.templateClose)))
          .otherwise(col("text")))
      .select(col("doc_id"), col("lang"), col("raw"))

    // ---- stages 0-3: clean + gates (batch-sided, narrow) ----
    val batch = cleanCols(arrivals)
      .select(col("doc_id"), col("lang"), col("n_tok0"),
        col("cleaned"), col("n_tok"))
      .localCheckpoint(false)
    val s2 = batch.filter(col("lang") === "en")
    val s3 = s2.filter(col("n_tok") >= 50)

    // ---- stage 4: exact dedup WITHIN the batch ----
    val wFp = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    val s4 = s3.withColumn("fp", md5(lower(col("cleaned"))))
      .withColumn("rn", row_number().over(wFp)).filter(col("rn") === 1)
      .select(col("doc_id"), col("cleaned"), col("n_tok"), col("fp"))
      .localCheckpoint(false)

    // ---- stage 5: exact dedup AGAINST the corpus fingerprints ----
    val s5 = s4.join(corpusFps, Seq("fp"), "left_anti")
      .select(col("doc_id"), col("cleaned"), col("n_tok"))
      .localCheckpoint(false)

    // ---- stage 6: near-dup probe of the STORED index ----
    val idx = Dedup.neutralLshIndex(spark, dir)
    val storedSets = spark.read.parquet(s"$idx/sets")
    val chosenR = Dedup.chosenRowsPerBand(spark, dir)
    val corpusBands = Dedup.sigBandsAt(spark, dir, chosenR)
      .join(existing.select(col("doc_id")), "doc_id")
      .select(col("doc_id").as("cid"), explode(col("bands")).as("bk"))
    val batchSig = Dedup.inPlanSigAndSets(
      s5.select(col("doc_id"), col("cleaned").as("text")), chosenR)
      .localCheckpoint(false) // consumers: band probe + verify sets
    val cand = batchSig
      .select(col("doc_id").as("bid"), explode(col("bands")).as("bk"))
      .join(corpusBands, Seq("bk"))
      .select(col("bid"), col("cid")).distinct()
    val nearDrops = cand
      .join(batchSig.select(col("doc_id").as("bid"), col("hs").as("hb")), "bid")
      .join(storedSets.select(col("doc_id").as("cid"), col("hs").as("hc")), "cid")
      .withColumn("inter",
        expr("CAST(sorted_intersect_count(hb, hc) AS DOUBLE)"))
      .filter(col("inter") /
        (size(col("hb")) + size(col("hc")) - col("inter")).cast("double")
        >= 0.8)
      .select(col("bid").as("doc_id")).distinct()
    val s6 = s5.join(nearDrops, Seq("doc_id"), "left_anti")
      .localCheckpoint(false)

    // ---- stage 7: decontam vs the held-out eval set ----
    val grams3 = expr(
      "transform(sequence(1, size(w) - 2), i -> array_join(slice(w, i, 3), ' '))")
    val evalGrams = base.filter(col("doc_id") % 50 === 0)
      .withColumn("w", split(lower(trim(col("text"))), "\\s+"))
      .filter(size(col("w")) >= 3)
      .select(explode(grams3).as("gram")).distinct()
      .withColumn("hit", lit(true))
    val overlap = s6.withColumn("w", split(lower(col("cleaned")), "\\s+"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(grams3).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gram")).as("own"),
        countDistinct(when(col("hit"), col("gram"))).as("shared"))
    val s7 = s6.join(overlap, Seq("doc_id"))
      .filter(col("shared") * 2 < col("own"))
      .select(col("doc_id"), col("cleaned"), col("n_tok"))
      .localCheckpoint(false)

    // ---- stage 8: quality gate ----
    val qstats = s7
      .select(col("doc_id"),
        explode(split(lower(col("cleaned")), "\\s+")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("nt"), max(col("tf")).as("mx"))
    val s8 = s7.join(qstats, Seq("doc_id"))
      .filter(!(col("nt") < 10) && !(col("mx") * 5 > col("nt")))
      .select(col("doc_id"), col("n_tok"))
      .localCheckpoint(false)

    // ---- stage 9: APPEND-pack (continue the store's pack numbering) ----
    val packed = ScaleOps.prefixSum(s8, Seq("doc_id"), "n_tok", "cum")
      .crossJoin(broadcast(packedOffset))
      .select(expr(s"(off + cum - n_tok) div $packBudget").as("pack_id"),
        col("n_tok"))

    def stage(name: String, df: DataFrame, tok: String): DataFrame =
      df.agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col(tok)), lit(0L)).cast(LongType).as("n_tokens"))
        .select(lit(name).as("stage"), col("n_docs"), col("n_tokens"))

    stage("0_arrivals", batch, "n_tok0")
      .unionByName(stage("1_clean", batch, "n_tok"))
      .unionByName(stage("2_langid", s2, "n_tok"))
      .unionByName(stage("3_length", s3, "n_tok"))
      .unionByName(stage("4_dedup_batch", s4, "n_tok"))
      .unionByName(stage("5_dedup_corpus", s5, "n_tok"))
      .unionByName(stage("6_neardup_corpus", s6, "n_tok"))
      .unionByName(stage("7_decontam", s7, "n_tok"))
      .unionByName(stage("8_quality", s8, "n_tok"))
      .unionByName(packed
        .agg(countDistinct(col("pack_id")).as("n_docs"),
          coalesce(sum(col("n_tok")), lit(0L)).cast(LongType).as("n_tokens"))
        .select(lit("9_appended").as("stage"), col("n_docs"), col("n_tokens")))
      .orderBy(col("stage"))
  }

  private val ep02Sql = {
    val strip =
      """trim(regexp_replace(
        |      replace(replace(replace(replace(replace(
        |        regexp_replace(regexp_replace(nfc_normalize(raw), '[\x00-\x1f]', '', 'g'),
        |          '(?s)(<script[^>]*>.*?</script>|<style[^>]*>.*?</style>|<!--.*?-->|<[^>]*>)',
        |          ' ', 'g'),
        |        '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&amp;', '&'),
        |      '\s+', ' ', 'g'))""".stripMargin
    val tOpen = TextOps.templateOpen
    val tClose = TextOps.templateClose
    val hashedSetOf = (lst: String) => Dedup.oracleHashedSet(lst)
    s"""WITH base AS (SELECT doc_id, text, lang FROM documents),
      |ex0 AS (
      |  SELECT doc_id, text AS raw FROM base
      |  WHERE doc_id % 10 <> 7 AND doc_id % 50 <> 0),
      |ex AS (
      |  SELECT doc_id, $strip AS cleaned FROM ex0),
      |exn AS (
      |  SELECT e.doc_id, cleaned,
      |    CAST(len(string_split_regex(lower(cleaned), '\\s+')) AS BIGINT) n_tok,
      |    b.lang
      |  FROM ex e JOIN base b ON e.doc_id = b.doc_id),
      |cfp AS (SELECT DISTINCT md5(lower(cleaned)) fp FROM exn),
      |poff AS (
      |  SELECT CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) poff FROM exn
      |  WHERE lang = 'en' AND n_tok >= 50),
      |arr0 AS (
      |  SELECT doc_id, lang, text FROM base WHERE doc_id % 10 = 7
      |  UNION ALL
      |  SELECT doc_id + 300001, lang, text FROM base WHERE doc_id % 100 = 1
      |  UNION ALL
      |  SELECT doc_id + 500001, lang, text FROM base WHERE doc_id % 100 = 7
      |  UNION ALL
      |  SELECT doc_id + 400001, 'en', text || ' qzx' FROM base WHERE doc_id % 100 = 2
      |  UNION ALL
      |  SELECT doc_id + 200001, 'en', text FROM base WHERE doc_id % 50 = 0),
      |arr AS (
      |  SELECT doc_id, lang,
      |    CASE WHEN doc_id % 3 = 0 THEN '$tOpen' || text || '$tClose'
      |         ELSE text END AS raw
      |  FROM arr0),
      |cln AS (
      |  SELECT doc_id, lang,
      |    CAST(len(string_split_regex(lower(trim(raw)), '\\s+')) AS BIGINT) n_tok0,
      |    $strip AS cleaned
      |  FROM arr),
      |c2 AS (
      |  SELECT *, CAST(len(string_split_regex(lower(cleaned), '\\s+')) AS BIGINT) n_tok
      |  FROM cln),
      |s2 AS (SELECT * FROM c2 WHERE lang = 'en'),
      |s3 AS (SELECT * FROM s2 WHERE n_tok >= 50),
      |s4 AS (
      |  SELECT doc_id, cleaned, n_tok, fp FROM (
      |    SELECT *, md5(lower(cleaned)) fp,
      |      ROW_NUMBER() OVER (PARTITION BY md5(lower(cleaned)) ORDER BY doc_id) rn
      |    FROM s3) WHERE rn = 1),
      |s5 AS (SELECT doc_id, cleaned, n_tok FROM s4
      |       WHERE fp NOT IN (SELECT fp FROM cfp)),
      |bsh AS (
      |  SELECT doc_id, ${hashedSetOf(
        """list_transform(range(1, greatest(2, length(cleaned) - 3)),
          |           i -> substr(cleaned, CAST(i AS INTEGER), 5))""".stripMargin)} g
      |  FROM s5),
      |csh AS (
      |  SELECT e.doc_id, ${hashedSetOf(
        """list_transform(range(1, greatest(2, length(b.text) - 3)),
          |           i -> substr(b.text, CAST(i AS INTEGER), 5))""".stripMargin)} g
      |  FROM ex0 e JOIN base b ON e.doc_id = b.doc_id),
      |nd AS (
      |  SELECT DISTINCT bsh.doc_id FROM bsh, csh
      |  WHERE CAST(len(list_intersect(bsh.g, csh.g)) AS DOUBLE)
      |      / (len(bsh.g) + len(csh.g) - len(list_intersect(bsh.g, csh.g))) >= 0.8),
      |s6 AS (SELECT * FROM s5 WHERE doc_id NOT IN (SELECT doc_id FROM nd)),
      |eg AS (
      |  SELECT DISTINCT array_to_string(w[CAST(i AS INTEGER):CAST(i + 2 AS INTEGER)], ' ') gram
      |  FROM (SELECT string_split_regex(lower(trim(text)), '\\s+') w
      |        FROM base WHERE doc_id % 50 = 0),
      |    LATERAL unnest(range(1, len(w) - 1)) u(i) WHERE len(w) >= 3),
      |sg AS (
      |  SELECT doc_id, array_to_string(w[CAST(i AS INTEGER):CAST(i + 2 AS INTEGER)], ' ') gram
      |  FROM (SELECT doc_id, string_split_regex(lower(cleaned), '\\s+') w FROM s6),
      |    LATERAL unnest(range(1, len(w) - 1)) u(i) WHERE len(w) >= 3),
      |ov AS (
      |  SELECT sg.doc_id, COUNT(DISTINCT sg.gram) own,
      |    COUNT(DISTINCT sg.gram) FILTER (WHERE eg.gram IS NOT NULL) shared
      |  FROM sg LEFT JOIN eg ON sg.gram = eg.gram GROUP BY 1),
      |s7 AS (
      |  SELECT s6.doc_id, s6.cleaned, s6.n_tok FROM s6 JOIN ov USING (doc_id)
      |  WHERE ov.shared * 2 < ov.own),
      |tf AS (
      |  SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) tf FROM (
      |    SELECT doc_id, unnest(string_split_regex(lower(cleaned), '\\s+')) w
      |    FROM s7) GROUP BY doc_id, w),
      |qs AS (
      |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) nt, CAST(MAX(tf) AS BIGINT) mx
      |  FROM tf GROUP BY doc_id),
      |s8 AS (
      |  SELECT s7.doc_id, s7.n_tok FROM s7 JOIN qs USING (doc_id)
      |  WHERE NOT (qs.nt < 10) AND NOT (qs.mx * 5 > qs.nt)),
      |packed AS (
      |  SELECT (poff.poff + cum - n_tok) // 512 pack_id, n_tok FROM (
      |    SELECT n_tok, SUM(n_tok) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum
      |    FROM s8), poff),
      |funnel AS (
      |  SELECT '0_arrivals' stage, COUNT(*) n_docs,
      |    CAST(COALESCE(SUM(n_tok0), 0) AS BIGINT) n_tokens FROM cln
      |  UNION ALL SELECT '1_clean', COUNT(*), CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM c2
      |  UNION ALL SELECT '2_langid', COUNT(*), CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM s2
      |  UNION ALL SELECT '3_length', COUNT(*), CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM s3
      |  UNION ALL SELECT '4_dedup_batch', COUNT(*), CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM s4
      |  UNION ALL SELECT '5_dedup_corpus', COUNT(*), CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM s5
      |  UNION ALL SELECT '6_neardup_corpus', COUNT(*), CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM s6
      |  UNION ALL SELECT '7_decontam', COUNT(*), CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM s7
      |  UNION ALL SELECT '8_quality', COUNT(*), CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM s8
      |  UNION ALL SELECT '9_appended', COUNT(DISTINCT pack_id),
      |    CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM packed)
      |SELECT stage, n_docs, n_tokens FROM funnel ORDER BY stage""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("ep01_corpus_build",
      "EP1/EP3 composed pipeline: ingest→clean→dedup→near-dedup→decontam→quality→pack→shard",
      ep01CorpusBuild(_, _), Some(ep01Sql)),
    QueryDef("ep02_incremental_build",
      "incremental arrival-batch build: clean→batch dedup→corpus-fp dedup→stored-index near-dup probe→decontam→quality→append-pack",
      ep02IncrementalBuild(_, _), Some(ep02Sql)))
}
