package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Deterministic sampling for training-data curation. `df.sample()` is
  * seed-dependent AND partitioning-dependent (Bernoulli over partition
  * iterators), so two runs of the same pipeline can train on different
  * data. Curation samplers must instead be pure functions of the ROW —
  * then any engine, any partitioning, any retry produces the same
  * sample, and the oracle can verify it exactly.
  */
object Sampling {

  /** s05 — stratified exact-fraction sampling: 20% of each source
    * stratum (rounded up), chosen by a per-row LCG scramble of doc_id so
    * the choice is pseudo-random but reproducible. The per-stratum
    * quota (vs a global Bernoulli) guarantees small strata are not
    * wiped out — the standard fix for domain balance in corpus
    * sampling.
    *
    * Scale shape: one hash shuffle on the stratum key; per-stratum
    * window sort. Strata at corpus scale are domains/sources (millions
    * of rows each) — if a single stratum outgrows one task, swap the
    * rank for [[ScaleOps.denseIds]] over (stratum, scramble).
    */
  def s05StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    // 31-bit LCG scramble — doc_id is small enough that the product
    // stays well inside int64 on both engines
    val scramble = pmod(col("doc_id") * 1103515245L + 12345L, lit(2147483648L))
    val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    val wc = Window.partitionBy(col("source"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), scramble.as("h"))
      .withColumn("rn", row_number().over(w))
      .withColumn("quota", ceil(count(lit(1)).over(wc) * 0.2))
      .filter(col("rn") <= col("quota"))
      .select(col("source"), col("doc_id"), col("rn").cast("long").as("pick_rank"))
      .orderBy(col("source"), col("pick_rank"))
  }

  private val s05Sql =
    """WITH h AS (
      |  SELECT doc_id, source,
      |    (doc_id * 1103515245 + 12345) % 2147483648 AS h
      |  FROM documents),
      |r AS (
      |  SELECT *,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn,
      |    CAST(CEIL(COUNT(*) OVER (PARTITION BY source) * 0.2) AS BIGINT) AS quota
      |  FROM h)
      |SELECT source, doc_id, rn AS pick_rank
      |FROM r WHERE rn <= quota
      |ORDER BY source, pick_rank""".stripMargin

  /** s06 — training-mixture apportionment: split a fixed sample budget
    * across sources proportionally to their token mass, using
    * largest-remainder (Hamilton) apportionment so the quotas are exact
    * integers that sum to EXACTLY the budget — the arithmetic every
    * mixture config ("20% code, 30% web...") needs before a sampler like
    * s05 can execute it. Floating-point shares ("rate = 0.237...") drift
    * under re-partitioning; integer quotas don't.
    *
    * All math is exact int64: `B*tokens div T` + a remainder rank. The
    * window is unpartitioned, which is safe BECAUSE the frame is one row
    * per source (mixture configs are tens of rows, not data-scale); the
    * heavy part — the per-source token sums — is an ordinary partial+
    * final hash aggregate. At extreme token counts (B*tokens near 2^63)
    * widen the product to decimal(38,0).
    */
  def s06MixApportion(spark: SparkSession, dir: String, budget: Long = 1000000L): DataFrame = {
    val per = Tables.documents(spark, dir)
      .groupBy(col("source")).agg(sum(col("n_chars")).as("tokens"))
    val tot = per.agg(sum(col("tokens")).as("tt"))
    val wRem = Window.orderBy(col("rem").desc, col("source").asc)
    val wAll = Window.partitionBy()
    per.crossJoin(broadcast(tot))
      .withColumn("base_quota", expr(s"$budget * tokens div tt"))
      .withColumn("rem", expr(s"($budget * tokens) % tt"))
      .withColumn("leftover", lit(budget) - sum(col("base_quota")).over(wAll))
      .withColumn("rr", row_number().over(wRem))
      .select(col("source"), col("tokens"),
        (col("base_quota") + when(col("rr") <= col("leftover"), 1L).otherwise(0L))
          .as("quota"))
      .orderBy(col("source"))
  }

  private val s06Sql =
    """WITH per AS (
      |  SELECT source, CAST(SUM(n_chars) AS BIGINT) tokens FROM documents GROUP BY 1),
      |t AS (SELECT CAST(SUM(tokens) AS BIGINT) tt FROM per),
      |q AS (
      |  SELECT source, tokens,
      |    1000000 * tokens // tt AS base_quota,
      |    (1000000 * tokens) % tt AS rem
      |  FROM per CROSS JOIN t),
      |r AS (
      |  SELECT *,
      |    ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC) rr,
      |    1000000 - SUM(base_quota) OVER () leftover
      |  FROM q)
      |SELECT source, tokens,
      |  CAST(base_quota + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT) AS quota
      |FROM r ORDER BY source""".stripMargin

  /** s09 — deterministic WEIGHTED sampling without replacement: 10 docs
    * per source, where a doc's chance of selection scales with its
    * length (n_chars) — the "sample long documents preferentially"
    * knob every mixture pipeline has. The scheme is
    * Efraimidis–Spirakis priority sampling with the exponential key
    * replaced by a fixed-point reciprocal: u = MINSTD(doc_id) uniform
    * in [0, 2^31), priority = u·10^6 div w, keep the k smallest per
    * stratum. Heavier w → smaller expected priority → more likely
    * kept; everything stays in int64 (u·10^6 < 2^62), so the sample is
    * a pure function of the row — reproducible under any partitioning,
    * any engine, any retry, and exactly checkable by the oracle
    * (true A-ES uses -ln(u)/w; libm ln differs across engines in the
    * last ulp, which is exactly the nondeterminism this variant
    * removes). Scale shape: one shuffle on the stratum key + per-
    * stratum top-k window; a stratum too big for one task swaps the
    * window for w06's bounded-state top-k aggregate.
    */
  def s09WeightedSample(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("priority"), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        expr(s"(pmod(doc_id * 48271, 2147483647) * 1000000) div greatest(n_chars, 1)")
          .as("priority"))
      .withColumn("pick_rank", row_number().over(w))
      .filter(col("pick_rank") <= 10)
      .select(col("source"), col("pick_rank").cast("long").as("pick_rank"),
        col("doc_id"), col("n_chars"))
      .orderBy(col("source"), col("pick_rank"))
  }

  private val s09Sql =
    """WITH h AS (
      |  SELECT doc_id, source, n_chars,
      |    ((doc_id * 48271) % 2147483647) * 1000000 // GREATEST(n_chars, 1) AS priority
      |  FROM documents),
      |r AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY priority, doc_id) AS rn
      |  FROM h)
      |SELECT source, rn AS pick_rank, doc_id, n_chars
      |FROM r WHERE rn <= 10
      |ORDER BY source, pick_rank""".stripMargin

  /** s10 — grouped train/test split with a leakage audit: the correct
    * ML split keys on the GROUP (all of a user's events land on one
    * side — the GroupKFold rationale: row-level splits leak a user's
    * test behavior into training), and the audit proves it by running
    * both policies side by side and counting users present in BOTH
    * splits. Hashing uses the a36 multiplicative family over
    * `x mod (2³¹−1)` so the product stays well inside int64 at any id
    * magnitude — `user_id * bigConstant` alone would overflow at
    * cluster-scale ids.
    *
    * Scale shape: the split decision is a pure map-side hash (no
    * global state — every executor agrees on membership without
    * coordination, which is what makes the split reproducible across
    * reruns and engines); the audit is a two-level aggregate
    * ((method, user) presence → method), the second level over
    * user-cardinality rows.
    */
  def s10GroupSplit(spark: SparkSession, dir: String): DataFrame = {
    val P = 2147483647L
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        explode(expr(
          s"""array(
             |  named_struct('method', 'by_user',
             |    'is_train', ((user_id % $P) * 31 + 17) % $P % 100 < 80),
             |  named_struct('method', 'by_event',
             |    'is_train', ((event_id % $P) * 31 + 17) % $P % 100 < 80))""".stripMargin))
          .as("x"))
      .select(col("x.method").as("method"), col("x.is_train").as("is_train"),
        col("user_id"))
      .groupBy(col("method"), col("user_id"))
      .agg(count(lit(1)).as("n_rows"),
           sum(when(col("is_train"), 1L).otherwise(0L)).as("train_rows"),
           max(when(col("is_train"), 1L).otherwise(0L)).as("in_train"),
           max(when(!col("is_train"), 1L).otherwise(0L)).as("in_test"))
      .groupBy(col("method"))
      .agg(count(lit(1)).as("n_users"),
           sum(col("n_rows")).as("n_rows"),
           sum(col("train_rows")).as("n_train_rows"),
           sum(col("in_train") * col("in_test")).as("n_users_leaked"))
      .withColumn("leak_ppm", expr("(1000000 * n_users_leaked) div n_users"))
      .orderBy(col("method"))
  }

  private val s10Sql =
    """WITH tagged AS (
      |  SELECT method, is_train, user_id FROM (
      |    SELECT user_id,
      |      unnest([
      |        {'method': 'by_user',
      |         'is_train': ((user_id % 2147483647) * 31 + 17) % 2147483647 % 100 < 80},
      |        {'method': 'by_event',
      |         'is_train': ((event_id % 2147483647) * 31 + 17) % 2147483647 % 100 < 80}]) x
      |    FROM events) t,
      |    LATERAL (SELECT t.x.method AS method, t.x.is_train AS is_train)),
      |per_user AS (
      |  SELECT method, user_id, COUNT(*) n_rows,
      |    SUM(CASE WHEN is_train THEN 1 ELSE 0 END) train_rows,
      |    MAX(CASE WHEN is_train THEN 1 ELSE 0 END) in_train,
      |    MAX(CASE WHEN is_train THEN 0 ELSE 1 END) in_test
      |  FROM tagged GROUP BY method, user_id)
      |SELECT method, COUNT(*) AS n_users,
      |  CAST(SUM(n_rows) AS BIGINT) AS n_rows,
      |  CAST(SUM(train_rows) AS BIGINT) AS n_train_rows,
      |  CAST(SUM(in_train * in_test) AS BIGINT) AS n_users_leaked,
      |  (1000000 * CAST(SUM(in_train * in_test) AS BIGINT)) // COUNT(*) AS leak_ppm
      |FROM per_user GROUP BY method
      |ORDER BY method""".stripMargin

  /** s11 — class rebalancing by deterministic downsampling: every label
    * is cut to the minority class's size, keeping each label's m rows
    * with the smallest scrambled key (the s05 lesson: engine `sample()`
    * is partitioning-dependent; a hash order is reproducible anywhere —
    * and the multiplicative mix keeps small ids from degenerating, the
    * st09 lesson). The audit emits before/after counts and a kept-id
    * checksum so the driver hash-checks the SELECTION, not just its
    * size.
    *
    * Scale shape: the minority size is a 1-row broadcast off the label
    * count table; ranking windows partition per label (balanced groups
    * by construction); selection is a per-row comparison — no global
    * sort, no collect.
    */
  def s11ClassRebalance(spark: SparkSession, dir: String): DataFrame = {
    val P = 2147483647L
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"))
      .withColumn("k", expr(s"(vec_id % $P) * 2654435761 % $P"))
    val m = e.groupBy(col("label")).agg(count(lit(1)).as("n"))
      .agg(min(col("n")).as("m"))
    val w = Window.partitionBy(col("label")).orderBy(col("k"), col("vec_id"))
    e.crossJoin(broadcast(m))
      .withColumn("rn", row_number().over(w))
      .withColumn("kept", col("rn") <= col("m"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_before"),
           sum(when(col("kept"), 1L).otherwise(0L)).as("n_after"),
           sum(when(col("kept"), col("vec_id")).otherwise(0L)).as("kept_id_sum"))
      .orderBy(col("label"))
  }

  private val s11Sql =
    """WITH e AS (
      |  SELECT vec_id, label,
      |    (vec_id % 2147483647) * 2654435761 % 2147483647 k
      |  FROM embeddings),
      |m AS (SELECT CAST(MIN(n) AS BIGINT) m FROM (
      |        SELECT label, COUNT(*) n FROM e GROUP BY label)),
      |r AS (
      |  SELECT label, vec_id,
      |    ROW_NUMBER() OVER (PARTITION BY label ORDER BY k, vec_id) rn
      |  FROM e)
      |SELECT label, COUNT(*) AS n_before,
      |  CAST(SUM(CASE WHEN rn <= m.m THEN 1 ELSE 0 END) AS BIGINT) AS n_after,
      |  CAST(SUM(CASE WHEN rn <= m.m THEN vec_id ELSE 0 END) AS BIGINT) AS kept_id_sum
      |FROM r CROSS JOIN m
      |GROUP BY label
      |ORDER BY label""".stripMargin

  /** s12 — temperature-scaled mixture sampling (α = 0.5): source weights
    * ∝ √n_docs instead of n_docs — the multilingual/LLM rebalancing
    * standard (Conneau & Lample's temperature sampling) that upweights
    * small sources so a dominant domain cannot monopolize the budget.
    * √n is the one temperature whose weights stay ENGINE-EXACT: IEEE-754
    * sqrt is correctly rounded (bit-identical in any libm), and
    * floor(√n·10⁶) freezes it into int64 before any further arithmetic.
    * The integer weights feed s06's largest-remainder apportionment, and
    * s05's LCG scramble executes the per-source picks, so the output —
    * per-source quota, kept count, kept-id checksum — is a pure function
    * of the data on both engines.
    *
    * Scale shape: one count aggregate, a tens-of-rows quota frame
    * (broadcast), one window rank per source partition for the
    * execution — identical cost profile to s05.
    */
  def s12TemperatureMix(spark: SparkSession, dir: String, budget: Long = 500L): DataFrame = {
    val per = Tables.documents(spark, dir)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .withColumn("wgt",
        expr("CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT)"))
    val tot = per.agg(sum(col("wgt")).as("tw"))
    val wRem = Window.orderBy(col("rem").desc, col("source").asc)
    val wAll = Window.partitionBy()
    val quotas = per.crossJoin(broadcast(tot))
      .withColumn("base_quota", expr(s"$budget * wgt div tw"))
      .withColumn("rem", expr(s"($budget * wgt) % tw"))
      .withColumn("leftover", lit(budget) - sum(col("base_quota")).over(wAll))
      .withColumn("rr", row_number().over(wRem))
      .select(col("source"), col("n_docs"),
        (col("base_quota") + when(col("rr") <= col("leftover"), 1L).otherwise(0L))
          .as("quota"))
    val scramble = pmod(col("doc_id") * 1103515245L + 12345L, lit(2147483648L))
    val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    val picked = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), scramble.as("h"))
      .withColumn("rn", row_number().over(w))
      .join(broadcast(quotas.select(col("source"), col("quota"))), "source")
      .filter(col("rn") <= col("quota"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("kept_id_sum"))
    // `picked` is a per-source aggregate (tens of rows) but sits behind a
    // window+join pipeline, so the size estimate balloons past the
    // autoBroadcast threshold — hint it explicitly or AQE plans an SMJ.
    quotas.join(broadcast(picked), Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("quota"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_id_sum"), lit(0L)).as("kept_id_sum"))
      .orderBy(col("source"))
  }

  private val s12Sql =
    """WITH per AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) n_docs FROM documents GROUP BY 1),
      |wg AS (
      |  SELECT source, n_docs,
      |    CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT) wgt
      |  FROM per),
      |t AS (SELECT CAST(SUM(wgt) AS BIGINT) tw FROM wg),
      |q AS (
      |  SELECT source, n_docs, wgt,
      |    500 * wgt // tw AS base_quota,
      |    (500 * wgt) % tw AS rem
      |  FROM wg CROSS JOIN t),
      |r AS (
      |  SELECT *,
      |    ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC) rr,
      |    500 - SUM(base_quota) OVER () leftover
      |  FROM q),
      |quotas AS (
      |  SELECT source, n_docs,
      |    CAST(base_quota + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT) quota
      |  FROM r),
      |h AS (
      |  SELECT doc_id, source,
      |    (doc_id * 1103515245 + 12345) % 2147483648 AS h
      |  FROM documents),
      |rn AS (
      |  SELECT doc_id, source,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) rn
      |  FROM h),
      |picked AS (
      |  SELECT rn.source, rn.doc_id
      |  FROM rn JOIN quotas USING (source) WHERE rn.rn <= quotas.quota)
      |SELECT quotas.source, quotas.n_docs, quotas.quota,
      |  CAST(COUNT(picked.doc_id) AS BIGINT) AS n_kept,
      |  CAST(COALESCE(SUM(picked.doc_id), 0) AS BIGINT) AS kept_id_sum
      |FROM quotas LEFT JOIN picked ON quotas.source = picked.source
      |GROUP BY 1, 2, 3
      |ORDER BY quotas.source""".stripMargin

  /** s13 — temporal train/val/test split + leakage audit: time-series
    * models split by TIME, never by row hash — a hash split leaks the
    * future into training. Cut points sit at 70% / 85% of the observed
    * time span (integer-micros arithmetic over a 1-row min/max extent
    * broadcast — the a31 idiom, no driver collect), and the audit
    * reports what a time split cannot avoid and a modeler must know:
    * how many test/val users were already seen in train ("warm", their
    * behavior partially memorized) vs genuinely cold. Split sizes,
    * per-split user counts, warm/cold counts and warm ppm — all exact
    * integers.
    *
    * Scale shape: one scan for the extent, one for the split tagging;
    * the warm/cold audit is a semi-join of per-split user sets against
    * train users — shuffle on the high-cardinality user key, no skew.
    */
  def s13TimeSplit(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"))
    val extent = ev.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
    val tagged = ev.crossJoin(broadcast(extent))
      .withColumn("split", expr(
        """CASE WHEN (us - lo) * 100 < (hi - lo) * 70 THEN 'train'
          |     WHEN (us - lo) * 100 < (hi - lo) * 85 THEN 'val'
          |     ELSE 'test' END""".stripMargin))
    val users = tagged.select(col("split"), col("user_id")).distinct()
    val trainUsers = users.filter(col("split") === "train")
      .select(col("user_id").as("tu"))
    val warm = users.join(trainUsers, col("user_id") === col("tu"), "left")
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_users"),
        count(col("tu")).as("warm_users"))
    // two 3-row tables: pin the build side (the w29 golden-flap lesson)
    tagged.groupBy(col("split")).agg(count(lit(1)).as("n_events"))
      .join(broadcast(warm), "split")
      .withColumn("cold_users", col("n_users") - col("warm_users"))
      .withColumn("warm_ppm", expr("(1000000 * warm_users) div n_users"))
      .orderBy(col("split"))
  }

  private val s13Sql =
    """WITH e AS (SELECT user_id, epoch_us(ts) us FROM events),
      |x AS (SELECT MIN(us) lo, MAX(us) hi FROM e),
      |t AS (
      |  SELECT user_id, us,
      |    CASE WHEN (us - lo) * 100 < (hi - lo) * 70 THEN 'train'
      |         WHEN (us - lo) * 100 < (hi - lo) * 85 THEN 'val'
      |         ELSE 'test' END split
      |  FROM e, x),
      |u AS (SELECT DISTINCT split, user_id FROM t),
      |tr AS (SELECT user_id FROM u WHERE split = 'train'),
      |w AS (
      |  SELECT u.split, CAST(COUNT(*) AS BIGINT) n_users,
      |    CAST(COUNT(tr.user_id) AS BIGINT) warm_users
      |  FROM u LEFT JOIN tr ON u.user_id = tr.user_id
      |  GROUP BY 1),
      |n AS (SELECT split, COUNT(*) n_events FROM t GROUP BY 1)
      |SELECT n.split, n_events, n_users, warm_users,
      |  n_users - warm_users AS cold_users,
      |  (1000000 * warm_users) // n_users AS warm_ppm
      |FROM n JOIN w ON n.split = w.split
      |ORDER BY n.split""".stripMargin

  /** s14 — deterministic EPOCH SHUFFLE: the training-data ordering
    * primitive. Each epoch e permutes the corpus by the md5-int64 image
    * of "e:doc_id" (ties broken by doc_id — a total order, so the
    * permutation is a pure function of the row and the epoch number:
    * any engine, any partitioning, any retry reproduces it), then cuts
    * the permuted order into `shards` equal-size contiguous shards
    * (sizes differ by at most 1 — `ord·shards div n`). Reported per
    * (epoch, shard): count, order extent, and an order-sensitive
    * engine-neutral checksum (bit_xor of the md5 image of
    * "doc_id@ord" — position-dependent, so ANY mis-assignment flips
    * it).
    *
    * Scale shape: the global per-epoch rank runs through
    * [[ScaleOps.denseIds]] (range-repartition + partition-offset — no
    * single-partition window), and because epochs sort first, ONE
    * dense-id pass ranks every epoch: ord = gid − 1 − epoch·n with n
    * from parquet footer metadata. At 100 TB this is the
    * shuffle-service-free epoch reshuffle: each epoch is one range
    * exchange, shards land contiguous in permuted order so a trainer
    * streams shard files without a second shuffle.
    */
  def s14EpochShuffle(spark: SparkSession, dir: String,
                      epochs: Int = 3, shards: Int = 8): DataFrame = {
    val n = Tables.footerRowCount(spark, dir, "documents")
    val keyed = Tables.documents(spark, dir).select(col("doc_id"))
      .select(col("doc_id"), explode(expr(s"sequence(0, ${epochs - 1})")).as("epoch"))
      .withColumn("k", expr(
        "CAST(conv(substring(md5(concat(CAST(epoch AS STRING), ':', " +
          "CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"))
    ScaleOps.denseIds(keyed, Seq("epoch", "k", "doc_id"), "gid")
      .withColumn("ord", col("gid") - 1L - col("epoch").cast("long") * n)
      .withColumn("shard", expr(s"ord * $shards div $n"))
      .groupBy(col("epoch"), col("shard"))
      .agg(count(lit(1)).as("n_docs"),
           min(col("ord")).as("first_ord"),
           max(col("ord")).as("last_ord"),
           expr("bit_xor(CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), " +
             "'@', CAST(ord AS STRING))), 1, 15), 16, 10) AS BIGINT))")
             .as("order_checksum"))
      .orderBy(col("epoch"), col("shard"))
  }

  private val s14Sql =
    """WITH nn AS (SELECT COUNT(*) n FROM documents),
      |e AS (
      |  SELECT doc_id, CAST(ep.epoch AS INTEGER) epoch
      |  FROM documents, (SELECT unnest(range(0, 3)) epoch) ep),
      |k AS (
      |  SELECT doc_id, epoch,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(1, 16),
      |        i -> CAST(strpos('0123456789abcdef',
      |               substr(md5(epoch || ':' || doc_id), CAST(i AS INTEGER), 1)) - 1 AS BIGINT))),
      |      (a, b) -> a * 16 + b) k
      |  FROM e),
      |o AS (
      |  SELECT doc_id, epoch,
      |    ROW_NUMBER() OVER (PARTITION BY epoch ORDER BY k, doc_id) - 1 ord
      |  FROM k),
      |s AS (SELECT doc_id, epoch, ord, ord * 8 // nn.n shard FROM o, nn)
      |SELECT epoch, shard, COUNT(*) n_docs,
      |  MIN(ord) AS first_ord, MAX(ord) AS last_ord,
      |  bit_xor(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(range(1, 16),
      |      i -> CAST(strpos('0123456789abcdef',
      |             substr(md5(doc_id || '@' || ord), CAST(i AS INTEGER), 1)) - 1 AS BIGINT))),
      |    (a, b) -> a * 16 + b)) AS order_checksum
      |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** s15 — deterministic stratified k-fold assignment (k = 5): the
    * cross-validation split ML evaluation runs on top of the corpus —
    * every doc lands in exactly one fold by the shared md5-int64 image
    * of its id (so the assignment is reproducible on any engine, any
    * partitioning, any day — the s05 determinism rule), and the audit
    * emitted here is what a reviewer actually checks before trusting a
    * CV number: per-(fold, language) counts and an order-invariant XOR
    * id checksum proving the folds PARTITION the corpus (Σ = table,
    * disjointness by construction of a function), with per-stratum
    * balance asserted in Round8OpsSpec (hash-uniform folds hold each
    * stratum's share to within sampling noise).
    *
    * Scale shape: one projection + one partial-aggregated groupBy on
    * (fold, lang) — bounded output (k × |langs|), no shuffle of doc
    * rows beyond the aggregate's.
    */
  def s15StratifiedKfold(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"),
        expr("pmod(CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT), 5)")
          .as("fold"),
        expr("CAST(conv(substring(md5(concat('kf:', CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)")
          .as("img"))
      .groupBy(col("fold"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        expr("bit_xor(img)").as("id_checksum"))
      .orderBy(col("fold"), col("lang"))

  private val s15Sql =
    """WITH a AS (
      |  SELECT lang,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(1, 16),
      |        i -> CAST(strpos('0123456789abcdef',
      |               substr(md5(CAST(doc_id AS VARCHAR)), CAST(i AS INTEGER), 1)) - 1 AS BIGINT))),
      |      (a, b) -> a * 16 + b) % 5 fold,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(1, 16),
      |        i -> CAST(strpos('0123456789abcdef',
      |               substr(md5(concat('kf:', CAST(doc_id AS VARCHAR))), CAST(i AS INTEGER), 1)) - 1 AS BIGINT))),
      |      (a, b) -> a * 16 + b) img
      |  FROM documents)
      |SELECT fold, lang, CAST(COUNT(*) AS BIGINT) n_docs,
      |  CAST(bit_xor(img) AS BIGINT) id_checksum
      |FROM a GROUP BY 1, 2 ORDER BY fold, lang""".stripMargin

  /** s16 — universe (join-consistent) sampling vs independent Bernoulli:
    * the correlated-sampling lemma every join-cardinality estimator and
    * every "develop on 1% of the lake" workflow rests on. Hashing the
    * JOIN KEY with one shared function and keeping keys whose image
    * ≡ 0 (mod 10) samples BOTH fact tables consistently: the join of
    * the samples is exactly the join restricted to kept keys — a true
    * 10% universe sample of the join, unbiased via est = joined/p.
    * Independent per-row 10% Bernoulli on each side destroys join
    * density instead: a pair survives only when both rows independently
    * survive (p² ≈ 1%), so the same estimator needs joined/p² and its
    * variance is driven by a 100× smaller surviving-pair count — the
    * measured joined_rows gap between the two strategy rows IS the
    * lemma. At 100 TB: universe sampling is a metadata-free filter that
    * composes with every downstream join (same keys kept everywhere);
    * independent sampling is only safe for single-table statistics.
    *
    * Determinism: the shared md5-int64 image (d10/d12 convention) on
    * both engines; estimates and err_ppm are exact integer arithmetic.
    */
  def s16UniverseSample(spark: SparkSession, dir: String): DataFrame = {
    // PLAN SHAPE (the r8 scale-probe finding): the first cut ran one
    // aggregate per count — 4 orders scans + 5 lineitem scans and TWO
    // shuffle joins — and its 10× probe walls (24.4×/9.1× on linear
    // bytes) were the serialized scans stacking up. This form reads
    // each table TWICE (one wide conditional aggregate for every kept/
    // total count; one scan feeding the single join) and runs ONE join
    // whose sides are pre-filtered to the UNION of the two samples
    // (~11–19% of rows), counting both strategies' joined rows from
    // flags carried through the join. Same emitted values, 9 scans → 4,
    // 2 joins → 1.
    def img(s: String) =
      s"pmod(CAST(conv(substring(md5($s), 1, 15), 16, 10) AS BIGINT), 10)"
    val uO = img("concat('u:', CAST(o_orderkey AS STRING))") + " = 0"
    val iO = img("concat('o:', CAST(o_orderkey AS STRING))") + " = 0"
    val uL = img("concat('u:', CAST(l_orderkey AS STRING))") + " = 0"
    val iL = img("concat('l:', CAST(l_orderkey AS STRING), ':', " +
      "CAST(l_linenumber AS STRING))") + " = 0"
    val oFlags = Tables.orders(spark, dir)
      .select(col("o_orderkey"), expr(uO).as("u_o"), expr(iO).as("i_o"))
    val lFlags = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), expr(uL).as("u_l"), expr(iL).as("i_l"))
    // one wide aggregate per table: every side count in a single scan
    val oCounts = oFlags.agg(
      sum(when(col("u_o"), 1L).otherwise(0L)).as("kept_orders_u"),
      sum(when(col("i_o"), 1L).otherwise(0L)).as("kept_orders_i"))
    val lCounts = lFlags.agg(count(lit(1)).as("true_total"),
      sum(when(col("u_l"), 1L).otherwise(0L)).as("kept_lineitem_u"),
      sum(when(col("i_l"), 1L).otherwise(0L)).as("kept_lineitem_i"))
    // ONE join, sides filtered to the union of both samples; a pair is
    // a universe join row iff both u-flags hold (they agree by
    // construction — same key, same hash) and an independent join row
    // iff both per-row i-flags hold
    val joined = oFlags.filter(col("u_o") || col("i_o"))
      .join(lFlags.filter(col("u_l") || col("i_l")),
        col("o_orderkey") === col("l_orderkey"))
      .agg(sum(when(col("u_o") && col("u_l"), 1L).otherwise(0L)).as("joined_u"),
        sum(when(col("i_o") && col("i_l"), 1L).otherwise(0L)).as("joined_i"))
    def emit(name: String, ko: String, kl: String, j: String,
             scale: Long): Column = struct(
      lit(name).as("strategy"), col(ko).as("kept_orders"),
      col(kl).as("kept_lineitem"),
      col(j).as("joined_rows"), (col(j) * scale).as("est_total"),
      col("true_total"),
      // numerator in DECIMAL(38,0) from the first multiply:
      // joined*scale*1e6 passes int64 near 9e10 joined rows — the
      // oracle's HUGEINT never wraps, so the Spark side must not
      // hit ANSI overflow there either
      expr(s"CAST(abs(CAST($j AS DECIMAL(38,0)) * $scale " +
        s"- true_total) * 1000000 div true_total AS BIGINT)").as("err_ppm"))
    oCounts.crossJoin(broadcast(lCounts)).crossJoin(broadcast(joined))
      .select(explode(array(
        emit("universe", "kept_orders_u", "kept_lineitem_u", "joined_u", 10L),
        emit("independent", "kept_orders_i", "kept_lineitem_i", "joined_i",
          100L))).as("r"))
      .select(col("r.*"))
      .orderBy(col("strategy").desc)
  }

  private val s16Sql = {
    def img(s: String) =
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(1, 16),
         |        i -> CAST(strpos('0123456789abcdef',
         |               substr(md5($s), CAST(i AS INTEGER), 1)) - 1 AS BIGINT))),
         |      (a, b) -> a * 16 + b) % 10""".stripMargin
    s"""WITH uo AS (SELECT o_orderkey k FROM orders
       |  WHERE ${img("concat('u:', CAST(o_orderkey AS VARCHAR))")} = 0),
       |ul AS (SELECT l_orderkey k FROM lineitem
       |  WHERE ${img("concat('u:', CAST(l_orderkey AS VARCHAR))")} = 0),
       |io_ AS (SELECT o_orderkey k FROM orders
       |  WHERE ${img("concat('o:', CAST(o_orderkey AS VARCHAR))")} = 0),
       |il AS (SELECT l_orderkey k FROM lineitem
       |  WHERE ${img("concat('l:', CAST(l_orderkey AS VARCHAR), ':', CAST(l_linenumber AS VARCHAR))")} = 0),
       |t AS (SELECT CAST(COUNT(*) AS BIGINT) n FROM lineitem),
       |rows_ AS (
       |  SELECT 'universe' strategy,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM uo) kept_orders,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM ul) kept_lineitem,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM uo JOIN ul ON uo.k = ul.k) joined_rows,
       |    CAST(10 AS BIGINT) scale
       |  UNION ALL
       |  SELECT 'independent',
       |    (SELECT COUNT(*) FROM io_), (SELECT COUNT(*) FROM il),
       |    (SELECT COUNT(*) FROM io_ JOIN il ON io_.k = il.k), 100)
       |SELECT strategy, kept_orders, kept_lineitem, joined_rows,
       |  joined_rows * scale est_total, t.n true_total,
       |  CAST(abs(CAST(joined_rows AS HUGEINT) * scale - t.n) * 1000000
       |    // t.n AS BIGINT) err_ppm
       |FROM rows_, t ORDER BY strategy DESC""".stripMargin
  }

  /** s17 — weight-proportional SYSTEMATIC resampling: place n = 100
    * equally-spaced points on the cumulative-weight axis (midpoint rule:
    * point j sits at (2j+1)·W / 2n) and give each document one copy per
    * point falling in its weight interval — the importance-resampling
    * step that turns per-doc weights (t41's DSIR weights, quality
    * scores, here n_chars) into an actual training mix. Systematic
    * selection dominates multinomial draws for this: copies_d is always
    * ⌊n·w_d/W⌋ or ⌈n·w_d/W⌉ (variance < 1, asserted in spec), totals
    * are EXACTLY n, and with the deterministic midpoint offset there is
    * no RNG — both engines enumerate the same sample.
    *
    * Exact form: with inclusive cumulative weight C_d, copies_d =
    * f(C_d) − f(C_d − w_d) where f(c) = min(n, ⌈(2nc − W)/2W⌉) counts
    * the sample points below c — evaluated as (2nc + W − 1) div 2W in
    * DECIMAL(38,0)/HUGEINT on both engines (exact to W ~ 10³⁵).
    *
    * Scale shape: the cumulative weights come from the distributed
    * two-pass [[ScaleOps.prefixSum]] (range partition + per-partition
    * offsets, no single-partition window); everything after is per-row
    * arithmetic against one broadcast total. The output is the SELECTED
    * docs only (≤ n rows when weights are heavy-tailed, ≤ corpus always).
    */
  def s17SystematicResample(spark: SparkSession, dir: String, n: Int = 100): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars").cast("long").as("weight"))
    val cum = graft.operators.ScaleOps.prefixSum(docs, Seq("doc_id"), "weight", "cw")
    val tot = docs.agg(sum(col("weight")).as("w_total"))
    def f(c: String): String =
      s"least(CAST($n AS DECIMAL(38,0)), greatest(CAST(0 AS DECIMAL(38,0)), " +
        s"(CAST(2 AS DECIMAL(38,0)) * $n * ($c) + w_total - 1) div (CAST(2 AS DECIMAL(38,0)) * w_total)))"
    cum.crossJoin(broadcast(tot))
      .withColumn("copies", expr(
        s"CAST(${f("cw")} - ${f("cw - weight")} AS BIGINT)"))
      .filter(col("copies") > 0)
      .select(col("doc_id"), col("weight"), col("copies"))
      .orderBy(col("doc_id"))
  }

  private val s17Sql =
    """WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) weight FROM documents),
      |c AS (
      |  SELECT doc_id, weight,
      |    SUM(weight) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND CURRENT ROW) cw,
      |    SUM(weight) OVER () w_total
      |  FROM d),
      |k AS (
      |  SELECT doc_id, weight,
      |    least(CAST(100 AS HUGEINT), greatest(CAST(0 AS HUGEINT),
      |      (CAST(200 AS HUGEINT) * cw + w_total - 1) // (CAST(2 AS HUGEINT) * w_total)))
      |    - least(CAST(100 AS HUGEINT), greatest(CAST(0 AS HUGEINT),
      |      (CAST(200 AS HUGEINT) * (cw - weight) + w_total - 1) // (CAST(2 AS HUGEINT) * w_total)))
      |    copies
      |  FROM c)
      |SELECT doc_id, weight, CAST(copies AS BIGINT) copies
      |FROM k WHERE copies > 0
      |ORDER BY doc_id""".stripMargin

  /** s18 — Neyman (variance-optimal) stratified allocation: how many of
    * a 1000-row sample budget each stratum DESERVES — n_h ∝ N_h·σ_h, the
    * allocation that minimizes the stratified mean's variance (Neyman
    * 1934), versus the proportional allocation [[s05StratifiedSample]]
    * implements. High-variance strata are oversampled; near-constant
    * strata need almost nothing — the budget decision every
    * stratified-sampling pipeline makes before s05 draws a single row.
    *
    * Exactness: N_h·σ_h = √(D_h) with D_h = n_h·Σx² − (Σx)² (the n²·
    * variance integer, exact in DECIMAL(38,0), emitted as STRING since
    * cents² crosses int64 — the a56 rule). The square root is an exact
    * INTEGER floor-sqrt: IEEE double sqrt seed (correctly rounded in
    * both engines), one integer Newton step r₁ = (r₀ + D div r₀) div 2
    * (seed error ≤ ~2⁹ at D near 10³⁸ collapses below 1), then a ±1
    * clamp — bit-identical across engines, valid to D < 8.5·10³⁷
    * (r < int64). Seats are assigned by largest remainder (the s06
    * apportionment convention): Σ alloc = 1000 exactly, ties broken by
    * stratum key.
    *
    * Scale shape: ONE wide conditional aggregate per stratum (map-side
    * partials), everything after runs on the |strata|-row frame.
    */
  def s18NeymanAllocation(spark: SparkSession, dir: String,
                          budget: Long = 1000L): DataFrame = {
    val D = org.apache.spark.sql.types.DecimalType(38, 0)
    val strata = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("priority"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("x"))
      .groupBy(col("priority"))
      .agg(count(lit(1)).as("n_rows"), sum(col("x")).as("sum_cents"),
        sum(col("x").cast(D) * col("x")).cast(D).as("sxx"))
      .withColumn("d_h", (col("n_rows") * col("sxx") -
        col("sum_cents").cast(D) * col("sum_cents")).cast(D))
      // exact integer floor-sqrt: IEEE seed, one Newton step, ±1 clamp
      .withColumn("r0", expr("CAST(sqrt(CAST(d_h AS DOUBLE)) AS BIGINT)"))
      .withColumn("r1", expr(
        "CASE WHEN r0 <= 0 THEN CAST(0 AS BIGINT) " +
          "ELSE CAST((r0 + CAST(d_h div r0 AS BIGINT)) div 2 AS BIGINT) END"))
      .withColumn("sd_scaled", expr(
        "CASE WHEN CAST(r1 + 1 AS DECIMAL(38,0)) * (r1 + 1) <= d_h THEN r1 + 1 " +
          "WHEN CAST(r1 AS DECIMAL(38,0)) * r1 > d_h THEN r1 - 1 ELSE r1 END"))
    def largestRemainder(df: DataFrame, weight: String, out: String): DataFrame = {
      // budget·weight lifts to DECIMAL(38,0): sd_scaled can sit near
      // int64, so the seat arithmetic must not wrap at the headroom edge
      val withTotal = df
        .crossJoin(broadcast(
          df.agg(sum(col(weight).cast(D)).cast(D).as("w_total"))))
        .withColumn("floor_seats", expr(
          s"CAST((CAST($budget AS DECIMAL(38,0)) * $weight) div w_total AS BIGINT)"))
        .withColumn("rem", expr(
          s"CAST(CAST($budget AS DECIMAL(38,0)) * $weight AS DECIMAL(38,0)) % w_total"))
      val leftOver = withTotal
        .agg((lit(budget) - sum(col("floor_seats"))).as("left_over"))
      val wRank = Window.orderBy(col("rem").desc, col("priority").asc)
      withTotal.crossJoin(broadcast(leftOver))
        .withColumn("rk", row_number().over(wRank))
        .withColumn(out,
          (col("floor_seats") + when(col("rk") <= col("left_over"), 1L)
            .otherwise(0L)).cast("long"))
        .drop("w_total", "floor_seats", "rem", "left_over", "rk")
    }
    val withNeyman = largestRemainder(strata, "sd_scaled", "alloc_neyman")
    val withBoth = largestRemainder(withNeyman, "n_rows", "alloc_proportional")
    withBoth.select(col("priority"), col("n_rows"), col("sum_cents"),
        col("d_h").cast("string").as("d_h"), col("sd_scaled"),
        col("alloc_neyman"), col("alloc_proportional"))
      .orderBy(col("priority"))
  }

  private val s18Sql =
    """WITH s AS (
      |  SELECT o_orderpriority priority, CAST(COUNT(*) AS BIGINT) n_rows,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) sum_cents,
      |    SUM(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS HUGEINT)
      |      * CAST(round(o_totalprice * 100) AS BIGINT)) sxx
      |  FROM orders GROUP BY 1),
      |d AS (
      |  SELECT priority, n_rows, sum_cents,
      |    n_rows * sxx - CAST(sum_cents AS HUGEINT) * sum_cents d_h
      |  FROM s),
      |r AS (
      |  SELECT *, CAST(sqrt(CAST(d_h AS DOUBLE)) AS BIGINT) r0 FROM d),
      |r1 AS (
      |  SELECT *, CASE WHEN r0 <= 0 THEN CAST(0 AS BIGINT)
      |    ELSE CAST((r0 + CAST(d_h // r0 AS BIGINT)) // 2 AS BIGINT) END r1
      |  FROM r),
      |sd AS (
      |  SELECT priority, n_rows, sum_cents, d_h,
      |    CASE WHEN CAST(r1 + 1 AS HUGEINT) * (r1 + 1) <= d_h THEN r1 + 1
      |         WHEN CAST(r1 AS HUGEINT) * r1 > d_h THEN r1 - 1 ELSE r1 END sd_scaled
      |  FROM r1),
      |ney AS (
      |  SELECT priority, n_rows, sum_cents, d_h, sd_scaled,
      |    CAST((CAST(1000 AS HUGEINT) * sd_scaled)
      |      // (SELECT SUM(CAST(sd_scaled AS HUGEINT)) FROM sd) AS BIGINT) fl,
      |    ROW_NUMBER() OVER (ORDER BY
      |      (CAST(1000 AS HUGEINT) * sd_scaled)
      |        % (SELECT SUM(CAST(sd_scaled AS HUGEINT)) FROM sd) DESC,
      |      priority ASC) rk
      |  FROM sd),
      |ney2 AS (
      |  SELECT *, CAST(fl + CASE WHEN rk <= 1000 - (SELECT SUM(fl) FROM ney)
      |    THEN 1 ELSE 0 END AS BIGINT) alloc_neyman
      |  FROM ney),
      |pro AS (
      |  SELECT priority,
      |    CAST((CAST(1000 AS HUGEINT) * n_rows)
      |      // (SELECT SUM(CAST(n_rows AS HUGEINT)) FROM sd) AS BIGINT) fl2,
      |    ROW_NUMBER() OVER (ORDER BY
      |      (CAST(1000 AS HUGEINT) * n_rows)
      |        % (SELECT SUM(CAST(n_rows AS HUGEINT)) FROM sd) DESC,
      |      priority ASC) rk2
      |  FROM sd),
      |pro2 AS (
      |  SELECT priority, CAST(fl2 + CASE WHEN rk2 <= 1000 - (SELECT SUM(fl2) FROM pro)
      |    THEN 1 ELSE 0 END AS BIGINT) alloc_proportional
      |  FROM pro)
      |SELECT ney2.priority, n_rows, sum_cents, CAST(d_h AS VARCHAR) d_h,
      |  sd_scaled, alloc_neyman, alloc_proportional
      |FROM ney2 JOIN pro2 ON ney2.priority = pro2.priority
      |ORDER BY ney2.priority""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("s18_neyman_allocation",
      "Neyman variance-optimal stratified allocation: exact integer floor-sqrt of n^2-variance, largest-remainder seats vs proportional",
      s18NeymanAllocation(_, _), Some(s18Sql)),
    QueryDef("s17_systematic_resample",
      "weight-proportional systematic resampling: exact n=100 copies via midpoint points on the cumulative axis",
      s17SystematicResample(_, _), Some(s17Sql)),
    QueryDef("s16_universe_sample",
      "universe (join-key-consistent) sampling vs independent Bernoulli: the correlated-sampling lemma measured",
      s16UniverseSample, Some(s16Sql)),
    QueryDef("s15_stratified_kfold",
      "deterministic stratified 5-fold CV assignment: partition proof + per-stratum balance",
      s15StratifiedKfold, Some(s15Sql)),
    QueryDef("s14_epoch_shuffle",
      "deterministic per-epoch permutation + equal contiguous shards (epoch reshuffle)",
      s14EpochShuffle(_, _), Some(s14Sql)),
    QueryDef("s13_time_split",
      "temporal train/val/test split with warm/cold user leakage audit",
      s13TimeSplit, Some(s13Sql)),
    QueryDef("s12_temperature_mix",
      "temperature-0.5 mixture quotas + deterministic execution + checksums",
      s12TemperatureMix(_, _), Some(s12Sql)),
    QueryDef("s11_class_rebalance",
      "deterministic minority-size downsampling with kept-id checksum",
      s11ClassRebalance, Some(s11Sql)),
    QueryDef("s10_group_split",
      "grouped vs row-level train/test split + user-leakage audit",
      s10GroupSplit, Some(s10Sql)),
    QueryDef("s09_weighted_sample",
      "deterministic weighted priority sample (integer A-ES), 10 per stratum",
      s09WeightedSample, Some(s09Sql)),
    QueryDef("s05_stratified_sample",
      "deterministic 20% exact-fraction sample per stratum",
      s05StratifiedSample, Some(s05Sql)),
    QueryDef("s06_mix_apportion",
      "largest-remainder token-budget apportionment across sources",
      s06MixApportion(_, _), Some(s06Sql))
  )
}
