package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, Tables}
import graft.util.Exact._

/** Join family. The reference itself has zero joins (SURVEY §2.5), but an
  * engine a reference user could switch to must have the full join surface,
  * and the grouped-transform / scalar-broadcast dataflows it DOES have
  * (SURVEY A17/A18) are join-shaped. Every query here is written so Catalyst
  * picks the scale-correct physical join:
  *
  *  - dimension tables (region/nation/supplier) are marked
  *    [[org.apache.spark.sql.functions.broadcast]] — at 100 TB the fact
  *    table never shuffles for them;
  *  - fact-fact joins (orders⋈lineitem) shuffle on the join key once and
  *    aggregate partially map-side BEFORE the join where semantics allow;
  *  - the as-of enrichment is a window carry-forward, not a join at all —
  *    one shuffle on the partition key, no range-join blowup.
  */
object Joins {

  /** Broadcast star join: lineitem ⋈ supplier ⋈ nation ⋈ region, revenue
    * per region. TPC-H-Q5-shaped. All three dims broadcast; the only
    * shuffle is the final 5-group aggregate.
    */
  def j01BroadcastStar(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val sup = broadcast(Tables.supplier(spark, dir))
    val nat = broadcast(Tables.nation(spark, dir))
    val reg = broadcast(Tables.region(spark, dir))
    li.join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(nat, sup("s_nationkey") === nat("n_nationkey"))
      .join(reg, nat("n_regionkey") === reg("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(sum(dec(col("l_extendedprice")) * dec(lit(1.0) - col("l_discount")))
             .cast(DoubleType).as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("r_name").asc)
  }

  private val j01Sql =
    """SELECT r_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name
      |ORDER BY revenue DESC, r_name ASC""".stripMargin

  /** Fact-fact shuffle join with pre-join partial aggregation: revenue per
    * lineitem order is aggregated BEFORE joining orders (60k→15k rows into
    * the join at sf0.01; same ratio at 100 TB), then top-k customers.
    * TPC-H-Q3/Q10-shaped.
    */
  def j02FactFactRevenue(spark: SparkSession, dir: String): DataFrame = {
    val perOrder = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_extendedprice")) * dec(lit(1.0) - col("l_discount")))
             .as("order_rev"))
    Tables.orders(spark, dir)
      .join(perOrder, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("order_rev")).cast(DoubleType).as("revenue"),
           count(lit(1)).as("n_orders"))
      .orderBy(col("revenue").desc, col("o_custkey").asc)
      .limit(100)
  }

  private val j02Sql =
    """WITH per_order AS (
      |  SELECT l_orderkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS order_rev
      |  FROM lineitem GROUP BY 1)
      |SELECT o_custkey, CAST(SUM(order_rev) AS DOUBLE) AS revenue, COUNT(*) AS n_orders
      |FROM orders JOIN per_order ON o_orderkey = l_orderkey
      |GROUP BY o_custkey
      |ORDER BY revenue DESC, o_custkey ASC
      |LIMIT 100""".stripMargin

  /** Left semi join — customers having at least one open order. At scale:
    * the semi join needs only the distinct right keys, which Spark
    * aggregates before the exchange.
    */
  def j03SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val open = Tables.orders(spark, dir).filter(col("o_orderstatus") === "O")
    Tables.customer(spark, dir)
      .join(open, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  private val j03Sql =
    """SELECT c_custkey, c_mktsegment
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      |ORDER BY c_custkey""".stripMargin

  /** Left anti join — customers who never placed an urgent order. */
  def j04AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
    Tables.customer(spark, dir)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  private val j04Sql =
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  /** Left outer join + conditional aggregation — per-customer order count
    * including zero-order customers (the COUNT(o_orderkey) ignores the
    * null-extended rows, as SQL semantics require).
    */
  def j05OuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val cus = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
    cus.join(ord, cus("c_custkey") === ord("o_custkey"), "left_outer")
      .groupBy(cus("c_custkey"))
      .agg(count(ord("o_orderkey")).as("n_orders"),
           exactSum(coalesce(ord("o_totalprice"), lit(0.0))).as("total_spent"))
      .orderBy(col("c_custkey"))
  }

  private val j05Sql =
    """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
      |  CAST(SUM(CAST(COALESCE(o_totalprice, 0.0) AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey
      |ORDER BY c_custkey""".stripMargin

  /** As-of enrichment: each event carries the timestamp and value of the
    * most recent prior 'error' event of the same user. Implemented as a
    * window carry-forward (last_value ignoreNulls over an unbounded-
    * preceding frame) — ONE shuffle on user_id, no range-join explosion;
    * this is the scale-correct form of an as-of join when the right side
    * is a filtered view of the same stream.
    */
  def j06AsOf(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .withColumn("prev_error_ts",
        last(when(col("event_type") === "error", col("ts")), ignoreNulls = true).over(w))
      .withColumn("prev_error_value",
        last(when(col("event_type") === "error", col("value")), ignoreNulls = true).over(w))
      .select(col("event_id"), col("user_id"), col("event_type"),
              // epoch micros, not TimestampType: parquet timestamp precision
              // tags differ across engines even when the instants are equal
              unix_micros(col("prev_error_ts")).as("prev_error_us"),
              col("prev_error_value"))
      .orderBy(col("event_id"))
  }

  private val j06Sql =
    """SELECT event_id, user_id, event_type,
      |  epoch_us(LAST_VALUE(CASE WHEN event_type = 'error' THEN ts END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) AS prev_error_us,
      |  LAST_VALUE(CASE WHEN event_type = 'error' THEN "value" END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_error_value
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** Range join against a small in-memory bucket dimension: price bands.
    * The band table is broadcast, so the non-equi condition never shuffles
    * the fact side (BroadcastNestedLoopJoin over 4 rows).
    */
  def j07RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = Seq(
      ("low", 0.0, 25000.0), ("mid", 25000.0, 100000.0),
      ("high", 100000.0, 250000.0), ("top", 250000.0, 1e18))
      .toDF("band", "lo", "hi")
    Tables.orders(spark, dir)
      .join(broadcast(bands),
            col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_orders"),
           exactAvg(col("o_totalprice")).as("avg_price"))
      .orderBy(col("band"))
  }

  private val j07Sql =
    """WITH bands(band, lo, hi) AS (
      |  VALUES ('low', 0.0, 25000.0), ('mid', 25000.0, 100000.0),
      |         ('high', 100000.0, 250000.0), ('top', 250000.0, 1e18))
      |SELECT band, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(o_totalprice) AS avg_price
      |FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
      |GROUP BY band
      |ORDER BY band""".stripMargin

  /** Skew-safe aggregate-then-join: nation-level customer account stats
    * joined back to nation names. The aggregate runs BEFORE the join so the
    * dim join touches 25 rows, not 1.5k (or 150M at 100 TB).
    */
  def j08AggThenJoin(spark: SparkSession, dir: String): DataFrame = {
    val byNation = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"),
           exactAvg(col("c_acctbal")).as("avg_bal"))
    byNation
      .join(broadcast(Tables.nation(spark, dir)),
            col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("n_customers"), col("avg_bal"))
      .orderBy(col("n_name"))
  }

  private val j08Sql =
    """SELECT n_name, COUNT(*) AS n_customers,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal) AS avg_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** j11 — Bloom-filter semi-join pushdown: build a Bloom filter over the
    * BUILDING-segment customer keys (the small side), pre-filter orders
    * with `might_contain` BEFORE the shuffle, then run the real join.
    * False positives survive the filter but die in the join, so the
    * result is EXACTLY the plain join (the oracle is plain SQL) — the
    * Bloom stage only cuts shuffle volume.
    *
    * Scale rationale: at 100 TB the orders scan dwarfs everything; a
    * ~1 MB filter with fpp 0.01 drops ~79% of rows (4/5 segments) before
    * the exchange. This is the explicit form of what AQE's runtime bloom
    * filters (spark.sql.optimizer.runtime.bloomFilter.enabled) do for
    * qualifying shapes; having it as an operator lets a pipeline apply
    * it where the optimizer can't prove it safe.
    */
  def j11BloomJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    // The builder aggregates the SMALL side only (one tree-reduce of a
    // fixed-size bitset). expectedNumItems from the contract scale; fpp
    // 1% keeps the filter ~1 MB at 1M build keys.
    val bloom = cust.stat.bloomFilter("c_custkey", 100000L, 0.01)
    val bloomBc = spark.sparkContext.broadcast(bloom)
    val might = udf((k: Long) => bloomBc.value.mightContain(k))
    Tables.orders(spark, dir)
      .filter(might(col("o_custkey")))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
           countDistinct(col("o_custkey")).as("n_custs"),
           exactSum(col("o_totalprice"), 2).as("sum_total"))
      .orderBy(col("o_orderpriority"))
  }

  private val j11Sql =
    """SELECT o_orderpriority, COUNT(*) AS n_orders,
      |  COUNT(DISTINCT o_custkey) AS n_custs,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE c.c_mktsegment = 'BUILDING'
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** j12 — CDC merge / upsert (MERGE INTO semantics): apply a change
    * batch to a base table — updates override matching keys, inserts add
    * new keys — via the union + latest-wins-window compaction idiom.
    * The change batch is derived deterministically in-query (every 10th
    * customer gets +100 balance; five brand-new keys 900001..900005) so
    * both engines see the same input.
    *
    * Scale shape: NO join — one union (no shuffle) + one hash shuffle on
    * the key with 1-2-row groups. This is how streaming CDC compaction
    * (Delta/Hudi-style) scales: the window form handles ANY number of
    * versions per key in one pass, where a full-outer-join form handles
    * exactly two tables and re-shuffles per batch.
    */
  def j12Upsert(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        lit(0L).as("version"))
    val updates = Tables.customer(spark, dir)
      .filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"), col("c_mktsegment"),
        (col("c_acctbal") + 100.0).as("c_acctbal"), lit(1L).as("version"))
    val inserts = spark.range(900001L, 900006L)
      .select(col("id").as("c_custkey"), lit("MACHINERY").as("c_mktsegment"),
        lit(0.0).as("c_acctbal"), lit(1L).as("version"))
    val w = Window.partitionBy(col("c_custkey")).orderBy(col("version").desc)
    base.unionByName(updates).unionByName(inserts)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        (col("version") === 1L).as("changed"))
      .orderBy(col("c_custkey"))
  }

  private val j12Sql =
    """WITH all_rows AS (
      |  SELECT c_custkey, c_mktsegment, c_acctbal, 0 AS version FROM customer
      |  UNION ALL
      |  SELECT c_custkey, c_mktsegment, c_acctbal + 100.0, 1 AS version
      |  FROM customer WHERE c_custkey % 10 = 0
      |  UNION ALL
      |  SELECT k AS c_custkey, 'MACHINERY' AS c_mktsegment, 0.0 AS c_acctbal, 1 AS version
      |  FROM range(900001, 900006) t(k)),
      |ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY version DESC) AS rn
      |  FROM all_rows)
      |SELECT c_custkey, c_mktsegment, c_acctbal, version = 1 AS changed
      |FROM ranked WHERE rn = 1
      |ORDER BY c_custkey""".stripMargin

  /** j13 — null-safe equality join (`<=>` / IS NOT DISTINCT FROM): a
    * nullable segment key joins its dimension INCLUDING the null
    * segment ("unassigned"), where a plain equi-join would silently
    * drop every null-keyed fact row. Null keys are pervasive in
    * curation metadata (missing language, unknown license); the
    * null-safe operator keeps them first-class. Still a hash join —
    * null compares as a regular key value — so the plan shape is
    * identical to j01's.
    */
  def j13NullSafeJoin(spark: SparkSession, dir: String): DataFrame = {
    val facts = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"),
        when(col("o_custkey") % 7 === 0, lit(null)).otherwise(col("o_custkey") % 7)
          .as("seg"))
    val dim = facts.select(col("seg")).distinct()
      .select(col("seg").as("dseg"),
        coalesce(concat(lit("seg-"), col("seg")), lit("unassigned")).as("label"))
    facts.join(broadcast(dim), facts("seg") <=> dim("dseg"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)").as("total"))
      .orderBy(col("label"))
  }

  private val j13Sql =
    """WITH f AS (
      |  SELECT o_orderkey, o_totalprice,
      |    CASE WHEN o_custkey % 7 = 0 THEN NULL ELSE o_custkey % 7 END AS seg
      |  FROM orders),
      |d AS (
      |  SELECT seg AS dseg,
      |    COALESCE('seg-' || seg, 'unassigned') AS label
      |  FROM (SELECT DISTINCT seg FROM f))
      |SELECT label, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM f JOIN d ON f.seg IS NOT DISTINCT FROM d.dseg
      |GROUP BY label ORDER BY label""".stripMargin

  /** j15 — the NATIVE as-of join ([[graft.plans.AsOfJoin]]): every event
    * enriched with the user's latest strictly-earlier error event. Same
    * point-in-time family as j06's window encoding, but as a true
    * two-relation operator: the error side is its own (filtered, narrow)
    * relation, and the physical plan is two co-partitioning exchanges +
    * a one-pass per-partition merge — no window over the full stream
    * carrying every payload column, no O(pairs) inequality join.
    * Determinism: ties in error time break by event_id (last wins).
    */
  def j15AsOfJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
              unix_micros(col("ts")).as("us"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("err_user"), col("us").as("err_us"),
              col("event_id").as("err_event_id"))
    graft.plans.AsOfJoin.asof(
        ev, errors,
        leftKeys = Seq("user_id"), rightKeys = Seq("err_user"),
        leftTimeCol = "us", rightTimeCol = "err_us",
        rightTieBreak = Seq("err_event_id"))
      .select(col("event_id"), col("user_id"), col("event_type"),
              col("err_us"), col("err_event_id"))
      .orderBy(col("event_id"))
  }

  private val j15Sql =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events),
      |r AS (
      |  SELECT user_id AS err_user, us AS err_us, event_id AS err_event_id
      |  FROM e WHERE event_type = 'error'),
      |p AS (
      |  SELECT e.event_id, r.err_us, r.err_event_id,
      |    ROW_NUMBER() OVER (PARTITION BY e.event_id
      |                       ORDER BY r.err_us DESC, r.err_event_id DESC) AS rn
      |  FROM e JOIN r ON e.user_id = r.err_user AND r.err_us < e.us)
      |SELECT e.event_id, e.user_id, e.event_type, p.err_us, p.err_event_id
      |FROM e LEFT JOIN (SELECT * FROM p WHERE rn = 1) p USING (event_id)
      |ORDER BY e.event_id""".stripMargin

  /** j22 — the native as-of join's DIRECTION × TOLERANCE surface
    * ([[graft.plans.AsOfJoin]], extended): every purchase enriched with
    * (a) the user's latest click STRICTLY before it and at most 1 h old
    * — `direction=backward, tolerance=1h`, the attribution shape where
    * stale clicks must NOT claim credit — and (b) the user's next view
    * STRICTLY after it within 2 h — `direction=forward, tolerance=2h`,
    * the post-purchase-engagement shape. Two chained native merges:
    * each is the same two-exchange + one-pass-per-partition plan as
    * j15, with the tolerance applied as a constant-time gate on the
    * single buffered candidate (never a pair scan). Tie rules are part
    * of the contract: backward breaks equal click times by LAST
    * event_id, forward by FIRST — both totalized by the exec's
    * (key, time, tie) child ordering.
    */
  def j22AsofTolerance(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("us").as("click_us"),
        col("event_id").as("click_id"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("us").as("view_us"),
        col("event_id").as("view_id"))
    val withClick = graft.plans.AsOfJoin.asof(
      purchases, clicks,
      leftKeys = Seq("user_id"), rightKeys = Seq("c_user"),
      leftTimeCol = "us", rightTimeCol = "click_us",
      rightTieBreak = Seq("click_id"),
      direction = "backward", toleranceUs = Some(3600000000L))
    graft.plans.AsOfJoin.asof(
        withClick, views,
        leftKeys = Seq("user_id"), rightKeys = Seq("v_user"),
        leftTimeCol = "us", rightTimeCol = "view_us",
        rightTieBreak = Seq("view_id"),
        direction = "forward", toleranceUs = Some(7200000000L))
      .select(col("event_id"), col("user_id"), col("us").as("p_us"),
        col("click_us"), col("click_id"), col("view_us"), col("view_id"))
      .orderBy(col("event_id"))
  }

  private val j22Sql =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, epoch_us(ts) us FROM events),
      |p AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'purchase'),
      |c AS (SELECT user_id cu, us cus, event_id cid FROM e WHERE event_type = 'click'),
      |v AS (SELECT user_id vu, us vus, event_id vid FROM e WHERE event_type = 'view'),
      |cb AS (
      |  SELECT p.event_id, c.cus, c.cid,
      |    ROW_NUMBER() OVER (PARTITION BY p.event_id
      |      ORDER BY c.cus DESC, c.cid DESC) rn
      |  FROM p JOIN c ON p.user_id = c.cu AND c.cus < p.us
      |    AND p.us - c.cus <= 3600000000),
      |vf AS (
      |  SELECT p.event_id, v.vus, v.vid,
      |    ROW_NUMBER() OVER (PARTITION BY p.event_id
      |      ORDER BY v.vus ASC, v.vid ASC) rn
      |  FROM p JOIN v ON p.user_id = v.vu AND v.vus > p.us
      |    AND v.vus - p.us <= 7200000000)
      |SELECT p.event_id, p.user_id, p.us p_us, cb.cus click_us, cb.cid click_id,
      |  vf.vus view_us, vf.vid view_id
      |FROM p
      |LEFT JOIN (SELECT event_id, cus, cid FROM cb WHERE rn = 1) cb USING (event_id)
      |LEFT JOIN (SELECT event_id, vus, vid FROM vf WHERE rn = 1) vf USING (event_id)
      |ORDER BY event_id""".stripMargin

  /** j17 — interval join with NO equi key, binned: per purchase, count
    * corpus-wide view events inside ±30 min (and how many were the
    * buyer's own). The naive form is a pure inequality theta-join —
    * Spark would plan BroadcastNestedLoop/Cartesian, the j07 broadcast
    * trick dies when BOTH sides are fact-scale. The scalable encoding:
    * quantize time into 1 h bins, replicate each ±30 min interval to
    * the ≤ 2 bins it overlaps, hash-join points to intervals ON THE
    * BIN, then filter exact containment. A point lives in exactly one
    * bin, so each (purchase, view) pair meets exactly once — no dedup
    * pass. Replication factor = span/binWidth + 1 ≤ 2; both sides
    * shuffle once on a key AQE can re-split on skew (a hot hour skews a
    * bin, not a broadcast).
    *
    * Zero-match purchases are kept by the left join back to the
    * un-replicated purchase base (counts coalesce to 0).
    */
  def j17IntervalBinJoin(spark: SparkSession, dir: String): DataFrame = {
    val binUs = 3600000000L  // 1 h bins
    val halfUs = 1800000000L // ±30 min
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
    val views = e.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("view_user"),
        col("us").as("vus"))
      .withColumn("bin", expr(s"vus div $binUs"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("us"))
    val counts = purchases
      .withColumn("bin", explode(expr(
        s"sequence((us - $halfUs) div $binUs, (us + $halfUs) div $binUs)")))
      .join(views, Seq("bin"))
      .filter(col("vus") >= col("us") - halfUs && col("vus") <= col("us") + halfUs)
      .groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_concurrent"),
           sum(when(col("view_user") === col("user_id"), 1L)).as("own"))
    purchases.join(counts, Seq("purchase_id"), "left")
      .select(col("purchase_id"),
        coalesce(col("n_concurrent"), lit(0L)).as("n_concurrent"),
        coalesce(col("own"), lit(0L)).as("own_views"))
      .orderBy(col("purchase_id"))
  }

  /** Oracle: the brute-force inequality join — the semantics j17's
    * binning must reproduce exactly. */
  private val j17Sql =
    """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) us FROM events),
      |p AS (SELECT event_id pid, user_id, us FROM e WHERE event_type = 'purchase'),
      |v AS (SELECT event_id vid, user_id vuser, us vus FROM e WHERE event_type = 'view')
      |SELECT p.pid AS purchase_id,
      |  CAST(COUNT(v.vid) AS BIGINT) AS n_concurrent,
      |  CAST(COALESCE(SUM(CASE WHEN v.vuser = p.user_id THEN 1 END), 0) AS BIGINT) AS own_views
      |FROM p LEFT JOIN v
      |  ON v.vus BETWEEN p.us - 1800000000 AND p.us + 1800000000
      |GROUP BY 1
      |ORDER BY purchase_id""".stripMargin

  /** j18 — point-in-time join against an SCD2 dimension: every feature
    * store's correctness contract. The dimension carries three
    * validity-interval versions per user (deterministic in-query build:
    * version v becomes valid at day0 + v·(6 + user%18) hours, segment
    * rotates per version), and each fact row joins the version whose
    * [valid_from, valid_to) contains the EVENT time — never the latest
    * version, which would leak future attribute values into training
    * features (the s10 leakage story at the attribute level).
    *
    * Scale shape: the join keeps user_id as a proper EQUI key with the
    * interval check as a residual filter, so Spark plans a hash join
    * (shuffled or broadcast as sizes dictate) — the fatal version of
    * this query drops the equi key and degenerates to a
    * BroadcastNestedLoopJoin. Versions-per-user is bounded (3), so the
    * residual scans ≤3 candidates per probe; at 100 TB the dimension
    * pre-partitions by user alongside the facts and the exchange
    * disappears.
    */
  def j18Scd2Join(spark: SparkSession, dir: String): DataFrame = {
    val day0 = 1704067200000000L // 2024-01-01 00:00 UTC in micros
    val users = Tables.events(spark, dir).select(col("user_id")).distinct()
    val dim = users.select(col("user_id"), explode(expr("array(0, 1, 2)")).as("v"))
      .withColumn("step_us",
        expr("(6 + user_id % 18) * CAST(3600000000 AS BIGINT)"))
      .withColumn("from_us", expr(s"CAST($day0 AS BIGINT) + v * step_us"))
      .withColumn("to_us",
        expr(s"IF(v < 2, CAST($day0 AS BIGINT) + (v + 1) * step_us, " +
             "CAST(4102444800000000 AS BIGINT))"))
      .withColumn("segment",
        expr("element_at(array('A', 'B', 'C'), CAST((user_id + v) % 3 + 1 AS INT))"))
      .select(col("user_id").as("d_user"), col("v"), col("from_us"),
        col("to_us"), col("segment"))
    Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .join(dim, col("user_id") === col("d_user") &&
        col("us") >= col("from_us") && col("us") < col("to_us"))
      .groupBy(col("segment"), col("v"))
      .agg(count(lit(1)).as("n_events"),
           countDistinct(col("user_id")).as("n_users"),
           sum(col("cents")).as("sum_cents"))
      .orderBy(col("segment"), col("v"))
  }

  private val j18Sql =
    """WITH u AS (SELECT DISTINCT user_id FROM events),
      |dim AS (
      |  SELECT user_id d_user, v,
      |    1704067200000000 + v * ((6 + user_id % 18) * CAST(3600000000 AS BIGINT)) from_us,
      |    CASE WHEN v < 2
      |      THEN 1704067200000000 + (v + 1) * ((6 + user_id % 18) * CAST(3600000000 AS BIGINT))
      |      ELSE CAST(4102444800000000 AS BIGINT) END to_us,
      |    ['A', 'B', 'C'][CAST((user_id + v) % 3 + 1 AS INTEGER)] segment
      |  FROM u, (SELECT unnest([0, 1, 2]) v)),
      |e AS (
      |  SELECT user_id, epoch_us(ts) us, CAST(round(value * 100) AS BIGINT) cents
      |  FROM events WHERE value IS NOT NULL)
      |SELECT segment, v, COUNT(*) AS n_events,
      |  COUNT(DISTINCT e.user_id) AS n_users,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents
      |FROM e JOIN dim ON e.user_id = dim.d_user
      |  AND e.us >= dim.from_us AND e.us < dim.to_us
      |GROUP BY segment, v
      |ORDER BY segment, v""".stripMargin

  /** j19 — join fan-out pre-audit: before launching a self-join on a
    * candidate key, compute EXACTLY how many rows it would produce —
    * Σₖ nₖ² from the per-key count table alone — bucketed by the
    * floor-log₂ of each key's pair contribution (the integer
    * `length(bin(x)) − 1`, no float log anywhere). The accidental
    * many-to-many explosion is the most expensive mistake a pipeline
    * author makes at 100 TB; this query prices it from metadata-scale
    * input (the count table) without running the join. d03/d09's
    * banded designs exist precisely because this number said "don't".
    *
    * Scale shape: one partial-aggregated count per key (the only pass
    * over data), then bucketing over the key-cardinality-sized count
    * table — the a24 skew-diagnostic contract.
    */
  def j19FanoutAudit(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("n"))
      .select(col("n"), (col("n") * col("n")).as("pairs"))
      .withColumn("log2_bucket", expr("CAST(length(bin(pairs)) - 1 AS INT)"))
      .groupBy(col("log2_bucket"))
      .agg(count(lit(1)).as("n_keys"),
           sum(col("pairs")).as("est_join_rows"),
           max(col("n")).as("max_key_rows"))
      .orderBy(col("log2_bucket"))

  private val j19Sql =
    """WITH c AS (SELECT l_partkey k, CAST(COUNT(*) AS BIGINT) n FROM lineitem GROUP BY 1),
      |p AS (SELECT k, n, n * n AS pairs,
      |        CAST(length(bin(n * n)) - 1 AS INTEGER) b FROM c)
      |SELECT b AS log2_bucket, COUNT(*) AS n_keys,
      |  CAST(SUM(pairs) AS BIGINT) AS est_join_rows,
      |  CAST(MAX(n) AS BIGINT) AS max_key_rows
      |FROM p GROUP BY b ORDER BY b""".stripMargin

  /** j20 — accumulating-snapshot latency: order-to-first-ship gap in
    * whole days per order (min over the order's line items), then
    * exact nearest-rank P50/P90 of that gap per order priority — the
    * fulfillment-SLA table, built from a fact-to-fact join + the w21
    * percentile machinery, integers end to end.
    *
    * Scale shape: the orders↔lineitem join keys on orderkey (the
    * natural co-partitioned pair — bucketed j14-style at 100 TB, the
    * exchange disappears); the per-order min partial-aggregates
    * map-side; percentiles rank per-priority on ONE window exchange
    * with the 3-value pct fan-out exploding map-side (the w21
    * contract).
    */
  def j20OrderToShip(spark: SparkSession, dir: String): DataFrame = {
    val gaps = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_orderdate").cast("date").as("od"))
      .join(Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_shipdate").cast("date").as("sd")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(min(datediff(col("sd"), col("od"))).cast(LongType).as("gap_days"))
    val wRank = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("gap_days"), col("o_orderkey"))
    val wAll = Window.partitionBy(col("o_orderpriority"))
    gaps
      .withColumn("rn", row_number().over(wRank))
      .withColumn("n", count(lit(1)).over(wAll))
      .select(col("o_orderpriority"), col("gap_days"), col("rn"), col("n"),
        explode(expr("array(50, 90)")).as("pct"))
      .filter(col("rn") === expr("(pct * n + 99) div 100"))
      .select(col("o_orderpriority").as("priority"), col("pct"),
        col("gap_days").as("pct_gap_days"), col("n").as("n_orders"))
      .orderBy(col("priority"), col("pct"))
  }

  private val j20Sql =
    """WITH g AS (
      |  SELECT o.o_orderkey, o.o_orderpriority,
      |    CAST(MIN(CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE)) AS BIGINT) gap_days
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |  GROUP BY o.o_orderkey, o.o_orderpriority),
      |r AS (
      |  SELECT o_orderpriority, gap_days, o_orderkey,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY gap_days, o_orderkey) rn,
      |    COUNT(*) OVER (PARTITION BY o_orderpriority) n
      |  FROM g),
      |x AS (SELECT r.*, unnest([50, 90]) pct FROM r)
      |SELECT o_orderpriority AS priority, pct, gap_days AS pct_gap_days,
      |  CAST(n AS BIGINT) AS n_orders
      |FROM x WHERE rn = (pct * n + 99) // 100
      |ORDER BY priority, pct""".stripMargin

  /** j21 — Yannakakis full reducer over the acyclic chain
    * customer → orders → lineitem: two semi-join sweeps (bottom-up
    * o⋉c, l⋉o; top-down o⋉l, c⋉o) strip every dangling tuple BEFORE the
    * real join runs, so no intermediate ever exceeds the output — the
    * classical guarantee ad-hoc join orders lack, and the multi-relation
    * exact dual of [[j11BloomJoin]]'s single probabilistic pushdown.
    * The emitted rows are the audit: per-stage surviving counts (the
    * reduction each sweep buys on this corpus's filters — BUILDING
    * customers, 1996 orders, quantity ≥ 45 lines) and the final joined
    * row count + exact revenue cents. After full reduction the join is
    * redundancy-free: every reduced line joins exactly one surviving
    * order and customer, so joined_rows == the reduced lineitem count —
    * asserted in spec, visible in the contract rows.
    *
    * Scale shape: semi-joins are the cheapest reducers Spark has
    * (left_semi broadcasts the small side's keys; at fact-fact scale
    * they shuffle only keys, never payloads); the final join then
    * touches only tuples that contribute to the output. At 100 TB this
    * is the difference between shuffling a dangling-heavy intermediate
    * and shuffling the answer.
    */
  def j21FullReducer(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val o = Tables.orders(spark, dir)
      .filter(expr("year(o_orderdate) = 1996"))
      .select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") >= 45)
      .select(col("l_orderkey"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
    val o1 = o.join(c, col("o_custkey") === col("c_custkey"), "left_semi")
    val l1 = l.join(o1, col("l_orderkey") === col("o_orderkey"), "left_semi")
    val o2 = o1.join(l1, col("o_orderkey") === col("l_orderkey"), "left_semi")
    val c2 = c.join(o2, col("c_custkey") === col("o_custkey"), "left_semi")
    val joined = l1
      .join(o2, col("l_orderkey") === col("o_orderkey"))
      .join(c2, col("o_custkey") === col("c_custkey"))
    def stage(step: String, rel: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_rows"))
        .select(lit(step).as("step"), lit(rel).as("relation"),
          col("n_rows"), lit(0L).as("cents_sum"))
    stage("0_filter", "customer", c)
      .unionByName(stage("0_filter", "orders", o))
      .unionByName(stage("0_filter", "lineitem", l))
      .unionByName(stage("1_reduce_up", "orders", o1))
      .unionByName(stage("1_reduce_up", "lineitem", l1))
      .unionByName(stage("2_reduce_down", "orders", o2))
      .unionByName(stage("2_reduce_down", "customer", c2))
      .unionByName(joined.agg(count(lit(1)).as("n_rows"),
          coalesce(sum(col("cents")), lit(0L)).as("cents_sum"))
        .select(lit("3_join").as("step"), lit("result").as("relation"),
          col("n_rows"), col("cents_sum")))
      .orderBy(col("step"), col("relation"))
  }

  private val j21Sql =
    """WITH c AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
      |o AS (SELECT o_orderkey, o_custkey FROM orders
      |      WHERE year(o_orderdate) = 1996),
      |l AS (SELECT l_orderkey,
      |        CAST(round(l_extendedprice * 100) AS BIGINT) cents
      |      FROM lineitem WHERE l_quantity >= 45),
      |o1 AS (SELECT * FROM o WHERE o_custkey IN (SELECT c_custkey FROM c)),
      |l1 AS (SELECT * FROM l WHERE l_orderkey IN (SELECT o_orderkey FROM o1)),
      |o2 AS (SELECT * FROM o1 WHERE o_orderkey IN (SELECT l_orderkey FROM l1)),
      |c2 AS (SELECT * FROM c WHERE c_custkey IN (SELECT o_custkey FROM o2)),
      |j AS (SELECT l1.cents FROM l1
      |      JOIN o2 ON l1.l_orderkey = o2.o_orderkey
      |      JOIN c2 ON o2.o_custkey = c2.c_custkey),
      |rows_ AS (
      |  SELECT '0_filter' step, 'customer' relation,
      |    CAST(COUNT(*) AS BIGINT) n_rows, CAST(0 AS BIGINT) cents_sum FROM c
      |  UNION ALL SELECT '0_filter', 'orders', COUNT(*), 0 FROM o
      |  UNION ALL SELECT '0_filter', 'lineitem', COUNT(*), 0 FROM l
      |  UNION ALL SELECT '1_reduce_up', 'orders', COUNT(*), 0 FROM o1
      |  UNION ALL SELECT '1_reduce_up', 'lineitem', COUNT(*), 0 FROM l1
      |  UNION ALL SELECT '2_reduce_down', 'orders', COUNT(*), 0 FROM o2
      |  UNION ALL SELECT '2_reduce_down', 'customer', COUNT(*), 0 FROM c2
      |  UNION ALL SELECT '3_join', 'result', COUNT(*),
      |    CAST(COALESCE(SUM(cents), 0) AS BIGINT) FROM j)
      |SELECT step, relation, n_rows, cents_sum
      |FROM rows_ ORDER BY step, relation""".stripMargin

  /** j23 — AMS sign-sketch JOIN-SIZE estimation: the CBO primitive that
    * prices an equi-join BEFORE running it. [[j19FanoutAudit]] computes
    * the exact answer from the per-key count table — fine when the key
    * domain is small enough to aggregate; the AGMS estimator (Alon–
    * Gibbons–Matias–Szegedy) answers the same question from two
    * CONSTANT-SIZE sketches: with s_j(u) ∈ {±1} a shared 4-wise-ish
    * hash sign, X_j = Σ_u s_j(u)·n_A(u) and Y_j = Σ_u s_j(u)·n_B(u),
    * each X_j·Y_j is an unbiased estimate of |A ⋈_u B| = Σ_u n_A·n_B
    * (cross terms cancel in expectation), averaged over 16 estimators.
    * Distinct from [[Maintenance.a59AmsF2]], which owns the SELF-join
    * second moment: this is the CROSS inner product of two different
    * frequency vectors — the join-cardinality use of the same sketch
    * family, and the reason a query planner can carry one sketch per
    * table per key and price any pairwise equi-join from metadata.
    *
    * Contract: every unordered event-type pair (10 rows), exact join
    * size, the AMS estimate (estimators can be individually negative —
    * the mean is sign-aware magnitude-floored, the g09 rule), and the
    * signed error in ppm of exact. Sign images use the 'jsz:' prefix so
    * they are independent of a59's signs.
    *
    * Scale shape: ONE aggregate to the (type, user) count table; the
    * sketch is a ×16 explode partial-aggregated to 5×16 = 80 rows; the
    * exact reference is a self-join of the bounded count table. At
    * 100 TB the exact side is the expensive audit; the sketches are the
    * metadata-plane answer.
    */
  def j23JoinSizeSketch(spark: SparkSession, dir: String): DataFrame = {
    val D = DecimalType(38, 0)
    val cu = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("c"))
    val exact = cu.as("a").join(cu.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(sum(col("a.c").cast(D) * col("b.c")).cast(D).as("exact_rows"))
    val sk = cu
      .withColumn("j", explode(expr("sequence(0, 15)")))
      .withColumn("sgn", expr("1 - 2 * CAST(pmod(CAST(conv(substring(md5(" +
        "concat('jsz:', CAST(user_id AS STRING), ':', CAST(j AS STRING))" +
        "), 1, 15), 16, 10) AS BIGINT), 2) AS INT)"))
      .groupBy(col("event_type"), col("j"))
      .agg(sum(col("sgn") * col("c")).as("x"))
    val est = sk.as("a").join(sk.as("b"),
        col("a.j") === col("b.j") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(sum(expr("CAST(a.x AS DECIMAL(19,0)) * b.x")).cast(D).as("xy"))
      .withColumn("est_rows", expr(
        "CASE WHEN xy >= 0 THEN CAST(xy div 16 AS BIGINT) " +
          "ELSE -CAST((-xy) div 16 AS BIGINT) END"))
    exact.join(est, Seq("type_a", "type_b"))
      .select(col("type_a"), col("type_b"),
        col("exact_rows").cast("long").as("exact_rows"), col("est_rows"),
        expr("CASE WHEN CAST(est_rows AS DECIMAL(38,0)) >= exact_rows " +
          "THEN CAST((CAST(est_rows AS DECIMAL(38,0)) - exact_rows) * 1000000 " +
          "div exact_rows AS BIGINT) " +
          "ELSE -CAST((exact_rows - CAST(est_rows AS DECIMAL(38,0))) * 1000000 " +
          "div exact_rows AS BIGINT) END").as("err_ppm"))
      .orderBy(col("type_a"), col("type_b"))
  }

  private val j23Sql = {
    val sgn =
      """1 - 2 * CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, 16),
        |        i -> CAST(strpos('0123456789abcdef', substr(md5(
        |               concat('jsz:', CAST(user_id AS VARCHAR), ':', CAST(j AS VARCHAR))
        |             ), CAST(i AS INTEGER), 1)) - 1 AS BIGINT))),
        |      (a, h) -> a * 16 + h) % 2 AS BIGINT)""".stripMargin
    s"""WITH cu AS (
      |  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) c
      |  FROM events GROUP BY 1, 2),
      |exact AS (
      |  SELECT a.event_type type_a, b.event_type type_b,
      |    CAST(SUM(CAST(a.c AS HUGEINT) * b.c) AS HUGEINT) exact_rows
      |  FROM cu a JOIN cu b
      |    ON a.user_id = b.user_id AND a.event_type < b.event_type
      |  GROUP BY 1, 2),
      |sg AS (
      |  SELECT event_type, j, c, $sgn sgn
      |  FROM cu, (SELECT unnest(range(0, 16)) AS j)),
      |sk AS (
      |  SELECT event_type, j, CAST(SUM(sgn * c) AS BIGINT) x
      |  FROM sg GROUP BY 1, 2),
      |est AS (
      |  SELECT a.event_type type_a, b.event_type type_b,
      |    SUM(CAST(a.x AS HUGEINT) * b.x) xy
      |  FROM sk a JOIN sk b
      |    ON a.j = b.j AND a.event_type < b.event_type
      |  GROUP BY 1, 2),
      |er AS (
      |  SELECT type_a, type_b,
      |    CASE WHEN xy >= 0 THEN CAST(xy // 16 AS BIGINT)
      |         ELSE -CAST((-xy) // 16 AS BIGINT) END est_rows
      |  FROM est)
      |SELECT exact.type_a, exact.type_b,
      |  CAST(exact_rows AS BIGINT) exact_rows, est_rows,
      |  CASE WHEN CAST(est_rows AS HUGEINT) >= exact_rows
      |    THEN CAST((CAST(est_rows AS HUGEINT) - exact_rows) * 1000000
      |      // exact_rows AS BIGINT)
      |    ELSE -CAST((exact_rows - CAST(est_rows AS HUGEINT)) * 1000000
      |      // exact_rows AS BIGINT) END err_ppm
      |FROM exact JOIN er ON exact.type_a = er.type_a AND exact.type_b = er.type_b
      |ORDER BY exact.type_a, exact.type_b""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("j23_join_size_sketch",
      "AGMS sign-sketch join-cardinality estimate per type pair vs the exact count-table answer",
      j23JoinSizeSketch, Some(j23Sql)),
    QueryDef("j21_full_reducer",
      "Yannakakis full reducer: bottom-up/top-down semi-join sweeps, per-stage counts + dangling-free join",
      j21FullReducer, Some(j21Sql)),
    QueryDef("j20_order_to_ship",
      "accumulating snapshot: exact P50/P90 order-to-ship days per priority",
      j20OrderToShip, Some(j20Sql)),
    QueryDef("j19_fanout_audit",
      "exact self-join row-count pre-audit from per-key counts (log2 buckets)",
      j19FanoutAudit, Some(j19Sql)),
    QueryDef("j18_scd2_join",
      "point-in-time SCD2 join: equi key + validity-interval residual",
      j18Scd2Join, Some(j18Sql)),
    QueryDef("j17_interval_bin_join",
      "no-equi-key interval join via time binning (both sides fact-scale)",
      j17IntervalBinJoin, Some(j17Sql)),
    QueryDef("j01_broadcast_star", "broadcast star join, revenue per region", j01BroadcastStar, Some(j01Sql)),
    QueryDef("j22_asof_tolerance",
      "native as-of join direction x tolerance: backward 1h attribution + forward 2h engagement, chained merges",
      j22AsofTolerance, Some(j22Sql)),
    QueryDef("j15_asof_join", "NATIVE as-of join (custom plan + strategy + merge exec)",
      j15AsOfJoin, Some(j15Sql)),
    QueryDef("j02_fact_fact_revenue", "fact-fact shuffle join w/ pre-join partial agg", j02FactFactRevenue, Some(j02Sql)),
    QueryDef("j03_semi_join", "left semi join (EXISTS)", j03SemiJoin, Some(j03Sql)),
    QueryDef("j04_anti_join", "left anti join (NOT EXISTS)", j04AntiJoin, Some(j04Sql)),
    QueryDef("j05_outer_join", "left outer join + null-safe agg", j05OuterJoin, Some(j05Sql)),
    QueryDef("j06_asof_enrich", "as-of enrichment via window carry-forward", j06AsOf, Some(j06Sql)),
    QueryDef("j07_range_join", "broadcast range join on price bands", j07RangeJoin, Some(j07Sql)),
    QueryDef("j08_agg_then_join", "aggregate-before-join dim enrichment", j08AggThenJoin, Some(j08Sql)),
    QueryDef("j11_bloom_join", "Bloom-filter semi-join pushdown before shuffle",
      j11BloomJoin, Some(j11Sql)),
    QueryDef("j12_upsert", "CDC merge/upsert via union + latest-wins window",
      j12Upsert, Some(j12Sql)),
    QueryDef("j13_nullsafe_join", "null-safe (<=>) dim join keeps null-keyed facts",
      j13NullSafeJoin, Some(j13Sql))
  )
}
