package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // static conf lives on the SparkContext: later sessions on this
      // JVM inherit it (see ExtensionsSpec), builder-only settings don't
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf: String = "/root/testdata/sf0.001"

  /** Per-entry memo of registered-query DataFrames, populated lazily at
    * FIRST USE per name. Several queries run heavy construction-time side
    * effects (st16 executes a complete streaming pipeline, io16
    * drops/recreates the shared metastore table, io17/l13/d18 stage data
    * and run jobs), so RelationalSpec's registry-wide checks — which walk
    * every frame more than once — share one construction per query.
    *
    * Deliberately NOT bulk-eager, and deliberately NOT used by
    * PlanGoldenSpec: the round-10 bulk-eager form built d18's
    * localCheckpoint()-based frame during the bulk pass, and the
    * checkpoint's runtime size stats (collected at construction time)
    * flipped its join strategy (BroadcastHashJoin → SortMergeJoin),
    * drifting the committed plan golden (ADVICE r10). Plan goldens are
    * pinned against FRESH construction; only the registry-wide
    * value/schema checks share frames.
    */
  private val frameCache =
    scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.sql.DataFrame]
  /** Queries whose CONSTRUCTION clobbers a SHARED location (metastore
    * tables dropped + physically purged, then recreated): a memoized
    * frame from an earlier construction points at files a later fresh
    * construction (e.g. PlanGoldenSpec's) has deleted — FILE_NOT_EXIST
    * at read time. Always construct these fresh. Every other staging
    * query mints a NEW scratch dir per construction, so its memoized
    * frame stays valid.
    */
  private val constructionImpure =
    Set("io16_bucket_pruning", "j14_bucketed_join")
  def frame(name: String): org.apache.spark.sql.DataFrame = {
    def build = Registry.all.find(_.name == name)
      .getOrElse(sys.error(s"unknown query $name")).fn(spark, sf)
    if (constructionImpure(name)) build
    else frameCache.getOrElseUpdate(name, build)
  }
}

class RelationalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("every registered query returns rows at sf0.001") {
    Registry.all.foreach { d =>
      val n = frame(d.name).count()
      assert(n > 0, s"${d.name} returned no rows")
    }
  }

  test("no registered query emits a DecimalType output column") {
    // The r3 (t08) and r8 (a56/a57/a60/g14/w33) escapes were the same
    // class: a decimal output column round-trips as Python Decimal from
    // Spark parquet but float64 from DuckDB, so the driver's str(value)
    // hash diverges even when every value is numerically identical.
    // DECIMAL(38,0) is welcome INSIDE a plan (exact integer algebra);
    // the emitted schema must carry it as BIGINT (when the contract
    // scale provably fits) or STRING (when >int64 headroom is the
    // point). Structs/arrays/maps are walked too.
    import org.apache.spark.sql.types._
    def decimals(dt: DataType, path: String): Seq[String] = dt match {
      case _: DecimalType => Seq(path)
      case s: StructType => s.fields.flatMap(f => decimals(f.dataType, s"$path.${f.name}")).toSeq
      case a: ArrayType => decimals(a.elementType, s"$path[]")
      case m: MapType =>
        decimals(m.keyType, s"$path<key>") ++ decimals(m.valueType, s"$path<value>")
      case _ => Nil
    }
    val offenders = Registry.all.flatMap { d =>
      decimals(frame(d.name).schema, d.name)
    }
    assert(offenders.isEmpty,
      s"decimal output columns leak the driver-hash divergence class: ${offenders.mkString(", ")}")
  }

  test("registry names are unique and oracle columns are aliased") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size)
    // every oracle must not contain an unaliased aggregate like "sum(" in
    // the projection header... cheap sanity: oracle parses as non-empty SQL
    Registry.all.flatMap(_.oracle).foreach(sql => assert(sql.trim.nonEmpty))
  }

  test("p01 pushes filters and prunes columns at the parquet scan") {
    val plan = operators.Relational.p01ProjectFilter(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), "expected parquet PushedFilters")
    assert(plan.contains("IsNotNull"), "expected not-null filter pushed")
    // column pruning: the scan must not read l_extendedprice
    val scanLine = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!scanLine.contains("l_extendedprice"), s"scan reads too much: $scanLine")
  }

  test("a12 clip is a pure projection: no join, no value-buffering agg") {
    val plan = operators.Relational.a12IqrClip(spark, sf)
      .queryExecution.executedPlan.toString
    // quantiles come from ScalableQuantile (bounded-state radix selection)
    // so the clip plan itself must contain no join and no ObjectHashAggregate
    assert(!plan.contains("Join"), s"expected no join in the clip plan")
    assert(!plan.contains("ObjectHashAggregate"),
      "expected no value-buffering percentile aggregate")
  }

  test("a01 keeps aggregation in whole-stage codegen with partial aggregation") {
    val df = operators.Relational.a01PricingSummary(spark, sf)
    df.collect() // materialize so AQE finalizes the physical plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), "expected HashAggregate")
    // AQE final-plan strings mark codegen stages as "*(n)"
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
      "expected whole-stage codegen")
  }

  test("exact sums are partition-count invariant") {
    import org.apache.spark.sql.functions._
    import graft.util.Exact._
    def agg(parts: Int) = Tables.lineitem(spark, sf)
      .repartition(parts)
      .groupBy(col("l_returnflag"))
      .agg(exactSum(col("l_extendedprice")).as("s"), exactAvg(col("l_quantity")).as("a"))
      .collect().map(_.toString).sorted.toSeq
    // decimal sums are exact and associative → identical under any partitioning
    assert(agg(1) == agg(13))
  }
}
