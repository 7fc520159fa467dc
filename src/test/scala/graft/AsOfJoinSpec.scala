package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOfJoin

/** Behavior spec for the native as-of join (graft.plans.AsOfJoin):
  * physical plan shape, equivalence to the relational encoding, edge
  * semantics the oracle corpus can't exercise (null keys/times, exact
  * time ties, tie-break totality), and partitioning invariance.
  */
class AsOfJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  private val sf001 = "/root/testdata/sf0.01"

  private def tiny(rows: Seq[(java.lang.Long, java.lang.Long, String)]): DataFrame = {
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = true),
      StructField("t", LongType, nullable = true),
      StructField("tag", StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3)), 3),
      schema)
  }
  private def L(v: Long): java.lang.Long = java.lang.Long.valueOf(v)

  private def run(left: DataFrame, right: DataFrame): Seq[(Long, Long, Option[String])] =
    AsOfJoin.asof(
        left, right.toDF("rk", "rt", "rtag"),
        Seq("k"), Seq("rk"), "t", "rt", Seq("rtag"))
      .select(col("k"), col("t"), col("rtag"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2))))
      .sortBy(x => (x._1, x._2))

  test("merge exec picks the strictly-earlier latest row; ties break by tie-break column") {
    val left = tiny(Seq((L(1), L(100), "a"), (L(1), L(200), "b"), (L(2), L(150), "c")))
    val right = tiny(Seq(
      (L(1), L(100), "r-at-100"),   // equal time: excluded (strict <)
      (L(1), L(50), "r-early"),
      (L(1), L(150), "r-mid-1"), (L(1), L(150), "r-mid-2"), // tie: rtag max wins
      (L(2), L(151), "r-late")))    // after left's 150: no match
    assert(run(left, right) == Seq(
      (1L, 100L, Some("r-early")),
      (1L, 200L, Some("r-mid-2")),
      (2L, 150L, None)))
  }

  test("null keys and null times never match, on either side") {
    val left = tiny(Seq((null, L(100), "a"), (L(1), null, "b"), (L(1), L(100), "c")))
    val right = tiny(Seq((null, L(50), "rnull"), (L(1), null, "rtnull"), (L(1), L(60), "ok")))
    val got = AsOfJoin.asof(left, right.toDF("rk", "rt", "rtag"),
        Seq("k"), Seq("rk"), "t", "rt", Seq("rtag"))
      .select(col("tag"), col("rtag")).collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got == Map("a" -> None, "b" -> None, "c" -> Some("ok")))
  }

  test("empty right side leaves every left row unmatched") {
    val left = tiny(Seq((L(1), L(100), "a"), (L(2), L(200), "b")))
    val right = tiny(Seq.empty)
    assert(run(left, right).forall(_._3.isEmpty))
  }

  test("j15 equals the inequality-join + rank encoding, under any partitioning") {
    val j15 = operators.Joins.j15AsOfJoin(spark, sf001).collect()

    val ev = Tables.events(spark, sf001)
      .select(col("event_id"), col("user_id"), col("event_type"),
              unix_micros(col("ts")).as("us"))
      .repartition(7, col("event_type")) // adversarial: not the join key
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("err_user"), col("us").as("err_us"),
              col("event_id").as("err_event_id"))
    val native = AsOfJoin.asof(ev, errors,
        Seq("user_id"), Seq("err_user"), "us", "err_us", Seq("err_event_id"))
      .select(col("event_id"), col("user_id"), col("event_type"),
              col("err_us"), col("err_event_id"))
      .orderBy(col("event_id")).collect()
    assert(native.sameElements(j15), "as-of result changed under a different input partitioning")

    // the relational encoding: all pairs + rank, kept as ground truth
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("err_us").desc, col("err_event_id").desc)
    val encoded = ev.join(errors,
        col("user_id") === col("err_user") && col("err_us") < col("us"), "inner")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("event_id"), col("err_us"), col("err_event_id"))
    val truth = ev.join(encoded, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
              col("err_us"), col("err_event_id"))
      .orderBy(col("event_id")).collect()
    assert(j15.sameElements(truth), "native as-of diverges from the relational encoding")
  }

  test("physical plan is the merge exec between two co-partitioning exchanges") {
    val df = operators.Joins.j15AsOfJoin(spark, sf001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("AsOfJoin"), s"native node missing:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "as-of fell back to a pair-building join")
  }

  test("forward direction picks the strictly-later earliest row; first tie wins") {
    val left = tiny(Seq((L(1), L(100), "l"), (L(1), L(200), "l"), (L(2), L(50), "l")))
    val right = tiny(Seq(
      (L(1), L(100), "at100"), (L(1), L(150), "a150"), (L(1), L(150), "b150"),
      (L(1), L(500), "late"), (L(2), L(10), "early")))
    val got = AsOfJoin.asof(
        left, right.toDF("rk", "rt", "rtag"),
        Seq("k"), Seq("rk"), "t", "rt", Seq("rtag"), direction = "forward")
      .select(col("k"), col("t"), col("rtag")).collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).sortBy(x => (x._1, x._2))
    // t=100: rt=100 excluded (strict); earliest after = 150, FIRST tie = a150
    // t=200: earliest after = 500; k=2 t=50: nothing after 50? rt=10 is before -> null
    assert(got.toSeq == Seq((1L, 100L, Some("a150")), (1L, 200L, Some("late")),
      (2L, 50L, None)))
  }

  test("tolerance nulls out matches beyond the bound, both directions") {
    val left = tiny(Seq((L(1), L(1000), "l"), (L(1), L(5000), "l")))
    val right = tiny(Seq((L(1), L(900), "b900"), (L(1), L(5900), "f5900")))
    val back = AsOfJoin.asof(left, right.toDF("rk", "rt", "rtag"),
        Seq("k"), Seq("rk"), "t", "rt", Seq("rtag"),
        direction = "backward", toleranceUs = Some(200L))
      .select(col("t"), col("rtag")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1)
    // t=1000: b900 is 100 old -> within 200; t=5000: b900 is 4100 old -> null
    assert(back.toSeq == Seq((1000L, Some("b900")), (5000L, None)))
    val fwd = AsOfJoin.asof(left, right.toDF("rk", "rt", "rtag"),
        Seq("k"), Seq("rk"), "t", "rt", Seq("rtag"),
        direction = "forward", toleranceUs = Some(1000L))
      .select(col("t"), col("rtag")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1)
    // t=1000: next is 5900, gap 4900 > 1000 -> null; t=5000: 5900 gap 900 -> match
    assert(fwd.toSeq == Seq((1000L, None), (5000L, Some("f5900"))))
  }

  test("j22 equals the inequality-join + rank encoding; two native merges in the plan") {
    val df = operators.Joins.j22AsofTolerance(spark, sf001)
    val got = df.collect().map(r => (r.getLong(0),
      Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.get(4)).map(_.asInstanceOf[Long]),
      Option(r.get(5)).map(_.asInstanceOf[Long]), Option(r.get(6)).map(_.asInstanceOf[Long])))
      .sortBy(_._1)
    // relational truth on the driver
    val ev = Tables.events(spark, sf001)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val p = ev.filter(_._3 == "purchase")
    val c = ev.filter(_._3 == "click")
    val v = ev.filter(_._3 == "view")
    val truth = p.map { case (eid, u, _, us) =>
      val click = c.filter(x => x._2 == u && x._4 < us && us - x._4 <= 3600000000L)
        .sortBy(x => (-x._4, -x._1)).headOption
      val view = v.filter(x => x._2 == u && x._4 > us && x._4 - us <= 7200000000L)
        .sortBy(x => (x._4, x._1)).headOption
      (eid, click.map(_._4), click.map(_._1), view.map(_._4), view.map(_._1))
    }.sortBy(_._1)
    assert(got.length == truth.length && got.sameElements(truth),
      s"first diff: ${got.zip(truth).find(x => x._1 != x._2)}")
    // both verdict classes are live: some purchases matched, some nulled by tolerance
    assert(got.exists(_._2.isDefined) && got.exists(_._2.isEmpty))
    assert(got.exists(_._4.isDefined) && got.exists(_._4.isEmpty))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.split("AsOfJoin").length - 1 >= 2, "expected two native merge execs")
  }
}
