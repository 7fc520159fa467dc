package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** The genuine streaming path must replay to byte-identical results vs
  * the batch plan (same windows, same exact decimal sums). */
class EventStreamSpec extends AnyFunSuite {
  import SparkTestSession._

  test("streaming tumbling windows == batch tumbling windows on replay") {
    val batch = EventStream.st01Tumbling(spark, sf).collect().map(_.toString)
    val streamed = EventStream.streamingTumblingCounts(spark, sf).collect().map(_.toString)
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("streaming session windows == batch session windows on replay") {
    import org.apache.spark.sql.functions._
    import graft.util.Exact._
    val spark2 = spark
    spark2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stageDir = java.nio.file.Files.createTempDirectory("graft_sess_")
    java.nio.file.Files.createSymbolicLink(
      stageDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sf/events.parquet"))
    val q = spark2.readStream
      .schema(EventStream.eventsSchema)
      .parquet(stageDir.toString)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "6 hours").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), exactSum(col("value")).as("sum_value"))
      .select(col("user_id"), unix_micros(col("w.start")).as("session_start_us"),
              col("n_events"), col("sum_value"))
      .writeStream.format("memory").queryName("st_sessions")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark2.table("st_sessions")
      .orderBy(col("user_id"), col("session_start_us")).collect().map(_.toString)
    val batch = EventStream.st04SessionWindow(spark2, sf).collect().map(_.toString)
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
  }

  test("mapGroupsWithState final per-user state == batch aggregate") {
    import org.apache.spark.sql.functions._
    val streamed = EventStream.statefulUserStats(spark, sf).collect().map(_.toString)
    val batch = Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (sum(expr("CAST(round(value * 100) AS BIGINT)")) / 100.0).as("sum_value"))
      .orderBy(col("user_id")).collect().map(_.toString)
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
  }

  test("driver entry() smoke: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("scalable dense ids == single-partition row_number") {
    val a15 = operators.Relational.a15RowNumber(spark, sf).collect().map(_.toString)
    val a17 = operators.ScaleOps.a17ScalableRowNumber(spark, sf).collect().map(_.toString)
    assert(a17.toSeq == a15.toSeq)
  }

  test("m02 metadata aggregation never reads the text payload column... beyond length") {
    val df = operators.Multimodal.m02MetadataOnly(spark, sf)
    df.collect()
    val scan = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!scan.contains("source"), s"scan reads more than needed: $scan")
  }
}
