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
