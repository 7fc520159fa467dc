package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.{QueryDef, Tables}

/** Scale-path variants of operators whose naive form degenerates to a
  * single task. */
object ScaleOps {

  /** Globally-ordered dense row ids WITHOUT a single-partition window:
    * range-repartition on the sort keys (so partition i holds keys ≤
    * partition i+1), sort within partitions, count rows per partition,
    * then add each partition's offset to its local index. Two narrow
    * passes; every stage is partition-parallel. This is the 100 TB path
    * for the reference's `Record_ID` assignment (SURVEY P13); the
    * result is identical to `row_number() OVER (ORDER BY keys)` because
    * the keys + tie-break form a total order.
    */
  def denseIds(df: DataFrame, keys: Seq[String], idCol: String): DataFrame = {
    val sortCols = keys.map(col)
    // Persist the arranged rows AT THE RDD LEVEL: the counts pass and the
    // id pass would otherwise EACH re-run the range exchange + sort + the
    // entire upstream plan (in the health ETL that is the whole cleaning
    // pipeline, twice) — and, because the range partitioner re-samples its
    // bounds per execution, a recompute could even produce DIFFERENT
    // partition boundaries than the ones `offsets` was built from. One
    // materialized copy pins both.
    //
    // RDD persist (not DataFrame.persist) on purpose: an InMemoryRelation
    // is held strongly by the session's CacheManager until an explicit
    // unpersist, so each call would leak a sorted copy of the input. An
    // RDD-level cache is released by the ContextCleaner as soon as the
    // returned frame (whose lineage is the only reference) is dropped.
    val arranged = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val arrangedRdd = arranged.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = arrangedRdd.mapPartitionsWithIndex {
      case (pid, it) => Iterator((pid, it.size.toLong))
    }.collect().sortBy(_._1)
    val offsets = counts.map(_._2).scanLeft(0L)(_ + _)
    val schema = StructType(arranged.schema.fields :+ StructField(idCol, LongType))
    val withIds = arrangedRdd.mapPartitionsWithIndex { case (pid, it) =>
      var i = offsets(pid)
      it.map { r => i += 1; Row.fromSeq(r.toSeq :+ i) }
    }
    df.sparkSession.createDataFrame(withIds, schema)
  }

  /** a17 — the scalable row-id over customers: must equal a15's
    * single-partition `row_number` exactly (same oracle SQL).
    */
  def a17ScalableRowNumber(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    denseIds(base, Seq("c_mktsegment", "c_custkey"), "record_id")
      .select(col("c_custkey"), col("c_mktsegment"),
              col("record_id").cast("int").as("record_id"))
      .orderBy(col("record_id"))
  }

  private val a17Sql =
    """SELECT c_custkey, c_mktsegment,
      |       CAST(ROW_NUMBER() OVER (ORDER BY c_mktsegment, c_custkey) AS INTEGER) AS record_id
      |FROM customer
      |ORDER BY record_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("a17_row_number_scalable",
      "P13 dense ids via range partition + offsets (no global window)",
      a17ScalableRowNumber, Some(a17Sql))
  )
}
