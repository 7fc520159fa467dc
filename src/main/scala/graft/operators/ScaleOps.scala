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

  /** Distributed prefix sum: the running total of `valueCol` in
    * `orderCols` order WITHOUT a single-partition window — the same
    * two-pass shape as [[denseIds]] (range repartition + sort, collect
    * ONE long per partition, add each partition's offset to its local
    * running sum). Nulls contribute 0. Identical to
    * `sum(value) OVER (ORDER BY keys ROWS UNBOUNDED PRECEDING)` when the
    * keys form a total order; every stage is partition-parallel, so this
    * is the 100 TB path for cumulative token accounting / sequence
    * packing.
    */
  def prefixSum(df: DataFrame, orderCols: Seq[String], valueCol: String,
                outCol: String): DataFrame = {
    val sortCols = orderCols.map(col)
    val arranged = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    // RDD-level persist for the same two reasons as denseIds: pin the
    // range boundaries across both passes, collectable by the cleaner
    val arrangedRdd = arranged.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val idx = arranged.schema.fieldIndex(valueCol)
    val partSums = arrangedRdd.mapPartitionsWithIndex { case (pid, it) =>
      var s = 0L
      it.foreach(r => if (!r.isNullAt(idx)) s += r.getLong(idx))
      Iterator((pid, s))
    }.collect().sortBy(_._1)
    val offsets = partSums.map(_._2).scanLeft(0L)(_ + _)
    val schema = StructType(arranged.schema.fields :+ StructField(outCol, LongType))
    val out = arrangedRdd.mapPartitionsWithIndex { case (pid, it) =>
      var s = offsets(pid)
      it.map { r =>
        if (!r.isNullAt(idx)) s += r.getLong(idx)
        Row.fromSeq(r.toSeq :+ s)
      }
    }
    df.sparkSession.createDataFrame(out, schema)
  }

  /** t08 — sequence packing for LLM training batches: documents in
    * doc_id order are laid out on one token stream and cut into packs of
    * `budget` tokens; a document belongs to the pack its FIRST token
    * lands in (contiguous packing — the deterministic, fully parallel
    * variant of greedy first-fit: packs can overflow by at most one
    * document, never reorder). The cumulative count comes from
    * [[prefixSum]], so no single-partition window anywhere.
    */
  def t08SequencePacking(spark: SparkSession, dir: String,
                         budget: Long = 512L): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast(LongType).as("n_tok"))
    prefixSum(docs, Seq("doc_id"), "n_tok", "cum_tok")
      .withColumn("pack_id", expr(s"(cum_tok - n_tok) div $budget"))
      .groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_tok")).as("pack_tokens"),
           min(col("doc_id")).as("first_doc"),
           max(col("doc_id")).as("last_doc"))
      .orderBy(col("pack_id"))
  }

  private val t08Sql =
    """WITH d AS (
      |  SELECT doc_id, CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, n_tok,
      |    SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
      |  FROM d)
      |SELECT CAST((cum_tok - n_tok) // 512 AS BIGINT) AS pack_id, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tok) AS BIGINT) AS pack_tokens,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM c
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

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

  /** a30 — exact LOWER weighted median of extended price, weighted by
    * quantity, per return flag: the smallest price v with
    * 2·Σ(quantity | price ≤ v) ≥ total quantity. Spark's built-in
    * weighted form (`percentile(v, 0.5, freq)`) buffers a counts-map
    * over every distinct value into one final reducer; this instead
    * runs the bounded-state `bithistw` radix selection (weight-sum
    * histograms, ~100 KB state, map-side combined) once per slice, all
    * slices sharing each of the ≤6 passes. The slice labels come from
    * one tiny distinct scan — the return flag is a bounded analytics
    * dimension (3 values), not data-scale fan-out. The median is an
    * actual data value (no interpolation), so it is bit-exact
    * cross-engine.
    */
  def a30WeightedMedian(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.lineitem(spark, dir)
      .filter(col("l_extendedprice").isNotNull && col("l_quantity").isNotNull &&
              col("l_quantity") > 0)
      .select(col("l_returnflag"), col("l_extendedprice"),
              col("l_quantity").cast(LongType).as("w"))
    val flags = base.select(col("l_returnflag")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val meds = graft.util.ScalableQuantile.weightedLowerMedians(
      base, "l_extendedprice", "w",
      flags.map(f => f -> (col("l_returnflag") === f)))
    val medDf = flags.map(f => (f, meds(f).get)).toDF("l_returnflag", "weighted_median")
    base.groupBy(col("l_returnflag"))
      .agg(sum(col("w")).as("total_weight"))
      .join(broadcast(medDf), Seq("l_returnflag"))
      .select(col("l_returnflag"), col("total_weight"),
              col("weighted_median"))
      .orderBy(col("l_returnflag"))
  }

  private val a30Sql =
    """WITH w AS (
      |  SELECT l_returnflag g, l_extendedprice v, CAST(l_quantity AS BIGINT) wt
      |  FROM lineitem
      |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL AND l_quantity > 0),
      |t AS (SELECT g, CAST(SUM(wt) AS BIGINT) tw FROM w GROUP BY 1),
      |c AS (SELECT g, v, SUM(wt) OVER (PARTITION BY g ORDER BY v) cum FROM w),
      |m AS (SELECT c.g, MIN(c.v) med
      |      FROM c JOIN t ON c.g = t.g
      |      WHERE 2 * c.cum >= t.tw
      |      GROUP BY c.g)
      |SELECT t.g AS l_returnflag, t.tw AS total_weight, m.med AS weighted_median
      |FROM t JOIN m ON t.g = m.g
      |ORDER BY l_returnflag""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("a30_weighted_median",
      "exact weighted median per flag via bithistw radix selection",
      a30WeightedMedian, Some(a30Sql)),
    QueryDef("a17_row_number_scalable",
      "P13 dense ids via range partition + offsets (no global window)",
      a17ScalableRowNumber, Some(a17Sql)),
    QueryDef("t08_sequence_packing",
      "contiguous token packing via distributed prefix sum",
      t08SequencePacking(_, _), Some(t08Sql))
  )
}
