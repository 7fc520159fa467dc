package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Set-operation family: UNION ALL / UNION DISTINCT / INTERSECT / EXCEPT.
  * Absent from the reference (SURVEY §2.5 "Set ops: none") but part of the
  * complete engine surface. Distinct-flavored set ops are a single hash
  * shuffle on the full row — at 100 TB prefer the ALL variants plus an
  * explicit dropDuplicates on the minimal key set, which is what these
  * queries demonstrate.
  */
object SetOps {

  /** UNION ALL then conflict-free re-aggregation: one activity ledger from
    * two differently-shaped sources (orders + events), tagged by origin.
    */
  def s01UnionAll(spark: SparkSession, dir: String): DataFrame = {
    val fromOrders = Tables.orders(spark, dir)
      .select(col("o_custkey").as("actor_id"), lit("order").as("kind"))
    val fromEvents = Tables.events(spark, dir)
      .select(col("user_id").as("actor_id"), lit("event").as("kind"))
    fromOrders.unionByName(fromEvents)
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"), countDistinct(col("actor_id")).as("n_actors"))
      .orderBy(col("kind"))
  }

  private val s01Sql =
    """WITH u AS (
      |  SELECT o_custkey AS actor_id, 'order' AS kind FROM orders
      |  UNION ALL
      |  SELECT user_id AS actor_id, 'event' AS kind FROM events)
      |SELECT kind, COUNT(*) AS n, COUNT(DISTINCT actor_id) AS n_actors
      |FROM u GROUP BY kind ORDER BY kind""".stripMargin

  /** UNION DISTINCT over projected key tuples. */
  def s02UnionDistinct(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    val b = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    a.union(b).distinct().orderBy(col("o_custkey"))
  }

  private val s02Sql =
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |UNION
      |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |ORDER BY o_custkey""".stripMargin

  /** INTERSECT — customers with both a finished and an urgent order. */
  def s03Intersect(spark: SparkSession, dir: String): DataFrame = {
    val finished = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    finished.intersect(urgent).orderBy(col("o_custkey"))
  }

  private val s03Sql =
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |ORDER BY o_custkey""".stripMargin

  /** EXCEPT — customers with orders but never an urgent one. */
  def s04Except(spark: SparkSession, dir: String): DataFrame = {
    val all = Tables.orders(spark, dir).select(col("o_custkey"))
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    all.except(urgent).orderBy(col("o_custkey"))
  }

  private val s04Sql =
    """SELECT o_custkey FROM orders
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |ORDER BY o_custkey""".stripMargin

  /** INTERSECT ALL — multiset semantics: a customer with 3 finished and
    * 2 urgent orders appears min(3,2)=2 times. The ALL variants matter
    * at scale precisely because they avoid the full-row distinct of
    * s03/s04: Spark plans them as a counted semi-aggregate, not a
    * dedup-then-join.
    */
  def s07IntersectAll(spark: SparkSession, dir: String): DataFrame = {
    val finished = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    finished.intersectAll(urgent)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("multiplicity"))
      .orderBy(col("o_custkey"))
  }

  private val s07Sql =
    """WITH i AS (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |  INTERSECT ALL
      |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |SELECT o_custkey, COUNT(*) AS multiplicity
      |FROM i GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** EXCEPT ALL — multiset difference: occurrences survive count-wise
    * (5 finished minus 2 urgent leaves 3 rows), where s04's EXCEPT
    * removes the key entirely.
    */
  def s08ExceptAll(spark: SparkSession, dir: String): DataFrame = {
    val finished = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    finished.exceptAll(urgent)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("multiplicity"))
      .orderBy(col("o_custkey"))
  }

  private val s08Sql =
    """WITH e AS (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |  EXCEPT ALL
      |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |SELECT o_custkey, COUNT(*) AS multiplicity
      |FROM e GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("s01_union_all", "UNION ALL two sources + re-agg", s01UnionAll, Some(s01Sql)),
    QueryDef("s02_union_distinct", "UNION DISTINCT", s02UnionDistinct, Some(s02Sql)),
    QueryDef("s03_intersect", "INTERSECT", s03Intersect, Some(s03Sql)),
    QueryDef("s04_except", "EXCEPT", s04Except, Some(s04Sql)),
    QueryDef("s07_intersect_all", "INTERSECT ALL (multiset) + multiplicity",
      s07IntersectAll, Some(s07Sql)),
    QueryDef("s08_except_all", "EXCEPT ALL (multiset) + multiplicity",
      s08ExceptAll, Some(s08Sql))
  )
}
