package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway the engine's custom logical operators
  * need: wrapping a hand-built [[LogicalPlan]] into a DataFrame. Spark
  * exposes every other extension seam publicly (functions, optimizer
  * rules, planner strategies via `SparkSessionExtensions` /
  * `spark.experimental`), but plan construction itself has no public
  * constructor — so this lives in `org.apache.spark.sql` to see
  * `classic.Dataset.ofRows`, and contains nothing else.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
