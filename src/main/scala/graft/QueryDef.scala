package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator exposed through the driver contract.
  *
  * @param name   stable key — appears in SparkEntry.queries / CORRECTNESS_r{N}.json
  * @param doc    which SURVEY.md §2 operator(s) this query exercises
  * @param oracle equivalent DuckDB SQL over the same parquet tables; None for
  *               ops not expressible in portable SQL (driver then records a
  *               weaker rows-only check)
  */
final case class QueryDef(
    name: String,
    doc: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)
