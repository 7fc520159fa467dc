package graft.health

import org.apache.spark.sql.SparkSession

/** The COMMITTED cleaned-health fixture: the Spark ETL's output over the
  * reference CSV, written once as a single deterministic parquet file and
  * checked into the repo (tools/fixtures/). It is what the EP2 SQL-path
  * contract queries (HealthQueries.defs) and their DuckDB oracles both
  * read — the same artifact on both sides, so the dual-engine check
  * isolates the SQL semantics. A HealthSpec test keeps the artifact in
  * sync with the live ETL (bit-exact), and the ETL itself is separately
  * golden-tested against the reference's own pandas pipeline.
  *
  * Regenerate after an INTENTIONAL ETL change with:
  *   sbt "runMain graft.health.HealthFixture"
  * and review the diff like any golden change.
  */
object HealthFixture {

  val path = "/root/repo/tools/fixtures/health_cleaned.parquet"

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    write(spark, path)
    spark.stop()
  }

  /** One file, rows in Record_ID order — byte-stable across runs. */
  def write(spark: SparkSession, outFile: String): Unit = {
    val tmp = graft.util.Scratch.dir("health_fixture_")
    HealthEtl.clean(spark)
      .coalesce(1)
      .sortWithinPartitions("Record_ID")
      .write.mode("overwrite").parquet(tmp)
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .findFirst().orElseThrow()
    val dest = java.nio.file.Paths.get(outFile)
    java.nio.file.Files.createDirectories(dest.getParent)
    java.nio.file.Files.copy(part, dest,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }
}
