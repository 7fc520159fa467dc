package graft.report

import org.apache.spark.sql.SparkSession

/** CLI entry for the EP3 weekly report job.
  * Usage: runMain graft.report.ReportMain [csvPath] [outFile]
  */
object ReportMain {
  def main(args: Array[String]): Unit = {
    val csv = if (args.length > 0) args(0) else graft.health.HealthEtl.defaultCsvPath
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val report = WeeklyReport.run(spark, csv)
    if (args.length > 1)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(args(1)), report)
    println(report)
    spark.stop()
  }
}
