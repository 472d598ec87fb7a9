package graft

import org.apache.spark.sql.SparkSession
import graft.queries.Catalog

/** Diagnostic main: prints `explain("formatted")` for the headline queries —
  * the evidence that filters push to the parquet scans, small dimensions
  * broadcast, and the hot paths stay inside WholeStageCodegen.
  * Usage: runMain graft.Plans [sfDir]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- Catalog.headlines) {
      println(s"\n===== $name =====")
      try {
        val df = Catalog.queries(name)(spark, sfDir)
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch { case e: Throwable => println(s"failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
