package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: run named SparkEntry queries against an SF dir and print
  * row count + wall time per query. Usage:
  *   runMain graft.tools.RunQueries <sfDir> <name1,name2,...|all> [--explain]
  */
object RunQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val explain = args.contains("--explain")
    val show = args.contains("--show")
    val names: Seq[String] =
      if (args.length < 2 || args(1) == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var failed = 0
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[run] unknown query: $name"); failed += 1
        case Some(fn) =>
          val t0 = System.nanoTime()
          try {
            val df = fn(spark, sfDir)
            if (explain) df.explain("formatted")
            if (show) df.show(20, truncate = false)
            val n = df.count()
            println(f"[run] $name%-28s rows=$n%-8d ${(System.nanoTime() - t0) / 1e9}%.2fs")
          } catch {
            case e: Throwable =>
              failed += 1
              println(s"[run] $name FAILED: ${e.getMessage}")
          }
      }
    }
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
