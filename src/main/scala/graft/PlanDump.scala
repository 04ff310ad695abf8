package graft

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for named queries to files — the
  * before/after plan evidence for optimization rounds (plans/rNN/).
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> [query ...]
  * (no queries = every SparkEntry query). Environment mirrors Bench:
  * SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.federation.FederationHarness.setup(spark, dir)
    graft.federation.jdbc.JdbcHarness.executor(spark, dir)
    graft.federation.duckdb.DuckDbHarness.executor(spark, dir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- names) {
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        // executed plan too (post-AQE shape) — run the query first
        df.count()
        val executed = df.queryExecution.executedPlan.toString()
        val body = s"== explain(formatted) ==\n$formatted\n" +
          s"== executedPlan (post-AQE) ==\n$executed\n"
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
          body.getBytes("UTF-8"))
        System.err.println(s"[plandump] wrote $name")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
