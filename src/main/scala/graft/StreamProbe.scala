package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Measures where streaming-gate wall time goes: runs each gate's stream
  * via the same in-memory-sink path the bench times, and prints the
  * StreamingQueryProgress duration breakdown per microbatch plus the
  * wall-clock segments around it (dataframe build, start(), drain, stop).
  *
  * Usage: runMain graft.StreamProbe [gate ...]   (default: a spread)
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_PROBE_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warmup as Bench
    spark.range(1000000).selectExpr("sum(id % 7)", "count(distinct id % 11)")
      .collect()
    graft.sources.Tables.all.foreach { t =>
      graft.sources.Tables.table(spark, dir, t).count()
    }
    graft.federation.FederationHarness.setup(spark, dir)
    graft.federation.jdbc.JdbcHarness.executor(spark, dir)
    graft.federation.duckdb.DuckDbHarness.executor(spark, dir)

    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.filter(_.startsWith("stream_")).toSeq.sorted

    for (name <- names; it <- 1 to iters) {
      val fn = SparkEntry.queries(name)
      graft.streaming.StreamProbeHook.reset()
      val t0 = System.nanoTime()
      try {
        fn(spark, dir).count()
        val total = (System.nanoTime() - t0) / 1e6
        val seg = graft.streaming.StreamProbeHook.report()
        println(f"$name%-28s iter$it total=${total}%8.1f ms  $seg")
      } catch { case e: Throwable =>
        println(s"$name iter$it FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
