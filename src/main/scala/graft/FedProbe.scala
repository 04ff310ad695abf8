package graft

import org.apache.spark.sql.SparkSession

/** Measurement-only: splits a federated gate's wall time into DataFrame
  * construction, analysis, optimization (where FederationRule + the
  * unparser run), physical planning, and execution — the VERDICT-r14 ask
  * ("verify the unparse share; if plan-rewrite > 20 ms/gate, consider
  * caching unparse output"). */
object FedProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_PROBE_ITERS", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
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
      else Seq("fed_q1_pushdown", "fed_duckdb_q1", "fed_jdbc_q1",
        "fed_q3_join", "fed_duckdb_window", "fed_union_topk",
        "fed_duckdb_grouptopk", "fed_runtime_filter", "fed_exists",
        "fed_partial_agg")
    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6
    for (name <- names; it <- 1 to iters) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      val tBuild = ms(t0)
      val t1 = System.nanoTime()
      df.queryExecution.assertAnalyzed()
      val tAnalyze = ms(t1)
      val t2 = System.nanoTime()
      df.queryExecution.optimizedPlan
      val tOptimize = ms(t2)
      val t3 = System.nanoTime()
      df.queryExecution.executedPlan
      val tPlan = ms(t3)
      val t4 = System.nanoTime()
      df.count()
      val tExec = ms(t4)
      println(f"$name%-24s it$it build=$tBuild%7.1f analyze=$tAnalyze%7.1f " +
        f"optimize=$tOptimize%7.1f plan=$tPlan%6.1f exec=$tExec%7.1f ms")
    }
    spark.stop()
  }
}
