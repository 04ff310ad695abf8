package graft

import org.apache.spark.sql.SparkSession

/** Measurement-only: runs the named gates in order, printing EVERY
  * iteration's wall time (the bench only prints median/min, which hides
  * per-iteration degradation); when an iteration exceeds 4x the gate's
  * first, dumps driver thread stacks to stderr for attribution.
  *
  * Usage: runMain graft.IterProbe <iters> <gate> [gate ...]
  */
object IterProbe {
  def main(args: Array[String]): Unit = {
    val iters = args(0).toInt
    val names = args.drop(1).toSeq
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(
      sys.env.getOrElse("SPARK_GRAFT_LOG", "WARN"))
    spark.range(1000000).selectExpr("sum(id % 7)", "count(distinct id % 11)")
      .collect()
    graft.sources.Tables.all.foreach { t =>
      graft.sources.Tables.table(spark, dir, t).count()
    }
    graft.federation.FederationHarness.setup(spark, dir)
    graft.federation.jdbc.JdbcHarness.executor(spark, dir)
    graft.federation.duckdb.DuckDbHarness.executor(spark, dir)

    for (name <- names) {
      val fn = SparkEntry.queries(name)
      var first = -1.0
      var dumped = false
      for (it <- 1 to iters) {
        val watcher = new Thread(() => {
          // dump stacks if this iteration runs 4x the first one
          if (first > 0 && !dumped) {
            try {
              Thread.sleep(math.max(2000, (first * 4 * 1000).toLong))
              if (!dumped) {
                dumped = true
                System.err.println(s"=== SLOW ITERATION thread dump ($name iter $it) ===")
                import scala.jdk.CollectionConverters._
                Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
                  if (st.nonEmpty && !t.getName.startsWith("IterProbe-watch")) {
                    System.err.println(s"--- ${t.getName} (${t.getState})")
                    st.take(12).foreach(f => System.err.println(s"    $f"))
                  }
                }
              }
            } catch { case _: InterruptedException => }
          }
        }, s"IterProbe-watch-$it")
        watcher.setDaemon(true)
        watcher.start()
        import scala.jdk.CollectionConverters._
        def gcStats(): (Long, Long) = {
          val beans = java.lang.management.ManagementFactory
            .getGarbageCollectorMXBeans.asScala
          (beans.map(_.getCollectionCount).sum,
            beans.map(_.getCollectionTime).sum)
        }
        val (gc0, gt0) = gcStats()
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        val (gc1, gt1) = gcStats()
        watcher.interrupt()
        if (first < 0) first = sec
        val heapMb = (Runtime.getRuntime.totalMemory() -
          Runtime.getRuntime.freeMemory()) / (1024 * 1024)
        println(f"$name iter$it: $sec%8.3f s  gcN=${gc1 - gc0}%3d " +
          f"gcMs=${gt1 - gt0}%6d heapUsedMb=$heapMb%6d")
      }
    }
    spark.stop()
  }
}
