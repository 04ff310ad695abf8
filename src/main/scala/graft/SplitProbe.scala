package graft

import org.apache.spark.sql.SparkSession

/** Measurement-only: does `spark.sql.files.maxPartitionBytes` change the
  * microbatch scan parallelism (and addBatch wall) of the file-source
  * streaming gates? Interleaved A/B in one process per guide §1. */
object SplitProbe {
  def main(args: Array[String]): Unit = {
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
    graft.sources.Tables.all.foreach { t =>
      graft.sources.Tables.table(spark, dir, t).count()
    }
    val gates = Seq("stream_c4_filter", "stream_lm_quality", "stream_novelty",
      "stream_dsir", "stream_anomaly_tag")
    for (round <- 1 to 3; split <- Seq("128m", "4m", "1m"); g <- gates) {
      spark.conf.set("spark.sql.files.maxPartitionBytes", split)
      val t0 = System.nanoTime()
      SparkEntry.queries(g)(spark, dir).count()
      println(f"round$round split=$split%-5s $g%-22s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    spark.stop()
  }
}
