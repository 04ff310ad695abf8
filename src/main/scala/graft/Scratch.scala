package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan-audit main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val audited = Seq(
      "q3_shipping_priority", "q5_local_supplier", "q6_forecast_revenue",
      "q10_returned_items", "ev_sessionize", "dedup_minhash",
      "sim_bruteforce_topk", "samp_hash_10pct")

    for (name <- audited) {
      val df = SparkEntry.queries(name)(spark, dir)
      df.count() // let AQE finalize
      val plan = df.queryExecution.executedPlan.toString()
      def count(s: String) = plan.sliding(s.length).count(_ == s)
      println(s"=== $name ===")
      println(s"  broadcasts=${count("BroadcastHashJoin")} " +
        s"smj=${count("SortMergeJoin")} " +
        s"exchanges=${count("Exchange")} " +
        s"codegenSpans=${count("WholeStageCodegen")}")
      plan.linesIterator
        .filter(l => l.contains("PushedFilters") || l.contains("ReadSchema"))
        .take(6).foreach(l => println("  " + l.trim.take(160)))
    }
    spark.stop()
  }
}
