package graft

import org.apache.spark.sql.SparkSession

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    graft.federation.FederationHarness.setup(spark, dir)

    val df = spark.sql(
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM fed_orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin)
    println("=== ROLLUP optimized ===")
    println(df.queryExecution.optimizedPlan.treeString)

    val df2 = spark.sql(
      """SELECT o_orderstatus, COUNT(*) AS n
        |FROM fed_orders
        |GROUP BY GROUPING SETS ((o_orderstatus), ())""".stripMargin)
    println("=== GROUPING SETS optimized ===")
    println(df2.queryExecution.optimizedPlan.treeString)

    val df3 = spark.sql(
      """SELECT o_orderstatus, GROUPING(o_orderstatus) AS g, COUNT(*) AS n
        |FROM fed_orders GROUP BY CUBE (o_orderstatus)""".stripMargin)
    println("=== CUBE + GROUPING optimized ===")
    println(df3.queryExecution.optimizedPlan.treeString)

    // scalar subquery shape
    val df4 = spark.sql(
      """SELECT o_orderkey FROM fed_orders
        |WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM fed_orders)
        |LIMIT 5""".stripMargin)
    println("=== scalar subquery optimized ===")
    println(df4.queryExecution.optimizedPlan.treeString)

    // IN subquery shape
    val df5 = spark.sql(
      """SELECT c_custkey FROM fed_customer
        |WHERE c_custkey IN (SELECT o_custkey FROM fed_orders WHERE o_orderstatus = 'F')
        |LIMIT 5""".stripMargin)
    println("=== IN subquery optimized ===")
    println(df5.queryExecution.optimizedPlan.treeString)

    spark.stop()
  }
}
