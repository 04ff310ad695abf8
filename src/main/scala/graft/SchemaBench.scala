package graft

import org.apache.spark.sql.SparkSession

/** Measurement-only: cost of parquet schema inference at DataFrame build
  * time, inferred vs explicit schema, interleaved in one process so the
  * box-load lottery hits both arms equally. */
object SchemaBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = s"$dir/lineitem.parquet"
    val schema = spark.read.parquet(path).schema
    // warm both paths
    spark.read.parquet(path).count()
    spark.read.schema(schema).parquet(path).count()
    var tInfer = 0.0; var tExplicit = 0.0
    var tInferCnt = 0.0; var tExplicitCnt = 0.0
    for (_ <- 1 to 30) {
      var t0 = System.nanoTime()
      spark.read.parquet(path)
      tInfer += (System.nanoTime() - t0) / 1e6
      t0 = System.nanoTime()
      spark.read.schema(schema).parquet(path)
      tExplicit += (System.nanoTime() - t0) / 1e6
      t0 = System.nanoTime()
      spark.read.parquet(path).selectExpr("sum(l_orderkey)").collect()
      tInferCnt += (System.nanoTime() - t0) / 1e6
      t0 = System.nanoTime()
      spark.read.schema(schema).parquet(path)
        .selectExpr("sum(l_orderkey)").collect()
      tExplicitCnt += (System.nanoTime() - t0) / 1e6
    }
    println(f"build-only  infer=${tInfer / 30}%8.1f ms  explicit=${tExplicit / 30}%8.1f ms")
    println(f"build+agg   infer=${tInferCnt / 30}%8.1f ms  explicit=${tExplicitCnt / 30}%8.1f ms")
    spark.stop()
  }
}
