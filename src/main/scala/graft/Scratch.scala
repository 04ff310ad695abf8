package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warmup
    spark.range(1000000).selectExpr("sum(id % 7)").collect()
    graft.sources.Tables.documents(spark, dir).count()

    time("signatures only") {
      graft.sources.Tables.documents(spark, dir)
        .select(col("doc_id"),
          operators.Dedup.minhashSignature(col("text")).as("sig"))
        .count()
    }
    time("candidates(0.5)") {
      operators.Dedup.minhashCandidates(spark, dir, 0.5).count()
    }
    time("candidates again (sig cached)") {
      operators.Dedup.minhashCandidates(spark, dir, 0.5).count()
    }
    time("shingle sets only") {
      graft.sources.Tables.documents(spark, dir)
        .select(col("doc_id"),
          array_distinct(operators.Dedup.shingles(col("text"))).as("sh"))
        .count()
    }
    time("full ngramJaccard") {
      operators.Dedup.ngramJaccard(spark, dir).count()
    }
    time("full ngramJaccard again") {
      operators.Dedup.ngramJaccard(spark, dir).count()
    }
    println("[scratch] candidate count = " +
      operators.Dedup.minhashCandidates(spark, dir, 0.5).count())
    spark.stop()
  }
}
