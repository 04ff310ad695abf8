package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement-only: stage-by-stage timing of the containment gate
  * (guide §1 — attribute the residual before touching the self-join). */
object ContainProbe {
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
    import graft.functions.PortableHashExprs
    import graft.sources.Tables

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    Tables.table(spark, dir, "documents").count()
    for (rep <- 1 to 3) {
      println(s"--- rep $rep")
      val sh = Tables.documents(spark, dir)
        .select(col("doc_id"),
          explode(PortableHashExprs.portable_shingles(col("text"), 3))
            .as("shg"))
        .filter(col("shg") =!= "")
        .select(col("doc_id"),
          conv(substring(md5(col("shg")), 1, 14), 16, 10).cast("long")
            .as("h"))
      time("kernel only (noop)") {
        sh.write.format("noop").mode("overwrite").save()
      }
      val dsh = sh.distinct()
      time("kernel+distinct (noop)") {
        dsh.write.format("noop").mode("overwrite").save()
      }
      import org.apache.spark.sql.expressions.Window
      val shkPlan = dsh
        .withColumn("df", count(lit(1)).over(Window.partitionBy(col("h"))))
        .filter(col("df") <= 32)
        .select(col("doc_id"), col("h"))
      val shk = time("stage+checkpoint")(shkPlan.localCheckpoint())
      val sizes = shk.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
      val pairs = shk.select(col("h"), col("doc_id").as("contained_id"))
        .join(shk.select(col("h"), col("doc_id").as("container_id")),
          Seq("h"))
        .filter(col("contained_id") =!= col("container_id"))
        .groupBy(col("contained_id"), col("container_id"))
        .agg(count(lit(1)).as("n_common"))
      time("self-join pairs (noop)") {
        pairs.write.format("noop").mode("overwrite").save()
      }
      time("rest (join sizes + sort)") {
        pairs
          .join(sizes.select(col("doc_id").as("contained_id"),
            col("n_sh").as("n_contained")), Seq("contained_id"))
          .withColumn("containment_ppm",
            expr("n_common * 1000000L DIV n_contained"))
          .filter(col("containment_ppm") >= 800000L)
          .orderBy(col("contained_id"), col("container_id"))
          .write.format("noop").mode("overwrite").save()
      }
      // candidate replacement: groupBy(h)+collect_list, in-row pairs
      val grouped = shk.groupBy(col("h"))
        .agg(collect_list(col("doc_id")).as("ids"))
      val pairs2 = grouped
        .select(explode(col("ids")).as("contained_id"), col("ids"))
        .select(col("contained_id"), explode(col("ids")).as("container_id"))
        .filter(col("contained_id") =!= col("container_id"))
        .groupBy(col("contained_id"), col("container_id"))
        .agg(count(lit(1)).as("n_common"))
      time("collect_list pairs (noop)") {
        pairs2.write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
