package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables._

/** Deterministic sampling — a core training-data-curation primitive: the
  * sample is a pure function of the row key (MD5 bucket), so it is
  * reproducible across runs, engines, and cluster sizes, composes with
  * incremental ingestion (a doc's membership never changes), and needs no
  * shuffle or state. The 10% bucket rule uses the same engine-portable
  * hash as [[graft.functions.PortableHashExprs]], so the DuckDB oracle
  * selects the identical sample.
  */
object Sampling {

  /** Portable MD5 bucket in [0, 100) of a key column rendered as text. */
  private def hashBucket(keyAsString: org.apache.spark.sql.Column) =
    conv(substring(md5(keyAsString), 1, 14), 16, 10).cast("long") % 100

  /** The deterministic 10% document sample, with its bucket exposed. */
  def hashSample(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .withColumn("bucket", hashBucket(col("doc_id").cast("string")))
      .filter(col("bucket") < 10)
      .select(col("doc_id"), col("source"), col("lang"), col("bucket"))
      .orderBy(col("doc_id"))

  val hashSampleOracle: String =
    """SELECT doc_id, source, lang,
      |  CAST('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,14) AS BIGINT) % 100 AS bucket
      |FROM documents
      |WHERE CAST('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,14) AS BIGINT) % 100 < 10
      |ORDER BY doc_id""".stripMargin

  /** Per-source sampled-vs-total counts: the report a pipeline uses to
    * confirm the sample is unbiased across strata. */
  def sampleStats(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .withColumn("sampled",
        (hashBucket(col("doc_id").cast("string")) < 10).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_total"), sum(col("sampled")).as("n_sampled"))
      .orderBy(col("source"))

  val sampleStatsOracle: String =
    """SELECT source, COUNT(*) AS n_total,
      |  CAST(SUM(CASE WHEN CAST('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,14) AS BIGINT) % 100 < 10
      |       THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin

  /** Stratified deterministic sampling: a different rate per language
    * stratum (downsample the dominant language, upsample the tails — the
    * standard data-mixing move when rebalancing a training corpus). Same
    * MD5-bucket membership rule as [[hashSample]], so strata stay
    * reproducible and composable: a document's bucket never changes, only
    * the per-stratum threshold does. Still a pure filter — no shuffle, no
    * state, no sort — so it pushes into the scan at any corpus size. */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val rate = when(col("lang") === "en", lit(5))
      .when(col("lang").isin("de", "fr", "es"), lit(20))
      .otherwise(lit(50))
    documents(s, dir)
      .withColumn("bucket", hashBucket(col("doc_id").cast("string")))
      .filter(col("bucket") < rate)
      .select(col("doc_id"), col("lang"), col("bucket"))
      .orderBy(col("doc_id"))
  }

  val stratifiedSampleOracle: String =
    """SELECT doc_id, lang,
      |  CAST('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,14) AS BIGINT) % 100 AS bucket
      |FROM documents
      |WHERE CAST('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,14) AS BIGINT) % 100
      |  < CASE WHEN lang = 'en' THEN 5
      |         WHEN lang IN ('de','fr','es') THEN 20 ELSE 50 END
      |ORDER BY doc_id""".stripMargin
}
