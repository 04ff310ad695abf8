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

  // ------------------------------------------------ mixture construction

  /** The target pre-training mixture, as ppm weights per language. */
  val mixtureWeights: Seq[(String, Long)] = Seq(
    "en" -> 400000L, "de" -> 150000L, "fr" -> 150000L,
    "es" -> 150000L, "zh" -> 150000L)

  /** Mixture construction: turn target per-stratum weights into the
    * LARGEST achievable downsample-only corpus and the deterministic
    * per-stratum acceptance rates that produce it.
    *
    *   T        = min over strata of ⌊n_s · 10⁶ / w_s⌋  (binding stratum)
    *   quota_s  = ⌊w_s · T / 10⁶⌋
    *   rate_s   = ⌊quota_s · 10⁴ / n_s⌋ basis points, membership =
    *              md5-bucket(doc_id) mod 10⁴ < rate_s
    *
    * All integer arithmetic, so any engine derives the same rates and the
    * same member set. Plan shape: one tiny per-stratum aggregate (strata
    * count is small — the global window over it is a 5-row frame at ANY
    * corpus size), broadcast back onto the corpus for the membership
    * flag, then the per-stratum rollup — the corpus is scanned, never
    * re-shuffled wide. */
  def mixture(s: SparkSession, dir: String,
      weights: Seq[(String, Long)] = mixtureWeights): DataFrame = {
    val w = weights.tail.foldLeft(
      when(col("lang") === weights.head._1, lit(weights.head._2))) {
      case (acc, (l, p)) => acc.when(col("lang") === l, lit(p))
    }.otherwise(lit(0L))
    val counts = documents(s, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .withColumn("w_ppm", w)
      .filter(col("w_ppm") > 0)
    import org.apache.spark.sql.expressions.Window
    val rates = counts
      .withColumn("t_feasible",
        min(expr("n * 1000000L div w_ppm")).over(
          Window.partitionBy(lit(1))))
      .withColumn("quota", expr("w_ppm * t_feasible div 1000000L"))
      .withColumn("rate_bp",
        least(lit(10000L), expr("quota * 10000L div n")))
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 14),
      16, 10).cast("long") % 10000
    documents(s, dir)
      .withColumn("bucket", bucket)
      .join(broadcast(rates), "lang")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_total"),
        first(col("w_ppm")).as("w_ppm"),
        first(col("quota")).as("quota"),
        first(col("rate_bp")).as("rate_bp"),
        sum(when(col("bucket") < col("rate_bp"), 1L).otherwise(0L))
          .as("n_sampled"))
      .orderBy(col("lang"))
  }

  val mixtureOracle: String =
    """WITH c AS (
      |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
      |    CASE lang WHEN 'en' THEN 400000 WHEN 'de' THEN 150000
      |      WHEN 'fr' THEN 150000 WHEN 'es' THEN 150000
      |      WHEN 'zh' THEN 150000 ELSE 0 END AS w_ppm
      |  FROM documents GROUP BY lang
      |), t AS (
      |  SELECT lang, n, w_ppm,
      |    MIN(n * 1000000 // w_ppm) OVER () AS tf
      |  FROM c WHERE w_ppm > 0
      |), r AS (
      |  SELECT lang, n, w_ppm, (w_ppm * tf) // 1000000 AS quota,
      |    LEAST(10000, ((w_ppm * tf) // 1000000) * 10000 // n) AS rate_bp
      |  FROM t
      |)
      |SELECT r.lang, r.n AS n_total, CAST(r.w_ppm AS BIGINT) AS w_ppm,
      |  CAST(r.quota AS BIGINT) AS quota, CAST(r.rate_bp AS BIGINT) AS rate_bp,
      |  CAST(SUM(CASE WHEN
      |    CAST('0x'||substr(md5(CAST(d.doc_id AS VARCHAR)),1,14) AS BIGINT)
      |      % 10000 < r.rate_bp THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
      |FROM r JOIN documents d ON d.lang = r.lang
      |GROUP BY r.lang, r.n, r.w_ppm, r.quota, r.rate_bp
      |ORDER BY r.lang""".stripMargin

  // ------------------------------------------- leakage-free splitting

  /** Leakage-free train/valid/test split: the split is assigned to each
    * near-dup CLUSTER ([[Dedup.components]] label), not each document, so
    * two near-duplicate documents can never land in different splits — a
    * per-doc hash split leaks every near-dup pair that straddles
    * train/test, which is exactly the contamination the dedup pipeline
    * exists to prevent. Assignment is the same deterministic MD5 bucket
    * as [[hashSample]], keyed on the component id: 90/5/5 by bucket
    * ranges, reproducible across runs, engines, and corpus growth (a
    * cluster's split never changes unless the cluster itself merges).
    *
    * Scale shape: one broadcast-or-hash join of the corpus against the
    * cached label table (two longs per doc — built once per corpus
    * snapshot inside [[Dedup.components]]); the bucket is a projection.
    * No extra shuffle beyond the label join. */
  def leakFreeSplit(s: SparkSession, dir: String): DataFrame = {
    val bucket = conv(substring(md5(col("component").cast("string")), 1, 14),
      16, 10).cast("long") % 100
    graft.operators.Dedup.components(s, dir)
      .select(col("doc_id"), col("component"))
      .withColumn("bucket", bucket)
      .withColumn("split",
        when(col("bucket") < 90, "train")
          .when(col("bucket") < 95, "valid")
          .otherwise("test"))
      .select(col("doc_id"), col("component"), col("split"))
      .orderBy(col("doc_id"))
  }

  /** Recursive-CTE labels (the [[Dedup.componentsOracle]] fixpoint) with
    * the same MD5 bucket rule on the component id. */
  val leakFreeSplitOracle: String =
    graft.operators.Dedup.componentsOracle.replace(
      """SELECT doc_id, MIN(comp) AS component, MIN(comp) = doc_id AS is_rep
        |FROM reach GROUP BY doc_id ORDER BY doc_id""".stripMargin,
      """, lab AS (
        |  SELECT doc_id, MIN(comp) AS component FROM reach GROUP BY doc_id
        |)
        |SELECT doc_id, component,
        |  CASE WHEN CAST('0x'||substr(md5(CAST(component AS VARCHAR)),1,14) AS BIGINT) % 100 < 90 THEN 'train'
        |       WHEN CAST('0x'||substr(md5(CAST(component AS VARCHAR)),1,14) AS BIGINT) % 100 < 95 THEN 'valid'
        |       ELSE 'test' END AS split
        |FROM lab ORDER BY doc_id""".stripMargin)
}
