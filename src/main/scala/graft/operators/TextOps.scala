package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables._

/** Text-analysis operators for a training-data pipeline, over the
  * `documents` table (doc_id, text, lang, source, n_chars).
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * (split/filter/transform/aggregate on arrays) — no Scala UDFs — so at
  * 100 TB each operator is a single narrow scan-projection stage: no
  * shuffle at all until the (tiny) aggregate outputs.
  */
object TextOps {

  private def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** A small multilingual stopword table (public lists). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "de", "du", "que"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una", "de", "que"))

  /** Per-document token statistics: counts via whitespace tokenization plus a
    * BPE-ish sub-token estimate (runs of letters / digits / other). */
  def tokenStats(s: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    documents(s, dir).select(
      col("doc_id"),
      length(col("text")).as("n_chars_m"),
      size(t).as("n_tokens"),
      size(array_distinct(t)).as("n_distinct_tokens"),
      // BPE-ish: count letter runs, digit runs, and punctuation marks (a
      // cheap proxy for sub-word token count used for budget estimation).
      size(regexp_extract_all(col("text"),
        lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))
        .as("n_subtokens"))
      .orderBy(col("doc_id"))
  }

  val tokenStatsOracle: String =
    """SELECT doc_id,
      |  CAST(LENGTH(text) AS INTEGER) AS n_chars_m,
      |  CAST(LEN(regexp_split_to_array(TRIM(text), '\s+')) AS INTEGER) AS n_tokens,
      |  CAST(LEN(list_distinct(regexp_split_to_array(TRIM(text), '\s+'))) AS INTEGER) AS n_distinct_tokens,
      |  CAST(LEN(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS INTEGER) AS n_subtokens
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Quality scoring: length, lexical diversity, stopword ratio, mean token
    * length. Ratios are single IEEE divisions of exact integers, so they
    * hash-match the oracle. */
  def qualityScore(s: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    val en = stopwords("en")
    documents(s, dir).select(
      col("doc_id"),
      size(t).as("n_tokens"),
      (size(array_distinct(t)).cast("double") / size(t))
        .as("type_token_ratio"),
      (size(filter(t, x => x.isin(en.map(lit(_)): _*))).cast("double") / size(t))
        .as("stopword_ratio"),
      ((length(col("text")) - size(t) + 1).cast("double") / size(t))
        .as("mean_token_len"))
      .withColumn("quality_ok",
        col("n_tokens") >= 10 && col("type_token_ratio") > 0.2 &&
          col("mean_token_len") >= 2.0 && col("mean_token_len") <= 12.0)
      .orderBy(col("doc_id"))
  }

  val qualityScoreOracle: String = {
    val en = stopwords("en").map(w => s"'$w'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, text, regexp_split_to_array(TRIM(text), '\\s+') AS toks
       |  FROM documents
       |), m AS (
       |  SELECT doc_id,
       |    CAST(LEN(toks) AS INTEGER) AS n_tokens,
       |    CAST(LEN(list_distinct(toks)) AS DOUBLE) / LEN(toks) AS type_token_ratio,
       |    CAST(LEN(list_filter(toks, x -> x IN ($en))) AS DOUBLE) / LEN(toks) AS stopword_ratio,
       |    CAST(LENGTH(text) - LEN(toks) + 1 AS DOUBLE) / LEN(toks) AS mean_token_len
       |  FROM t
       |)
       |SELECT doc_id, n_tokens, type_token_ratio, stopword_ratio, mean_token_len,
       |  (n_tokens >= 10 AND type_token_ratio > 0.2
       |   AND mean_token_len >= 2.0 AND mean_token_len <= 12.0) AS quality_ok
       |FROM m
       |ORDER BY doc_id""".stripMargin
  }

  /** Language identification: CJK-character detection plus per-language
    * stopword voting with a fixed precedence (en > de > fr > es). A
    * frequency-profile n-gram classifier would use the same single-pass
    * shape; scoring is pure projection → embarrassingly parallel. */
  def langId(s: SparkSession, dir: String): DataFrame = {
    val t = tokens(lower(col("text")))
    def score(lang: String): Column =
      size(filter(t, x => x.isin(stopwords(lang).map(lit(_)): _*)))
    documents(s, dir).select(
      col("doc_id"), col("lang").as("labeled_lang"),
      score("en").as("s_en"), score("de").as("s_de"),
      score("fr").as("s_fr"), score("es").as("s_es"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "[\\x{4E00}-\\x{9FFF}]", "")))
        .as("n_cjk"))
      .withColumn("predicted_lang",
        when(col("n_cjk") > 0, "zh")
          .when(col("s_en") >= col("s_de") && col("s_en") >= col("s_fr") &&
            col("s_en") >= col("s_es"), "en")
          .when(col("s_de") >= col("s_fr") && col("s_de") >= col("s_es"), "de")
          .when(col("s_fr") >= col("s_es"), "fr")
          .otherwise("es"))
      .select(col("doc_id"), col("labeled_lang"), col("predicted_lang"),
        col("s_en"), col("s_de"), col("s_fr"), col("s_es"))
      .orderBy(col("doc_id"))
  }

  val langIdOracle: String = {
    def inList(lang: String) =
      stopwords(lang).map(w => s"'$w'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, lang, text,
       |    regexp_split_to_array(TRIM(LOWER(text)), '\\s+') AS toks
       |  FROM documents
       |), sc AS (
       |  SELECT doc_id, lang AS labeled_lang,
       |    CAST(LEN(list_filter(toks, x -> x IN (${inList("en")}))) AS INTEGER) AS s_en,
       |    CAST(LEN(list_filter(toks, x -> x IN (${inList("de")}))) AS INTEGER) AS s_de,
       |    CAST(LEN(list_filter(toks, x -> x IN (${inList("fr")}))) AS INTEGER) AS s_fr,
       |    CAST(LEN(list_filter(toks, x -> x IN (${inList("es")}))) AS INTEGER) AS s_es,
       |    LENGTH(text) - LENGTH(regexp_replace(text, '[\\x{4E00}-\\x{9FFF}]', '', 'g')) AS n_cjk
       |  FROM t
       |)
       |SELECT doc_id, labeled_lang,
       |  CASE WHEN n_cjk > 0 THEN 'zh'
       |       WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
       |       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
       |       WHEN s_fr >= s_es THEN 'fr'
       |       ELSE 'es' END AS predicted_lang,
       |  s_en, s_de, s_fr, s_es
       |FROM sc
       |ORDER BY doc_id""".stripMargin
  }

  /** Document fingerprinting: md5 content hash of normalized text plus a
    * 64-bit xxhash for cheap equality bucketing. */
  def fingerprint(s: SparkSession, dir: String): DataFrame = {
    val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    documents(s, dir).select(
      col("doc_id"),
      md5(norm).as("content_md5"),
      xxhash64(norm).as("content_xx64"))
      .orderBy(col("doc_id"))
  }

  /** Oracle covers the md5 fingerprint (xxhash64 is Spark-specific, checked
    * by the unit tests instead). */
  val fingerprintOracle: String =
    """SELECT doc_id,
      |  md5(regexp_replace(LOWER(TRIM(text)), '\s+', ' ', 'g')) AS content_md5
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** fingerprint variant restricted to oracle-comparable columns. */
  def fingerprintMd5(s: SparkSession, dir: String): DataFrame = {
    val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    documents(s, dir).select(
      col("doc_id"), md5(norm).as("content_md5"))
      .orderBy(col("doc_id"))
  }

  /** Heavy-hitter tokens via a distributed Count-Min sketch
    * ([[graft.functions.CountMinSketch.CountMinAgg]], a typed Aggregator:
    * per-partition partial sketches, elementwise-sum merge). Output: the
    * top tokens by exact count alongside the sketch's estimate — the
    * estimate is recomputed independently by the SQL oracle from the same
    * portable hash family, so over-count behavior is verified, not
    * assumed. Exact counts for the report come from a groupBy (fine for a
    * top-k report; the sketch is the scale path when the key domain does
    * not fit an exact aggregation). */
  def heavyHitters(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    import s.implicits._
    import graft.functions.{CountMinSketch, PortableHashExprs}
    val depth = 4
    val width = 1024
    val toks = documents(s, dir)
      .select(explode(PortableHashExprs.portable_shingles(col("text"), 1))
        .as("tok"))
      .filter(col("tok") =!= "")
      .persist() // the sketch pass and the exact-count pass share one scan
    val sketch = toks.as[String]
      .select(new CountMinSketch.CountMinAgg(depth, width).toColumn).head()
    val top = toks.groupBy(col("tok"))
      .agg(count(lit(1)).as("true_count"))
      .orderBy(col("true_count").desc, col("tok"))
      .limit(k).collect()
    toks.unpersist()
    val rows = top.toSeq.map { r =>
      val t = r.getString(0)
      (t, r.getLong(1), CountMinSketch.estimate(sketch, t, depth, width))
    }
    rows.toDF("token", "true_count", "est_count")
      .orderBy(col("true_count").desc, col("token"))
  }

  /** Top-k characteristic terms per document by a log-free TF-IDF rank:
    * score_ppm = ⌊tf · 10⁶ / df⌋. Dropping the usual log() keeps every
    * value in exact integer arithmetic (ln's last-ulp behavior differs
    * across engines, so a logged score would not hash-match an external
    * oracle), and per document the ranking is monotone in tf/df — the same
    * order classical tf·idf induces for a fixed corpus size. Two map-side
    * combinable aggregations (term frequency, document frequency), one
    * shuffle-hash join on the term dictionary, and a per-doc top-k window;
    * nothing touches the driver. */
  def tfidf(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import graft.functions.PortableHashExprs
    val terms = documents(s, dir)
      .select(col("doc_id"),
        explode(PortableHashExprs.portable_shingles(col("text"), 1)).as("term"))
      .filter(col("term") =!= "")
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, "term")
      .withColumn("score_ppm", expr("(tf * 1000000L) DIV df"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_ppm").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"),
        col("df"), col("score_ppm"))
      .orderBy(col("doc_id"), col("rank"))
  }

  val tfidfOracle: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    unnest([x FOR x IN string_split_regex(lower(text), '\s+') IF x <> '']) AS term
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
      |), dfreq AS (
      |  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
      |), scored AS (
      |  SELECT t.doc_id, t.term, t.tf, d.df,
      |    CAST((t.tf * 1000000) // d.df AS BIGINT) AS score_ppm
      |  FROM tf t JOIN dfreq d USING (term)
      |), ranked AS (
      |  SELECT doc_id, term, tf, df, score_ppm,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
      |      ORDER BY score_ppm DESC, term) AS INTEGER) AS rank
      |  FROM scored
      |)
      |SELECT doc_id, rank, term, tf, df, score_ppm FROM ranked
      |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin

  /** DuckDB rebuild of the sketch: same tokens, same bucket formula, same
    * min-over-rows estimate. */
  val heavyHittersOracle: String =
    """WITH toks AS (
      |  SELECT unnest([x FOR x IN string_split_regex(lower(text), '\s+') IF x <> '']) AS tok
      |  FROM documents
      |), top AS (
      |  SELECT tok, COUNT(*) AS true_count FROM toks
      |  GROUP BY tok ORDER BY true_count DESC, tok LIMIT 10
      |), cells AS (
      |  SELECT r.i,
      |    (((((1103515245*(r.i+7)+12345) % 1073741823) | 1)
      |       * (CAST('0x'||substr(md5(tok),1,14) AS BIGINT) % 2147483647)
      |       + ((2027382749*(r.i+13)+577) % 2147483647)) % 2147483647) % 1024 AS b,
      |    COUNT(*) AS c
      |  FROM toks CROSS JOIN (SELECT unnest(range(0, 4)) AS i) r
      |  GROUP BY 1, 2
      |), est AS (
      |  SELECT t.tok, MIN(c2.c) AS est_count
      |  FROM top t JOIN cells c2
      |    ON c2.b = (((((1103515245*(c2.i+7)+12345) % 1073741823) | 1)
      |       * (CAST('0x'||substr(md5(t.tok),1,14) AS BIGINT) % 2147483647)
      |       + ((2027382749*(c2.i+13)+577) % 2147483647)) % 2147483647) % 1024
      |  GROUP BY t.tok
      |)
      |SELECT t.tok AS token, t.true_count, e.est_count
      |FROM top t JOIN est e ON e.tok = t.tok
      |ORDER BY t.true_count DESC, t.tok""".stripMargin

  /** HyperLogLog-style distinct-token estimate built from pure integer
    * arithmetic so the SQL oracle reproduces it bit-for-bit: 256 registers,
    * bucket = h mod 256, rank = leading-zero count of the remaining 48
    * hash bits + 1, and the harmonic sum computed EXACTLY as an integer
    * (sum of 2^(49-rank) ≤ 2^57) before a single double division — no
    * transcendental functions, whose last-ulp behavior differs across
    * engines. Bias corrections are deliberately omitted for verifiability;
    * the exact distinct count is reported alongside. */
  def distinctEstimate(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PortableHashExprs
    val m = 256
    val toks = documents(s, dir)
      .select(explode(PortableHashExprs.portable_shingles(col("text"), 1))
        .as("tok"))
      .filter(col("tok") =!= "")
      .persist() // register pass and exact-count pass share one scan
    val hashed = toks.select(
      conv(substring(md5(col("tok")), 1, 14), 16, 10).cast("long").as("h"))
    val ranked = hashed.select(
      (col("h") % m).as("bucket"),
      expr("h div 256").as("w"))
      .withColumn("rank",
        when(col("w") === 0, lit(49))
          .otherwise(lit(49) - length(conv(col("w"), 10, 2))))
    val regs = ranked.groupBy(col("bucket")).agg(max(col("rank")).as("r"))
    val sums = regs.agg(
      sum(expr("cast(pow(2, 49 - r) as long)")).as("s_present"),
      count(lit(1)).as("n_buckets")).head()
    val trueDistinct =
      toks.agg(countDistinct(col("tok")).as("d")).head().getLong(0)
    toks.unpersist()
    val sPresent = sums.getLong(0)
    val nBuckets = sums.getLong(1)
    // absent buckets have rank 0 and contribute 2^49 each; the arithmetic
    // sequence below mirrors the oracle's expression order exactly
    val sTotal = sPresent + (m - nBuckets) * (1L << 49)
    val alpha = 0.7213 / (1 + 1.079 / m)
    val est = alpha * m * m * (1L << 49).toDouble / sTotal.toDouble
    import s.implicits._
    Seq((trueDistinct, est, nBuckets))
      .toDF("true_distinct", "est_distinct", "n_used_buckets")
  }

  val distinctEstimateOracle: String =
    """WITH toks AS (
      |  SELECT unnest([x FOR x IN string_split_regex(lower(text), '\s+') IF x <> '']) AS tok
      |  FROM documents
      |), hashed AS (
      |  SELECT CAST('0x'||substr(md5(tok),1,14) AS BIGINT) AS h FROM toks
      |), ranked AS (
      |  SELECT h % 256 AS bucket,
      |    CASE WHEN h // 256 = 0 THEN 49
      |         ELSE 49 - length(bin(h // 256)) END AS rank
      |  FROM hashed
      |), regs AS (
      |  SELECT bucket, MAX(rank) AS r FROM ranked GROUP BY bucket
      |), sums AS (
      |  SELECT CAST(SUM(CAST(pow(2, 49 - r) AS BIGINT)) AS BIGINT) AS s_present,
      |    COUNT(*) AS n_buckets
      |  FROM regs
      |)
      |SELECT
      |  (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) FROM toks) AS true_distinct,
      |  (0.7213 / (1 + 1.079 / 256)) * 256 * 256 * CAST(1::BIGINT << 49 AS DOUBLE)
      |    / CAST(s_present + (256 - n_buckets) * (1::BIGINT << 49) AS DOUBLE) AS est_distinct,
      |  n_buckets AS n_used_buckets
      |FROM sums""".stripMargin

  /** Repetition-based quality signals (the Gopher-style filters): type/
    * token ratio and the most-repeated token / adjacent bigram, as exact
    * integer ppm so any engine reproduces the ranking bitwise.
    *
    * One compiled pass per row ([[graft.functions.TextHashExprs
    * .TokenRepetition]]) — zero shuffle, vs the explode + two-groupBy
    * equivalent the oracle runs. */
  def repetition(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(col("doc_id"),
        graft.functions.TextHashExprs.token_repetition(col("text")).as("r"))
      .select(col("doc_id"), col("r.n_tokens").as("n_tokens"),
        col("r.n_distinct").as("n_distinct"),
        col("r.top_token_n").as("top_token_n"),
        col("r.top_bigram_n").as("top_bigram_n"))
      .withColumn("ttr_ppm",
        expr("n_distinct * 1000000L div n_tokens"))
      .withColumn("rep_bigram_ppm",
        expr("top_bigram_n * 1000000L div greatest(n_tokens - 1, 1)"))
      .orderBy(col("doc_id"))

  val repetitionOracle: String =
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |), tok AS (
      |  SELECT doc_id, unnest(toks) AS tok,
      |    unnest(generate_series(1, len(toks))) AS i
      |  FROM d
      |), tc AS (
      |  SELECT doc_id, COUNT(*) AS n_distinct, MAX(c) AS top_token_n
      |  FROM (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2)
      |  GROUP BY doc_id
      |), bc AS (
      |  SELECT doc_id, MAX(c) AS top_bigram_n
      |  FROM (SELECT a.doc_id, a.tok || ' ' || b.tok AS bg, COUNT(*) AS c
      |        FROM tok a JOIN tok b
      |          ON a.doc_id = b.doc_id AND b.i = a.i + 1
      |        GROUP BY 1, 2)
      |  GROUP BY doc_id
      |), base AS (
      |  SELECT d.doc_id, CAST(len(d.toks) AS INTEGER) AS n_tokens,
      |    CAST(t.n_distinct AS INTEGER) AS n_distinct,
      |    CAST(t.top_token_n AS INTEGER) AS top_token_n,
      |    CAST(COALESCE(b.top_bigram_n, 0) AS INTEGER) AS top_bigram_n
      |  FROM d JOIN tc t USING (doc_id) LEFT JOIN bc b USING (doc_id)
      |)
      |SELECT doc_id, n_tokens, n_distinct, top_token_n, top_bigram_n,
      |  CAST(CAST(n_distinct AS BIGINT) * 1000000
      |    // n_tokens AS BIGINT) AS ttr_ppm,
      |  CAST(CAST(top_bigram_n AS BIGINT) * 1000000
      |    // greatest(n_tokens - 1, 1) AS BIGINT) AS rep_bigram_ppm
      |FROM base ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- PII / pattern scan

  /** Sensitive-pattern library: the standard pre-training scrub targets
    * (emails, phone numbers, IPv4s) plus a configurable deny-list slot.
    * Patterns restrict to the RE2 ∩ java.util.regex common subset
    * (character classes, bounded repeats, alternation, `\b` — no
    * lookaround), so Spark and the oracle compile identical semantics. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone" -> "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b",
    "ipv4" -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b")

  /** The deny-list used by the gates: terms that DO occur in the synthetic
    * corpus, standing in for an org-specific blocklist. */
  val denyPattern: String = "\\b(customer|vector)\\b"

  /** Per-source sensitive-content report: match counts per pattern and
    * documents hit — the scrub-coverage summary an LLM-data pipeline emits
    * before redaction. One narrow projection + one tiny aggregate; the
    * regex work is codegen'd `regexp_extract_all`, no shuffle until the
    * per-source rollup. */
  def piiReport(s: SparkSession, dir: String,
      patterns: Seq[(String, String)] = piiPatterns,
      deny: String = denyPattern): DataFrame = {
    val counts = patterns.map { case (nm, p) =>
      size(regexp_extract_all(col("text"), lit(p), lit(0))).as(s"c_$nm")
    }
    val denyC = size(regexp_extract_all(col("text"), lit(deny), lit(0)))
      .as("c_deny")
    val perDoc = documents(s, dir)
      .select(col("source") +: (counts :+ denyC): _*)
    perDoc.groupBy(col("source"))
      .agg(
        sum(col(s"c_${patterns.head._1}")).as(s"n_${patterns.head._1}"),
        (patterns.tail.map { case (nm, _) =>
          sum(col(s"c_$nm")).as(s"n_$nm") } ++ Seq(
          sum(col("c_deny")).as("n_deny"),
          sum(when(col("c_deny") > 0, 1L).otherwise(0L)).as("docs_deny"),
          count(lit(1)).as("n_docs"))): _*)
      .orderBy(col("source"))
  }

  val piiReportOracle: String =
    """SELECT source,
      |  CAST(SUM(len(regexp_extract_all(text,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT) AS n_email,
      |  CAST(SUM(len(regexp_extract_all(text,
      |    '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b'))) AS BIGINT) AS n_phone,
      |  CAST(SUM(len(regexp_extract_all(text,
      |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))) AS BIGINT) AS n_ipv4,
      |  CAST(SUM(len(regexp_extract_all(text,
      |    '\b(customer|vector)\b'))) AS BIGINT) AS n_deny,
      |  CAST(SUM(CASE WHEN len(regexp_extract_all(text,
      |    '\b(customer|vector)\b')) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_deny,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs
      |FROM documents
      |GROUP BY source ORDER BY source""".stripMargin

  /** Redaction: deny-list hits replaced by `[MASKED]`; emits the masked
    * text's md5 (hash-exact cross-engine proof of the full redacted
    * string without shipping it) plus hit counts. Pure projection —
    * shuffle-free at any corpus size. */
  def maskText(s: SparkSession, dir: String,
      deny: String = denyPattern): DataFrame =
    documents(s, dir).select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(deny), lit(0))).as("n_masked"),
      md5(regexp_replace(col("text"), deny, "[MASKED]")).as("masked_md5"),
      length(regexp_replace(col("text"), deny, "[MASKED]")).as("masked_len"))
      .orderBy(col("doc_id"))

  val maskTextOracle: String =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '\b(customer|vector)\b'))
      |    AS INTEGER) AS n_masked,
      |  md5(regexp_replace(text, '\b(customer|vector)\b', '[MASKED]', 'g'))
      |    AS masked_md5,
      |  CAST(LENGTH(regexp_replace(text, '\b(customer|vector)\b',
      |    '[MASKED]', 'g')) AS INTEGER) AS masked_len
      |FROM documents ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------------- chunking

  /** Overlapping token-window chunking (RAG / context-window packing):
    * each document becomes ⌈n_tokens / stride⌉ windows of `width` tokens
    * starting every `stride`. Built as one generate-and-explode
    * projection — `sequence` of starts, `slice` per start, `posexplode` —
    * so chunking 100 TB is an embarrassingly parallel scan stage with no
    * shuffle; emits the chunk md5 + token count, not the text. */
  def chunk(s: SparkSession, dir: String, width: Int = 32,
      stride: Int = 16): DataFrame = {
    // filter-empty tokenization, same cross-engine rationale as blockDedup
    val toks = filter(split(col("text"), "\\s+"), t => t =!= "")
    val starts = sequence(lit(0),
      greatest(size(toks) - 1, lit(0)), lit(stride))
    val chunks = transform(starts,
      i => array_join(slice(toks, i + lit(1), lit(width)), " "))
    documents(s, dir)
      .select(col("doc_id"), toks.as("toks"), chunks.as("chunks"))
      .select(col("doc_id"), posexplode(col("chunks")).as(Seq("chunk_id", "chunk")))
      .select(col("doc_id"), col("chunk_id"),
        size(split(col("chunk"), " ")).as("n_tokens"),
        md5(col("chunk")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  // ----------------------------------------------------- BM25 retrieval

  /** The standing query-term set for the BM25 gate. */
  val bm25Terms: Seq[String] = Seq("customer", "spark", "merge")

  /** Log-free BM25 ranked retrieval: top-k documents for a small query
    * term set, scored with the classic saturation formula (k1=1.2,
    * b=0.75) kept ENTIRELY in exact integer arithmetic so the ranking is
    * engine-reproducible (same trick as [[tfidf]]'s score_ppm):
    *
    *   sat_ppm  = ⌊10⁶·22·tf·T / (10·tf·T + 3·T + 9·dl·N)⌋
    *   idf_ppm  = ⌊10⁶·(N−df+1) / (df+1)⌋
    *   score    = Σ_terms ⌊idf_ppm·sat_ppm / 10⁶⌋
    *
    * (k1, b folded into the ×10 constants: 22=10(k1+1), 3=10·k1(1−b),
    * 9=10·k1·b; multiplying through by corpus token count T clears the
    * dl/avgdl ratio without a float division.)
    *
    * Plan shape: per-doc tf for a HANDFUL of terms is array `filter`
    * inside one codegen'd projection — no explode, no per-term shuffle;
    * the corpus stats (N, T, per-term df) are ONE tiny aggregate
    * broadcast back; the global top-k is `orderBy().limit()` —
    * TakeOrderedAndProject, per-partition heaps + driver merge of k
    * rows, never a single-partition global sort. At 100 TB the stats row
    * comes from the corpus summary table a real pipeline maintains;
    * everything else is a narrow scan. int64 headroom: 10⁶·22·tf·T
    * stays < 2⁶³ up to ~4·10¹² corpus tokens per stats scope. */
  // ------------------------------------------------ LM quality scoring

  /** CCNet-style language-model quality scoring: an add-one-smoothed
    * bigram LM is trained on a REFERENCE slice of the corpus (`source =
    * trainSource` — the stand-in for CCNet's wikipedia LM) and every
    * document is scored by its mean per-bigram surprisal. High surprisal
    * = text the reference model finds unpredictable (noise, gibberish,
    * wrong language); low = fluent/boilerplate. Pipelines bucket on this
    * score to pick the quality tail to drop — exactly CCNet's
    * head/middle/tail split.
    *
    * Exactness across engines: true log-probabilities are transcendental,
    * so the surprisal is quantized to INTEGER bits per bigram:
    * {{{
    *   bits(w1,w2) = floor(log2((c1 + V) / (c12 + 1)))
    * }}}
    * the floor-log2 of the inverse smoothed probability, computed as
    * `length(bin(den DIV num)) - 1` — floor(log2(x)) equals
    * floor(log2(floor(x))) for x ≥ 1 (both lie in the same power-of-two
    * interval), and `bin()` renders positives unpadded identically in
    * Spark and DuckDB, so the DuckDB oracle reproduces every bit count
    * exactly. The doc score is `sum(bits) * 1e6 div n_bigrams` — integer
    * ppm, hash-stable.
    *
    * Scale shape: the model tables (unigram counts, bigram counts, V) are
    * reference-corpus-sized — independent of the 100 TB being scored —
    * and join the scored bigram stream on (w1) / (w1, w2) keys; AQE
    * broadcasts them when small, shuffle-joins otherwise. The scored side
    * is one generate + two joins + one map-side-combined aggregate; docs
    * with fewer than two tokens are kept with a NULL score via the final
    * left join against `documents` (absent and unscorable must not be
    * conflated — same lesson as the overlap matrix). */
  def lmScore(s: SparkSession, dir: String,
      trainSource: String = "src0"): DataFrame = {
    val toks = documents(s, dir).select(col("doc_id"), col("source"),
      filter(split(lower(col("text")), "\\s+"), t => t =!= "").as("t"))
    val bigrams = toks.select(col("doc_id"), col("source"),
      explode(zip_with(
        slice(col("t"), lit(1), greatest(size(col("t")) - 1, lit(0))),
        slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("source"),
        col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val trainToks = toks.filter(col("source") === trainSource)
      .select(explode(col("t")).as("w"))
    val uni = trainToks.groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val vocab = trainToks.select(
      countDistinct(col("w")).as("v"))
    val bgc = bigrams.filter(col("source") === trainSource)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val scored = bigrams
      .join(bgc, Seq("w1", "w2"), "left")
      .join(uni.withColumnRenamed("w", "w1"), Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        (length(bin(expr(
          "(coalesce(c1, 0L) + v) DIV (coalesce(c12, 0L) + 1)"))) - 1)
          .as("bits"))
    val agg = scored.groupBy(col("doc_id")).agg(
      count(lit(1)).cast("int").as("nb"),
      sum(col("bits")).as("bits_sum"))
    documents(s, dir).select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("nb"), lit(0)).as("n_bigrams"),
        when(col("nb").isNull, lit(null).cast("long"))
          .otherwise(expr("bits_sum * 1000000L DIV nb")).as("bits_ppm"))
      .orderBy(col("doc_id"))
  }

  /** Mirror of [[lmScore]]: same tokenize/bigram/floor-log2 pipeline in
    * DuckDB SQL (`bin()` and `//` agree with Spark's `bin`/`DIV` on
    * positive integers). */
  val lmScoreOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |    [x FOR x IN string_split_regex(lower(text), '\s+') IF x <> ''] AS t
      |  FROM documents
      |), bg AS (
      |  SELECT doc_id, source, t[i] AS w1, t[i + 1] AS w2
      |  FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i)
      |  WHERE len(t) >= 2
      |), train_toks AS (
      |  SELECT unnest(t) AS w FROM toks WHERE source = 'src0'
      |), uni AS (
      |  SELECT w, CAST(COUNT(*) AS BIGINT) AS c1 FROM train_toks GROUP BY w
      |), vocab AS (
      |  SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM train_toks
      |), bgc AS (
      |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
      |  FROM bg WHERE source = 'src0' GROUP BY w1, w2
      |), scored AS (
      |  SELECT bg.doc_id,
      |    length(bin((COALESCE(u.c1, 0) + v.v) // (COALESCE(c.c12, 0) + 1))) - 1 AS bits
      |  FROM bg
      |  LEFT JOIN bgc c ON bg.w1 = c.w1 AND bg.w2 = c.w2
      |  LEFT JOIN uni u ON bg.w1 = u.w
      |  CROSS JOIN vocab v
      |), agg AS (
      |  SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS nb,
      |    CAST(SUM(bits) AS BIGINT) AS bits_sum
      |  FROM scored GROUP BY doc_id
      |)
      |SELECT d.doc_id, COALESCE(a.nb, 0) AS n_bigrams,
      |  CASE WHEN a.nb IS NULL THEN NULL
      |    ELSE CAST(a.bits_sum * 1000000 // a.nb AS BIGINT) END AS bits_ppm
      |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** TRIGRAM stupid-backoff LM scoring — the order-3 sibling of
    * [[lmScore]], using the backoff scheme published for web-scale LMs
    * (score the trigram if the reference corpus has seen it, else back
    * off to the bigram, else to the add-one unigram, paying a fixed
    * penalty per backoff level; the scheme's virtue is that it needs NO
    * discounting pass — counts are used raw, which is what makes it
    * feasible at corpus scale).
    *
    * Exactness across engines: α is fixed at 1/4 so each backoff level
    * costs exactly 2 integer bits, and each level's surprisal is the
    * floor-log2 of its inverse raw probability via the same
    * `length(bin(den DIV num)) - 1` identity as [[lmScore]]:
    * {{{
    *   c123 > 0:  bits = fl2(c12 / c123)            (trigram)
    *   c23  > 0:  bits = 2 + fl2(c2 / c23)          (backoff to bigram)
    *   else:      bits = 4 + fl2((T + V)/(c3 + 1))  (add-one unigram)
    * }}}
    * every `den ≥ num ≥ 1` by count containment (a trigram occurrence
    * contains its bigram prefix; a bigram occurrence contains its head
    * unigram), so the DIV is always ≥ 1 and `bin` is defined. Doc score
    * = `sum(bits)·10⁶ DIV n_trigrams` — integer ppm, hash-stable.
    *
    * Scale shape: model tables (trigram/bigram/unigram counts over the
    * REFERENCE slice) are reference-corpus-sized and hash-join the
    * scored trigram stream (AQE broadcasts when small); the scored side
    * is one generate + four model joins + one map-side-combined
    * aggregate; docs under 3 tokens keep a NULL score via the final
    * `documents` left join. */
  def lm3Score(s: SparkSession, dir: String,
      trainSource: String = "src0"): DataFrame = {
    val toks = documents(s, dir).select(col("doc_id"), col("source"),
      filter(split(lower(col("text")), "\\s+"), t => t =!= "").as("t"))
    val n = size(col("t"))
    // the when() guard repeats the n >= 3 filter INSIDE the expression:
    // filter merging + eager subexpression evaluation can run the
    // transform on shorter docs first, where sequence(1, n-2) descends
    // through 0 and element_at(t, 0) throws (same shape as the
    // spanDedupOf guard — see the comment there)
    val tri = toks.filter(n >= 3).select(col("doc_id"), col("source"),
      explode(when(n >= 3, transform(sequence(lit(1), n - 2),
        i => struct(element_at(col("t"), i).as("w1"),
          element_at(col("t"), i + 1).as("w2"),
          element_at(col("t"), i + 2).as("w3"))))).as("tg"))
      .select(col("doc_id"), col("source"), col("tg.w1").as("w1"),
        col("tg.w2").as("w2"), col("tg.w3").as("w3"))
    val bi = toks.select(col("doc_id"), col("source"),
      explode(zip_with(
        slice(col("t"), lit(1), greatest(n - 1, lit(0))),
        slice(col("t"), lit(2), greatest(n - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("source"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val trainToks = toks.filter(col("source") === trainSource)
      .select(explode(col("t")).as("w"))
    val uni = trainToks.groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val totals = trainToks.agg(count(lit(1)).as("tt"),
      countDistinct(col("w")).as("v"))
    val bic = bi.filter(col("source") === trainSource)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val tric = tri.filter(col("source") === trainSource)
      .groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("c123"))
    // model tables are REFERENCE-corpus-sized (independent of the corpus
    // being scored), so broadcast them explicitly: leaving the choice to
    // AQE still pays the probe side's shuffle WRITE before the SMJ→BHJ
    // conversion lands — measured at 5.05M docs / 262.6M trigrams:
    // 18.5 GB of shuffle that the explicit hints eliminate
    val scored = tri
      .join(broadcast(tric), Seq("w1", "w2", "w3"), "left")
      .join(broadcast(bic.withColumnRenamed("cb", "c12")),
        Seq("w1", "w2"), "left")
      .join(broadcast(bic.toDF("w2", "w3", "c23")), Seq("w2", "w3"), "left")
      .join(broadcast(uni.toDF("w2", "c2")), Seq("w2"), "left")
      .join(broadcast(uni.toDF("w3", "c3")), Seq("w3"), "left")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        when(col("c123").isNotNull,
          length(bin(expr("c12 DIV c123"))) - 1)
          .when(col("c23").isNotNull,
            length(bin(expr("c2 DIV c23"))) + 1)
          .otherwise(length(bin(
            expr("(tt + v) DIV (coalesce(c3, 0L) + 1)"))) + 3)
          .as("bits"))
    val agg = scored.groupBy(col("doc_id")).agg(
      count(lit(1)).cast("int").as("nt"),
      sum(col("bits")).as("bits_sum"))
    documents(s, dir).select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("nt"), lit(0)).as("n_trigrams"),
        when(col("nt").isNull, lit(null).cast("long"))
          .otherwise(expr("bits_sum * 1000000L DIV nt")).as("bits_ppm"))
      .orderBy(col("doc_id"))
  }

  /** Mirror of [[lm3Score]] in DuckDB SQL. */
  val lm3ScoreOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |    [x FOR x IN string_split_regex(lower(text), '\s+') IF x <> ''] AS t
      |  FROM documents
      |), tg AS (
      |  SELECT doc_id, source, t[i] AS w1, t[i + 1] AS w2, t[i + 2] AS w3
      |  FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i)
      |  WHERE len(t) >= 3
      |), bg AS (
      |  SELECT source, t[i] AS w1, t[i + 1] AS w2
      |  FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i)
      |  WHERE len(t) >= 2
      |), train_toks AS (
      |  SELECT unnest(t) AS w FROM toks WHERE source = 'src0'
      |), uni AS (
      |  SELECT w, CAST(COUNT(*) AS BIGINT) AS cu FROM train_toks GROUP BY w
      |), totals AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS tt,
      |    CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM train_toks
      |), bic AS (
      |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cb
      |  FROM bg WHERE source = 'src0' GROUP BY w1, w2
      |), tric AS (
      |  SELECT w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS c123
      |  FROM tg WHERE source = 'src0' GROUP BY w1, w2, w3
      |), scored AS (
      |  SELECT tg.doc_id,
      |    CASE WHEN t3.c123 IS NOT NULL
      |      THEN length(bin(b12.cb // t3.c123)) - 1
      |    WHEN b23.cb IS NOT NULL
      |      THEN length(bin(u2.cu // b23.cb)) + 1
      |    ELSE length(bin((tot.tt + tot.v) // (COALESCE(u3.cu, 0) + 1))) + 3
      |    END AS bits
      |  FROM tg
      |  LEFT JOIN tric t3 ON tg.w1 = t3.w1 AND tg.w2 = t3.w2
      |    AND tg.w3 = t3.w3
      |  LEFT JOIN bic b12 ON tg.w1 = b12.w1 AND tg.w2 = b12.w2
      |  LEFT JOIN bic b23 ON tg.w2 = b23.w1 AND tg.w3 = b23.w2
      |  LEFT JOIN uni u2 ON tg.w2 = u2.w
      |  LEFT JOIN uni u3 ON tg.w3 = u3.w
      |  CROSS JOIN totals tot
      |), agg AS (
      |  SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS nt,
      |    CAST(SUM(bits) AS BIGINT) AS bits_sum
      |  FROM scored GROUP BY doc_id
      |)
      |SELECT d.doc_id, COALESCE(a.nt, 0) AS n_trigrams,
      |  CASE WHEN a.nt IS NULL THEN NULL
      |    ELSE CAST(a.bits_sum * 1000000 // a.nt AS BIGINT) END AS bits_ppm
      |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** CCNet's head/middle/tail split: per source, scored documents are
    * ranked by LM surprisal ([[lmScore]]) and cut into `nBuckets` equal
    * tiles — bucket 1 ("head") is the most reference-like text, the last
    * bucket ("tail") the least; pipelines keep head+middle and drop or
    * down-weight the tail. NTILE over the total order (bits_ppm, doc_id)
    * is deterministic and identical across engines. One window + one
    * aggregate, both keyed on source — a single exchange beyond the
    * scoring pipeline. Unscorable docs (< 2 tokens) are excluded from
    * ranking by construction. */
  /** Per-document LM-quality tile (see [[qualityBuckets]]) — shared by
    * the bucket report and the curated-corpus pipeline. */
  private[operators] def lmBucketed(s: SparkSession, dir: String,
      nBuckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = lmScore(s, dir).filter(col("bits_ppm").isNotNull)
      .join(documents(s, dir).select(col("doc_id"), col("source")),
        Seq("doc_id"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("bits_ppm"), col("doc_id"))
    scored.withColumn("bucket", ntile(nBuckets).over(w))
  }

  def qualityBuckets(s: SparkSession, dir: String,
      nBuckets: Int = 3): DataFrame = {
    lmBucketed(s, dir, nBuckets)
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("bits_ppm")).as("min_bits_ppm"),
        max(col("bits_ppm")).as("max_bits_ppm"))
      .orderBy(col("source"), col("bucket"))
  }

  /** [[lmScore]] oracle pipeline + NTILE(3) per source. */
  val qualityBucketsOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |    [x FOR x IN string_split_regex(lower(text), '\s+') IF x <> ''] AS t
      |  FROM documents
      |), bg AS (
      |  SELECT doc_id, source, t[i] AS w1, t[i + 1] AS w2
      |  FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i)
      |  WHERE len(t) >= 2
      |), train_toks AS (
      |  SELECT unnest(t) AS w FROM toks WHERE source = 'src0'
      |), uni AS (
      |  SELECT w, CAST(COUNT(*) AS BIGINT) AS c1 FROM train_toks GROUP BY w
      |), vocab AS (
      |  SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM train_toks
      |), bgc AS (
      |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
      |  FROM bg WHERE source = 'src0' GROUP BY w1, w2
      |), scored AS (
      |  SELECT bg.doc_id,
      |    length(bin((COALESCE(u.c1, 0) + v.v) // (COALESCE(c.c12, 0) + 1))) - 1 AS bits
      |  FROM bg
      |  LEFT JOIN bgc c ON bg.w1 = c.w1 AND bg.w2 = c.w2
      |  LEFT JOIN uni u ON bg.w1 = u.w
      |  CROSS JOIN vocab v
      |), agg AS (
      |  SELECT doc_id, COUNT(*) AS nb,
      |    CAST(SUM(bits) * 1000000 // COUNT(*) AS BIGINT) AS bits_ppm
      |  FROM scored GROUP BY doc_id
      |), tiled AS (
      |  SELECT d.source, a.bits_ppm,
      |    CAST(NTILE(3) OVER (PARTITION BY d.source
      |      ORDER BY a.bits_ppm, a.doc_id) AS INTEGER) AS bucket
      |  FROM agg a JOIN documents d USING (doc_id)
      |)
      |SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  MIN(bits_ppm) AS min_bits_ppm, MAX(bits_ppm) AS max_bits_ppm
      |FROM tiled GROUP BY source, bucket
      |ORDER BY source, bucket""".stripMargin

  def bm25(s: SparkSession, dir: String, k: Int = 20,
      terms: Seq[String] = bm25Terms): DataFrame = {
    val toks = filter(split(lower(col("text")), "\\s+"), t => t =!= "")
    val tfCols = terms.map(t =>
      size(filter(col("toks"), x => x === lit(t))).cast("long").as(s"tf_$t"))
    val perDoc = documents(s, dir)
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id") +: size(col("toks")).cast("long").as("dl") +: tfCols: _*)
    val statCols = Seq(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("n_toks")) ++
      terms.map(t => sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L))
        .as(s"df_$t"))
    val stats = perDoc.agg(statCols.head, statCols.tail: _*)
    val contribs = terms.map(t => s"""CASE WHEN tf_$t > 0 THEN
      ((1000000L * (n_docs - df_$t + 1)) DIV (df_$t + 1)) *
      ((1000000L * 22 * tf_$t * n_toks) DIV
        (10 * tf_$t * n_toks + 3 * n_toks + 9 * dl * n_docs))
      DIV 1000000L ELSE 0L END""").mkString(" + ")
    val scored = perDoc.crossJoin(broadcast(stats))
      .withColumn("bm25_ppm", expr(contribs))
      .filter(col("bm25_ppm") > 0)
      .orderBy(col("bm25_ppm").desc, col("doc_id"))
      .limit(k)
    import org.apache.spark.sql.expressions.Window
    scored.withColumn("rank", row_number().over(
        Window.orderBy(col("bm25_ppm").desc, col("doc_id"))))
      .select(col("rank") +: col("doc_id") +: col("dl") +:
        col("bm25_ppm") +: terms.map(t => col(s"tf_$t")): _*)
      .orderBy(col("rank"))
  }

  val bm25Oracle: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    [x FOR x IN string_split_regex(lower(text), '\s+') IF x <> ''] AS toks
      |  FROM documents
      |), p AS (
      |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
      |    CAST(len([x FOR x IN toks IF x = 'customer']) AS BIGINT) AS tf_customer,
      |    CAST(len([x FOR x IN toks IF x = 'spark']) AS BIGINT) AS tf_spark,
      |    CAST(len([x FOR x IN toks IF x = 'merge']) AS BIGINT) AS tf_merge
      |  FROM d
      |), st AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(dl) AS BIGINT) AS n_toks,
      |    CAST(SUM(CASE WHEN tf_customer > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_customer,
      |    CAST(SUM(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_spark,
      |    CAST(SUM(CASE WHEN tf_merge > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_merge
      |  FROM p
      |), sc AS (
      |  SELECT doc_id, dl, tf_customer, tf_spark, tf_merge,
      |    (CASE WHEN tf_customer > 0 THEN
      |      ((1000000 * (n_docs - df_customer + 1)) // (df_customer + 1)) *
      |      ((1000000 * 22 * tf_customer * n_toks) //
      |        (10 * tf_customer * n_toks + 3 * n_toks + 9 * dl * n_docs))
      |      // 1000000 ELSE 0 END) +
      |    (CASE WHEN tf_spark > 0 THEN
      |      ((1000000 * (n_docs - df_spark + 1)) // (df_spark + 1)) *
      |      ((1000000 * 22 * tf_spark * n_toks) //
      |        (10 * tf_spark * n_toks + 3 * n_toks + 9 * dl * n_docs))
      |      // 1000000 ELSE 0 END) +
      |    (CASE WHEN tf_merge > 0 THEN
      |      ((1000000 * (n_docs - df_merge + 1)) // (df_merge + 1)) *
      |      ((1000000 * 22 * tf_merge * n_toks) //
      |        (10 * tf_merge * n_toks + 3 * n_toks + 9 * dl * n_docs))
      |      // 1000000 ELSE 0 END) AS bm25_ppm
      |  FROM p, st
      |)
      |SELECT CAST(ROW_NUMBER() OVER (ORDER BY bm25_ppm DESC, doc_id)
      |    AS INTEGER) AS rank,
      |  doc_id, dl, CAST(bm25_ppm AS BIGINT) AS bm25_ppm,
      |  tf_customer, tf_spark, tf_merge
      |FROM sc WHERE bm25_ppm > 0
      |ORDER BY bm25_ppm DESC, doc_id LIMIT 20""".stripMargin

  // ------------------------------------- repeated-block (boilerplate) dedup

  /** Frequent-repeated-block removal — the line/paragraph-level dedup stage
    * of a pre-training pipeline (CCNet's shared-line filter; Lee et al.
    * 2022's repeated-substring dedup, approximated at disjoint token-block
    * granularity since this corpus has no newlines): any block of `width`
    * consecutive tokens occurring in ≥ `minDf` distinct documents is
    * boilerplate and removed from EVERY document.
    *
    * Scale shape: pass 1 reduces each doc to its distinct block md5s (the
    * shuffle carries 32-char hashes, never text) and keeps hashes with
    * df ≥ minDf — boilerplate sets are tiny by construction (a block must
    * repeat across docs to qualify), so the frequent set folds to ONE array
    * row that is broadcast; pass 2 is a pure projection filtering each
    * doc's blocks against the broadcast array inside the row. Document
    * text is never shuffled, and there is no doc×block join. Emits the
    * kept-text md5 rather than the text (hash-exact cross-engine proof). */
  def blockDedup(s: SparkSession, dir: String, width: Int = 16,
      minDf: Int = 2): DataFrame = {
    // filter-empty tokenization (the PortableHashExprs convention), NOT
    // trim+split: Java split drops trailing empty strings while DuckDB's
    // regexp_split_to_array keeps them, so a doc ending in non-space
    // whitespace (tab) would yield different block arrays under trim
    val toks = filter(split(col("text"), "\\s+"), t => t =!= "")
    val starts = sequence(lit(0), greatest(size(toks) - 1, lit(0)), lit(width))
    val blocks = transform(starts,
      i => array_join(slice(toks, i + lit(1), lit(width)), " "))
    val d = documents(s, dir).select(col("doc_id"), blocks.as("blocks"))
    // one row per (doc, distinct block): count(*) == count distinct docs
    val freq = d
      .select(explode(array_distinct(col("blocks"))).as("b"))
      .select(md5(col("b")).as("bh"))
      .groupBy(col("bh")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .agg(sort_array(collect_list(col("bh"))).as("freq"))
    d.crossJoin(broadcast(freq))
      .select(col("doc_id"),
        size(col("blocks")).as("n_blocks"),
        filter(col("blocks"),
          b => !array_contains(col("freq"), md5(b))).as("kept"))
      .select(col("doc_id"), col("n_blocks"),
        size(col("kept")).as("n_kept"),
        md5(array_join(col("kept"), " ")).as("kept_md5"))
      .orderBy(col("doc_id"))
  }

  val blockDedupOracle: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    [x FOR x IN regexp_split_to_array(text, '\s+') IF x <> ''] AS toks
      |  FROM documents
      |), b AS (
      |  SELECT doc_id, CAST(i AS INTEGER) AS i,
      |    array_to_string(toks[i+1 : i+16], ' ') AS block
      |  FROM d, UNNEST(range(0, greatest(len(toks), 1), 16)) AS u(i)
      |), freq AS (
      |  SELECT md5(block) AS bh
      |  FROM b GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2
      |), kept AS (
      |  SELECT b.doc_id,
      |    COUNT(*) AS n_blocks,
      |    COUNT(*) FILTER (WHERE f.bh IS NULL) AS n_kept,
      |    md5(COALESCE(string_agg(block, ' ' ORDER BY i)
      |      FILTER (WHERE f.bh IS NULL), '')) AS kept_md5
      |  FROM b LEFT JOIN freq f ON f.bh = md5(b.block)
      |  GROUP BY b.doc_id
      |)
      |SELECT doc_id, CAST(n_blocks AS INTEGER) AS n_blocks,
      |  CAST(n_kept AS INTEGER) AS n_kept, kept_md5
      |FROM kept ORDER BY doc_id""".stripMargin

  // ----------------------------------------- cross-source overlap audit

  /** Pairwise source-contamination matrix: n-gram Jaccard between every
    * pair of sources — the corpus-level audit run before mixing corpora
    * (is "web" already substantially inside "books"?). Each source is its
    * distinct token-trigram md5 set; for every source pair: intersection,
    * union, and jaccard in exact integer ppm.
    *
    * Scale shape: docs reduce to distinct (source, shingle-md5) rows — a
    * narrow map-side-combined aggregate; the self-join key is the shingle
    * hash, whose per-key match count is bounded by the number of SOURCES
    * (not docs), so the join output is ≤ |shingles|·S²/2 narrow rows; the
    * final matrix is S² rows. Nothing rejoins the corpus.
    *
    * The matrix is COMPLETE: every source pair appears, including pairs
    * with zero shingle overlap (n_common = 0) — in a contamination audit
    * "absent" must never be ambiguous with "no overlap". The pair frame is
    * the cross product of the (tiny, S-row) sizes table, left-joined with
    * the observed intersections. */
  /** Per-document n-gram NOVELTY: the fraction of a doc's distinct
    * shingles whose global FIRST occurrence (smallest doc_id) is this doc
    * — the corpus-growth diagnostic that shows whether newly ingested
    * data still contributes unseen content or is re-crawling the same
    * text (novelty decaying toward 0 = the crawl is saturating).
    *
    * Scale shape: docs reduce to distinct (doc_id, shingle-md5) rows in
    * one map-side-combined pass; first occurrences are a second
    * map-side-combined MIN; the join back is hash-keyed on the shingle
    * and its output is exactly the input rows (linear — every row meets
    * ONE firsts row). Ratios are exact integer ppm. */
  def novelty(s: SparkSession, dir: String, n: Int = 3): DataFrame = {
    import graft.functions.PortableHashExprs
    val sh = documents(s, dir)
      .select(col("doc_id"),
        explode(PortableHashExprs.portable_shingles(col("text"), n))
          .as("shg"))
      .filter(col("shg") =!= "")
      .select(col("doc_id"), md5(col("shg")).as("h"))
      .distinct()
    val firsts = sh.groupBy(col("h")).agg(min(col("doc_id")).as("first_doc"))
    val agg = sh.join(firsts, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
    documents(s, dir).select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        when(coalesce(col("n_shingles"), lit(0L)) === 0,
          lit(null).cast("long"))
          .otherwise(expr("n_novel * 1000000L DIV n_shingles"))
          .as("novelty_ppm"))
      .orderBy(col("doc_id"))
  }

  /** Same shingle construction as [[sourceOverlapOracle]], first
    * occurrences by MIN(doc_id), identical rollup. */
  val noveltyOracle: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    [x FOR x IN string_split_regex(lower(text), '\s+') IF x <> ''] AS t
      |  FROM documents
      |), shl AS (
      |  SELECT doc_id, CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
      |    ELSE [array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t)-1)]
      |    END AS shs
      |  FROM toks
      |), sh AS (
      |  SELECT DISTINCT doc_id, md5(s2) AS h
      |  FROM shl, UNNEST(shs) AS u(s2)
      |  WHERE s2 <> ''
      |), firsts AS (
      |  SELECT h, MIN(doc_id) AS first_doc FROM sh GROUP BY h
      |), agg AS (
      |  SELECT sh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
      |    CAST(SUM(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_novel
      |  FROM sh JOIN firsts f USING (h) GROUP BY sh.doc_id
      |)
      |SELECT d.doc_id, COALESCE(a.n_shingles, 0) AS n_shingles,
      |  COALESCE(a.n_novel, 0) AS n_novel,
      |  CASE WHEN COALESCE(a.n_shingles, 0) = 0 THEN NULL
      |    ELSE CAST(a.n_novel * 1000000 // a.n_shingles AS BIGINT) END
      |    AS novelty_ppm
      |FROM documents d LEFT JOIN agg a USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  /** Per-source mean unigram self-surprisal — the engine-exact stand-in
    * for Shannon entropy as a corpus-diversity measure: token w with
    * corpus count c out of T total occurrences carries
    * `floor(log2(T DIV c))` integer bits (the same `length(bin(..))-1`
    * kernel as [[lmScore]], so the score is bitwise reproducible where a
    * float `log` would not be); a source's score is the mean over its
    * token OCCURRENCES in ppm. Repetitive/templated sources score low,
    * diverse prose scores high — the cheap corpus-mix diagnostic next to
    * the bigram LM. One global count aggregate (map-side combined,
    * broadcast back onto the token stream) + one per-source rollup. */
  def unigramSurprisal(s: SparkSession, dir: String): DataFrame = {
    val toks = documents(s, dir).select(col("source"),
      explode(filter(split(lower(col("text")), "\\s+"), t => t =!= ""))
        .as("w"))
    val counts = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val tot = counts.agg(sum(col("c")).as("t"))
    toks.join(counts, Seq("w"))
      .crossJoin(broadcast(tot))
      .select(col("source"),
        (length(bin(expr("t DIV c"))) - 1).as("bits"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("bits")).as("bits_sum"))
      .select(col("source"), col("n_tokens"),
        expr("bits_sum * 1000000L DIV n_tokens").as("mean_bits_ppm"))
      .orderBy(col("source"))
  }

  val unigramSurprisalOracle: String =
    """WITH toks AS (
      |  SELECT source, unnest([x FOR x IN
      |    string_split_regex(lower(text), '\s+') IF x <> '']) AS w
      |  FROM documents
      |), counts AS (
      |  SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY w
      |), tot AS (
      |  SELECT CAST(SUM(c) AS BIGINT) AS t FROM counts
      |), scored AS (
      |  SELECT toks.source, length(bin(t.t // c.c)) - 1 AS bits
      |  FROM toks JOIN counts c USING (w) CROSS JOIN tot t
      |)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |  CAST(SUM(bits) * 1000000 // COUNT(*) AS BIGINT) AS mean_bits_ppm
      |FROM scored GROUP BY source ORDER BY source""".stripMargin

  /** Vocabulary growth curve (Heaps' law): cumulative distinct token
    * types vs cumulative tokens processed, in doc_id ingestion order —
    * the diagnostic that tells a pipeline whether its corpus keeps
    * contributing vocabulary or has saturated. Computed at BUCKET
    * granularity (`bucketSize` docs per curve point): per-token first
    * occurrence is the same map-side-combined MIN as [[novelty]], new
    * types fold to one row per bucket, and the only ordered prefix sum
    * runs over the BUCKET table (corpus_size / bucketSize rows — the
    * curve's own resolution), never over docs. All counts integer. */
  def vocabGrowth(s: SparkSession, dir: String,
      bucketSize: Long = 50L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = documents(s, dir).select(col("doc_id"),
      filter(split(lower(col("text")), "\\s+"), t => t =!= "").as("t"))
    val perDoc = toks.select(col("doc_id"), size(col("t")).cast("long")
      .as("n_tokens"))
    val firsts = toks.select(col("doc_id"),
        explode(array_distinct(col("t"))).as("w"))
      .groupBy(col("w")).agg(min(col("doc_id")).as("first_doc"))
    val bTokens = perDoc
      .groupBy(expr(s"doc_id DIV $bucketSize").as("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("b_tokens"))
    val bTypes = firsts
      .groupBy(expr(s"first_doc DIV $bucketSize").as("bucket"))
      .agg(count(lit(1)).as("b_new_types"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bTokens.join(bTypes, Seq("bucket"), "left")
      .withColumn("b_new_types", coalesce(col("b_new_types"), lit(0L)))
      .withColumn("cum_tokens", sum(col("b_tokens")).over(w))
      .withColumn("cum_types", sum(col("b_new_types")).over(w))
      .select(col("bucket"), col("n_docs"), col("b_tokens"),
        col("b_new_types"), col("cum_tokens"), col("cum_types"))
      .orderBy(col("bucket"))
  }

  val vocabGrowthOracle: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    [x FOR x IN string_split_regex(lower(text), '\s+') IF x <> ''] AS t
      |  FROM documents
      |), per_doc AS (
      |  SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks
      |), firsts AS (
      |  SELECT w, MIN(doc_id) AS first_doc
      |  FROM (SELECT doc_id, unnest(list_distinct(t)) AS w FROM toks)
      |  GROUP BY w
      |), btok AS (
      |  SELECT doc_id // 50 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(n_tokens) AS BIGINT) AS b_tokens
      |  FROM per_doc GROUP BY 1
      |), btyp AS (
      |  SELECT first_doc // 50 AS bucket,
      |    CAST(COUNT(*) AS BIGINT) AS b_new_types
      |  FROM firsts GROUP BY 1
      |)
      |SELECT bt.bucket, bt.n_docs, bt.b_tokens,
      |  COALESCE(ty.b_new_types, 0) AS b_new_types,
      |  CAST(SUM(bt.b_tokens) OVER (ORDER BY bt.bucket
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum_tokens,
      |  CAST(SUM(COALESCE(ty.b_new_types, 0)) OVER (ORDER BY bt.bucket
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum_types
      |FROM btok bt LEFT JOIN btyp ty USING (bucket)
      |ORDER BY bt.bucket""".stripMargin

  def sourceOverlap(s: SparkSession, dir: String, n: Int = 3): DataFrame = {
    import graft.functions.PortableHashExprs
    val sets = documents(s, dir)
      .select(col("source"),
        explode(PortableHashExprs.portable_shingles(col("text"), n)).as("sh"))
      .filter(col("sh") =!= "")
      .select(col("source"), md5(col("sh")).as("h"))
      .distinct()
    val sizes = sets.groupBy(col("source")).agg(count(lit(1)).as("n_sh"))
    val inter = sets.as("a").join(sets.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
    val pairs = sizes.select(col("source").as("src_a"), col("n_sh").as("n_a"))
      .crossJoin(sizes.select(col("source").as("src_b"), col("n_sh").as("n_b")))
      .filter(col("src_a") < col("src_b"))
    pairs.join(inter, Seq("src_a", "src_b"), "left")
      .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
      .withColumn("jaccard_ppm",
        expr("n_common * 1000000L DIV (n_a + n_b - n_common)"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        col("n_common"), col("jaccard_ppm"))
      .orderBy(col("src_a"), col("src_b"))
  }

  val sourceOverlapOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |    [x FOR x IN string_split_regex(lower(text), '\s+') IF x <> ''] AS t
      |  FROM documents
      |), shl AS (
      |  SELECT source, CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
      |    ELSE [array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t)-1)]
      |    END AS shs
      |  FROM toks
      |), sh AS (
      |  SELECT DISTINCT source, md5(s2) AS h
      |  FROM shl, UNNEST(shs) AS u(s2)
      |  WHERE s2 <> ''
      |), sizes AS (
      |  SELECT source, COUNT(*) AS n_sh FROM sh GROUP BY source
      |), inter AS (
      |  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_common
      |  FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
      |  GROUP BY 1, 2
      |), pairs AS (
      |  SELECT sa.source AS src_a, sb.source AS src_b,
      |    sa.n_sh AS n_a, sb.n_sh AS n_b
      |  FROM sizes sa JOIN sizes sb ON sa.source < sb.source
      |)
      |SELECT p.src_a, p.src_b,
      |  CAST(p.n_a AS BIGINT) AS n_a, CAST(p.n_b AS BIGINT) AS n_b,
      |  CAST(COALESCE(i.n_common, 0) AS BIGINT) AS n_common,
      |  CAST(COALESCE(i.n_common, 0) * 1000000
      |    // (p.n_a + p.n_b - COALESCE(i.n_common, 0)) AS BIGINT) AS jaccard_ppm
      |FROM pairs p
      |LEFT JOIN inter i ON i.src_a = p.src_a AND i.src_b = p.src_b
      |ORDER BY p.src_a, p.src_b""".stripMargin

  /** MinHash-signature estimate of the pairwise source-overlap matrix —
    * the SCALE path next to [[sourceOverlap]]'s exact form: a source's
    * MinHash over its shingle UNION is the element-wise min of its docs'
    * signatures (min over docs of min over shingles), so the corpus
    * reduces to |sources|×64 narrow rows in ONE map-side-combined
    * aggregate over the already-codegen'd per-doc kernel — no shingle
    * self-join, no distinct-set materialization, wire cost independent of
    * corpus size. Estimate = matching components / 64, reported in exact
    * integer ppm; OperatorsSpec bounds it against the exact matrix. */
  def sourceMinhash(s: SparkSession, dir: String): DataFrame = {
    val sigs = documents(s, dir)
      .select(col("source"), Dedup.minhashSignature(col("text")).as("sig"))
      .select(col("source"), posexplode(col("sig")).as(Seq("i", "v")))
      .groupBy(col("source"), col("i")).agg(min(col("v")).as("v"))
    sigs.as("a").join(sigs.as("b"),
        col("a.i") === col("b.i") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(when(col("a.v") === col("b.v"), lit(1))).as("n_match"))
      .withColumn("est_jaccard_ppm", expr("n_match * 1000000L DIV 64"))
      .orderBy(col("src_a"), col("src_b"))
  }

  val sourceMinhashOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |    [x FOR x IN string_split_regex(lower(text), '\s+') IF x <> ''] AS t
      |  FROM documents
      |), sh AS (
      |  SELECT doc_id, source, CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
      |    ELSE [array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t)-1)] END AS shs
      |  FROM toks
      |), hs AS (
      |  SELECT doc_id, source,
      |    [(CAST('0x'||substr(md5(s2),1,14) AS BIGINT) % 2147483647) FOR s2 IN shs] AS hl
      |  FROM sh
      |), sigs AS (
      |  SELECT source, [list_min([((((1103515245*(i+7)+12345) % 1073741823) | 1) * h
      |      + ((2027382749*(i+13)+577) % 2147483647)) % 2147483647 FOR h IN hl])
      |    FOR i IN range(0,64)] AS sig
      |  FROM hs
      |), src AS (
      |  SELECT source, CAST(i AS INTEGER) AS i, MIN(sig[i+1]) AS v
      |  FROM sigs, UNNEST(range(0,64)) AS u(i)
      |  GROUP BY 1, 2
      |)
      |SELECT a.source AS src_a, b.source AS src_b,
      |  CAST(COUNT(*) FILTER (WHERE a.v = b.v) AS BIGINT) AS n_match,
      |  CAST(COUNT(*) FILTER (WHERE a.v = b.v) * 1000000 // 64 AS BIGINT)
      |    AS est_jaccard_ppm
      |FROM src a JOIN src b ON a.i = b.i AND a.source < b.source
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val chunkOracle: String =
    """WITH d AS (
      |  SELECT doc_id, regexp_split_to_array(TRIM(text), '\s+') AS toks
      |  FROM documents
      |), c AS (
      |  SELECT doc_id, CAST(i // 16 AS INTEGER) AS chunk_id,
      |    array_to_string(toks[i+1 : i+32], ' ') AS chunk
      |  FROM d, UNNEST(range(0, greatest(len(toks), 1), 16)) AS u(i)
      |)
      |SELECT doc_id, chunk_id,
      |  CAST(len(string_split(chunk, ' ')) AS INTEGER) AS n_tokens,
      |  md5(chunk) AS chunk_md5
      |FROM c ORDER BY doc_id, chunk_id""".stripMargin

  // ----------------------------------------- duplicated-substring spans

  /** Exact duplicated-substring span removal (ExactSubstr in Lee et al.
    * 2021, "Deduplicating Training Data Makes Language Models Better",
    * arXiv:2107.06499): any `width`-token window whose text occurs more
    * than once in the corpus — across documents OR repeated inside one —
    * is a duplicated substring; every occurrence EXCEPT the globally
    * first (smallest (doc_id, pos)) is marked for removal, and marked
    * windows are merged into maximal per-doc token spans. The paper
    * builds a corpus-wide suffix array; the distributed re-expression is
    * windowed hashing — the same duplicate set for span boundaries at
    * window granularity, with no global index structure:
    *
    *  1. per doc, hash every `width`-token window (transform over a
    *     `sequence` of starts — computed INSIDE the row, so the explode
    *     that follows emits only (pos, md5) pairs, never the token array);
    *  2. one shuffle on the window hash ranks occurrences by
    *     (doc_id, pos) and counts them — `cnt >= 2 AND rn > 1` marks
    *     non-canonical occurrences (the keep-one-copy policy);
    *  3. one shuffle on doc_id merges overlapping/adjacent windows into
    *     spans (gaps-and-islands: running max of span end over the
    *     pos-ordered window — no self-join).
    *
    * Output: one row per maximal removable span, 1-based inclusive token
    * positions. All-integer + md5 arithmetic → the DuckDB oracle
    * reproduces every row bit-exactly.
    *
    * Scale shape: wire cost is (n_windows ≈ n_tokens) rows of
    * (doc_id, pos, 32-char hash) through the rank shuffle — the same
    * order as the MinHash signature stage — and only duplicate hits
    * (rare at 100 TB outside boilerplate) reach the island stage. Text
    * never shuffles. The paper's 50-token production `width` drops the
    * hit rate further; the synthetic corpus's tiny vocabulary makes 8 the
    * interesting setting at test SF. */
  def spanDedup(s: SparkSession, dir: String, width: Int = 8): DataFrame =
    spanDedupOf(documents(s, dir), width)

  /** The span core over an explicit (doc_id, text) frame. */
  def spanDedupOf(docs: DataFrame, width: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Window hashing is ONE compiled kernel pass per row
    // (TextHashExprs.SpanWindowHashes): the previous
    // transform(starts, i => unhex(md5(array_join(slice(…))))) HOF chain
    // is CodegenFallback, so every window paid an interpreted lambda walk
    // plus a slice copy and a hex/unhex round-trip (r15 kernel profile:
    // that was most of the gate's 4.4 s). The kernel feeds md5 the same
    // bytes (tokens joined by single spaces), so every digest — and the
    // DuckDB oracle identity — is unchanged; short docs yield an empty
    // array (≡ the old size(toks) >= width filter).
    //
    // The hash stays a 16-byte BINARY shuffle key — the 5M-doc
    // ScaleStress measured the 32-char hex form paying 51 B/window-row
    // of shuffle (10.1 GB at 207M windows), most of it the key itself.
    val w = docs
      .select(col("doc_id"),
        graft.functions.TextHashExprs
          .span_window_hashes(col("text"), width).as("hs"))
      .select(col("doc_id"), posexplode(col("hs")).as(Seq("i", "h")))
      .select(col("doc_id"), (col("i") + 1).cast("long").as("pos"), col("h"))
    val byHash = Window.partitionBy(col("h"))
    // rn > 1 alone marks non-canonical duplicates: a second-ranked row
    // exists only when the hash occurs at least twice, so no separate
    // occurrence-count window pass is needed
    val ranked = w.withColumn("rn",
      row_number().over(byHash.orderBy(col("doc_id"), col("pos"))))
    val hits = ranked.filter(col("rn") > 1)
      .select(col("doc_id"), col("pos"),
        (col("pos") + (width - 1)).as("fin"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val prevMax = max(col("fin"))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val spans = hits
      .withColumn("brk",
        when(col("pos") > coalesce(prevMax, lit(-1L)) + 1, 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(byDoc))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("span_start"), max(col("fin")).as("span_end"),
        count(lit(1)).as("n_windows"))
    spans
      .select(col("doc_id"), col("island").as("span_id"),
        col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"),
        col("n_windows"))
      .orderBy(col("doc_id"), col("span_id"))
  }

  // ------------------------------------- content-defined chunking dedup

  /** Content-defined chunking (CDC) dedup: chunk boundaries are placed
    * where the rolling hash of the trailing `k`-token gram lands in a
    * fixed residue class (`md5int(gram) % d == 0`), so boundary positions
    * are a pure function of LOCAL content — inserting or deleting a
    * prefix shifts every fixed-width block ([[blockDedup]]'s weakness)
    * but leaves every downstream CDC chunk identity unchanged once the
    * first post-edit boundary re-synchronizes. The standard trick from
    * storage dedup (Muthitacharoen et al., "A Low-Bandwidth Network File
    * System", SOSP'01), applied at token granularity for corpus
    * boilerplate: `d = 8` gives ~8-token expected chunks.
    *
    * Everything up to the duplicate check happens INSIDE the row —
    * boundary positions, chunk starts/ends, chunk text and hash are array
    * expressions over the token array, so the only shuffled rows are
    * (doc_id, chunk_id, 32-char hash). A chunk is a cross-doc duplicate
    * when its hash occurs in ≥2 distinct docs — detected with
    * `min(doc_id) <> max(doc_id)` in ONE map-side-combined aggregate
    * (no count-distinct expansion), then a hash equi-join back marks
    * occurrences and a per-doc rollup reports the duplicated fraction. */
  def cdcDedup(s: SparkSession, dir: String): DataFrame = {
    val occ = cdcChunksOf(documents(s, dir))
    val dup = occ.groupBy(col("h"))
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .filter(col("mn") =!= col("mx"))
      .select(col("h"), lit(1L).as("m"))
    occ.join(dup, Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(coalesce(col("m"), lit(0L))).as("n_dup_chunks"))
      .withColumn("dup_ratio_ppm",
        expr("n_dup_chunks * 1000000L div n_chunks"))
      .orderBy(col("doc_id"))
  }

  /** The in-row CDC chunk table over an explicit (doc_id, text) frame:
    * (doc_id, chunk_id, chunk token count, chunk md5). One compiled
    * kernel pass per doc (TextHashExprs.CdcChunks) — the previous
    * boundary-filter + zip_with + per-chunk slice/join/md5 HOF chain ran
    * interpreted per gram AND per chunk; the kernel emits the identical
    * positional chunk ids, token counts and 32-char md5 hex (the DuckDB
    * oracle re-verifies). */
  def cdcChunksOf(docs: DataFrame, k: Int = 3, d: Int = 8): DataFrame =
    docs
      .select(col("doc_id"),
        explode(graft.functions.TextHashExprs.cdc_chunks(col("text"), k, d))
          .as("c"))
      .select(col("doc_id"), col("c.chunk_id").as("chunk_id"),
        col("c.n_tokens").as("n_tokens"), col("c.h").as("h"))

  val cdcDedupOracle: String =
    """WITH dd AS (
      |  SELECT doc_id,
      |    [x FOR x IN string_split_regex(text, '\s+') IF x <> ''] AS toks
      |  FROM documents
      |), b AS (
      |  SELECT doc_id, toks, len(toks) AS n,
      |    CASE WHEN len(toks) >= 3 THEN
      |      [i FOR i IN range(3, len(toks)+1)
      |       IF CAST('0x'||substr(md5(array_to_string(toks[i-2 : i], ' ')),1,14)
      |          AS BIGINT) % 8 = 0]
      |    ELSE [] END AS bpos
      |  FROM dd WHERE len(toks) >= 1
      |), c AS (
      |  SELECT doc_id, CAST(j AS BIGINT) AS chunk_id,
      |    (list_prepend(1, [p+1 FOR p IN bpos]))[j] AS s,
      |    (list_append(bpos, n))[j] AS e, toks
      |  FROM b, UNNEST(range(1, len(bpos)+2)) AS u(j)
      |), occ AS (
      |  SELECT doc_id, chunk_id,
      |    md5(array_to_string(toks[s : e], ' ')) AS h
      |  FROM c WHERE e >= s
      |), dup AS (
      |  SELECT h FROM occ GROUP BY h HAVING MIN(doc_id) <> MAX(doc_id)
      |)
      |SELECT o.doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
      |  CAST(COUNT(d2.h) AS BIGINT) AS n_dup_chunks,
      |  CAST(COUNT(d2.h) * 1000000 // COUNT(*) AS BIGINT) AS dup_ratio_ppm
      |FROM occ o LEFT JOIN dup d2 ON o.h = d2.h
      |GROUP BY o.doc_id ORDER BY o.doc_id""".stripMargin

  val spanDedupOracle: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    [x FOR x IN string_split_regex(text, '\s+') IF x <> ''] AS toks
      |  FROM documents
      |), w AS (
      |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
      |    md5(array_to_string(toks[i : i+7], ' ')) AS h
      |  FROM d, UNNEST(range(1, len(toks) - 6)) AS u(i)
      |  WHERE len(toks) >= 8
      |), ranked AS (
      |  SELECT doc_id, pos,
      |    ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn,
      |    COUNT(*) OVER (PARTITION BY h) AS cnt
      |  FROM w
      |), hits AS (
      |  SELECT doc_id, pos, pos + 7 AS fin FROM ranked
      |  WHERE cnt >= 2 AND rn > 1
      |), isl AS (
      |  SELECT doc_id, pos, fin,
      |    CASE WHEN pos > COALESCE(MAX(fin) OVER (PARTITION BY doc_id
      |      ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |      -1) + 1 THEN 1 ELSE 0 END AS brk
      |  FROM hits
      |), grp AS (
      |  SELECT doc_id, pos, fin,
      |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      |  FROM isl
      |)
      |SELECT doc_id, CAST(island AS BIGINT) AS span_id,
      |  MIN(pos) AS span_start, MAX(fin) AS span_end,
      |  MAX(fin) - MIN(pos) + 1 AS span_tokens,
      |  CAST(COUNT(*) AS BIGINT) AS n_windows
      |FROM grp GROUP BY doc_id, island
      |ORDER BY doc_id, span_id""".stripMargin

  // ------------------------------------- Gopher-style quality rule filter

  /** The required-word rule's published English list (Gopher, Rae et al.
    * 2021, arXiv:2112.11446 §A1.1): a document must contain at least two
    * of these to count as running English prose. */
  val gopherRequiredWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Corpus-adapted required-word list for the fixture gates: the
    * synthetic token soup contains only "the" from the published list, so
    * rule 7 would be constant-false there. */
  val gopherFixtureWords: Seq[String] = Seq("the", "a", "table", "value")

  /** Gopher's rule-based document filter (Rae et al. 2021, arXiv:2112.11446
    * §A1.1, Table A1; the same rule family underpins RefinedWeb and Dolma):
    * seven per-document structural rules —
    *
    *   1. word count within [minWords, maxWords];
    *   2. mean word length within [3, 10] characters;
    *   3. symbol-to-word ratio (`#` or `...`) ≤ 1/10;
    *   4. ≤ 10% of lines start with a bullet (`-`, `*`, `•`);
    *   5. ≤ 30% of lines end with an ellipsis;
    *   6. ≥ 80% of words contain an alphabetic character;
    *   7. at least two distinct words from a required word list.
    *
    * Every rule is a pure in-row array/regexp expression over the token and
    * line arrays — ratio comparisons are cross-multiplied integers (never an
    * IEEE division), so each boolean is engine-exact and the whole report is
    * ONE narrow scan-projection with no shuffle before the output sort. At
    * 100 TB this is the shape you want: the filter runs inside the scan's
    * WholeStageCodegen span and feeds the kept subset straight downstream.
    *
    * `requiredWords` defaults to the published English list; the gate passes
    * a corpus-adapted list because the synthetic fixture's token soup
    * contains only "the" from the published set (rule 7 would be constant).
    */
  def gopherRules(s: SparkSession, dir: String,
      minWords: Int = 30, maxWords: Int = 90,
      requiredWords: Seq[String] = gopherRequiredWords): DataFrame =
    gopherRulesOf(documents(s, dir), minWords, maxWords, requiredWords)

  /** [[gopherRules]] over an explicit (doc_id, source, text) frame — the
    * spec plants bullet/ellipsis/symbol-heavy docs the fixture lacks. */
  def gopherRulesOf(docs: DataFrame,
      minWords: Int = 30, maxWords: Int = 90,
      requiredWords: Seq[String] = gopherRequiredWords): DataFrame =
    gopherRulesFrame(docs, minWords, maxWords, requiredWords)
      .orderBy(col("doc_id"))

  /** The sort-free rule projection — stateless and entirely in-row, so it
    * applies unchanged to a STREAMING frame ([[
    * graft.streaming.StreamOps.gopherFilterStream]]); batch callers add
    * the output sort. */
  def gopherRulesFrame(docs: DataFrame,
      minWords: Int = 30, maxWords: Int = 90,
      requiredWords: Seq[String] = gopherRequiredWords): DataFrame = {
    // all eight signals from ONE compiled kernel pass
    // (TextHashExprs.GopherScreen): the HOF formulation ran five
    // interpreted filter/aggregate lambdas per doc (r15 profile); the
    // kernel computes the identical integers, oracle-verified
    val g = graft.functions.TextHashExprs.gopher_screen(col("text"),
      requiredWords)
    val m = docs.select(col("doc_id"), col("source"), g.as("gs"))
    m.select(
      col("doc_id"), col("source"),
      col("gs.n_words").as("n_words"),
      col("gs.sum_len").as("sum_len"),
      col("gs.n_symbols").as("n_symbols"),
      col("gs.n_lines").as("n_lines"),
      col("gs.n_bullet").as("n_bullet"),
      col("gs.n_ellipsis").as("n_ellipsis"),
      col("gs.n_alpha_words").as("n_alpha_words"),
      col("gs.n_required").as("n_required"))
      .select(
        col("doc_id"), col("source"), col("n_words"),
        (col("n_words") >= minWords && col("n_words") <= maxWords)
          .as("r_word_count"),
        (col("sum_len") >= col("n_words") * 3 &&
          col("sum_len") <= col("n_words") * 10).as("r_mean_word_len"),
        (col("n_symbols") * 10 <= col("n_words")).as("r_symbol_ratio"),
        (col("n_bullet") * 10 <= col("n_lines")).as("r_bullet_lines"),
        (col("n_ellipsis") * 10 <= col("n_lines") * 3).as("r_ellipsis_lines"),
        (col("n_alpha_words") * 10 >= col("n_words") * 8).as("r_alpha_words"),
        (col("n_required") >= 2).as("r_required_words"))
      .withColumn("keep",
        col("r_word_count") && col("r_mean_word_len") &&
          col("r_symbol_ratio") && col("r_bullet_lines") &&
          col("r_ellipsis_lines") && col("r_alpha_words") &&
          col("r_required_words"))
  }

  /** The seven structural rules folded into ONE boolean Column over a
    * text column — for compositions that keep everything in a single
    * scan projection ([[graft.operators.Pipeline.screenedCorpus]]).
    * Spec-pinned equal to [[gopherRulesFrame]]'s `keep`. */
  def gopherKeepOf(text: Column, minWords: Int = 30, maxWords: Int = 90,
      requiredWords: Seq[String] = gopherRequiredWords): Column = {
    val g = graft.functions.TextHashExprs.gopher_screen(text, requiredWords)
    val nWords = g.getField("n_words").cast("long")
    val nLines = g.getField("n_lines").cast("long")
    (nWords >= minWords && nWords <= maxWords) &&
      (g.getField("sum_len") >= nWords * 3 &&
        g.getField("sum_len") <= nWords * 10) &&
      (g.getField("n_symbols").cast("long") * 10 <= nWords) &&
      (g.getField("n_bullet").cast("long") * 10 <= nLines) &&
      (g.getField("n_ellipsis").cast("long") * 10 <= nLines * 3) &&
      (g.getField("n_alpha_words").cast("long") * 10 >= nWords * 8) &&
      (g.getField("n_required") >= 2)
  }

  /** Mirror of [[gopherRules]] with the gate's corpus-adapted required list
    * (see `SparkEntry`). */
  def gopherRulesOracle(minWords: Int, maxWords: Int,
      requiredWords: Seq[String]): String = {
    val req = requiredWords.map(w => s"'$w'").mkString(", ")
    s"""WITH m AS (
       |  SELECT doc_id, source, text,
       |    [x FOR x IN string_split_regex(TRIM(text), '\\s+') IF x <> ''] AS t,
       |    string_split(text, chr(10)) AS ls
       |  FROM documents
       |), c AS (
       |  SELECT doc_id, source,
       |    CAST(len(t) AS INTEGER) AS n_words,
       |    CAST(COALESCE(list_sum([length(x) FOR x IN t]), 0) AS BIGINT)
       |      AS sum_len,
       |    len(regexp_extract_all(text, '#|\\.\\.\\.')) AS n_symbols,
       |    len(ls) AS n_lines,
       |    len([l FOR l IN ls IF starts_with(l, '-') OR starts_with(l, '*')
       |      OR starts_with(l, '•')]) AS n_bullet,
       |    len([l FOR l IN ls IF ends_with(l, '...')]) AS n_ellipsis,
       |    len([w FOR w IN t IF regexp_matches(w, '[A-Za-z]')])
       |      AS n_alpha_words,
       |    len(list_intersect(list_distinct(t), [$req])) AS n_required
       |  FROM m
       |)
       |SELECT doc_id, source, n_words,
       |  n_words >= $minWords AND n_words <= $maxWords AS r_word_count,
       |  sum_len >= n_words * 3 AND sum_len <= n_words * 10
       |    AS r_mean_word_len,
       |  n_symbols * 10 <= n_words AS r_symbol_ratio,
       |  n_bullet * 10 <= n_lines AS r_bullet_lines,
       |  n_ellipsis * 10 <= n_lines * 3 AS r_ellipsis_lines,
       |  n_alpha_words * 10 >= n_words * 8 AS r_alpha_words,
       |  n_required >= 2 AS r_required_words,
       |  (n_words >= $minWords AND n_words <= $maxWords)
       |    AND (sum_len >= n_words * 3 AND sum_len <= n_words * 10)
       |    AND (n_symbols * 10 <= n_words)
       |    AND (n_bullet * 10 <= n_lines)
       |    AND (n_ellipsis * 10 <= n_lines * 3)
       |    AND (n_alpha_words * 10 >= n_words * 8)
       |    AND (n_required >= 2) AS keep
       |FROM c
       |ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------------------
  // Gopher REPETITION rules (Rae et al. 2021, Table A1 §A1.2) — the
  // within-document repetition screens next to [[gopherRules]]'s
  // structural ones. [[repetition]] above reports the raw top-token/
  // bigram counts as ranking signals; THIS family renders the complete
  // published verdicts (dup line/paragraph + char fractions, top 2/3/4-
  // gram char fractions, dup 5..10-gram char fractions, and the keep
  // conjunction). All twelve signals are computed IN-ROW: per-doc
  // n-gram frequencies come from ONE pass over the SORTED gram array
  // (equal grams are adjacent after array_sort, so a run-length
  // accumulator yields exact counts with no explode and no shuffle) —
  // O(m log m) CPU per doc, which is the shape a 100 TB scan wants. The
  // oracle deliberately computes the same numbers the OPPOSITE way
  // (UNNEST + GROUP BY per doc), so the gate is a differential test of
  // two independent computation strategies.
  //
  // Definitions (integer ppm; den=0 → fraction 0):
  //  - dup_line/para_frac      = (n - n_distinct) / n
  //  - dup_line/para_char_frac = chars in occurrences 2..k of any
  //    repeated line (paragraph) / summed line (paragraph) chars
  //  - top{2,3,4}_char_frac    = count*len of the most frequent word
  //    n-gram / doc chars; ties on count break to the LONGEST gram (a
  //    deterministic refinement of the published "most frequent")
  //  - dup{5..10}_char_frac    = Σ over grams with count>1 of
  //    (count-1)*len / doc chars — occurrence accounting, not the
  //    span-cover variant (overlap-aware span marking is not expressible
  //    as a per-row projection; both sides here implement THIS
  //    definition exactly, and thresholds are the published ones)
  //
  // Thresholds (keep iff NOT exceeded): lines/paras 30%, their char
  // variants 20%; top 2/3/4-gram 20/18/16%; dup 5..10-gram
  // 15/14/13/12/11/10%.

  /** One sorted-run pass: given an ascending-sorted array, returns
    * struct(top_chars, dup_chars) where top_chars = count*len of the
    * (count, len)-lexicographically maximal element and dup_chars = summed
    * lengths of all occurrences after each element's first. */
  private def runStats(sorted: Column): Column = {
    val zero = struct(lit("").as("p"), lit(0L).as("r"), lit(0L).as("br"),
      lit(0L).as("bl"), lit(0L).as("dc"))
    aggregate(sorted, zero,
      (acc, x) => {
        val same = x === acc.getField("p")
        val nr = when(same, acc.getField("r") + 1L).otherwise(lit(1L))
        val xl = length(x).cast("long")
        val better = nr > acc.getField("br") ||
          (nr === acc.getField("br") && xl > acc.getField("bl"))
        struct(x.as("p"), nr.as("r"),
          when(better, nr).otherwise(acc.getField("br")).as("br"),
          when(better, xl).otherwise(acc.getField("bl")).as("bl"),
          (acc.getField("dc") + when(same, xl).otherwise(lit(0L))).as("dc"))
      },
      acc => struct(
        (acc.getField("br") * acc.getField("bl")).as("top_chars"),
        acc.getField("dc").as("dup_chars")))
  }

  /** Word n-grams joined with single spaces; empty for docs shorter than
    * n tokens (guarded — `sequence` with a negative span would throw). */
  private def wordNgrams(t: Column, n: Int): Column =
    when(size(t) >= n,
      transform(sequence(lit(1), size(t) - (n - 1)),
        i => array_join(slice(t, i, lit(n)), " ")))
      .otherwise(array().cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType)))

  def repetitionRules(s: SparkSession, dir: String): DataFrame =
    repetitionRulesOf(documents(s, dir))

  def repetitionRulesOf(docs: DataFrame, useKernel: Boolean = true): DataFrame =
    repetitionRulesFrame(docs, useKernel).orderBy(col("doc_id"))

  /** The sort-free in-row projection (streaming-safe, like
    * [[gopherRulesFrame]]). `useKernel = true` (the default, and the gate
    * path) computes all 17 signals in ONE compiled pass per row
    * ([[graft.functions.TextHashExprs.RepetitionSignals]] — no gram-array
    * materialization, no per-element interpreted lambdas); `false` keeps
    * the higher-order-function formulation (11 sorted-run passes over
    * materialized gram arrays) as an in-JVM differential reference — the
    * spec pins kernel == HOF column-for-column, and the DuckDB oracle
    * computes the same numbers a THIRD way (UNNEST + GROUP BY). */
  def repetitionRulesFrame(docs: DataFrame,
      useKernel: Boolean = true): DataFrame = {
    val topNs = Seq(2, 3, 4)
    val dupNs = Seq(5, 6, 7, 8, 9, 10)
    val sigNames = Seq("n_lines", "n_lines_d", "line_chars",
      "dup_line_chars", "n_paras", "n_paras_d", "para_chars",
      "dup_para_chars") ++ topNs.map(n => s"top${n}_chars") ++
      dupNs.map(n => s"dup${n}_chars")
    val m = if (useKernel) {
      docs.select(col("doc_id"), col("source"),
        length(col("text")).cast("long").as("n_chars"),
        graft.functions.TextHashExprs.repetition_signals(col("text"))
          .as("g"))
        .select(Seq(col("doc_id"), col("source"), col("n_chars")) ++
          sigNames.map(n => col(s"g.$n").as(n)): _*)
    } else {
      val toks = filter(split(trim(col("text")), "\\s+"), x => x =!= "")
      def seq(d: Column) = runStats(array_sort(d))
      val base = docs.select(col("doc_id"), col("source"), col("text"),
        toks.as("t"), split(col("text"), "\n").as("ls"),
        split(col("text"), "\n\n").as("ps"))
      base.select(Seq(
        col("doc_id"), col("source"),
        length(col("text")).cast("long").as("n_chars"),
        size(col("ls")).cast("long").as("n_lines"),
        size(array_distinct(col("ls"))).cast("long").as("n_lines_d"),
        aggregate(col("ls"), lit(0L), (a, x) => a + length(x))
          .as("line_chars"),
        seq(col("ls")).getField("dup_chars").as("dup_line_chars"),
        size(col("ps")).cast("long").as("n_paras"),
        size(array_distinct(col("ps"))).cast("long").as("n_paras_d"),
        aggregate(col("ps"), lit(0L), (a, x) => a + length(x))
          .as("para_chars"),
        seq(col("ps")).getField("dup_chars").as("dup_para_chars")) ++
        topNs.map(n =>
          seq(wordNgrams(col("t"), n)).getField("top_chars")
            .as(s"top${n}_chars")) ++
        dupNs.map(n =>
          seq(wordNgrams(col("t"), n)).getField("dup_chars")
            .as(s"dup${n}_chars")): _*)
    }
    def ppm(num: String, den: String) =
      expr(s"CASE WHEN $den > 0 THEN ($num * 1000000L) DIV $den ELSE 0L END")
    def rule(num: String, den: String, permil: Int) =
      expr(s"$num * 1000L <= $den * $permil")
    val topThr = Map(2 -> 200, 3 -> 180, 4 -> 160)
    val dupThr = Map(5 -> 150, 6 -> 140, 7 -> 130, 8 -> 120, 9 -> 110,
      10 -> 100)
    val rules: Seq[(String, Column)] = Seq(
      "r_dup_lines" -> rule("(n_lines - n_lines_d)", "n_lines", 300),
      "r_dup_paras" -> rule("(n_paras - n_paras_d)", "n_paras", 300),
      "r_dup_line_chars" -> rule("dup_line_chars", "line_chars", 200),
      "r_dup_para_chars" -> rule("dup_para_chars", "para_chars", 200)) ++
      topNs.map(n =>
        s"r_top${n}gram" -> rule(s"top${n}_chars", "n_chars", topThr(n))) ++
      dupNs.map(n =>
        s"r_dup${n}gram" -> rule(s"dup${n}_chars", "n_chars", dupThr(n)))
    m.select(Seq(
      col("doc_id"), col("source"),
      ppm("(n_lines - n_lines_d)", "n_lines").as("dup_line_ppm"),
      ppm("dup_line_chars", "line_chars").as("dup_line_char_ppm"),
      ppm("(n_paras - n_paras_d)", "n_paras").as("dup_para_ppm"),
      ppm("dup_para_chars", "para_chars").as("dup_para_char_ppm")) ++
      topNs.map(n => ppm(s"top${n}_chars", "n_chars")
        .as(s"top${n}gram_ppm")) ++
      dupNs.map(n => ppm(s"dup${n}_chars", "n_chars")
        .as(s"dup${n}gram_ppm")) ++
      rules.map { case (name, c) => c.as(name) } :+
      rules.map(_._2).reduce(_ && _).as("keep"): _*)
  }

  // --------------------------------------------------------------------
  // BPE tokenizer training (Sennrich et al. 2016, arXiv:1508.07909) —
  // the published distributed recipe: the CORPUS pass is one map-side-
  // combined word-frequency aggregate (corpus-sized input, vocabulary-
  // sized output), and everything after — pair counting, merge
  // selection, the merge loop — runs on the compact (word, freq) table.
  // At 100 TB the corpus is read once; the trainer's working set is the
  // vocabulary, which is why this is the shape every production BPE
  // trainer uses. Initial symbols are code-point chars plus the
  // published `</w>` end-of-word marker; merge ties break to (count
  // DESC, left ASC, right ASC) so every run and every engine agrees.

  /** Iteration-0 adjacent-pair counts (the distributed primitive the
    * trainer loop repeats on the shrinking symbol table): top pairs by
    * weighted frequency. One corpus aggregate + vocab-sized pair math —
    * the gate shape. */
  def bpePairCounts(s: SparkSession, dir: String, topK: Int = 20): DataFrame =
    bpePairCountsOf(documents(s, dir), topK)

  def bpePairCountsOf(docs: DataFrame, topK: Int): DataFrame = {
    val toks = filter(split(lower(col("text")), "\\s+"), x => x =!= "")
    val words = docs.select(explode(toks).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val w = col("word")
    val inner = when(length(w) > 1,
      transform(sequence(lit(1), length(w) - 1), i => struct(
        w.substr(i, lit(1)).as("pair_left"),
        w.substr(i + 1, lit(1)).as("pair_right"))))
      .otherwise(array().cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("pair_left",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("pair_right",
            org.apache.spark.sql.types.StringType))))))
    val withMarker = concat(inner, array(struct(
      w.substr(length(w), lit(1)).as("pair_left"),
      lit("</w>").as("pair_right"))))
    words.select(explode(withMarker).as("p"), col("freq"))
      .groupBy(col("p.pair_left").as("pair_left"),
        col("p.pair_right").as("pair_right"))
      .agg(sum(col("freq")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair_left"), col("pair_right"))
      .limit(topK)
  }

  val bpePairCountsOracle: String =
    """WITH w AS (
      |  SELECT x AS word, CAST(COUNT(*) AS BIGINT) AS freq
      |  FROM documents, UNNEST(
      |    [x FOR x IN string_split_regex(lower(text), '\s+') IF x <> ''])
      |    AS u(x)
      |  GROUP BY x
      |), p AS (
      |  SELECT substr(word, i, 1) AS pair_left,
      |    substr(word, i + 1, 1) AS pair_right, freq
      |  FROM w, UNNEST(range(1, length(word))) AS r(i)
      |  UNION ALL
      |  SELECT substr(word, length(word), 1), '</w>', freq FROM w
      |)
      |SELECT pair_left, pair_right, CAST(SUM(freq) AS BIGINT) AS cnt
      |FROM p GROUP BY pair_left, pair_right
      |ORDER BY cnt DESC, pair_left, pair_right LIMIT 20""".stripMargin

  // --------------------------------------------------------------------
  // Winnowing fingerprints (Schleimer et al. 2003 — see
  // [[graft.functions.PortableHashExprs.winnowKernel]] for the algorithm
  // and the shared-substring guarantee). The fingerprint table is the
  // narrow (doc_id, pos, fp) artifact every downstream overlap check
  // joins on; the kernel is one compiled pass per row, and the oracle
  // recomputes the same selections the heavyweight way (k-gram UNNEST +
  // window join + min/rightmost aggregation).

  def winnowFingerprints(s: SparkSession, dir: String,
      k: Int = 5, w: Int = 4): DataFrame =
    winnowFingerprintsOf(documents(s, dir), k, w)

  def winnowFingerprintsOf(docs: DataFrame, k: Int = 5,
      w: Int = 4): DataFrame = {
    import graft.functions.{PortableHashExprs => P}
    docs.select(col("doc_id"),
      explode(P.winnow_fingerprints(col("text"), k, w)).as("f"))
      .select(col("doc_id"), col("f.pos").as("pos"), col("f.fp").as("fp"))
      .orderBy(col("doc_id"), col("pos"))
  }

  /** DuckDB mirror: k-gram hash table via UNNEST, windows as a range
    * join, per-window min hash then rightmost position — DISTINCT of the
    * selections equals the kernel's record-on-change because the
    * rightmost argmin never moves left as the window slides. */
  def winnowFingerprintsOracle(k: Int = 5, w: Int = 4): String =
    s"""WITH d AS (
       |  SELECT doc_id, lower(regexp_replace(text, '\\s+', '', 'g')) AS s
       |  FROM documents
       |), g AS (
       |  SELECT doc_id, CAST(i AS INTEGER) AS i,
       |    CAST('0x' || substr(md5(substr(s, i, $k)), 1, 8) AS BIGINT) AS h
       |  FROM d, UNNEST(range(1, length(s) - $k + 2)) AS u(i)
       |), nn AS (
       |  SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id
       |), wi AS (
       |  SELECT doc_id, CAST(j AS INTEGER) AS j
       |  FROM nn, UNNEST(range(1, GREATEST(n - $w + 1, 1) + 1)) AS u(j)
       |), sel AS (
       |  SELECT w.doc_id, w.j, MIN(g.h) AS mh
       |  FROM wi w JOIN g ON g.doc_id = w.doc_id
       |    AND g.i BETWEEN w.j AND w.j + ${w - 1}
       |  GROUP BY w.doc_id, w.j
       |), pick AS (
       |  SELECT s.doc_id, s.j, s.mh, MAX(g.i) AS pi
       |  FROM sel s JOIN g ON g.doc_id = s.doc_id AND g.h = s.mh
       |    AND g.i BETWEEN s.j AND s.j + ${w - 1}
       |  GROUP BY s.doc_id, s.j, s.mh
       |)
       |SELECT DISTINCT doc_id, CAST(pi AS INTEGER) AS pos, mh AS fp
       |FROM pick ORDER BY doc_id, pos""".stripMargin

  /** One learned merge: after `rank` prior merges, (left, right) was the
    * most frequent adjacent symbol pair with weighted count `cnt`. */
  final case class BpeMerge(rank: Int, left: String, right: String,
      cnt: Long)

  /** The trainer loop over an in-memory (symbols, freq) vocabulary —
    * vocabulary-bounded work, exactly what runs driver-side after the
    * corpus-sized frequency aggregate. Greedy left-to-right pair merge,
    * (count DESC, left ASC, right ASC) selection. */
  private[graft] def bpeTrainMerges(vocab: Seq[(Array[String], Long)],
      numMerges: Int): (Seq[BpeMerge], Seq[(Vector[String], Long)]) = {
    var words = vocab.map { case (sy, f) => (sy.toVector, f) }
    val out = Seq.newBuilder[BpeMerge]
    var r = 0
    var done = false
    while (r < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      for ((sy, f) <- words; i <- 0 until sy.length - 1)
        counts.updateWith((sy(i), sy(i + 1)))(c => Some(c.getOrElse(0L) + f))
      if (counts.isEmpty) done = true
      else {
        val ((l, rr), c) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        out += BpeMerge(r, l, rr, c)
        val merged = l + rr
        words = words.map { case (sy, f) =>
          val nb = Vector.newBuilder[String]
          var i = 0
          while (i < sy.length) {
            if (i < sy.length - 1 && sy(i) == l && sy(i + 1) == rr) {
              nb += merged; i += 2
            } else { nb += sy(i); i += 1 }
          }
          (nb.result(), f)
        }
        r += 1
      }
    }
    (out.result(), words)
  }

  /** Distributed BPE training: ONE corpus pass (map-side-combined word
    * frequencies), then the vocabulary-bounded merge loop driver-side
    * (the same bounded-collect contract as a broadcast build — published
    * trainers are structured identically). Returns the ranked merge
    * table. */
  def bpeTrain(s: SparkSession, dir: String,
      numMerges: Int = 30): Seq[BpeMerge] =
    bpeTrainOf(documents(s, dir), numMerges)._1

  /** Hard ceiling on the word-frequency table the trainer will pull to
    * the driver: 4M entries ≈ a few hundred MB of short strings — the
    * size class of an ordinary broadcast build. Web-scale corpora hold
    * 10⁸–10⁹ distinct whitespace tokens (URLs, typos, numerals), so the
    * UNPRUNED table is a guaranteed driver OOM at 100 TB; the cap turns
    * that into a loud, actionable failure instead. */
  val BpeMaxVocab: Int = 4 << 20

  /** Trainer over an explicit docs frame; also returns the final
    * vocabulary representation (symbols, freq) so specs can pin the
    * encoder-trainer consistency property.
    *
    * The driver-side collect is BOUNDED: words below `minFreq` are
    * dropped inside the frequency aggregate (engine-side, before any
    * row reaches the driver — published trainers prune identically, and
    * `minFreq = 1` is a no-op so the default stays bit-identical), and
    * the fetch itself is a distributed top-(maxVocab+1) by
    * (freq DESC, word ASC) — `TakeOrderedAndProject`, so the driver
    * never holds more than maxVocab+1 rows even when the corpus would
    * overflow the cap. Overflow (a full cap-sized result with one row to
    * spare) fails loudly with the knobs to turn rather than silently
    * truncating the vocabulary. */
  def bpeTrainOf(docs: DataFrame, numMerges: Int, minFreq: Long = 1L,
      maxVocab: Int = BpeMaxVocab)
      : (Seq[BpeMerge], Seq[(Vector[String], Long)]) = {
    require(maxVocab > 0, s"bpeTrainOf: maxVocab must be positive ($maxVocab)")
    val toks = filter(split(lower(col("text")), "\\s+"), x => x =!= "")
    val pruned = docs.select(explode(toks).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .where(col("freq") >= minFreq)
    val vocab = pruned
      .orderBy(col("freq").desc, col("word").asc)
      .limit(maxVocab + 1)
      .collect()
    if (vocab.length > maxVocab)
      throw new IllegalStateException(
        s"bpeTrainOf: pruned vocabulary exceeds maxVocab=$maxVocab " +
          s"(minFreq=$minFreq). Raise minFreq (frequency pruning happens " +
          "engine-side) or maxVocab if the driver can hold more.")
    bpeTrainMerges(vocab.toSeq
      .map(row => (bpeInitialSymbols(row.getString(0)), row.getLong(1))),
      numMerges)
  }

  private[graft] def bpeInitialSymbols(word: String): Array[String] = {
    val cps = word.codePoints().toArray
    val out = new Array[String](cps.length + 1)
    var i = 0
    while (i < cps.length) {
      out(i) = new String(Character.toChars(cps(i))); i += 1
    }
    out(cps.length) = "</w>"
    out
  }

  /** The twelve repetition screens folded into ONE boolean Column over a
    * text column (single kernel pass + cross-multiplied comparisons) —
    * the composition sibling of [[gopherKeepOf]]. Spec-pinned equal to
    * [[repetitionRulesFrame]]'s `keep`. */
  def repetitionKeepOf(text: Column): Column = {
    val g = graft.functions.TextHashExprs.repetition_signals(text)
    val nChars = length(text).cast("long")
    def f(n: String) = g.getField(n)
    val topThr = Map(2 -> 200, 3 -> 180, 4 -> 160)
    val dupThr = Map(5 -> 150, 6 -> 140, 7 -> 130, 8 -> 120, 9 -> 110,
      10 -> 100)
    val base = Seq(
      (f("n_lines") - f("n_lines_d")) * 1000L <= f("n_lines") * 300L,
      (f("n_paras") - f("n_paras_d")) * 1000L <= f("n_paras") * 300L,
      f("dup_line_chars") * 1000L <= f("line_chars") * 200L,
      f("dup_para_chars") * 1000L <= f("para_chars") * 200L) ++
      (2 to 4).map(n =>
        f(s"top${n}_chars") * 1000L <= nChars * topThr(n)) ++
      (5 to 10).map(n =>
        f(s"dup${n}_chars") * 1000L <= nChars * dupThr(n))
    base.reduce(_ && _)
  }

  /** DuckDB mirror of [[repetitionRulesFrame]] computed the OPPOSITE way:
    * UNNEST + GROUP BY per (doc, gram) instead of sorted-run in-row passes.
    * The packed `c * 1048576 + length(g)` max_by key realizes the same
    * (count, len)-lexicographic tie-break (doc lengths here are far below
    * 2^20 chars; the Spark side compares the pair exactly). */
  def repetitionRulesOracle: String = {
    val topNs = Seq(2, 3, 4)
    val dupNs = Seq(5, 6, 7, 8, 9, 10)
    val topThr = Map(2 -> 200, 3 -> 180, 4 -> 160)
    val dupThr = Map(5 -> 150, 6 -> 140, 7 -> 130, 8 -> 120, 9 -> 110,
      10 -> 100)
    def gramCtes(n: Int) =
      s"""g$n AS (
         |  SELECT doc_id, u.g FROM d, UNNEST(
         |    [array_to_string(t[i:i+${n - 1}], ' ')
         |     FOR i IN range(1, len(t) - ${n - 2})]) AS u(g)
         |), a$n AS (
         |  SELECT doc_id,
         |    CAST(max_by(c * length(g), c * 1048576 + length(g)) AS BIGINT)
         |      AS top_chars,
         |    CAST(COALESCE(SUM(CASE WHEN c > 1 THEN (c - 1) * length(g)
         |      END), 0) AS BIGINT) AS dup_chars
         |  FROM (SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c
         |        FROM g$n GROUP BY doc_id, g)
         |  GROUP BY doc_id
         |)""".stripMargin
    def seqCtes(tag: String, arr: String) =
      s"""${tag}c AS (
         |  SELECT doc_id, x, CAST(COUNT(*) AS BIGINT) AS c,
         |    CAST(LENGTH(x) AS BIGINT) AS ln
         |  FROM d, UNNEST($arr) AS u(x) GROUP BY doc_id, x
         |), ${tag}a AS (
         |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_$tag,
         |    CAST(COUNT(*) AS BIGINT) AS n_${tag}_d,
         |    CAST(SUM(c * ln) AS BIGINT) AS ${tag}_chars,
         |    CAST(SUM((c - 1) * ln) AS BIGINT) AS dup_${tag}_chars
         |  FROM ${tag}c GROUP BY doc_id
         |)""".stripMargin
    def ppm(num: String, den: String) =
      s"CASE WHEN $den > 0 THEN ($num * 1000000) // $den ELSE 0 END"
    def rule(num: String, den: String, permil: Int) =
      s"$num * 1000 <= $den * $permil"
    val topCols = topNs.map(n =>
      s"COALESCE(a$n.top_chars, 0) AS top${n}_chars").mkString(",\n    ")
    val dupCols = dupNs.map(n =>
      s"COALESCE(a$n.dup_chars, 0) AS dup${n}_chars").mkString(",\n    ")
    val joins = (topNs ++ dupNs)
      .map(n => s"LEFT JOIN a$n ON a$n.doc_id = d.doc_id")
      .mkString("\n  ")
    val ruleExprs = Seq(
      "r_dup_lines" -> rule("(n_line - n_line_d)", "n_line", 300),
      "r_dup_paras" -> rule("(n_para - n_para_d)", "n_para", 300),
      "r_dup_line_chars" -> rule("dup_line_chars", "line_chars", 200),
      "r_dup_para_chars" -> rule("dup_para_chars", "para_chars", 200)) ++
      topNs.map(n =>
        s"r_top${n}gram" -> rule(s"top${n}_chars", "n_chars", topThr(n))) ++
      dupNs.map(n =>
        s"r_dup${n}gram" -> rule(s"dup${n}_chars", "n_chars", dupThr(n)))
    s"""WITH d AS (
       |  SELECT doc_id, source, text,
       |    [x FOR x IN string_split_regex(TRIM(text), '\\s+') IF x <> '']
       |      AS t,
       |    string_split(text, chr(10)) AS ls,
       |    string_split(text, chr(10) || chr(10)) AS ps,
       |    CAST(LENGTH(text) AS BIGINT) AS n_chars
       |  FROM documents
       |), ${seqCtes("line", "ls")},
       |${seqCtes("para", "ps")},
       |${topNs.map(gramCtes).mkString(",\n")},
       |${dupNs.map(gramCtes).mkString(",\n")},
       |m AS (
       |  SELECT d.doc_id, d.source, d.n_chars,
       |    linea.n_line, linea.n_line_d, linea.line_chars,
       |    linea.dup_line_chars,
       |    paraa.n_para, paraa.n_para_d, paraa.para_chars,
       |    paraa.dup_para_chars,
       |    $topCols,
       |    $dupCols
       |  FROM d
       |  JOIN linea ON linea.doc_id = d.doc_id
       |  JOIN paraa ON paraa.doc_id = d.doc_id
       |  $joins
       |)
       |SELECT doc_id, source,
       |  ${ppm("(n_line - n_line_d)", "n_line")} AS dup_line_ppm,
       |  ${ppm("dup_line_chars", "line_chars")} AS dup_line_char_ppm,
       |  ${ppm("(n_para - n_para_d)", "n_para")} AS dup_para_ppm,
       |  ${ppm("dup_para_chars", "para_chars")} AS dup_para_char_ppm,
       |  ${topNs.map(n => ppm(s"top${n}_chars", "n_chars") +
              s" AS top${n}gram_ppm").mkString(",\n  ")},
       |  ${dupNs.map(n => ppm(s"dup${n}_chars", "n_chars") +
              s" AS dup${n}gram_ppm").mkString(",\n  ")},
       |  ${ruleExprs.map { case (nm, e) => s"$e AS $nm" }
              .mkString(",\n  ")},
       |  ${ruleExprs.map(r => s"(${r._2})").mkString(" AND ")} AS keep
       |FROM m
       |ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------------------
  // C4 cleaning heuristics (Raffel et al. 2020, "Exploring the Limits of
  // Transfer Learning with a Unified Text-to-Text Transformer", §2.2) —
  // the line-level + page-level screens that produced the C4 corpus,
  // completing the published-filter family next to [[gopherRulesFrame]]
  // (structural) and [[repetitionRulesFrame]] (repetition):
  //   line RETAINED iff it ends in terminal punctuation (. ! ? "), has at
  //   least `minLineWords` (published: 5) words, and does not mention
  //   "javascript";
  //   page KEPT iff its retained lines carry at least `minSentences`
  //   (published: 3) sentences AND the page contains no "lorem ipsum",
  //   no curly brace, and no word from the deployment blocklist
  //   (published: the "Dirty, Naughty, Obscene or Otherwise Bad Words"
  //   list — supplied by the caller, the engine ships no copy; word =
  //   maximal alphabetic run of the lowercased page).
  // Every screen is a pure in-row array/regexp expression over the line
  // array — ONE narrow scan projection, zero shuffle before the output
  // sort, so at 100 TB the whole C4 pass rides inside the scan's
  // WholeStageCodegen span. The remaining published C4 step — dropping
  // repeated three-sentence spans corpus-wide — is [[spanDedup]].

  /** Deployments pass the published blocklist; empty disables the screen. */
  val c4BadWords: Seq[String] = Seq.empty

  def c4Filters(s: SparkSession, dir: String, minLineWords: Int = 5,
      minSentences: Int = 3, badWords: Seq[String] = c4BadWords): DataFrame =
    c4FiltersOf(documents(s, dir), minLineWords, minSentences, badWords)

  /** [[c4Filters]] over an explicit (doc_id, source, text) frame — the
    * spec plants quote-terminated / javascript / lorem-ipsum / brace /
    * blocklisted pages the fixture lacks. */
  def c4FiltersOf(docs: DataFrame, minLineWords: Int = 5,
      minSentences: Int = 3, badWords: Seq[String] = c4BadWords): DataFrame =
    c4FiltersFrame(docs, minLineWords, minSentences, badWords)
      .orderBy(col("doc_id"))

  /** The sort-free screen projection — stateless and entirely in-row, so
    * it applies unchanged to a STREAMING frame ([[
    * graft.streaming.StreamOps.c4FilterStream]]); batch callers add the
    * output sort. */
  def c4FiltersFrame(docs: DataFrame, minLineWords: Int = 5,
      minSentences: Int = 3, badWords: Seq[String] = c4BadWords): DataFrame = {
    // all six page signals from ONE compiled kernel pass
    // (TextHashExprs.C4Screen) — the per-line filter lambda (rlike +
    // word-count HOF) was CodegenFallback, walking an interpreted tree
    // per LINE (r15 StreamProbe: the streaming C4 gate spent ~1 s of its
    // addBatch there); the kernel computes the identical integers and
    // booleans, oracle-verified
    docs.select(
      col("doc_id"), col("source"),
      graft.functions.TextHashExprs
        .c4_screen(col("text"), minLineWords, badWords).as("c4"))
      .select(col("doc_id"), col("source"),
        col("c4.n_lines").as("n_lines"),
        col("c4.n_kept_lines").as("n_kept_lines"),
        col("c4.n_sentences").as("n_sentences"),
        col("c4.r_no_lorem").as("r_no_lorem"),
        col("c4.r_no_brace").as("r_no_brace"),
        col("c4.r_no_badwords").as("r_no_badwords"))
      .withColumn("r_min_sentences", col("n_sentences") >= minSentences)
      .withColumn("keep",
        col("r_min_sentences") && col("r_no_lorem") && col("r_no_brace") &&
          col("r_no_badwords"))
  }

  /** The C4 page verdict folded into ONE boolean Column over a text
    * column — for compositions that keep everything in a single scan
    * projection (the [[gopherKeepOf]] shape). Spec-pinned equal to
    * [[c4FiltersFrame]]'s `keep`. */
  def c4KeepOf(text: Column, minLineWords: Int = 5, minSentences: Int = 3,
      badWords: Seq[String] = c4BadWords): Column = {
    val c4 = graft.functions.TextHashExprs
      .c4_screen(text, minLineWords, badWords)
    (c4.getField("n_sentences") >= minSentences) &&
      c4.getField("r_no_lorem") && c4.getField("r_no_brace") &&
      c4.getField("r_no_badwords")
  }

  /** The `text_c4_filters` gate corpus: the synthetic fixture is a
    * punctuation-free single-line token soup, so the published C4
    * parameters would be constant on it. Instead of corpus-adapted
    * thresholds (the [[gopherRules]] route), the gate derives punctuated
    * multi-line pages from the fixture with SEVEN deterministic literal
    * replaces — three rare bigrams (20-30 of 500 docs each) become the
    * page-level violations, one common unigram becomes the javascript
    * line screen, three common unigrams become sentence-terminated line
    * breaks. The DuckDB oracle applies the IDENTICAL replaces, so every
    * screen runs with its PUBLISHED parameters and still varies on the
    * fixture. All strings are regex-metacharacter-free on the pattern
    * side, so `regexp_replace` is a literal replace. */
  val c4GateReplaces: Seq[(String, String)] = Seq(
    // " dup" (no trailing space): the fixture's rare token is almost
    // always text-final
    " dup" -> " lorem ipsum",
    " big table " -> " big { table ",
    " the part " -> " the badword part ",
    " spark " -> " javascript ",
    " sort " -> ".\n",
    " query " -> "?\n",
    " merge " -> "!\n")

  val c4GateBadWords: Seq[String] = Seq("badword")

  /** The derived-page text as a Column (shared by the batch gate and the
    * streaming variant). */
  def c4GateTextCol: Column =
    c4GateReplaces.foldLeft(col("text")) { case (c, (from, to)) =>
      regexp_replace(c, from, to)
    }

  def c4GateDocs(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(col("doc_id"), col("source"), c4GateTextCol.as("text"))

  /** DuckDB mirror of the gate: the same seven replaces feeding the same
    * published-parameter screens. */
  def c4FiltersOracle(minLineWords: Int = 5, minSentences: Int = 3,
      badWords: Seq[String] = c4GateBadWords): String = {
    val derived = c4GateReplaces.foldLeft("text") { case (e, (from, to)) =>
      val t = to.replace("\n", "' || chr(10) || '")
      s"replace($e, '$from', '$t')"
    }
    val bw = badWords.map(w => s"'$w'").mkString(", ")
    val pageWords =
      "[w FOR w IN string_split_regex(lower(text), '[^a-z]+') IF w <> '']"
    val noBad =
      s"len(list_intersect(list_distinct($pageWords), [$bw])) = 0"
    s"""WITH src AS (
       |  SELECT doc_id, source, $derived AS text FROM documents
       |), m AS (
       |  SELECT doc_id, source, text, string_split(text, chr(10)) AS ls
       |  FROM src
       |), c AS (
       |  SELECT doc_id, source, text, CAST(len(ls) AS INTEGER) AS n_lines,
       |    [l FOR l IN ls IF regexp_matches(rtrim(l), '[.!?"]$$')
       |      AND len([w FOR w IN string_split_regex(TRIM(l), '\\s+')
       |        IF w <> '']) >= $minLineWords
       |      AND NOT contains(lower(l), 'javascript')] AS kept
       |  FROM m
       |), d AS (
       |  SELECT doc_id, source, text, n_lines,
       |    CAST(len(kept) AS INTEGER) AS n_kept_lines,
       |    -- COALESCE: DuckDB's array_to_string([]) is NULL where
       |    -- Spark's array_join([]) is '' (probed live)
       |    CAST(len(regexp_extract_all(
       |      COALESCE(array_to_string(kept, chr(10)), ''),
       |      '[.!?]')) AS INTEGER) AS n_sentences
       |  FROM c
       |)
       |SELECT doc_id, source, n_lines, n_kept_lines, n_sentences,
       |  NOT contains(lower(text), 'lorem ipsum') AS r_no_lorem,
       |  NOT contains(text, '{') AS r_no_brace,
       |  $noBad AS r_no_badwords,
       |  n_sentences >= $minSentences AS r_min_sentences,
       |  (n_sentences >= $minSentences
       |    AND NOT contains(lower(text), 'lorem ipsum')
       |    AND NOT contains(text, '{')
       |    AND $noBad) AS keep
       |FROM d
       |ORDER BY doc_id""".stripMargin
  }
}
