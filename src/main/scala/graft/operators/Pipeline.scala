package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables._

/** The end-to-end pre-training corpus build, composed from the library's
  * own stages — the "a user can run their whole pipeline on this engine"
  * demonstration, and a gate that any refactor of the underlying pieces
  * must keep green:
  *
  *   quality filter (Gopher-style TTR/repetition screen, one compiled
  *   kernel pass) → exact dedup (md5 fingerprint, keep the smallest
  *   doc_id) → mixture enforcement (per-language feasible quotas on the
  *   SURVIVING corpus) → sequence packing (per-shard concat-and-chop
  *   summary of what ships to training).
  *
  * Plan shape at 100 TB: one kernel scan-projection (no shuffle), one
  * dedup shuffle on the fingerprint, a tiny per-language aggregate +
  * 5-row window broadcast back, and the per-shard packing rollup — four
  * stages, three shuffles, nothing driver-side. Every intermediate stays
  * integer/hash-exact, so the whole chain is one DuckDB oracle. */
object Pipeline {

  def trainCorpus(s: SparkSession, dir: String, seqLen: Int = 64,
      nShards: Int = 8): DataFrame = {
    // stage 1: quality screen (same thresholds as the quality-filter gate)
    val scored = documents(s, dir)
      .select(col("doc_id"), col("lang"), col("text"),
        graft.functions.TextHashExprs.token_repetition(col("text")).as("r"))
      .select(col("doc_id"), col("lang"), col("text"),
        col("r.n_tokens").as("n_tokens"),
        expr("r.n_distinct * 1000000L div r.n_tokens").as("ttr_ppm"),
        expr("r.top_bigram_n * 1000000L div greatest(r.n_tokens - 1, 1)")
          .as("rep_ppm"))
      .filter(col("ttr_ppm").between(300000L, 800000L) &&
        col("rep_ppm") < 60000L)
    // stage 2: exact dedup — first doc_id per content fingerprint wins
    val deduped = scored
      .withColumn("fp", md5(col("text")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("lang"), col("n_tokens"))
    // stage 3: mixture quotas computed on the SURVIVORS
    val w = Sampling.mixtureWeights.tail.foldLeft(
      when(col("lang") === Sampling.mixtureWeights.head._1,
        lit(Sampling.mixtureWeights.head._2))) {
      case (acc, (l, p)) => acc.when(col("lang") === l, lit(p))
    }.otherwise(lit(0L))
    val rates = deduped.groupBy(col("lang"))
      .agg(count(lit(1)).as("n")).withColumn("w_ppm", w)
      .filter(col("w_ppm") > 0)
      .withColumn("t_feasible",
        min(expr("n * 1000000L div w_ppm")).over(Window.partitionBy(lit(1))))
      .withColumn("rate_bp", least(lit(10000L),
        expr("(w_ppm * t_feasible div 1000000L) * 10000L div n")))
      .select(col("lang"), col("rate_bp"))
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 14),
      16, 10).cast("long") % 10000
    val sampled = deduped
      .join(broadcast(rates), "lang")
      .filter(bucket < col("rate_bp"))
    // stage 4: packing summary per output shard
    sampled
      .select((conv(substring(md5(col("doc_id").cast("string")), 1, 14),
          16, 10).cast("long") % nShards).as("shard"),
        col("n_tokens").cast("long").as("n_tokens"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        expr(s"(n_tokens + ${seqLen - 1}) div $seqLen").as("n_seqs"))
      .orderBy(col("shard"))
  }

  /** The r8 curated-corpus chain, composed from the round's new stages —
    * the second refactor-guard pipeline next to [[trainCorpus]]:
    *
    *   LM tail-drop (CCNet split: keep head+middle of
    *   [[TextOps.lmBucketed]], drop each source's worst surprisal
    *   tercile) → exact dedup (md5, first doc_id wins) → per-source
    *   packing summary (docs, tokens, `ceil(tokens/seqLen)` sequences).
    *
    * Plan shape at 100 TB: the LM scoring joins (reference-model-sized),
    * one source-keyed window for the tiles, one dedup shuffle on the
    * fingerprint, one per-source rollup. Integer/hash-exact end to end —
    * one DuckDB oracle verifies the whole chain. */
  def curatedCorpus(s: SparkSession, dir: String,
      seqLen: Int = 64): DataFrame = {
    val kept = TextOps.lmBucketed(s, dir, 3).filter(col("bucket") < 3)
      .select(col("doc_id"), col("source"))
    // fingerprint + token count are computed IN THE SCAN PROJECTION so
    // document text never enters a shuffle: the join and dedup window
    // carry (doc_id, fp, n_tokens) only. The 5.05M-doc composition
    // stress caught the original shape (join on text, fp/tokens after)
    // shuffling 12.0 GB where this one moves ~0.4 GB — same rows, same
    // rollup, bitwise-identical output.
    val narrow = documents(s, dir).select(col("doc_id"),
      md5(col("text")).as("fp"),
      size(filter(split(lower(col("text")), "\\s+"), t => t =!= ""))
        .cast("long").as("n_tokens"))
    val deduped = kept
      .join(narrow, Seq("doc_id"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
      .filter(col("rk") === 1)
      .select(col("source"), col("n_tokens"))
    deduped.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        expr(s"(total_tokens + ${seqLen - 1}) div $seqLen").as("n_seqs"))
      .orderBy(col("source"))
  }

  /** The curated chain as one DuckDB pipeline (LM CTEs as in
    * [[TextOps.lmScoreOracle]], NTILE split, dedup, rollup). */
  val curatedCorpusOracle: String =
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
      |  SELECT doc_id,
      |    CAST(SUM(bits) * 1000000 // COUNT(*) AS BIGINT) AS bits_ppm
      |  FROM scored GROUP BY doc_id
      |), tiled AS (
      |  SELECT a.doc_id, d.source, d.text,
      |    NTILE(3) OVER (PARTITION BY d.source
      |      ORDER BY a.bits_ppm, a.doc_id) AS bucket
      |  FROM agg a JOIN documents d USING (doc_id)
      |), kept AS (
      |  SELECT doc_id, source, text FROM tiled WHERE bucket < 3
      |), dd AS (
      |  SELECT source,
      |    [x FOR x IN string_split_regex(lower(text), '\s+') IF x <> ''] AS t
      |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text)
      |          ORDER BY doc_id) AS rk FROM kept)
      |  WHERE rk = 1
      |)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(len(t)) AS BIGINT) AS total_tokens,
      |  CAST((SUM(len(t)) + 63) // 64 AS BIGINT) AS n_seqs
      |FROM dd GROUP BY source
      |ORDER BY source""".stripMargin

  /** The same four stages as one DuckDB chain. The quality CTEs mirror
    * [[graft.streaming.StreamOps.qualityFilterOracle]]; note `n_tokens`
    * here is the kernel's space-split count (string_split on ' '), the
    * same tokenization the packing stage then sums. */
  val trainCorpusOracle: String =
    """WITH d AS (
      |  SELECT doc_id, lang, text, string_split(text, ' ') AS toks
      |  FROM documents
      |), tok AS (
      |  SELECT doc_id, unnest(toks) AS tok,
      |    unnest(generate_series(1, len(toks))) AS i
      |  FROM d
      |), bc AS (
      |  SELECT doc_id, MAX(c) AS top_bigram_n
      |  FROM (SELECT a.doc_id, a.tok || ' ' || b.tok AS bg, COUNT(*) AS c
      |        FROM tok a JOIN tok b
      |          ON a.doc_id = b.doc_id AND b.i = a.i + 1
      |        GROUP BY 1, 2)
      |  GROUP BY doc_id
      |), m AS (
      |  SELECT d.doc_id, d.lang, d.text,
      |    CAST(len(d.toks) AS BIGINT) AS n_tokens,
      |    CAST(CAST(t.n_distinct AS BIGINT) * 1000000
      |      // len(d.toks) AS BIGINT) AS ttr_ppm,
      |    CAST(CAST(COALESCE(b.top_bigram_n, 0) AS BIGINT) * 1000000
      |      // greatest(len(d.toks) - 1, 1) AS BIGINT) AS rep_ppm
      |  FROM d
      |  JOIN (SELECT doc_id, COUNT(DISTINCT tok) AS n_distinct
      |        FROM tok GROUP BY doc_id) t USING (doc_id)
      |  LEFT JOIN bc b USING (doc_id)
      |), filtered AS (
      |  SELECT * FROM m
      |  WHERE ttr_ppm BETWEEN 300000 AND 800000 AND rep_ppm < 60000
      |), deduped AS (
      |  SELECT doc_id, lang, n_tokens FROM (
      |    SELECT doc_id, lang, n_tokens,
      |      ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rk
      |    FROM filtered)
      |  WHERE rk = 1
      |), c AS (
      |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
      |    CASE lang WHEN 'en' THEN 400000 WHEN 'de' THEN 150000
      |      WHEN 'fr' THEN 150000 WHEN 'es' THEN 150000
      |      WHEN 'zh' THEN 150000 ELSE 0 END AS w_ppm
      |  FROM deduped GROUP BY lang
      |), r AS (
      |  SELECT lang,
      |    LEAST(10000, ((w_ppm * MIN(n * 1000000 // w_ppm) OVER ())
      |      // 1000000) * 10000 // n) AS rate_bp
      |  FROM c WHERE w_ppm > 0
      |), sampled AS (
      |  SELECT dd.doc_id, dd.n_tokens
      |  FROM deduped dd JOIN r ON dd.lang = r.lang
      |  WHERE CAST('0x'||substr(md5(CAST(dd.doc_id AS VARCHAR)),1,14) AS BIGINT)
      |    % 10000 < r.rate_bp
      |)
      |SELECT
      |  CAST('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,14) AS BIGINT) % 8
      |    AS shard,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
      |  CAST((SUM(n_tokens) + 63) // 64 AS BIGINT) AS n_seqs
      |FROM sampled
      |GROUP BY 1 ORDER BY shard""".stripMargin

  /** The third refactor-guard composition: the TRAINING-SPLIT MANIFEST a
    * pipeline publishes after dedup-aware splitting — near-dup clusters
    * ([[Dedup.components]]) are assigned whole to train/valid/test
    * ([[Sampling.leakFreeSplit]]) and each split reports its cluster/doc/
    * token budget plus its largest cluster (the skew a curriculum or
    * packing stage needs to know about).
    *
    * Plan shape: the cached label table joins token counts (one hash
    * join), then a TWO-LEVEL aggregate — (split, component) partials
    * before the 3-row split rollup — so no count-distinct Expand and no
    * wide re-shuffle; everything after the label join is integer-exact. */
  def splitManifest(s: SparkSession, dir: String): DataFrame = {
    val ntok = documents(s, dir).select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).as("n_tokens"))
    val perComponent = Sampling.leakFreeSplit(s, dir)
      .join(ntok, Seq("doc_id"))
      .groupBy(col("split"), col("component"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("comp_tokens"))
    perComponent
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_components"),
        sum(col("n_docs")).as("n_docs"),
        sum(col("comp_tokens")).as("total_tokens"),
        max(col("n_docs")).as("max_component_docs"))
      .orderBy(col("split"))
  }

  /** Recursive-CTE labels + the split bucket rule + token counts, rolled
    * up through the same two levels. */
  val splitManifestOracle: String =
    Dedup.componentsOracle.replace(
      """SELECT doc_id, MIN(comp) AS component, MIN(comp) = doc_id AS is_rep
        |FROM reach GROUP BY doc_id ORDER BY doc_id""".stripMargin,
      """, lab AS (
        |  SELECT doc_id, MIN(comp) AS component FROM reach GROUP BY doc_id
        |), spl AS (
        |  SELECT doc_id, component,
        |    CASE WHEN CAST('0x'||substr(md5(CAST(component AS VARCHAR)),1,14) AS BIGINT) % 100 < 90 THEN 'train'
        |         WHEN CAST('0x'||substr(md5(CAST(component AS VARCHAR)),1,14) AS BIGINT) % 100 < 95 THEN 'valid'
        |         ELSE 'test' END AS split
        |  FROM lab
        |), ntok AS (
        |  SELECT doc_id,
        |    CAST(LEN(regexp_split_to_array(TRIM(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), pc AS (
        |  SELECT s.split, s.component, COUNT(*) AS n_docs,
        |    SUM(n.n_tokens) AS comp_tokens
        |  FROM spl s JOIN ntok n ON n.doc_id = s.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_components,
        |  CAST(SUM(n_docs) AS BIGINT) AS n_docs,
        |  CAST(SUM(comp_tokens) AS BIGINT) AS total_tokens,
        |  CAST(MAX(n_docs) AS BIGINT) AS max_component_docs
        |FROM pc GROUP BY split ORDER BY split""".stripMargin)

  /** The corpus DATASHEET — the per-source "data card" every released
    * training corpus ships with, composed from four of the library's own
    * stages as the fourth refactor-guard gate: token totals, language
    * spread, near-dup exposure (docs in multi-member [[Dedup.components]]
    * clusters), Gopher-rule pass rate, and mean LM surprisal vs the
    * reference slice. No count-distinct anywhere: language spread comes
    * from the (source, lang) → source two-level aggregate (the
    * [[splitManifest]] pattern — no Expand in the plan), duplicate
    * exposure reads the CACHED cluster label table, and the rule/LM
    * columns ride the same per-doc join. Plan shape at scale: three
    * corpus-keyed hash joins (narrow per-doc rows), two map-side-combined
    * aggregates, the 1-row LM vocab broadcast — nothing driver-side. */
  def datasheet(s: SparkSession, dir: String): DataFrame = {
    val docs = documents(s, dir)
    val t = docs.select(col("doc_id"), col("source"), col("lang"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    val dup = Dedup.components(s, dir)
      .select(col("doc_id"), col("component"))
      .withColumn("is_dup",
        count(lit(1)).over(Window.partitionBy(col("component"))) > 1)
      .select(col("doc_id"), col("is_dup"))
    val gf = TextOps
      .gopherRulesFrame(docs, requiredWords = TextOps.gopherFixtureWords)
      .select(col("doc_id"), col("keep"))
    val lm = TextOps.lmScore(s, dir).select(col("doc_id"), col("bits_ppm"))
    val l1 = t.join(dup, Seq("doc_id")).join(gf, Seq("doc_id"))
      .join(lm, Seq("doc_id"))
      .groupBy(col("source"), col("lang")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("bits_ppm").isNotNull, 1L).otherwise(0L)).as("n_scored"),
        sum(coalesce(col("bits_ppm"), lit(0L))).as("bits_sum"))
    l1.groupBy(col("source")).agg(
        sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        count(lit(1)).as("n_langs"),
        sum(col("n_dup")).as("n_dup_docs"),
        sum(col("n_kept")).as("n_gopher_kept"),
        sum(col("n_scored")).as("ns"),
        sum(col("bits_sum")).as("bs"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("n_langs"), col("n_dup_docs"), col("n_gopher_kept"),
        when(col("ns") === 0, lit(null).cast("long"))
          .otherwise(expr("bs DIV ns")).as("mean_bits_ppm"))
      .orderBy(col("source"))
  }

  /** The same composition in one DuckDB query: recursive-CTE cluster
    * labels, the full Gopher rule table and LM-surprisal subqueries, and
    * the identical two-level rollup. */
  val datasheetOracle: String =
    Dedup.componentsOracle.replace(
      """SELECT doc_id, MIN(comp) AS component, MIN(comp) = doc_id AS is_rep
        |FROM reach GROUP BY doc_id ORDER BY doc_id""".stripMargin,
      s""", lab AS (
         |  SELECT doc_id, MIN(comp) AS component FROM reach GROUP BY doc_id
         |), dupf AS (
         |  SELECT doc_id,
         |    COUNT(*) OVER (PARTITION BY component) > 1 AS is_dup
         |  FROM lab
         |), t AS (
         |  SELECT doc_id, source, lang,
         |    CAST(LEN(regexp_split_to_array(TRIM(text), '\\s+')) AS BIGINT)
         |      AS n_tokens
         |  FROM documents
         |), gf AS (
         |  SELECT doc_id, keep FROM (${graft.operators.TextOps
              .gopherRulesOracle(30, 90, TextOps.gopherFixtureWords)
              .stripSuffix("ORDER BY doc_id")}) g
         |), lmq AS (
         |  SELECT doc_id, bits_ppm FROM (${TextOps.lmScoreOracle
              .stripSuffix("ORDER BY doc_id")}) l
         |), j AS (
         |  SELECT t.source, t.lang, t.n_tokens, d.is_dup, g.keep, q.bits_ppm
         |  FROM t JOIN dupf d USING (doc_id) JOIN gf g USING (doc_id)
         |    JOIN lmq q USING (doc_id)
         |), l1 AS (
         |  SELECT source, lang, COUNT(*) AS n_docs, SUM(n_tokens) AS n_tokens,
         |    SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS n_dup,
         |    SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS n_kept,
         |    SUM(CASE WHEN bits_ppm IS NOT NULL THEN 1 ELSE 0 END) AS n_scored,
         |    SUM(CASE WHEN bits_ppm IS NOT NULL THEN bits_ppm ELSE 0 END)
         |      AS bits_sum
         |  FROM j GROUP BY 1, 2
         |)
         |SELECT source, CAST(SUM(n_docs) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         |  CAST(COUNT(*) AS BIGINT) AS n_langs,
         |  CAST(SUM(n_dup) AS BIGINT) AS n_dup_docs,
         |  CAST(SUM(n_kept) AS BIGINT) AS n_gopher_kept,
         |  CASE WHEN SUM(n_scored) = 0 THEN NULL
         |    ELSE CAST(SUM(bits_sum) // SUM(n_scored) AS BIGINT) END
         |    AS mean_bits_ppm
         |FROM l1 GROUP BY source ORDER BY source""".stripMargin)

  /** The r9 screening chain as ONE scan: Gopher structural rules +
    * repetition screens + Bloom decontamination composed IN-ROW —
    * `gopherKeepOf` and `repetitionKeepOf` are single boolean Columns,
    * the Bloom screen is a compiled expression, so the whole corpus-side
    * screen is one projection with ZERO text shuffle; only
    * Bloom-candidate docs explode into the exact confirm join, and the
    * (tiny) contaminated-id set anti-joins back as a broadcast. The
    * fifth refactor-guard composition: the gate re-verifies the three
    * r9 screens chained, against one chained DuckDB oracle. */
  def screenedCorpus(s: SparkSession, dir: String,
      benchSource: String = "src0", seqLen: Int = 64,
      threshold: Double = 0.2, mBits: Int = 1 << 20,
      k: Int = 5): DataFrame = {
    import graft.functions.{PortableHashExprs => P}
    val docs = documents(s, dir)
    // the bench shingle set feeds BOTH the driver-side Bloom build and
    // the exact confirm join; without materialization the explode +
    // distinct ran twice per invocation (r14 plan audit) — checkpoint it
    // once (within-query staging; every run recomputes from parquet)
    val bench = docs.filter(col("source") === benchSource)
      .select(explode(Dedup.shingles(col("text"), 3)).as("shingle"))
      .distinct()
      .localCheckpoint()
    val setBits = bench
      .select(explode(P.bloom_positions(col("shingle"), mBits, k)).as("p"))
      .distinct().collect().map(_.getLong(0))
    val bloom = new Array[Byte]((mBits + 7) / 8)
    setBits.foreach(p => bloom((p >>> 3).toInt) =
      (bloom((p >>> 3).toInt) | (1 << (p & 7L).toInt)).toByte)
    val toks = filter(split(lower(col("text")), "\\s+"), t => t =!= "")
    // the screen frame is consumed twice (candidate confirm + final
    // rollup), which re-ran all three screen kernels per consumer;
    // checkpoint it NARROW (no text — per-doc flags and counters only,
    // the scale-sane staging shape) so the kernels run once, and
    // re-attach text for the few Bloom-candidate docs by broadcasting
    // their ids back into a pruned documents scan
    val base = docs.filter(col("source") =!= benchSource).select(
      col("doc_id"), col("source"),
      size(toks).cast("long").as("n_tokens"),
      TextOps.gopherKeepOf(col("text"),
        requiredWords = TextOps.gopherFixtureWords).as("g_keep"),
      TextOps.repetitionKeepOf(col("text")).as("r_keep"),
      P.bloom_screen(col("text"), bloom, mBits, k, 3).as("sc"))
      .localCheckpoint()
    val candidates = base.filter(col("sc.n_candidates") > 0L)
      .select(col("doc_id"), col("sc.n_shingles").as("n_shingles"))
    // the re-read keeps the corpus-side filter so the overlap count never
    // depends on doc_id being unique ACROSS sources (a bench/corpus id
    // collision would otherwise pull bench text into n_overlap)
    val contaminated = docs.filter(col("source") =!= benchSource)
      .join(broadcast(candidates), Seq("doc_id"))
      .select(col("doc_id"), col("n_shingles"),
        explode(array_distinct(Dedup.shingles(col("text"), 3)))
          .as("shingle"))
      .join(broadcast(bench), Seq("shingle"))
      .groupBy(col("doc_id"), col("n_shingles"))
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap").cast("double") / col("n_shingles") >=
        threshold)
      .select(col("doc_id"))
    base.filter(col("g_keep") && col("r_keep"))
      .join(broadcast(contaminated), Seq("doc_id"), "left_anti")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        expr(s"(total_tokens + ${seqLen - 1}) div $seqLen").as("n_seqs"))
      .orderBy(col("source"))
  }

  /** The published web-corpus recipe chained (the C4 construction order:
    * page cleaning → structural quality → exact dedup → token budget),
    * the SIXTH refactor-guard composition: the C4 page screens (over the
    * gate's derived pages) and the Gopher structural screen (over the
    * raw text) fold into ONE scan projection via their single-Column
    * forms; survivors dedup exactly on md5 through one fingerprint
    * window (canonical = smallest doc_id CORPUS-WIDE, so a duplicate
    * counts in its canonical's source); per-source stage counts and the
    * surviving token budget roll up. Two narrow shuffles past the scan
    * (fingerprint window, source rollup) — no text ever shuffles. */
  def webCorpus(s: SparkSession, dir: String): DataFrame =
    webCorpusOf(documents(s, dir))

  /** [[webCorpus]] over an explicit (doc_id, source, text) frame — the
    * fixture has no exact-duplicate documents, so the spec plants
    * cross-source duplicates to exercise the canonical-source
    * accounting the gate's corpus cannot. */
  def webCorpusOf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = filter(split(lower(col("text")), "\\s+"), t => t =!= "")
    val base = docs.select(col("doc_id"), col("source"),
      size(toks).cast("long").as("n_tokens"),
      md5(col("text")).as("fp"),
      TextOps.c4KeepOf(TextOps.c4GateTextCol,
        badWords = TextOps.c4GateBadWords).as("c4_keep"),
      TextOps.gopherKeepOf(col("text"),
        requiredWords = TextOps.gopherFixtureWords).as("g_keep"))
    val perSource = base.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("c4_keep"), 1L).otherwise(0L)).as("n_c4"),
      sum(when(col("c4_keep") && col("g_keep"), 1L).otherwise(0L))
        .as("n_screened"))
    val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    val uniqAgg = base.filter(col("c4_keep") && col("g_keep"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("source")).agg(count(lit(1)).as("n_unique"),
        sum(col("n_tokens")).as("kept_tokens"))
    perSource.join(uniqAgg, Seq("source"), "left")
      .na.fill(0L, Seq("n_unique", "kept_tokens"))
      .orderBy(col("source"))
  }

  /** The web-corpus chain as one DuckDB pipeline, reusing the C4 and
    * Gopher stage oracles as subqueries. */
  def webCorpusOracle: String = {
    val c4 = TextOps.c4FiltersOracle().stripSuffix("ORDER BY doc_id")
    val gopher = TextOps
      .gopherRulesOracle(30, 90, TextOps.gopherFixtureWords)
      .stripSuffix("ORDER BY doc_id")
    s"""WITH c4k AS (
       |  SELECT doc_id, keep AS c4_keep FROM ($c4) x
       |), gk AS (
       |  SELECT doc_id, keep AS g_keep FROM ($gopher) y
       |), b AS (
       |  SELECT d.doc_id, d.source, md5(d.text) AS fp,
       |    CAST(len([x FOR x IN string_split_regex(lower(d.text), '\\s+')
       |      IF x <> '']) AS BIGINT) AS n_tokens,
       |    c4k.c4_keep, gk.g_keep
       |  FROM documents d
       |  JOIN c4k USING (doc_id) JOIN gk USING (doc_id)
       |), surv AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id)
       |    AS rn
       |  FROM b WHERE c4_keep AND g_keep
       |), p AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(CASE WHEN c4_keep THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_c4,
       |    CAST(SUM(CASE WHEN c4_keep AND g_keep THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_screened
       |  FROM b GROUP BY 1
       |), u AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_unique,
       |    CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens
       |  FROM surv WHERE rn = 1 GROUP BY 1
       |)
       |SELECT p.source, n_docs, n_c4, n_screened,
       |  COALESCE(n_unique, CAST(0 AS BIGINT)) AS n_unique,
       |  COALESCE(kept_tokens, CAST(0 AS BIGINT)) AS kept_tokens
       |FROM p LEFT JOIN u USING (source)
       |ORDER BY source""".stripMargin
  }

  /** The screening chain as one DuckDB pipeline, reusing the three
    * stage oracles as subqueries. */
  def screenedCorpusOracle: String = {
    val gopher = TextOps
      .gopherRulesOracle(30, 90, TextOps.gopherFixtureWords)
      .stripSuffix("ORDER BY doc_id")
    val rep = TextOps.repetitionRulesOracle.stripSuffix("ORDER BY doc_id")
    val decon = Dedup.decontaminateOracle.stripSuffix("ORDER BY t.doc_id")
    s"""WITH d AS (
       |  SELECT doc_id, source, CAST(len(
       |    [x FOR x IN string_split_regex(lower(text), '\\s+') IF x <> '']
       |  ) AS BIGINT) AS n_tokens
       |  FROM documents WHERE source <> 'src0'
       |)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       |  CAST((SUM(n_tokens) + 63) // 64 AS BIGINT) AS n_seqs
       |FROM d
       |WHERE doc_id IN (SELECT doc_id FROM ($gopher) g WHERE g.keep)
       |  AND doc_id IN (SELECT doc_id FROM ($rep) r WHERE r.keep)
       |  AND doc_id NOT IN (SELECT doc_id FROM ($decon) c
       |                     WHERE c.contaminated)
       |GROUP BY source ORDER BY source""".stripMargin
  }
}
