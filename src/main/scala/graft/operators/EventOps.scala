package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables._

/** Time-series / event-log operators over the `events` table
  * (event_id, ts, user_id, event_type, value, props-json).
  *
  * Scale notes: hourly rollup is a single shuffle on (hour, event_type)
  * with partial aggregation; sessionization shuffles once on user_id and
  * sorts within partitions (Spark's window exec) — at 100 TB the user_id
  * hash partitioning distributes evenly because user cardinality is high.
  * Sums over the double `value` column are avoided in oracle-checked
  * queries (FP sums are order-dependent); min/max/count are exact.
  */
object EventOps {

  /** Tumbling-window rollup: events per hour × type. The batch analog of the
    * streaming aggregation in [[graft.streaming.StreamOps]]. */
  def hourlyRollup(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .orderBy(col("hour"), col("event_type"))

  val hourlyRollupOracle: String =
    """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  MIN(value) AS min_value, MAX(value) AS max_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Sessionization: a session breaks after 30 min of user inactivity.
    * lag + cumulative sum over a per-user window; all-integer arithmetic so
    * the oracle hash-matches. */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapMs = 30L * 60 * 1000
    events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          (col("ts").cast("timestamp").cast("long") -
            col("prev_ts").cast("timestamp").cast("long")) * 1000L > gapMs,
          lit(1L)).otherwise(lit(0L)))
      .withColumn("session_seq", sum(col("new_session"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  /** The same sessionization through Spark's NATIVE `session_window`
    * grouping — Catalyst's merging-session aggregate, the declare-it
    * path next to [[sessionize]]'s hand-built lag+cumsum: no window
    * function, no per-user sort in user code; the operator is the
    * standard one a cluster's AQE/codegen pipeline already optimizes,
    * and the identical grouping runs in Structured Streaming with
    * watermarked state eviction. Semantics differ from [[sessionize]]
    * deliberately: windows are [first, last+gap) and the break
    * comparison is at full microsecond precision (the built-in's
    * contract), so the oracle mirrors THAT — a boundary event exactly
    * `gap` after its predecessor starts a new session. */
  def sessionWindows(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").cast("timestamp_ntz")
          .as("session_start"),
        col("session_window.end").cast("timestamp_ntz").as("session_end"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start"))

  val sessionWindowsOracle: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
      |    CASE WHEN LAG(CAST(ts AS TIMESTAMP)) OVER w IS NULL
      |           OR CAST(ts AS TIMESTAMP) >=
      |              LAG(CAST(ts AS TIMESTAMP)) OVER w + INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
      |), sess AS (
      |  SELECT user_id, ts,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flagged
      |)
      |SELECT user_id, MIN(ts) AS session_start,
      |  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
      |  CAST(COUNT(*) AS BIGINT) AS n_events
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  val sessionizeOracle: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
      |    CASE WHEN LAG(CAST(ts AS TIMESTAMP)) OVER w IS NULL
      |           OR date_diff('second', LAG(CAST(ts AS TIMESTAMP)) OVER w, CAST(ts AS TIMESTAMP)) * 1000 > 1800000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
      |), sess AS (
      |  SELECT user_id, ts,
      |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM flagged
      |)
      |SELECT user_id, session_seq, COUNT(*) AS n_events,
      |  MIN(ts) AS session_start, MAX(ts) AS session_end
      |FROM sess
      |GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin

  /** Event-transition matrix: per user, consecutive event pairs in time
    * order counted corpus-wide — the Markov-edge / path-analysis
    * primitive of product analytics (which step follows which, and with
    * what probability). One exchange on user_id for the lag, then a
    * map-side-combinable pair count over the tiny (types × types) key
    * space; the transition probability is integer ppm over the from-type
    * total (same exact-arithmetic trick as TextOps.tfidf), computed by a
    * window over the already-aggregated matrix — no second pass over the
    * events. Deterministic: (ts, event_id) ordering fixes every lag
    * pair. */
  def transitions(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events(s, dir)
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type").as("from_type"),
        col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"),
        countDistinct(col("user_id")).as("n_users"))
      .withColumn("from_total", sum(col("n_transitions"))
        .over(Window.partitionBy(col("from_type"))))
      .withColumn("p_ppm",
        expr("(n_transitions * 1000000L) DIV from_total"))
      .select(col("from_type"), col("to_type"), col("n_transitions"),
        col("n_users"), col("p_ppm"))
      .orderBy(col("from_type"), col("to_type"))
  }

  val transitionsOracle: String =
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |    LAG(event_type) OVER (PARTITION BY user_id
      |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_type
      |  FROM events
      |), m AS (
      |  SELECT prev_type AS from_type, event_type AS to_type,
      |    COUNT(*) AS n_transitions,
      |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      |  FROM seq WHERE prev_type IS NOT NULL
      |  GROUP BY 1, 2
      |)
      |SELECT from_type, to_type, n_transitions, n_users,
      |  CAST((n_transitions * 1000000) //
      |    SUM(n_transitions) OVER (PARTITION BY from_type) AS BIGINT) AS p_ppm
      |FROM m
      |ORDER BY from_type, to_type""".stripMargin

  /** Semi-structured extraction: pull `k` out of the JSON props column and
    * histogram it per event type. */
  def propsHistogram(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .withColumn("k_bucket", floor(col("k") / 10).cast("int"))
      .groupBy(col("event_type"), col("k_bucket"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"), col("k_bucket"))

  val propsHistogramOracle: String =
    """SELECT event_type,
      |  CAST(FLOOR(CAST(json_extract_string(props, '$.k') AS INTEGER) / 10) AS INTEGER) AS k_bucket,
      |  COUNT(*) AS n,
      |  MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** AS-OF join (custom operator the reference family lacks natively):
    * for each purchase event, the most recent prior signup of the same user.
    * Implemented as a union-tag + window backfill — one shuffle on user_id,
    * no pairwise product, scales linearly (the classic distributed as-of
    * pattern; per-key sort is local to each partition). */
  def asofPurchaseSignup(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("is_p"))
    val signups = e.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("is_p"))
    // At equal ts, purchases sort BEFORE signups (is_p desc) so a signup at
    // exactly the purchase timestamp is excluded from the purchase's
    // preceding window — matching the oracle's strict s.ts < p.ts.
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_p").desc, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    purchases.union(signups)
      .withColumn("last_signup_ts",
        last(when(col("is_p") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("is_p") === 1)
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("last_signup_ts"))
      .orderBy(col("user_id"), col("purchase_id"))
  }

  /** Exact per-group median of `value` — computed from an explicit
    * deterministic rank (value, event_id tiebreak) instead of an
    * engine-specific percentile function, so any SQL engine reproduces it
    * bit-for-bit: median = mean of the one or two middle-ranked rows. */
  def valueMedian(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val wAll = Window.partitionBy(col("event_type"))
    events(s, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(wAll))
      .filter(col("rn") === expr("(cnt+1) div 2") ||
        col("rn") === expr("(cnt+2) div 2"))
      .groupBy(col("event_type"))
      .agg(((min(col("value")) + max(col("value"))) / 2).as("median_value"),
        min(col("cnt")).as("n_events"))
      .orderBy(col("event_type"))
  }

  val valueMedianOracle: String =
    """WITH ranked AS (
      |  SELECT event_type, value, event_id,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS cnt
      |  FROM events
      |)
      |SELECT event_type, (MIN(value) + MAX(value)) / 2 AS median_value,
      |  MIN(cnt) AS n_events
      |FROM ranked
      |WHERE rn = (cnt+1)//2 OR rn = (cnt+2)//2
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  val asofOracle: String =
    """SELECT p.user_id, p.event_id AS purchase_id,
      |  CAST(p.ts AS TIMESTAMP) AS purchase_ts,
      |  (SELECT MAX(CAST(s.ts AS TIMESTAMP)) FROM events s
      |   WHERE s.event_type = 'signup' AND s.user_id = p.user_id
      |     AND s.ts < p.ts) AS last_signup_ts
      |FROM events p
      |WHERE p.event_type = 'purchase'
      |ORDER BY p.user_id, purchase_id""".stripMargin

  /** Bucketed interval (range) join — the keyless case Spark would
    * otherwise plan as BroadcastNestedLoopJoin, i.e. all-pairs.
    *
    * Each signup opens a window [ts, ts+1h); for every window, count the
    * purchases (any user) falling inside it. There is no equi key, so the
    * scalable plan is manufactured: time is cut into epochs of the window
    * width, each window is replicated to the (≤ 2) epochs it overlaps, each
    * point maps to exactly one epoch, and the join becomes an equi-join on
    * the epoch — O(points + 2·windows) join input instead of
    * O(points × windows), and it shuffles instead of broadcasting, so
    * neither side needs to fit in memory. Hot epochs (time skew — load
    * spikes are the norm in event data) are spread by an additional salt
    * key: points salt by hash(id) % `salts`, windows replicate across all
    * salts. A matched pair meets in exactly one (epoch, salt) bucket, so no
    * post-join dedup is needed.
    *
    * A range-join operator is an explicit add-on beyond the reference
    * federation surface (which has no join operators of its own); the
    * pattern is the standard interval-bucketing used by Spark-native
    * range-join implementations. */
  def rangeJoinWindowCounts(s: SparkSession, dir: String,
      salts: Int = 4): DataFrame = {
    val widthMs = 3600000L // bucket width == window width ⇒ ≤ 2 epochs/window
    val e = events(s, dir)
    val wins = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("window_id"), col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL '1' HOUR")).as("w_end"))
    val pts = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"), col("value"))
    def epochOf(ts: Column): Column =
      floor(unix_millis(ts.cast("timestamp")) / widthMs)
    // explode_outer: a NULL-ts window yields one NULL-epoch replica that
    // can never match (left join still surfaces it with n_purchases=0),
    // matching the oracle's LEFT JOIN semantics — plain explode would drop
    // the row entirely
    val winRep = wins
      .withColumn("epoch",
        explode_outer(sequence(epochOf(col("w_start")), epochOf(col("w_end")))))
      .withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
    val ptsKeyed = pts
      .withColumn("p_epoch", epochOf(col("p_ts")))
      .withColumn("p_salt", pmod(xxhash64(col("p_id")), lit(salts.toLong))
        .cast("int"))
    winRep.join(ptsKeyed,
        col("epoch") === col("p_epoch") && col("salt") === col("p_salt") &&
          col("p_ts") >= col("w_start") && col("p_ts") < col("w_end"),
        "left")
      .groupBy(col("window_id"))
      .agg(count(col("p_id")).as("n_purchases"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .orderBy(col("window_id"))
  }

  // ns→µs floor on both comparison sides (CAST ... AS TIMESTAMP) to match
  // Spark's µs events view — see Tables.events.
  val rangeJoinOracle: String =
    """SELECT s.event_id AS window_id,
      |  COUNT(p.event_id) AS n_purchases,
      |  MIN(p.value) AS min_value, MAX(p.value) AS max_value
      |FROM events s LEFT JOIN events p
      |  ON p.event_type = 'purchase'
      | AND CAST(p.ts AS TIMESTAMP) >= CAST(s.ts AS TIMESTAMP)
      | AND CAST(p.ts AS TIMESTAMP) < CAST(s.ts AS TIMESTAMP) + INTERVAL 1 HOUR
      |WHERE s.event_type = 'signup'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Exact per-group quantiles (p25/p50/p75/p90) by the nearest-rank
    * definition: value at rank ⌈p·n/100⌉ under a deterministic total order
    * (value, event_id). All-integer rank arithmetic — any engine
    * reproduces it bitwise, unlike interpolating percentile functions.
    * One shuffle (the per-group window); the filter keeps ≤4 rows per
    * group, so the final aggregate is negligible at any scale. */
  def valueQuantiles(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val wAll = Window.partitionBy(col("event_type"))
    def rankOf(p: Int) = expr(s"($p * cnt + 99) div 100")
    val ranked = events(s, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(wAll))
    ranked
      .filter(Seq(25, 50, 75, 90).map(p => col("rn") === rankOf(p))
        .reduce(_ || _))
      .groupBy(col("event_type"))
      .agg(
        min(when(col("rn") === rankOf(25), col("value"))).as("p25"),
        min(when(col("rn") === rankOf(50), col("value"))).as("p50"),
        min(when(col("rn") === rankOf(75), col("value"))).as("p75"),
        min(when(col("rn") === rankOf(90), col("value"))).as("p90"),
        min(col("cnt")).as("n_events"))
      .orderBy(col("event_type"))
  }

  /** Approximate quantiles from a log₂-binned histogram — the SCALE path
    * next to [[valueQuantiles]]'s exact selection: the exact form shuffles
    * and window-sorts every row per group (O(n log n) at 100 TB), while
    * this reduces the corpus to ≤64 (type, bin) rows in ONE map-side-
    * combined aggregate — the classic fixed-memory quantile sketch, made
    * engine-portable by using only integer arithmetic (value → cents via
    * floor, bin = bit length of cents, estimate = bin upper bound 2^b − 1;
    * no transcendental log whose last ulp differs across engines). The
    * estimate overshoots the true quantile by at most 2× (bin width) —
    * spec-asserted against the exact quantiles. */
  def quantileSketch(s: SparkSession, dir: String): DataFrame = {
    val hist = events(s, dir)
      .select(col("event_type"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
      .select(col("event_type"),
        when(col("cents") <= 0, lit(0))
          .otherwise(length(conv(col("cents"), 10, 2))).as("bin"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("bin"))
    val wAll = Window.partitionBy(col("event_type"))
    val cum = hist
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
    def est(p: Int) =
      min(when(col("cum") >= expr(s"($p * n + 99) div 100"),
        expr("shiftleft(1L, bin) - 1L"))).as(s"est_p${p}_cents")
    cum.groupBy(col("event_type"))
      .agg(min(col("n")).as("n_events"),
        count(lit(1)).as("bins_used"),
        est(25), est(50), est(75), est(90))
      .orderBy(col("event_type"))
  }

  val quantileSketchOracle: String =
    """WITH b AS (
      |  SELECT event_type,
      |    CASE WHEN CAST(floor(value * 100) AS BIGINT) <= 0 THEN 0
      |         ELSE CAST(length(bin(CAST(floor(value * 100) AS BIGINT)))
      |           AS INTEGER) END AS bin
      |  FROM events
      |), hist AS (
      |  SELECT event_type, bin, COUNT(*) AS c FROM b GROUP BY 1, 2
      |), cum AS (
      |  SELECT event_type, bin, c,
      |    SUM(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
      |    SUM(c) OVER (PARTITION BY event_type) AS n
      |  FROM hist
      |)
      |SELECT event_type,
      |  CAST(MIN(n) AS BIGINT) AS n_events,
      |  CAST(COUNT(*) AS BIGINT) AS bins_used,
      |  CAST(MIN(CASE WHEN cum >= (25 * n + 99) // 100
      |    THEN (1::BIGINT << bin) - 1 END) AS BIGINT) AS est_p25_cents,
      |  CAST(MIN(CASE WHEN cum >= (50 * n + 99) // 100
      |    THEN (1::BIGINT << bin) - 1 END) AS BIGINT) AS est_p50_cents,
      |  CAST(MIN(CASE WHEN cum >= (75 * n + 99) // 100
      |    THEN (1::BIGINT << bin) - 1 END) AS BIGINT) AS est_p75_cents,
      |  CAST(MIN(CASE WHEN cum >= (90 * n + 99) // 100
      |    THEN (1::BIGINT << bin) - 1 END) AS BIGINT) AS est_p90_cents
      |FROM cum
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  val valueQuantilesOracle: String =
    """WITH ranked AS (
      |  SELECT event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY value, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS cnt
      |  FROM events
      |)
      |SELECT event_type,
      |  MIN(CASE WHEN rn = (25 * cnt + 99) // 100 THEN value END) AS p25,
      |  MIN(CASE WHEN rn = (50 * cnt + 99) // 100 THEN value END) AS p50,
      |  MIN(CASE WHEN rn = (75 * cnt + 99) // 100 THEN value END) AS p75,
      |  MIN(CASE WHEN rn = (90 * cnt + 99) // 100 THEN value END) AS p90,
      |  MIN(cnt) AS n_events
      |FROM ranked
      |WHERE rn = (25 * cnt + 99) // 100 OR rn = (50 * cnt + 99) // 100
      |   OR rn = (75 * cnt + 99) // 100 OR rn = (90 * cnt + 99) // 100
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** IQR-fence outlier detection per event type (Tukey fences: outside
    * [p25 − 1.5·IQR, p75 + 1.5·IQR]) — the data-cleaning screen a metrics
    * pipeline runs before aggregating a value column. Quartiles are EXACT
    * selections (same ceil-rank construction as [[valueQuantiles]]), so
    * unlike mean/stddev z-scores there is no order-dependent FP summation
    * anywhere: the result hash-matches the oracle bitwise.
    *
    * Scale shape: one sort per event_type partition for the ranks (the
    * accepted exact-quantile cost; approx quantiles would drop the sort),
    * then the 5-row fence table '''broadcasts''' back onto the events for
    * a map-side-combined count — the corpus is never re-shuffled. */
  /** The per-type Tukey fence table (event_type, p25, p75, lo, hi) —
    * tiny (one row per event type), broadcast by both the batch
    * [[anomalies]] screen and the streaming in-flight tagger
    * ([[graft.streaming.StreamOps.anomalyTagStream]] stream-static join). */
  def iqrFences(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val wAll = Window.partitionBy(col("event_type"))
    def rankOf(p: Int) = expr(s"($p * cnt + 99) div 100")
    val ranked = events(s, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(wAll))
    ranked
      .filter(col("rn") === rankOf(25) || col("rn") === rankOf(75))
      .groupBy(col("event_type"))
      .agg(min(when(col("rn") === rankOf(25), col("value"))).as("p25"),
        min(when(col("rn") === rankOf(75), col("value"))).as("p75"))
      .withColumn("lo", col("p25") - (col("p75") - col("p25")) * lit(1.5))
      .withColumn("hi", col("p75") + (col("p75") - col("p25")) * lit(1.5))
  }

  def anomalies(s: SparkSession, dir: String): DataFrame = {
    events(s, dir).join(broadcast(iqrFences(s, dir)), Seq("event_type"))
      .groupBy(col("event_type"), col("p25"), col("p75"),
        col("lo"), col("hi"))
      .agg(count(lit(1)).as("n_events"),
        count(when(col("value") < col("lo") || col("value") > col("hi"),
          1)).as("n_outliers"),
        min(when(col("value") < col("lo"), col("value")))
          .as("min_outlier"),
        max(when(col("value") > col("hi"), col("value")))
          .as("max_outlier"))
      .orderBy(col("event_type"))
  }

  val anomaliesOracle: String =
    """WITH ranked AS (
      |  SELECT event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY value, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS cnt
      |  FROM events
      |), q AS (
      |  SELECT event_type,
      |    MIN(CASE WHEN rn = (25 * cnt + 99) // 100 THEN value END) AS p25,
      |    MIN(CASE WHEN rn = (75 * cnt + 99) // 100 THEN value END) AS p75
      |  FROM ranked
      |  WHERE rn = (25 * cnt + 99) // 100 OR rn = (75 * cnt + 99) // 100
      |  GROUP BY event_type
      |), b AS (
      |  SELECT event_type, p25, p75,
      |    p25 - (p75 - p25) * CAST(1.5 AS DOUBLE) AS lo,
      |    p75 + (p75 - p25) * CAST(1.5 AS DOUBLE) AS hi
      |  FROM q
      |)
      |SELECT e.event_type, b.p25, b.p75, b.lo, b.hi,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(COUNT(CASE WHEN e.value < b.lo OR e.value > b.hi THEN 1 END)
      |    AS BIGINT) AS n_outliers,
      |  MIN(CASE WHEN e.value < b.lo THEN e.value END) AS min_outlier,
      |  MAX(CASE WHEN e.value > b.hi THEN e.value END) AS max_outlier
      |FROM events e JOIN b ON e.event_type = b.event_type
      |GROUP BY e.event_type, b.p25, b.p75, b.lo, b.hi
      |ORDER BY e.event_type""".stripMargin

  /** Ordered funnel signup → view → purchase: a step counts only when it
    * happens strictly after the user's previous completed step.
    *
    * One shuffle on user_id: both chained "earliest prior qualifying
    * event" computations are windows over the SAME (partition, order), so
    * Catalyst stacks the two Window nodes on one exchange + one sort — no
    * self-joins, no per-step passes. Linear at 100 TB. */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    val prior = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events(s, dir)
      .withColumn("prior_signup_ts",
        min(when(col("event_type") === "signup", col("ts"))).over(prior))
      .withColumn("prior_view_ts",
        min(when(col("event_type") === "view" &&
          col("prior_signup_ts").isNotNull, col("ts"))).over(prior))
      .groupBy(col("user_id"))
      .agg(
        max(when(col("event_type") === "signup", 1).otherwise(0)).as("s1"),
        max(when(col("event_type") === "view" &&
          col("prior_signup_ts").isNotNull, 1).otherwise(0)).as("s2"),
        max(when(col("event_type") === "purchase" &&
          col("prior_view_ts").isNotNull, 1).otherwise(0)).as("s3"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(col("s1")).as("n_signup"),
        sum(col("s2")).as("n_view_after_signup"),
        sum(col("s3")).as("n_purchase_after_view"))
  }

  val funnelOracle: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events
      |), w1 AS (
      |  SELECT *, MIN(CASE WHEN event_type = 'signup' THEN ts END) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_signup_ts
      |  FROM e
      |), w2 AS (
      |  SELECT *, MIN(CASE WHEN event_type = 'view'
      |      AND prior_signup_ts IS NOT NULL THEN ts END) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_view_ts
      |  FROM w1
      |), u AS (
      |  SELECT user_id,
      |    MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS s1,
      |    MAX(CASE WHEN event_type = 'view'
      |        AND prior_signup_ts IS NOT NULL THEN 1 ELSE 0 END) AS s2,
      |    MAX(CASE WHEN event_type = 'purchase'
      |        AND prior_view_ts IS NOT NULL THEN 1 ELSE 0 END) AS s3
      |  FROM w2 GROUP BY user_id
      |)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
      |  CAST(SUM(s1) AS BIGINT) AS n_signup,
      |  CAST(SUM(s2) AS BIGINT) AS n_view_after_signup,
      |  CAST(SUM(s3) AS BIGINT) AS n_purchase_after_view
      |FROM u""".stripMargin

  /** Cohort retention: users grouped by the calendar day of their first
    * event; for each day offset 0..7, how many of the cohort were active.
    *
    * Scale: the cohort-day aggregate and the events join share the
    * user_id hash partitioning (co-partitioned shuffle reuse); the final
    * rollup is a small (days × 8) result. */
  def retention(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohorts = e.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    e.join(cohorts, "user_id")
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")))
      .filter(col("day_offset") <= 7)
      // timestamp_ntz output: DATE columns round-trip as datetimes through
      // parquet/pandas, so both sides emit naive midnight timestamps
      .groupBy(col("cohort_day").cast("timestamp_ntz").as("cohort_day"),
        col("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  val retentionOracle: String =
    """WITH e AS (
      |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
      |  FROM events
      |), f AS (
      |  SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id
      |)
      |SELECT CAST(f.cohort_day AS TIMESTAMP) AS cohort_day,
      |  CAST(date_diff('day', f.cohort_day, e.day) AS INTEGER) AS day_offset,
      |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
      |FROM e JOIN f USING (user_id)
      |WHERE date_diff('day', f.cohort_day, e.day) <= 7
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Conversion-lag histogram: per user, the time from FIRST signup to
    * the first purchase at-or-after it, bucketed into product-analytics
    * lag bands (<1h, <1d, <7d, ≥7d, never) — the windowed sibling of
    * [[funnel]]: not just whether the user converted, but how fast.
    *
    * Lag arithmetic is integer microseconds end-to-end (`unix_micros` /
    * DuckDB `epoch_us`, floor-divided to seconds) so the bucket edges and
    * sums are engine-exact — a float `epoch()` would round where Spark's
    * long cast truncates.
    *
    * Scale shape: two filtered per-user aggregates shuffle on user_id and
    * join co-partitioned (signups inner-join purchases on the same key,
    * non-converts recovered by the left join), then a 5-row map-side-
    * combined rollup. No window over the full event stream, no
    * re-shuffle after the first exchange. */
  def conversionLag(s: SparkSession, dir: String): DataFrame = {
    val micros = unix_micros(col("ts").cast("timestamp"))
    val e = events(s, dir).select(col("user_id"),
      col("event_type"), micros.as("us"))
    val su = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("us")).as("s_us"))
    val pu = e.filter(col("event_type") === "purchase")
      .join(su, Seq("user_id"))
      .filter(col("us") >= col("s_us"))
      .groupBy(col("user_id")).agg(min(col("us")).as("p_us"))
    val lag = su.join(pu, Seq("user_id"), "left")
      .withColumn("lag_s", expr("(p_us - s_us) div 1000000L"))
    lag
      .withColumn("bucket",
        when(col("lag_s").isNull, "4_none")
          .when(col("lag_s") < 3600L, "0_lt_1h")
          .when(col("lag_s") < 86400L, "1_lt_1d")
          .when(col("lag_s") < 604800L, "2_lt_7d")
          .otherwise("3_ge_7d"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_users"),
        min(col("lag_s")).as("min_lag_s"),
        max(col("lag_s")).as("max_lag_s"),
        sum(col("lag_s")).as("sum_lag_s"))
      .orderBy(col("bucket"))
  }

  val conversionLagOracle: String =
    """WITH e AS (
      |  SELECT user_id, event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |  FROM events
      |), su AS (
      |  SELECT user_id, MIN(us) AS s_us FROM e
      |  WHERE event_type = 'signup' GROUP BY user_id
      |), pu AS (
      |  SELECT e.user_id, MIN(e.us) AS p_us
      |  FROM e JOIN su ON su.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.us >= su.s_us
      |  GROUP BY e.user_id
      |), lg AS (
      |  SELECT su.user_id, (pu.p_us - su.s_us) // 1000000 AS lag_s
      |  FROM su LEFT JOIN pu ON pu.user_id = su.user_id
      |)
      |SELECT CASE WHEN lag_s IS NULL THEN '4_none'
      |  WHEN lag_s < 3600 THEN '0_lt_1h'
      |  WHEN lag_s < 86400 THEN '1_lt_1d'
      |  WHEN lag_s < 604800 THEN '2_lt_7d'
      |  ELSE '3_ge_7d' END AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_users,
      |  MIN(lag_s) AS min_lag_s, MAX(lag_s) AS max_lag_s,
      |  CAST(SUM(lag_s) AS BIGINT) AS sum_lag_s
      |FROM lg GROUP BY 1 ORDER BY 1""".stripMargin
}
