package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

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

  /** Streaming hourly rollup over a file source feeding `events`-schema
    * parquet. Append mode + 1h watermark. */
  def hourlyRollupStream(spark: SparkSession, dir: String): DataFrame = {
    // schema as stored (ts = int64 nanos; see Tables.eventsRaw)
    val schema = Tables.eventsRaw(spark, dir).schema
    spark.readStream
      .schema(schema)
      // the file source requires a directory; glob-filter to the events file
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      // watermarks require TIMESTAMP (not NTZ); output is cast back below
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), max(col("value")).as("max_value"))
      .select(col("window.start").cast("timestamp_ntz").as("hour"),
        col("event_type"), col("n_events"), col("max_value"))
  }

  /** Run the streaming rollup to completion against the (static) test
    * directory via the in-memory sink; returns the finished table. Used by
    * tests and the `stream_hourly` query entry. */
  def runToMemory(spark: SparkSession, dir: String,
      name: String = "stream_out"): DataFrame = {
    // The stateful aggregation keys (hour × event_type) number in the low
    // thousands; 32 state partitions would mean 32 state-store checkpoints
    // per batch for no parallelism benefit. Shuffle-partition count is
    // captured at stream start, so narrow it just for this query.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val q: StreamingQuery = hourlyRollupStream(spark, dir).writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
      q.processAllAvailable()
      q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.table(name)
  }
}
