package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.jdk.CollectionConverters._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All operators take `(spark, sfDir)` and resolve tables here so the same
  * query text runs at any scale factor. At 100 TB these would be
  * catalog tables backed by partitioned parquet/iceberg; `spark.read.parquet`
  * on a directory keeps the scan path identical (splittable files, column
  * pruning + predicate pushdown handled by the parquet DataSource v2).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Inferred parquet schemas, cached per (dir, table): without an
    * explicit schema every `spark.read.parquet` runs a footer-inference
    * job before the real query (measured: one job of ~10% of a warm
    * gate's wall time, per table touched, per invocation — across 221
    * gates x 3 bench iterations that is thousands of redundant footer
    * reads). The cache holds METADATA only — the catalog-table schema a
    * production deployment would resolve from its metastore — so every
    * query still computes from the parquet data. */
  private val schemaCache = scala.collection.concurrent.TrieMap
    .empty[(String, String), org.apache.spark.sql.types.StructType]

  /** The reader DataFrame itself is also reused per (session, dir,
    * table): it is an immutable logical plan (relation + file index),
    * not data — every query composed on top still scans parquet. This
    * drops the per-build file-index setup (~40 ms measured) on top of
    * the inference job the schema cache removes.
    *
    * Keyed WEAKLY on the session OBJECT (not an identity hash, which
    * recycles after GC and once handed a later test suite a DataFrame
    * whose SparkContext was already stopped): a stopped, dereferenced
    * session's entry is collected with the session, and a live entry can
    * only ever be served back to the exact session that built it. The
    * per-session map is still re-validated against `isStopped` so a
    * caller holding a stopped session never gets a stale plan either. */
  private val frameCache = new java.util.WeakHashMap[
    SparkSession,
    scala.collection.concurrent.TrieMap[(String, String), DataFrame]]()

  private def readCached(spark: SparkSession, dir: String,
      name: String): DataFrame = {
    val perSession = frameCache.synchronized {
      var m = frameCache.get(spark)
      if (m == null || spark.sparkContext.isStopped) {
        m = scala.collection.concurrent.TrieMap
          .empty[(String, String), DataFrame]
        frameCache.put(spark, m)
      }
      m
    }
    perSession.getOrElseUpdate((dir, name), {
      val path = s"$dir/$name.parquet"
      val schema = schemaCache.getOrElseUpdate((dir, name),
        spark.read.parquet(path).schema)
      spark.read.schema(schema).parquet(path)
    })
  }

  /** Evict the cached schema and reader plans for a data directory —
    * the release hook every other keyed cache in the repo provides
    * (Similarity.releaseIvfIndex, Dedup.releaseComponents): a corpus
    * rewritten under the same path must not be served a stale schema or
    * file index. */
  def releaseTables(dir: String): Unit = {
    schemaCache.keys.filter(_._1 == dir).foreach(schemaCache.remove)
    frameCache.synchronized {
      frameCache.values.asScala.foreach { m =>
        m.keys.filter(_._1 == dir).foreach(m.remove)
      }
    }
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else readCached(spark, dir, name)

  /** Early testdata drops stored events.ts as NANOSECOND timestamps, which
    * Spark's parquet reader rejects ([PARQUET_TYPE_ILLEGAL]); current drops
    * store microseconds, which read natively as TIMESTAMP_NTZ. Keep the
    * nanosAsLong conf so nano files read as raw int64 (converted in
    * [[events]] with integer µs division — floor semantics, matching
    * DuckDB's `CAST(ts_ns AS TIMESTAMP)` truncation); micro files are
    * unaffected by the conf and pass through as NTZ. */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    readCached(spark, dir, "events")
  }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = eventsRaw(s, d)
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      // timestamp_ntz to match how Spark 4 reads naive parquet timestamps
      // (and how DuckDB sees them) — session TZ is UTC everywhere.
      raw.withColumn("ts", org.apache.spark.sql.functions
        .expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz"))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Register every table as a temp view in the given session. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
