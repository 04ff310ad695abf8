package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Early testdata drops stored events.ts as NANOSECOND timestamps, which
    * Spark's parquet reader rejects ([PARQUET_TYPE_ILLEGAL]); current drops
    * store microseconds, which read natively as TIMESTAMP_NTZ. Keep the
    * nanosAsLong conf so nano files read as raw int64 (converted in
    * [[events]] with integer µs division — floor semantics, matching
    * DuckDB's `CAST(ts_ns AS TIMESTAMP)` truncation); micro files are
    * unaffected by the conf and pass through as NTZ. */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
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
