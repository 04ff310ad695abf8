package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CSV source/sink — the lowest-common-denominator interchange format
  * (every engine and spreadsheet reads it; the reference family exposes
  * CSV scan providers next to parquet). Document text is hostile to CSV
  * by nature — embedded commas, quotes, and newlines — so the writer
  * quotes every field with RFC 4180 double-quote escaping and the reader
  * runs in `multiLine` mode.
  *
  * Scale contract, stated honestly: multiLine CSV is NOT splittable (a
  * quoted newline makes record boundaries undiscoverable mid-file), so —
  * exactly like the gzip-JSONL source — the writer's `maxRecordsPerFile`
  * record budget IS the read parallelism: one task per shard, shard count
  * chosen at write time. A corpus that needs splittable scans belongs in
  * parquet/ORC ([[Orc]]); CSV is the export/ingest edge, and the gate
  * proves that edge is lossless.
  */
object Csv {

  /** Write `df` as quoted CSV shards under `path` (overwrite). Every
    * field is quoted and quotes double (RFC 4180), so commas, quotes and
    * newlines in document text survive; `maxRecordsPerFile` bounds shard
    * size = read parallelism. */
  def write(df: DataFrame, path: String,
      maxRecordsPerShard: Long = 100000L): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("quoteAll", "true")
      .option("escape", "\"")
      .option("maxRecordsPerFile", maxRecordsPerShard)
      .csv(path)

  /** Read a CSV directory with an explicit schema (no inference pass) in
    * multiLine mode with RFC 4180 quote doubling. */
  def read(s: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    s.read.schema(schema)
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .csv(path)

  /** The documents table round-tripped through quoted CSV shards. */
  def documentsViaCsv(s: SparkSession, dir: String,
      maxRecordsPerShard: Long = 200L): DataFrame = {
    val docs = Tables.documents(s, dir)
    val stage = java.nio.file.Paths.get("target", "csv-staging",
      s"docs_${Integer.toHexString(dir.hashCode)}").toString
    write(docs, stage, maxRecordsPerShard)
    read(s, stage, docs.schema)
  }

  /** Round-trip identity proof — the same per-source checksum aggregate
    * as the JSONL and ORC gates, so all three source paths compare
    * directly against one oracle. Any quoting/escaping loss in the CSV
    * hop breaks the md5 content checksum. */
  def roundTripReport(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val toks = filter(split(col("text"), "\\s+"), t => t =!= "")
    documentsViaCsv(s, dir)
      .select(col("source"), col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        conv(substring(md5(col("text")), 1, 14), 16, 10).cast("long")
          .as("h"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_id")).as("id_sum"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("h")).as("content_sum"))
      .orderBy(col("source"))
  }

  /** Identical to the JSONL/ORC oracle: the round trip must be
    * invisible. */
  val roundTripOracle: String = Jsonl.roundTripOracle
}
