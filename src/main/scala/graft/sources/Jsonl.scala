package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gzipped-JSONL source/sink — the interchange format LLM data pipelines
  * actually speak (one JSON object per line, gzip per shard). Spark's
  * built-in json DataSource does the heavy lifting: the writer shards by
  * partition with `maxRecordsPerFile` bounding shard size, each gzip
  * member is one whole file (gzip is not splittable — record budgeting IS
  * the parallelism control at 100 TB, one task per shard on read), and
  * the reader takes an EXPLICIT schema so no inference pass ever scans
  * the corpus.
  *
  * The `src_jsonl_roundtrip` gate proves the round trip is the identity:
  * parquet documents → gzip JSONL shards → read back → per-source
  * counts + an exact 64-bit content checksum, compared against the DuckDB
  * oracle computed DIRECTLY on the parquet table.
  */
object Jsonl {

  /** Write `df` as gzipped JSONL under `path` (overwrite), sharded at
    * `maxRecordsPerShard` rows. */
  def write(df: DataFrame, path: String,
      maxRecordsPerShard: Long = 100000L): Unit =
    df.write.mode("overwrite")
      .option("compression", "gzip")
      .option("maxRecordsPerFile", maxRecordsPerShard)
      .json(path)

  /** Read a JSONL directory with an explicit schema (no inference job). */
  def read(s: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    s.read.schema(schema).json(path)

  /** The documents table round-tripped through gzip JSONL shards — the
    * staging directory is rewritten per call (cheap at gate scale; a
    * production conversion is a one-off job). */
  def documentsViaJsonl(s: SparkSession, dir: String,
      maxRecordsPerShard: Long = 200L): DataFrame = {
    val docs = Tables.documents(s, dir)
    val stage = java.nio.file.Paths.get("target", "jsonl-staging",
      s"docs_${Integer.toHexString(dir.hashCode)}").toString
    write(docs, stage, maxRecordsPerShard)
    read(s, stage, docs.schema)
  }

  /** Round-trip identity proof as a per-source aggregate: row counts,
    * doc_id sum, token total, and a 64-bit text checksum (md5-prefix as
    * integer, the engine-portable hash the sampling family uses). Any
    * encoding loss in the JSON hop — escaping, unicode, numeric
    * widening — breaks the checksum against the parquet-side oracle. */
  def roundTripReport(s: SparkSession, dir: String): DataFrame = {
    val toks = filter(split(col("text"), "\\s+"), t => t =!= "")
    documentsViaJsonl(s, dir)
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

  /** The SAME aggregate straight off the parquet table: round trip ≡
    * identity. */
  val roundTripOracle: String =
    """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(doc_id) AS BIGINT) AS id_sum,
      |  CAST(SUM(len([x FOR x IN string_split_regex(text, '\s+')
      |    IF x <> ''])) AS BIGINT) AS n_tokens,
      |  CAST(SUM(CAST('0x' || substr(md5(text), 1, 14) AS BIGINT))
      |    AS BIGINT) AS content_sum
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin
}
