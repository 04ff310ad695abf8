package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ORC source/sink — the splittable columnar interchange format next to
  * parquet (reference-family engines read/write it natively; Spark ships
  * a vectorized ORC reader with predicate pushdown and column pruning).
  * Where gzip-JSONL shards ([[Jsonl]]) are opaque byte streams whose
  * parallelism is fixed at write time by record budgeting, ORC stripes
  * split on read — a 100 TB corpus re-parallelizes to any cluster size —
  * and min/max stripe statistics let a `doc_id`/`source` predicate skip
  * whole stripes without decoding them.
  *
  * The `src_orc_roundtrip` gate proves the hop is the identity with the
  * same per-source checksum aggregate as the JSONL gate, against the
  * DuckDB oracle computed directly on the parquet table; the spec
  * additionally pins that a filter over the ORC read reaches the scan as
  * a pushed filter (the property the format is chosen FOR).
  */
object Orc {

  /** Write `df` as zlib ORC under `path` (overwrite), sorted within
    * partitions by `sortCols` so stripe min/max statistics are tight —
    * the difference between a pushed filter skipping stripes and merely
    * evaluating early. */
  def write(df: DataFrame, path: String, sortCols: Seq[String]): Unit = {
    val sorted =
      if (sortCols.isEmpty) df
      else df.sortWithinPartitions(sortCols.map(col): _*)
    sorted.write.mode("overwrite")
      .option("compression", "zlib")
      .orc(path)
  }

  /** Read an ORC directory with an explicit schema (no inference job). */
  def read(s: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    s.read.schema(schema).orc(path)

  /** The documents table round-tripped through sorted ORC. */
  def documentsViaOrc(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val stage = java.nio.file.Paths.get("target", "orc-staging",
      s"docs_${Integer.toHexString(dir.hashCode)}").toString
    write(docs, stage, sortCols = Seq("doc_id"))
    read(s, stage, docs.schema)
  }

  /** Round-trip identity proof — the same per-source counts + 64-bit
    * content checksum as [[Jsonl.roundTripReport]], so the two source
    * gates are directly comparable. */
  def roundTripReport(s: SparkSession, dir: String): DataFrame = {
    val toks = filter(split(col("text"), "\\s+"), t => t =!= "")
    documentsViaOrc(s, dir)
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

  /** Identical to the JSONL oracle: the round trip must be invisible. */
  val roundTripOracle: String = Jsonl.roundTripOracle
}
