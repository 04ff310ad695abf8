package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables._

/** Training-sequence packing — the "concatenate and chop" stage that turns
  * a deduped, filtered corpus into fixed-length model input sequences.
  *
  * The industrial shape (GPT-style pre-training preprocessors): documents
  * are concatenated in a deterministic order and cut every `seqLen`
  * tokens, so no padding is wasted; each document therefore spans a
  * contiguous range of sequence ids. A single global concatenation order
  * would serialize the whole corpus through one cumulative sum, so —
  * exactly like the real pipelines that pack per output shard — documents
  * are first routed to a shard by a portable MD5 bucket of `doc_id`, and
  * the running token offset is computed per shard with a window:
  *
  *   - the shuffle is one hash partition by `shard` (embarrassingly
  *     parallel across shards; at 100 TB, shards = thousands of output
  *     files, each a bounded sort, the same cost as writing the file);
  *   - the per-shard prefix sum is the only order-dependent step, and it
  *     is exact integer arithmetic, so any engine reproduces it bitwise.
  *
  * Emits per document: its shard, token offset, and the first/last packed
  * sequence it lands in — the index a packed-dataset reader needs.
  */
object Packing {

  /** Portable MD5 shard in [0, nShards) of the document id (shared with
    * the streaming packer, [[graft.streaming.StreamOps.packingStream]]). */
  def shardOf(nShards: Int): org.apache.spark.sql.Column =
    conv(substring(md5(col("doc_id").cast("string")), 1, 14), 16, 10)
      .cast("long") % nShards

  def packSequences(s: SparkSession, dir: String, seqLen: Int = 64,
      nShards: Int = 8): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents(s, dir)
      .select(col("doc_id"), shardOf(nShards).as("shard"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
      .withColumn("tok_end", sum(col("n_tokens")).over(w))
      .withColumn("tok_start", col("tok_end") - col("n_tokens"))
      .select(col("doc_id"), col("shard"), col("n_tokens"), col("tok_start"),
        expr(s"tok_start div $seqLen").as("seq_first"),
        expr(s"(tok_end - 1) div $seqLen").as("seq_last"))
      .withColumn("n_seqs", col("seq_last") - col("seq_first") + lit(1L))
      .orderBy(col("doc_id"))
  }

  val packSequencesOracle: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    CAST('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,14) AS BIGINT) % 8
      |      AS shard,
      |    CAST(len(regexp_split_to_array(TRIM(text), '\s+')) AS BIGINT)
      |      AS n_tokens
      |  FROM documents
      |), o AS (
      |  SELECT doc_id, shard, n_tokens,
      |    CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS tok_end
      |  FROM d
      |)
      |SELECT doc_id, shard, n_tokens, tok_end - n_tokens AS tok_start,
      |  (tok_end - n_tokens) // 64 AS seq_first,
      |  (tok_end - 1) // 64 AS seq_last,
      |  (tok_end - 1) // 64 - (tok_end - n_tokens) // 64 + 1 AS n_seqs
      |FROM o ORDER BY doc_id""".stripMargin

  /** Shard-level packing summary: sequences produced and the padding-free
    * utilization of the final (only partially filled) sequence — the
    * numbers a packing job reports per output file. */
  def packStats(s: SparkSession, dir: String, seqLen: Int = 64,
      nShards: Int = 8): DataFrame =
    documents(s, dir)
      .select(shardOf(nShards).as("shard"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        expr(s"(n_tokens + ${seqLen - 1}) div $seqLen").as("n_seqs"),
        expr(s"n_tokens % $seqLen").as("tail_tokens"))
      .orderBy(col("shard"))

  val packStatsOracle: String =
    """SELECT
      |  CAST('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,14) AS BIGINT) % 8
      |    AS shard,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CAST(len(regexp_split_to_array(TRIM(text), '\s+'))
      |    AS BIGINT)) AS BIGINT) AS n_tokens,
      |  CAST((SUM(CAST(len(regexp_split_to_array(TRIM(text), '\s+'))
      |    AS BIGINT)) + 63) // 64 AS BIGINT) AS n_seqs,
      |  CAST(SUM(CAST(len(regexp_split_to_array(TRIM(text), '\s+'))
      |    AS BIGINT)) % 64 AS BIGINT) AS tail_tokens
      |FROM documents
      |GROUP BY 1 ORDER BY shard""".stripMargin
}
