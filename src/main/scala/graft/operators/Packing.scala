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

  /** The MATERIALIZING packer: turns per-document token-id arrays into
    * fixed-length packed sequences — the `array<int>` rows a trainer's
    * data loader actually reads — with one writer task per shard block.
    *
    * `ids` is any deterministic per-document token-id Column
    * (`array<int>`): the production tokenizer is the trained BPE codec
    * ([[graft.functions.BpeCodec.idsText]]); the oracle gate uses a
    * hash-id tokenizer so the WHOLE pipeline (routing, ordering,
    * chopping, id integrity per position) is engine-checkable.
    *
    * Scale shape: ONE shuffle (hash partition by shard), then a single
    * streaming pass per partition — documents arrive shard-contiguous and
    * doc_id-ordered (`sortWithinPartitions`), the chopper carries at most
    * `seqLen − 1` buffered tokens across documents, and every shard's
    * sequences are emitted in order with ids `0..n−1`. Nothing is
    * collected; at 100 TB, `nShards` is thousands and each task streams
    * its shards' documents once. The final partial sequence per shard is
    * emitted SHORT (no padding), matching [[packStats]]'s `tail_tokens`
    * accounting. */
  def packTokens(docs: DataFrame, ids: org.apache.spark.sql.Column,
      seqLen: Int, nShards: Int): DataFrame = {
    require(seqLen > 0 && nShards > 0,
      s"packTokens: seqLen=$seqLen nShards=$nShards must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val prepared = docs
      .select(shardOf(nShards).as("shard"),
        col("doc_id").cast("long").as("doc_id"),
        ids.cast("array<int>").as("ids"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "doc_id")
      .as[(Long, Long, Array[Int])]
    prepared.mapPartitions { docsIt =>
      new Iterator[(Long, Long, Array[Int])] {
        private var curShard = Long.MinValue
        private var nextSeqId = 0L
        private val buf = new scala.collection.mutable.ArrayBuffer[Int]
        private val pending =
          new scala.collection.mutable.Queue[(Long, Long, Array[Int])]
        private def flushTail(): Unit =
          if (buf.nonEmpty) {
            pending.enqueue((curShard, nextSeqId, buf.toArray))
            buf.clear()
            nextSeqId += 1
          }
        private def fill(): Unit = {
          while (pending.isEmpty && docsIt.hasNext) {
            val (shard, _, docIds) = docsIt.next()
            if (shard != curShard) {
              flushTail()
              curShard = shard
              nextSeqId = 0L
            }
            var i = 0
            while (i < docIds.length) {
              buf += docIds(i)
              if (buf.length == seqLen) {
                pending.enqueue((curShard, nextSeqId, buf.toArray))
                buf.clear()
                nextSeqId += 1
              }
              i += 1
            }
          }
          if (pending.isEmpty && !docsIt.hasNext) flushTail()
        }
        override def hasNext: Boolean = { fill(); pending.nonEmpty }
        override def next(): (Long, Long, Array[Int]) = {
          fill(); pending.dequeue()
        }
      }
    }.toDF("shard", "seq_id", "ids")
  }

  /** Write packed sequences as a per-shard parquet tree
    * (`shard=N/part-….parquet`) — rows are already shard-contiguous from
    * [[packTokens]]'s partitioning, so each task writes whole shard
    * files, no second shuffle. */
  def packWrite(packed: DataFrame, outDir: String): Unit =
    packed.write.mode("overwrite").partitionBy("shard").parquet(outDir)

  /** Round-trip identity gate: pack with a HASH-id tokenizer (28-bit md5
    * prefix per whitespace token — the engine can recompute every id),
    * write the per-shard tree, READ IT BACK, and reduce each stored
    * sequence to order-sensitive invariants (count, sum, position-
    * weighted sum). The oracle rebuilds the same packing arithmetic from
    * `documents` alone — any gap, overlap, misroute, reorder, or id
    * corruption in the written files breaks a position-weighted sum. */
  def packWriteRoundtrip(s: SparkSession, dir: String, seqLen: Int = 64,
      nShards: Int = 8): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    val hashIds = transform(toks,
      w => conv(substring(md5(w), 1, 7), 16, 10).cast("int"))
    val out = s"target/pack-roundtrip-${Math.abs(dir.hashCode)}"
    packWrite(packTokens(documents(s, dir), hashIds, seqLen, nShards), out)
    s.read.parquet(out)
      .select(col("shard").cast("long").as("shard"), col("seq_id"),
        posexplode(col("ids")).as(Seq("p", "id")))
      .groupBy(col("shard"), col("seq_id"))
      .agg(count(lit(1)).as("n_toks"),
        sum(col("id").cast("long")).as("sum_ids"),
        sum((col("p") + 1).cast("long") * col("id")).as("pos_weighted"))
      .orderBy(col("shard"), col("seq_id"))
  }

  val packWriteRoundtripOracle: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    CAST('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,14) AS BIGINT) % 8
      |      AS shard,
      |    regexp_split_to_array(TRIM(text), '\s+') AS toks
      |  FROM documents
      |), o AS (
      |  SELECT doc_id, shard, toks,
      |    CAST(SUM(len(toks)) OVER (PARTITION BY shard ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      - len(toks) AS tok_start
      |  FROM d
      |), t AS (
      |  SELECT shard, tok_start + i - 1 AS gpos,
      |    CAST('0x'||substr(md5(toks[i]),1,7) AS BIGINT) AS id
      |  FROM o, UNNEST(range(1, len(toks) + 1)) AS r(i)
      |)
      |SELECT shard, gpos // 64 AS seq_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_toks,
      |  CAST(SUM(id) AS BIGINT) AS sum_ids,
      |  CAST(SUM((gpos % 64 + 1) * id) AS BIGINT) AS pos_weighted
      |FROM t GROUP BY 1, 2 ORDER BY shard, seq_id""".stripMargin

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
