package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, plus decode / feature-extract / resize / frame-sample stages.
  *
  * The container has no image/audio codecs, so the decode kernels are
  * STUBBED with a deterministic fake (byte-statistics standing in for
  * pixel decoding — clearly marked below). Everything Spark-side is real:
  * the binary schema, the typed metadata struct, partition-preserving
  * `mapPartitions` batching (the Scala analog of `mapInPandas` — one
  * iterator per partition, constant memory), and the feature schema.
  *
  * At 100 TB: media bytes never shuffle — every stage below is a narrow
  * map over the scan; only extracted (small) features flow onward.
  */
object Multimodal {

  /** Typed per-item decoded metadata. */
  case class MediaMeta(width: Int, height: Int, channels: Int, format: String)

  case class MediaRow(doc_id: Long, media: Array[Byte], media_type: String)

  case class MediaFeature(doc_id: Long, n_bytes: Long, width: Int,
      height: Int, channels: Int, format: String, mean_byte: Double,
      feature: Array[Float])

  /** Build an opaque binary "media" column from the documents table (the
    * testdata carries no real media; utf-8 bytes stand in — the plumbing is
    * type-correct for any blob). */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      (when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4")).as("media_type"))

  /** STUB decode kernel: a real build would call an image/audio codec here
    * (???). Deterministic fake: metadata derived from the byte stream. */
  private def decodeStub(bytes: Array[Byte], mediaType: String): MediaMeta = {
    // ??? — codec unavailable in this container; deterministic fake below.
    val h = java.util.Arrays.hashCode(bytes)
    MediaMeta(
      width = 64 + math.abs(h % 1024),
      height = 64 + math.abs((h / 1024) % 1024),
      channels = if (mediaType.startsWith("image")) 3 else 1,
      format = mediaType.substring(mediaType.indexOf('/') + 1))
  }

  /** STUB feature extractor (resize + embed in a real pipeline): fixed-width
    * float vector from strided byte statistics. */
  private def featureStub(bytes: Array[Byte], dim: Int = 8): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) { out(i % dim) += (bytes(i) & 0xff) / 255.0f; i += 1 }
    out
  }

  /** Decode + feature-extract over media batches. `mapPartitions` keeps the
    * per-partition iterator streaming (no materialization), matching the
    * batch shape a Pandas-UDF/`mapInPandas` stage would have. */
  def decodeAndFeaturize(s: SparkSession, dir: String): Dataset[MediaFeature] = {
    import s.implicits._
    mediaTable(s, dir).as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val meta = decodeStub(r.media, r.media_type)
        var sum = 0L
        r.media.foreach(b => sum += (b & 0xff))
        MediaFeature(r.doc_id, r.media.length.toLong, meta.width, meta.height,
          meta.channels, meta.format,
          if (r.media.length == 0) 0.0 else sum.toDouble / r.media.length,
          featureStub(r.media))
      }
    }
  }

  /** Frame sampling for video-typed rows: emit every `stride`-th "frame"
    * (fixed-size byte windows of the blob — the real kernel would demux).
    * One row in, few rows out: `flatMap`, still narrow. */
  def sampleFrames(s: SparkSession, dir: String, frameBytes: Int = 64,
      stride: Int = 4): DataFrame = {
    import s.implicits._
    mediaTable(s, dir).filter(col("media_type") === "video/mp4")
      .as[MediaRow]
      .flatMap { r =>
        val nFrames = r.media.length / frameBytes
        (0 until nFrames by stride).map { f =>
          val frame = java.util.Arrays.copyOfRange(
            r.media, f * frameBytes, (f + 1) * frameBytes)
          (r.doc_id, f, frame.length, java.util.Arrays.hashCode(frame))
        }
      }
      .toDF("doc_id", "frame_idx", "frame_bytes", "frame_hash")
  }

  /** Oracle-comparable slice of the media pipeline: byte length and
    * media-type routing are exact (the fake decode stays out of the oracle).
    */
  def mediaStats(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("n_items"),
        sum(length(col("media"))).as("total_bytes"),
        min(length(col("media"))).as("min_bytes"),
        max(length(col("media"))).as("max_bytes"))
      .orderBy(col("media_type"))

  val mediaStatsOracle: String =
    """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image/png'
      |            WHEN doc_id % 3 = 1 THEN 'audio/wav'
      |            ELSE 'video/mp4' END AS media_type,
      |  COUNT(*) AS n_items,
      |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
      |  CAST(MIN(octet_length(encode(text))) AS INTEGER) AS min_bytes,
      |  CAST(MAX(octet_length(encode(text))) AS INTEGER) AS max_bytes
      |FROM documents
      |GROUP BY 1
      |ORDER BY 1""".stripMargin
}
