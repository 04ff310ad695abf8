package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, plus decode / feature-extract / resize / frame-sample stages.
  *
  * The container has no image/audio codecs, so the decode kernels are
  * STUBBED with a deterministic fake (integer byte-statistics standing in
  * for pixel decoding — clearly marked below). Everything Spark-side is
  * real: the binary schema, the typed metadata struct, partition-preserving
  * `mapPartitions` batching (the Scala analog of `mapInPandas` — one
  * iterator per partition, constant memory), and the feature schema.
  *
  * The fakes are deliberately integer-exact arithmetic over the raw bytes,
  * so the whole pipeline (including the stubbed kernels) is verified
  * against a DuckDB oracle — byte-for-byte, not just row counts.
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
      feature: Array[Long])

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

  /** Position-weighted checksum of the byte stream:
    * `(Σ byte_i · i) mod 1000003`, i 1-based. The deterministic seed for
    * the fake decode below; pure integer math. */
  private def checksum(bytes: Array[Byte]): Long = {
    var h = 0L
    var j = 0
    while (j < bytes.length) { h += (bytes(j) & 0xff).toLong * (j + 1); j += 1 }
    h % 1000003L
  }

  /** STUB decode kernel: a real build would call an image/audio codec here
    * (???). Deterministic fake: dimensions derived from the byte checksum. */
  private def decodeStub(bytes: Array[Byte], mediaType: String): MediaMeta = {
    // ??? — codec unavailable in this container; deterministic fake below.
    val h = checksum(bytes)
    MediaMeta(
      width = (64 + h % 512).toInt,
      height = (64 + (h / 512) % 512).toInt,
      channels = if (mediaType.startsWith("image")) 3 else 1,
      format = mediaType.substring(mediaType.indexOf('/') + 1))
  }

  /** STUB feature extractor (resize + embed in a real pipeline): fixed-width
    * vector of strided byte sums — integer-exact. */
  private def featureStub(bytes: Array[Byte], dim: Int = 8): Array[Long] = {
    val out = new Array[Long](dim)
    var i = 0
    while (i < bytes.length) { out(i % dim) += (bytes(i) & 0xff); i += 1 }
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

  /** DuckDB mirror of `decodeAndFeaturize` + the feature_csv rendering in
    * SparkEntry: bytes recovered from the utf-8 blob via hex expansion,
    * then the same integer formulas. */
  val decodeFeaturesOracle: String =
    """WITH b AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image/png'
      |         WHEN doc_id % 3 = 1 THEN 'audio/wav'
      |         ELSE 'video/mp4' END AS media_type,
      |    octet_length(encode(text)) AS n,
      |    list_transform(range(1, octet_length(encode(text))+1),
      |      i -> (strpos('123456789ABCDEF', substr(hex(encode(text)), 2*i-1, 1))*16
      |          + strpos('123456789ABCDEF', substr(hex(encode(text)), 2*i, 1)))) AS bytes
      |  FROM documents
      |), d AS (
      |  SELECT doc_id, media_type, n, bytes,
      |    COALESCE(list_sum(list_transform(bytes, (x,i) -> x*i)), 0) % 1000003 AS h
      |  FROM b
      |)
      |SELECT doc_id,
      |  CAST(n AS BIGINT) AS n_bytes,
      |  CAST(64 + h % 512 AS INTEGER) AS width,
      |  CAST(64 + (h // 512) % 512 AS INTEGER) AS height,
      |  CAST(CASE WHEN media_type LIKE 'image%' THEN 3 ELSE 1 END AS INTEGER) AS channels,
      |  str_split(media_type, '/')[2] AS format,
      |  CASE WHEN n = 0 THEN 0.0
      |       ELSE CAST(COALESCE(list_sum(bytes), 0) AS DOUBLE) / n END AS mean_byte,
      |  array_to_string(list_transform(range(0,8),
      |    k -> COALESCE(list_sum(list_transform(bytes,
      |           (x,i) -> CASE WHEN (i-1)%8=k THEN x ELSE 0 END)), 0)), ',') AS feature_csv
      |FROM d
      |ORDER BY doc_id""".stripMargin

  /** Frame sampling for video-typed rows: emit every `stride`-th "frame"
    * (fixed-size byte windows of the blob — the real kernel would demux).
    * One row in, few rows out: `flatMap`, still narrow. Frame hash is a
    * `(h·31 + byte) mod 2147483647` rolling hash seeded with 1 — integer
    * math shared with the oracle. */
  def sampleFrames(s: SparkSession, dir: String, frameBytes: Int = 64,
      stride: Int = 4): DataFrame = {
    import s.implicits._
    mediaTable(s, dir).filter(col("media_type") === "video/mp4")
      .as[MediaRow]
      .flatMap { r =>
        val nFrames = r.media.length / frameBytes
        (0 until nFrames by stride).map { f =>
          var h = 1L
          var j = f * frameBytes
          val end = (f + 1) * frameBytes
          while (j < end) { h = (h * 31 + (r.media(j) & 0xff)) % 2147483647L; j += 1 }
          (r.doc_id, f, frameBytes, h)
        }
      }
      .toDF("doc_id", "frame_idx", "frame_bytes", "frame_hash")
  }

  val sampleFramesOracle: String =
    """WITH b AS (
      |  SELECT doc_id, octet_length(encode(text)) AS n,
      |    list_transform(range(1, octet_length(encode(text))+1),
      |      i -> (strpos('123456789ABCDEF', substr(hex(encode(text)), 2*i-1, 1))*16
      |          + strpos('123456789ABCDEF', substr(hex(encode(text)), 2*i, 1)))) AS bytes
      |  FROM documents WHERE doc_id % 3 = 2
      |)
      |SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
      |  CAST(64 AS INTEGER) AS frame_bytes,
      |  CAST(list_reduce(list_prepend(1, bytes[f*64+1 : (f+1)*64]),
      |    (a, x) -> (a*31 + x) % 2147483647) AS BIGINT) AS frame_hash
      |FROM b, UNNEST(range(0, n//64, 4)) AS t(f)
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** Media near-dup detection via a banded blockwise fingerprint: each
    * item's 8 feature sums reduce to 8 fingerprint bytes, paired into
    * 4×16-bit band keys; items sharing ANY band become candidate
    * duplicates and the smallest partner id wins ([[Dedup.minhash]]'s
    * single-link policy). A real build would put DCT-sign pHash bits
    * where the STUB feature bytes are — the banding, bucket self-join,
    * and keep-policy are the production-real parts, and the cost shape is
    * the same as text LSH: 4 narrow rows per item, join per band bucket,
    * media bytes never shuffle. */
  def phashNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val f = decodeAndFeaturize(s, dir)
      .select(col("doc_id"),
        transform(col("feature"), x => pmod(x, lit(256))).as("fb"))
    val keyed = f.select(col("doc_id"),
      explode(transform(sequence(lit(0), lit(3)), b => struct(
        b.as("band"),
        (element_at(col("fb"), b * 2 + 1) * 256 +
          element_at(col("fb"), b * 2 + 2)).as("bkey")))).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"),
        col("bb.bkey").as("bkey"))
    val pairs = keyed.as("a")
      .join(keyed.as("b2"), Seq("band", "bkey"))
      .where(col("a.doc_id") < col("b2.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b2.doc_id").as("b_id"))
      .distinct()
    val best = pairs.groupBy(col("b_id").as("doc_id"))
      .agg(min(col("a_id")).as("dup_of"))
    f.join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        concat_ws(",", transform(col("fb"), _.cast("string"))).as("fp_csv"),
        coalesce(col("dup_of"), col("doc_id")).as("dup_of"))
      .withColumn("is_dup", col("dup_of") < col("doc_id"))
      .orderBy(col("doc_id"))
  }

  /** Same byte expansion as [[decodeFeaturesOracle]]; fingerprint bytes,
    * band keys, and the single-link min all mirrored in SQL. */
  val phashNearDupOracle: String =
    """WITH b AS (
      |  SELECT doc_id,
      |    list_transform(range(1, octet_length(encode(text))+1),
      |      i -> (strpos('123456789ABCDEF', substr(hex(encode(text)), 2*i-1, 1))*16
      |          + strpos('123456789ABCDEF', substr(hex(encode(text)), 2*i, 1)))) AS bytes
      |  FROM documents
      |), f AS (
      |  SELECT doc_id, list_transform(range(0,8),
      |    k -> COALESCE(list_sum(list_transform(bytes,
      |           (x,i) -> CASE WHEN (i-1)%8=k THEN x ELSE 0 END)), 0) % 256) AS fb
      |  FROM b
      |), keyed AS (
      |  SELECT doc_id, band, fb[2*band+1]*256 + fb[2*band+2] AS bkey
      |  FROM f, UNNEST(range(0,4)) AS t(band)
      |), pairs AS (
      |  SELECT DISTINCT a.doc_id AS a_id, b2.doc_id AS b_id
      |  FROM keyed a JOIN keyed b2
      |    ON a.band = b2.band AND a.bkey = b2.bkey AND a.doc_id < b2.doc_id
      |), best AS (
      |  SELECT b_id AS doc_id, MIN(a_id) AS dup_of FROM pairs GROUP BY b_id
      |)
      |SELECT f.doc_id, array_to_string(f.fb, ',') AS fp_csv,
      |  COALESCE(best.dup_of, f.doc_id) AS dup_of,
      |  COALESCE(best.dup_of, f.doc_id) < f.doc_id AS is_dup
      |FROM f LEFT JOIN best ON best.doc_id = f.doc_id
      |ORDER BY f.doc_id""".stripMargin

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
