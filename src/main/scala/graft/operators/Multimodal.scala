package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, plus decode / feature-extract / frame-sample stages.
  *
  * The decode path is REAL: each document is rendered into a valid
  * binary P6 PPM image (header + RGB raster — [[encodePpm]]), and
  * [[decodePpm]] is a genuine whitespace/comment-tolerant PPM parser that
  * would read any conforming PPM file, not just ours. Features are a
  * perceptual hash over the DECODED pixels: integer luma → 8×8
  * downsample → 2-D Walsh–Hadamard transform → coefficient sign bits
  * ([[phashBytes]]). The WHT is the integer-exact analog of the pHash
  * DCT (Hadamard entries are ±1, so the transform is pure additions),
  * which keeps the whole chain — encode, parse, downsample, transform,
  * hash — verifiable bit-for-bit against the DuckDB oracle; a float
  * DCT's cos() last-ulp behavior would not be.
  *
  * Spark-side plumbing is production-shaped throughout: binary schema,
  * typed metadata struct, partition-preserving `mapPartitions` batching
  * (the Scala analog of `mapInPandas` — one iterator per partition,
  * constant memory), narrow feature schema.
  *
  * At 100 TB: media bytes never shuffle — every stage below is a narrow
  * map over the scan; only extracted (small) features flow onward.
  */
object Multimodal {

  /** Typed per-item decoded metadata. */
  case class MediaMeta(width: Int, height: Int, channels: Int, format: String)

  case class MediaRow(doc_id: Long, media: Array[Byte], media_type: String)

  case class PpmRow(doc_id: Long, media: Array[Byte])

  /** A decoded image: dimensions + interleaved RGB raster. */
  case class PpmImage(width: Int, height: Int, maxVal: Int,
      pixels: Array[Byte])

  case class MediaFeature(doc_id: Long, n_bytes: Long, width: Int,
      height: Int, channels: Int, format: String, mean_byte: Double,
      feature: Array[Long])

  /** Build an opaque binary "media" column from the documents table (the
    * testdata carries no real media; utf-8 bytes stand in — the plumbing is
    * type-correct for any blob). Used by the byte-level stages
    * ([[mediaStats]], [[sampleFrames]]); the decode chain uses the real
    * PPM blobs from [[ppmTable]]. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      (when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4")).as("media_type"))

  // ------------------------------------------------ real PPM encode/decode

  /** Render a document into a VALID binary P6 PPM image: `P6\nW H\n255\n`
    * followed by W·H interleaved RGB bytes. Dimensions vary per doc
    * (8..16 each side, from doc_id); pixels tile the utf-8 content bytes.
    * Any conforming PPM reader decodes the result. */
  def encodePpm(docId: Long, content: Array[Byte]): Array[Byte] = {
    val w = 8 + (docId % 9).toInt
    val h = 8 + ((docId / 9) % 9).toInt
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val npix = w * h * 3
    val out = new Array[Byte](header.length + npix)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < npix) {
      out(header.length + i) =
        if (content.length == 0) 0 else content(i % content.length)
      i += 1
    }
    out
  }

  /** REAL P6 PPM parser: magic check, whitespace- and `#`-comment-tolerant
    * header (width, height, maxval), single whitespace, then the raster.
    * Throws on malformed input — no silent fallback. */
  def decodePpm(bytes: Array[Byte]): PpmImage = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"malformed PPM: $msg")
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6')
      fail("bad magic (want P6)")
    var pos = 2
    def nextInt(): Int = {
      var inComment = false
      while (pos < bytes.length && {
        val c = bytes(pos).toChar
        if (inComment) { if (c == '\n') inComment = false; true }
        else if (c == '#') { inComment = true; true }
        else c.isWhitespace
      }) pos += 1
      if (pos >= bytes.length) fail("truncated header")
      var v = 0
      var any = false
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); pos += 1; any = true
      }
      if (!any) fail(s"expected integer at offset $pos")
      v
    }
    val w = nextInt(); val h = nextInt(); val mv = nextInt()
    if (w <= 0 || h <= 0 || mv <= 0 || mv > 255) fail(s"bad header $w x $h / $mv")
    pos += 1 // the single whitespace byte after maxval
    val n = w * h * 3
    if (bytes.length - pos < n)
      fail(s"truncated raster: want $n, have ${bytes.length - pos}")
    PpmImage(w, h, mv, java.util.Arrays.copyOfRange(bytes, pos, pos + n))
  }

  /** 64-bit perceptual hash of a decoded image, as 8 fingerprint bytes:
    * integer luma `(r + 2g + b)/4` per pixel, nearest-neighbor 8×8
    * downsample, 2-D Walsh–Hadamard transform
    * (`H[i][j] = (−1)^popcount(i&j)` — Sylvester order), sign bit per
    * coefficient packed MSB-first. Pure integer arithmetic end-to-end, so
    * the oracle reproduces every bit. */
  def phashBytes(img: PpmImage): Array[Int] = {
    val g = new Array[Long](64)
    var k = 0
    while (k < 64) {
      val gy = (k / 8) * img.height / 8
      val gx = (k % 8) * img.width / 8
      val base = (gy * img.width + gx) * 3
      g(k) = ((img.pixels(base) & 0xff) + 2 * (img.pixels(base + 1) & 0xff) +
        (img.pixels(base + 2) & 0xff)) / 4
      k += 1
    }
    val fb = new Array[Int](8)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var c = 0L
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            val neg = (Integer.bitCount(u & yy) + Integer.bitCount(v & xx)) % 2
            c += (if (neg == 0) g(yy * 8 + xx) else -g(yy * 8 + xx))
            xx += 1
          }
          yy += 1
        }
        val idx = u * 8 + v
        if (c > 0) fb(idx / 8) |= 1 << (7 - idx % 8)
        v += 1
      }
      u += 1
    }
    fb
  }

  /** The corpus as real PPM blobs, one image per document. */
  def ppmTable(s: SparkSession, dir: String): Dataset[PpmRow] = {
    import s.implicits._
    documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .as[PpmRow]
      .mapPartitions(_.map(r => PpmRow(r.doc_id, encodePpm(r.doc_id, r.media))))
  }

  /** Decode + feature-extract over media batches: parse the PPM blob,
    * report REAL decoded dimensions, mean pixel byte, and the 8 pHash
    * fingerprint bytes. `mapPartitions` keeps the per-partition iterator
    * streaming (no materialization), matching the batch shape a
    * Pandas-UDF/`mapInPandas` stage would have. */
  def decodeAndFeaturize(s: SparkSession, dir: String): Dataset[MediaFeature] = {
    import s.implicits._
    ppmTable(s, dir).mapPartitions { rows =>
      rows.map { r =>
        val img = decodePpm(r.media)
        var sum = 0L
        img.pixels.foreach(b => sum += (b & 0xff))
        MediaFeature(r.doc_id, r.media.length.toLong, img.width, img.height,
          3, "ppm", sum.toDouble / img.pixels.length,
          phashBytes(img).map(_.toLong))
      }
    }
  }

  /** The encode∘decode∘hash pipeline recomputed in SQL: same byte
    * expansion, same tiling, same luma/downsample/WHT/sign formulas. The
    * oracle mirrors the MATH of the round-trip (the Spark side genuinely
    * routes through PPM bytes and the parser). Shared by the decode and
    * near-dup oracles. */
  private val ppmFpCte: String =
    """b AS (
      |  SELECT doc_id, octet_length(encode(text)) AS tb,
      |    list_transform(range(1, octet_length(encode(text))+1),
      |      i -> (strpos('123456789ABCDEF', substr(hex(encode(text)), 2*i-1, 1))*16
      |          + strpos('123456789ABCDEF', substr(hex(encode(text)), 2*i, 1)))) AS bytes
      |  FROM documents
      |), dims AS (
      |  SELECT doc_id, tb, bytes,
      |    CAST(8 + doc_id % 9 AS INTEGER) AS w,
      |    CAST(8 + (doc_id // 9) % 9 AS INTEGER) AS h
      |  FROM b
      |), pix AS (
      |  SELECT doc_id, w, h, w*h*3 AS npix,
      |    3 + length(CAST(w AS VARCHAR)) + 1 + length(CAST(h AS VARCHAR)) + 5 AS hdr,
      |    list_transform(range(0, w*h*3),
      |      i -> CASE WHEN tb = 0 THEN 0 ELSE bytes[(i % tb) + 1] END) AS p
      |  FROM dims
      |), gray AS (
      |  SELECT doc_id, w, h, npix, hdr, p,
      |    list_transform(range(0, 64),
      |      k -> (p[((k//8 * h // 8) * w + (k%8 * w // 8)) * 3 + 1]
      |          + 2*p[((k//8 * h // 8) * w + (k%8 * w // 8)) * 3 + 2]
      |          + p[((k//8 * h // 8) * w + (k%8 * w // 8)) * 3 + 3]) // 4) AS g
      |  FROM pix
      |), wht AS (
      |  SELECT doc_id, w, h, npix, hdr, p,
      |    list_transform(range(0, 64),
      |      kk -> list_sum(list_transform(range(0, 64),
      |        k -> g[k+1] * (1 - 2*((bit_count(CAST(kk//8 AS BIGINT) & CAST(k//8 AS BIGINT))
      |                 + bit_count(CAST(kk%8 AS BIGINT) & CAST(k%8 AS BIGINT))) % 2)))) ) AS c
      |  FROM gray
      |), f AS (
      |  SELECT doc_id, w, h, npix, hdr, p,
      |    list_transform(range(0, 8),
      |      j -> list_sum(list_transform(range(0, 8),
      |        t -> CASE WHEN c[j*8+t+1] > 0 THEN (1 << (7-t)) ELSE 0 END))) AS fb
      |  FROM wht
      |)""".stripMargin

  val decodeFeaturesOracle: String =
    s"""WITH $ppmFpCte
       |SELECT doc_id,
       |  CAST(hdr + npix AS BIGINT) AS n_bytes,
       |  w AS width, h AS height,
       |  CAST(3 AS INTEGER) AS channels, 'ppm' AS format,
       |  CAST(list_sum(p) AS DOUBLE) / npix AS mean_byte,
       |  array_to_string(fb, ',') AS feature_csv
       |FROM f ORDER BY doc_id""".stripMargin

  /** Frame sampling for video-typed rows: emit every `stride`-th "frame"
    * (fixed-size byte windows of the blob — a demux kernel has the same
    * one-row-in/few-rows-out shape). `flatMap`, still narrow. Frame hash
    * is a `(h·31 + byte) mod 2147483647` rolling hash seeded with 1 —
    * integer math shared with the oracle. */
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

  /** Media near-dup detection over the REAL pHash: the 8 fingerprint
    * bytes pair into 4×16-bit band keys; items sharing ANY band become
    * candidate duplicates and the smallest partner id wins
    * ([[Dedup.minhash]]'s single-link policy). Cost shape is the same as
    * text LSH: 4 narrow rows per item, join per band bucket, media bytes
    * never shuffle — only the 8-byte fingerprints do. */
  def phashNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val f = decodeAndFeaturize(s, dir)
      .select(col("doc_id"), col("feature").as("fb"))
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

  /** Same pHash pipeline as [[decodeFeaturesOracle]]; band keys and the
    * single-link min mirrored in SQL. */
  val phashNearDupOracle: String =
    s"""WITH $ppmFpCte,
       |keyed AS (
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

  // ------------------------------------------------ real WAV encode/decode

  /** A decoded PCM clip: sample rate + signed 16-bit samples. */
  case class WavAudio(sampleRate: Int, samples: Array[Int])

  case class AudioFeature(doc_id: Long, n_bytes: Long, n_samples: Int,
    sample_rate: Int, mean_abs: Double, fp_csv: String)

  /** Render a document into a VALID RIFF/WAVE file: the standard 44-byte
    * header (PCM, mono, 8 kHz, 16-bit) followed by `64 + doc_id % 64`
    * little-endian samples whose bytes tile the utf-8 content — the audio
    * sibling of [[encodePpm]]. Any conforming WAV reader decodes it. */
  def encodeWav(docId: Long, content: Array[Byte]): Array[Byte] = {
    val n = 64 + (docId % 64).toInt
    val dataBytes = 2 * n
    val out = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)        // PCM, mono
      .putInt(8000).putInt(16000)     // sample rate, byte rate
      .putShort(2).putShort(16)       // block align, bits per sample
    out.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var j = 0
    while (j < dataBytes) {
      out.put(if (content.length == 0) 0.toByte
        else content(j % content.length))
      j += 1
    }
    out.array()
  }

  /** REAL RIFF/WAVE parser: verifies the RIFF/WAVE magic, walks the chunk
    * list (tolerating unknown chunks and their word alignment), requires a
    * PCM 16-bit `fmt ` chunk before `data`, and decodes the samples as
    * signed little-endian 16-bit. Throws on malformed input. */
  def decodeWav(bytes: Array[Byte]): WavAudio = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"malformed WAV: $msg")
    def ascii(off: Int) = new String(bytes, off, 4, "US-ASCII")
    def u32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    def u16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    if (bytes.length < 12 || ascii(0) != "RIFF" || ascii(8) != "WAVE")
      fail("bad RIFF/WAVE magic")
    var pos = 12
    var sampleRate = -1
    var bitsPerSample = -1
    var channels = -1
    while (pos + 8 <= bytes.length) {
      val id = ascii(pos)
      val size = u32(pos + 4)
      if (size < 0 || pos + 8 + size > bytes.length)
        fail(s"chunk '$id' overruns file")
      if (id == "fmt ") {
        if (size < 16) fail("fmt chunk too small")
        if (u16(pos + 8) != 1) fail("not PCM")
        channels = u16(pos + 10)
        sampleRate = u32(pos + 12)
        bitsPerSample = u16(pos + 22)
      } else if (id == "data") {
        if (sampleRate < 0) fail("data before fmt")
        if (bitsPerSample != 16 || channels != 1)
          fail(s"unsupported format: $channels ch / $bitsPerSample bit")
        val n = size / 2
        val samples = new Array[Int](n)
        var i = 0
        while (i < n) {
          samples(i) = ((bytes(pos + 8 + 2 * i) & 0xff) |
            ((bytes(pos + 8 + 2 * i + 1) & 0xff) << 8)).toShort.toInt
          i += 1
        }
        return WavAudio(sampleRate, samples)
      }
      pos += 8 + size + (size % 2) // RIFF chunks are word-aligned
    }
    fail("no data chunk")
  }

  /** 64-bit audio fingerprint as 8 bytes: nearest-neighbor downsample of
    * the clip to 64 points, 1-D Walsh–Hadamard transform
    * (`H[u][k] = (−1)^popcount(u&k)`), sign bit per coefficient — the 1-D
    * analog of [[phashBytes]], pure integer arithmetic end-to-end. */
  def audioFingerprint(a: WavAudio): Array[Int] = {
    val n = a.samples.length
    val bins = Array.tabulate(64)(k => a.samples(k * n / 64).toLong)
    val fb = new Array[Int](8)
    var u = 0
    while (u < 64) {
      var c = 0L
      var k = 0
      while (k < 64) {
        c += (if (Integer.bitCount(u & k) % 2 == 0) bins(k) else -bins(k))
        k += 1
      }
      if (c > 0) fb(u / 8) |= 1 << (7 - u % 8)
      u += 1
    }
    fb
  }

  /** Decode + fingerprint over real WAV blobs — the audio leg of the
    * multimodal pipeline, same narrow `mapPartitions` shape as
    * [[decodeAndFeaturize]]: media bytes never shuffle, only the small
    * feature rows flow on. */
  def decodeAndFingerprintAudio(s: SparkSession,
      dir: String): Dataset[AudioFeature] = {
    import s.implicits._
    documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .as[PpmRow]
      .mapPartitions(_.map { r =>
        val blob = encodeWav(r.doc_id, r.media)
        val a = decodeWav(blob)
        var sumAbs = 0L
        a.samples.foreach(s0 => sumAbs += math.abs(s0.toLong))
        AudioFeature(r.doc_id, blob.length.toLong, a.samples.length,
          a.sampleRate, sumAbs.toDouble / a.samples.length,
          audioFingerprint(a).mkString(","))
      })
  }

  /** The encode∘decode∘fingerprint pipeline in SQL: same byte tiling,
    * signed-16-bit reconstruction, downsample, 1-D WHT and sign packing
    * (the Spark side genuinely routes through WAV bytes and the parser —
    * the oracle mirrors the math). */
  val audioFingerprintOracle: String =
    """WITH b AS (
      |  SELECT doc_id, octet_length(encode(text)) AS tb,
      |    list_transform(range(1, octet_length(encode(text))+1),
      |      i -> (strpos('123456789ABCDEF', substr(hex(encode(text)), 2*i-1, 1))*16
      |          + strpos('123456789ABCDEF', substr(hex(encode(text)), 2*i, 1)))) AS bytes
      |  FROM documents
      |), d AS (
      |  SELECT doc_id, tb, bytes, CAST(64 + doc_id % 64 AS INTEGER) AS n
      |  FROM b
      |), smp AS (
      |  SELECT doc_id, tb, n,
      |    list_transform(range(0, n), i ->
      |      CASE WHEN tb = 0 THEN 0 ELSE
      |        CASE WHEN bytes[((2*i) % tb) + 1]
      |                  + 256*bytes[((2*i+1) % tb) + 1] >= 32768
      |          THEN bytes[((2*i) % tb) + 1]
      |                  + 256*bytes[((2*i+1) % tb) + 1] - 65536
      |          ELSE bytes[((2*i) % tb) + 1]
      |                  + 256*bytes[((2*i+1) % tb) + 1] END END) AS s
      |  FROM d
      |), bins AS (
      |  SELECT doc_id, n, s,
      |    list_transform(range(0, 64), k -> s[(k*n)//64 + 1]) AS g
      |  FROM smp
      |), wht AS (
      |  SELECT doc_id, n, s,
      |    list_transform(range(0, 64),
      |      u -> list_sum(list_transform(range(0, 64),
      |        k -> g[k+1] * (1 - 2*(bit_count(CAST(u AS BIGINT) & CAST(k AS BIGINT)) % 2))))) AS c
      |  FROM bins
      |), f AS (
      |  SELECT doc_id, n, s,
      |    list_transform(range(0, 8),
      |      j -> list_sum(list_transform(range(0, 8),
      |        t -> CASE WHEN c[j*8+t+1] > 0 THEN (1 << (7-t)) ELSE 0 END))) AS fb
      |  FROM wht
      |)
      |SELECT doc_id, CAST(44 + 2*n AS BIGINT) AS n_bytes,
      |  n AS n_samples, CAST(8000 AS INTEGER) AS sample_rate,
      |  CAST(list_sum(list_transform(s, x -> abs(x))) AS DOUBLE) / n
      |    AS mean_abs,
      |  array_to_string(fb, ',') AS fp_csv
      |FROM f ORDER BY doc_id""".stripMargin

  /** Oracle-comparable slice of the media pipeline: byte length and
    * media-type routing are exact. */
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
