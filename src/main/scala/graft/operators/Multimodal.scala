package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, processed in batched per-partition passes.
  *
  * The Spark-side plumbing is real — binary payload column, metadata
  * struct, typed Dataset, `mapPartitions` with explicit batching (the
  * shape a vectorized decode would use) — but the decode itself is a
  * clearly-marked deterministic STUB: this container has no image/audio
  * codec libraries, so "decode" computes arithmetic features of the
  * payload bytes (which is what makes a DuckDB oracle possible). Swap
  * [[fakeDecode]] for a real codec call in production. */
object Multimodal {

  /** Batch size for the per-partition decode loop — the unit a real
    * vectorized decoder (or GPU transfer) would process at once. */
  private val DecodeBatch = 64

  final case class MediaRow(doc_id: Long, payload: Array[Byte], width: Long, height: Long)
  final case class Feature(doc_id: Long, width: Long, height: Long,
      n_bytes: Long, checksum_x100: Long)

  /** STUB decode: a real implementation would parse the codec header and
    * decode pixels/samples. Here: byte-level arithmetic features —
    * deterministic, schema-correct, oracle-checkable. */
  private def fakeDecode(r: MediaRow): Feature = {
    val head = r.payload.take(32)
    val sum = head.foldLeft(0L)((acc, b) => acc + (b & 0xff))
    Feature(r.doc_id, r.width, r.height, r.payload.length.toLong, sum * 100 / 32)
  }

  /** m1: build a media table (payload bytes derived from text — stand-in
    * for real image bytes) and run the batched decode/feature pass. */
  def m1DecodeFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.load(s, dir, "documents").select(
      col("doc_id").cast("long").as("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("n_chars") % 64 + 16).cast("long").as("width"),
      (col("doc_id") % 32 + 16).cast("long").as("height"))
      .as[MediaRow]
    media.mapPartitions { it =>
      // Batched decode loop: a real decoder amortizes codec/GPU setup per
      // batch; the iterator shape (grouped → flatMap) is the real plumbing.
      it.grouped(DecodeBatch).flatMap { batch => batch.map(fakeDecode) }
    }.toDF().orderBy("doc_id")
  }

  final case class Frame(doc_id: Long, frame_no: Long, frame_sum: Long)

  /** m2: frame sampling — treat the payload as a "video" of 16-byte
    * frames and sample every 4th one, emitting per-frame features. The
    * explode shape (one row per sampled frame) is the real plumbing a
    * frame-level pipeline needs; frame decode itself is the same
    * deterministic STUB arithmetic as m1. */
  def m2FrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.load(s, dir, "documents").select(
      col("doc_id").cast("long").as("doc_id"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
    media.flatMap { case (id, payload) =>
      val nFrames = payload.length / FrameBytes
      // STUB: a real implementation would seek + decode keyframes.
      (0 until nFrames by FrameStride).iterator.map { f =>
        val frame = payload.slice(f * FrameBytes, (f + 1) * FrameBytes)
        Frame(id, f.toLong, frame.foldLeft(0L)((acc, b) => acc + (b & 0xff)))
      }
    }.toDF().orderBy("doc_id", "frame_no")
  }

  private val FrameBytes = 16
  private val FrameStride = 4

  final case class Thumb(doc_id: Long, thumb_w: Long, thumb_h: Long, thumb_sum: Long)

  /** m3: resize — stride-sample the payload down to a fixed 8x8
    * "thumbnail" (the nearest-neighbor downsample shape). STUB: a real
    * resize would interpolate decoded pixels; here the sampled bytes are
    * summed so the oracle can replicate the arithmetic. */
  def m3Resize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.load(s, dir, "documents").select(
      col("doc_id").cast("long").as("doc_id"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
    media.map { case (id, payload) =>
      val n = ThumbSide * ThumbSide
      val stride = math.max(1, payload.length / n)
      var sum = 0L
      var k = 0
      while (k < n && k * stride < payload.length) {
        sum += payload(k * stride) & 0xff
        k += 1
      }
      Thumb(id, ThumbSide.toLong, ThumbSide.toLong, sum)
    }.toDF().orderBy("doc_id")
  }

  private val ThumbSide = 8

  final case class Decoded(doc_id: Long, width: Long, height: Long, px_sum: Long)

  /** m4: REAL image decode — no stub. Each document renders to a
    * deterministic grayscale image (pixel k = byte k mod len of the
    * text), is encoded through the JDK's actual PNG codec
    * (`javax.imageio`), and the decode stage reads the PNG back and
    * extracts pixel features. PNG grayscale is lossless, so the decoded
    * pixels equal the source bytes and a DuckDB oracle can verify the
    * whole encode→decode→feature pipeline exactly. This is the
    * [[m1DecodeFeatures]] plumbing with the stub replaced by a real
    * codec; m1–m3 remain for the pure-arithmetic contract.
    *
    * Batch shape matches a production decoder: one codec context per
    * batch of [[DecodeBatch]] images inside `mapPartitions` — the same
    * iterator shape a GPU/turbojpeg decode would use. */
  def m4PngDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // decode stage: real PNG parse + pixel feature extraction, batched
    pngEncoded(s, dir).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.grouped(DecodeBatch).flatMap(_.map { case (id, png) =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
        val raster = img.getRaster
        var sum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            sum += raster.getSample(x, y, 0)
            x += 1
          }
          y += 1
        }
        Decoded(id, img.getWidth.toLong, img.getHeight.toLong, sum)
      })
    }.toDF().orderBy("doc_id")
  }

  /** Encode stage of [[m4PngDecode]]: text → real PNG payloads.
    *
    * Pixel k is CHARACTER k mod len, truncated to the 8-bit grayscale
    * plane (`codepoint & 0xff`) — the same domain as the oracle's
    * `ascii(substr(text, k%len+1, 1))` for every codepoint ≤ 255, which
    * this corpus satisfies (byte-domain `getBytes` would diverge from
    * the oracle's character positions on any multi-byte codepoint). An
    * empty document renders as a single zero pixel source instead of
    * dividing by zero. */
  private[operators] def pngEncoded(s: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[(Long, Array[Byte])] = {
    import s.implicits._
    Tables.load(s, dir, "documents").select(
      col("doc_id").cast("long").as("doc_id"),
      col("text"),
      (col("n_chars") % 64 + 16).cast("int").as("w"),
      (col("doc_id") % 32 + 16).cast("int").as("h"))
      .as[(Long, String, Int, Int)]
      .mapPartitions { it =>
        // ImageIO's default stream cache spills through a TEMP FILE per
        // image — memory-cached streams are ~10× faster and identical
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, text, w, h) =>
          val codes =
            if (text.isEmpty) Array(0)
            else Array.tabulate(text.length)(i => text.charAt(i) & 0xff)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var k = 0
          while (k < w * h) {
            raster.setSample(k % w, k / w, 0, codes(k % codes.length))
            k += 1
          }
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", out)
          (id, out.toByteArray)
        }
      }
  }

  /** m5: typed metadata extraction from an opaque binary column with
    * PURE CATALYST byte ops — no UDF, no decoder: the PNG signature and
    * IHDR fields (width, height, bit depth, color type) are parsed from
    * the real codec output of [[pngEncoded]] via substring/hex/conv,
    * all codegen'd builtins. This is the schema-on-read shape for media
    * lakes at scale: a metadata scan touches the first ~26 bytes of
    * each blob and never runs image code; the oracle checks the parsed
    * fields against the known source geometry, proving the real encoder
    * wrote what the pipeline believes it wrote.
    *
    * PNG layout (public spec): 8-byte signature 89504E470D0A1A0A, then
    * the IHDR chunk — 4-byte length, "IHDR", 4-byte big-endian width,
    * 4-byte height, 1-byte bit depth, 1-byte color type. */
  def m5PngMeta(s: SparkSession, dir: String): DataFrame = {
    val png = pngEncoded(s, dir).toDF("doc_id", "png")
    def beUint(off: Int, len: Int): Column =
      conv(hex(substring(col("png"), off, len)), 16, 10).cast("long")
    png.select(col("doc_id"),
      (hex(substring(col("png"), 1, 8)) === "89504E470D0A1A0A")
        .cast("long").as("sig_ok"),
      beUint(17, 4).as("width"),
      beUint(21, 4).as("height"),
      beUint(25, 1).as("bit_depth"),
      beUint(26, 1).as("color_type"))
      .orderBy("doc_id")
  }

  final case class WavFeat(doc_id: Long, n_samples: Long, sample_rate: Long,
    rms_micro: Long, zero_crossings: Long)

  /** m6: the AUDIO analog of m4 — a real WAV/RIFF container round-trip.
    * Encode: per doc, `400 + doc_id % 200` deterministic 16-bit PCM
    * samples (`s_i = (doc_id·31 + i·7) mod 65536 − 32768`) wrapped in a
    * canonical 44-byte RIFF/fmt/data header (any audio tool can read the
    * payloads). Decode: parse the container back — magic checks, fmt
    * fields, little-endian samples — and extract the features a corpus
    * pipeline filters on: duration, sample rate, RMS loudness,
    * zero-crossing rate. PCM is lossless, so the oracle recomputes the
    * features straight from the synthesis formula: a hash-match proves
    * the byte-level encode→parse round-trip, exactly m4's proof shape.
    * RMS determinism: the sample-square sum is exact in BIGINT, and
    * /n → sqrt → ×1e6 → floor are single correctly-rounded IEEE ops on
    * identical operands in both engines. */
  /** Encode stage of [[m6WavDecode]]: doc_id → real RIFF/WAV payload. */
  private[operators] def wavEncoded(s: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[(Long, Array[Byte])] = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val n = (400 + id % 200).toInt
          val rate = 8000
          val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
            .put("WAVE".getBytes("US-ASCII"))
            .put("fmt ".getBytes("US-ASCII")).putInt(16)
            .putShort(1).putShort(1) // PCM, mono
            .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
            .put("data".getBytes("US-ASCII")).putInt(n * 2)
          var i = 0
          while (i < n) {
            bb.putShort((((id * 31 + i * 7) % 65536) - 32768).toShort)
            i += 1
          }
          (id, bb.array())
        }
      }
  }

  def m6WavDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    wavEncoded(s, dir).map { case (id, bytes) =>
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(off: Int): String = new String(bytes, off, 4, "US-ASCII")
      require(tag(0) == "RIFF" && tag(8) == "WAVE" && tag(12) == "fmt " &&
        tag(36) == "data", s"not a canonical WAV container for doc $id")
      require(bb.getShort(20) == 1 && bb.getShort(34) == 16,
        s"expected 16-bit PCM for doc $id")
      val rate = bb.getInt(24).toLong
      val n = bb.getInt(40) / 2
      var sumSq = 0L
      var zc = 0L
      var prevNeg = false
      var i = 0
      while (i < n) {
        val v = bb.getShort(44 + i * 2).toLong
        sumSq += v * v
        val neg = v < 0
        if (i > 0 && neg != prevNeg) zc += 1
        prevNeg = neg
        i += 1
      }
      val rms = math.sqrt(sumSq.toDouble / n)
      WavFeat(id, n.toLong, rate, math.floor(rms * 1e6).toLong, zc)
    }.toDF().orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m6_wav_decode" -> m6WavDecode _,
    "m1_media_decode" -> m1DecodeFeatures _,
    "m2_frame_sample" -> m2FrameSample _,
    "m3_resize" -> m3Resize _,
    "m4_png_decode" -> m4PngDecode _,
    "m5_png_meta" -> m5PngMeta _,
  )

  val oracles: Map[String, String] = Map(
    // m6: PCM is lossless — recompute the features directly from the
    // sample-synthesis formula; a hash-match proves the WAV container
    // encode→parse round-trip byte-exactly
    "m6_wav_decode" ->
      ("""WITH d AS (SELECT doc_id, 400 + doc_id % 200 n FROM documents),
         |s AS (SELECT doc_id, n, unnest(range(0, n)) i FROM d),
         |v AS (SELECT doc_id, n, i,
         |        ((doc_id * 31 + i * 7) % 65536) - 32768 v FROM s),
         |w AS (SELECT doc_id, n, i, v,
         |        lag(v) OVER (PARTITION BY doc_id ORDER BY i) pv FROM v),
         |agg AS (SELECT doc_id, CAST(max(n) AS BIGINT) n_samples,
         |          CAST(sum(v * v) AS BIGINT) ss,
         |          CAST(sum(CASE WHEN pv IS NOT NULL
         |              AND ((v < 0) != (pv < 0)) THEN 1 ELSE 0 END) AS BIGINT) zc
         |        FROM w GROUP BY doc_id)
         |SELECT doc_id, n_samples, CAST(8000 AS BIGINT) sample_rate,
         |  CAST(floor(sqrt(CAST(ss AS DOUBLE) / CAST(n_samples AS DOUBLE))
         |    * 1000000.0) AS BIGINT) rms_micro,
         |  zc zero_crossings
         |FROM agg ORDER BY doc_id""".stripMargin),
    // Payload is ASCII text, so byte arithmetic == character arithmetic.
    "m1_media_decode" ->
      ("""WITH f AS (SELECT doc_id, n_chars % 64 + 16 width, doc_id % 32 + 16 height,
         |  length(text) n_bytes,
         |  list_reduce(list_concat([CAST(0 AS BIGINT)],
         |    list_transform(range(1, least(33, length(text)+1)),
         |      i -> ascii(substr(text, i, 1))::BIGINT)),
         |    (a, b) -> a + b) bytesum
         |FROM documents)
         |SELECT doc_id, width, height, n_bytes, bytesum * 100 // 32 checksum_x100
         |FROM f ORDER BY doc_id""".stripMargin),
    // the frame index comes from a correlated scalar range() over each
    // document's own length (the table-function form can't be lateral in
    // DuckDB 1.0) — no fixed frame cap to silently diverge on long payloads
    "m2_frame_sample" ->
      ("""WITH fr AS (
         |  SELECT doc_id, text, unnest(range(0, length(text) // 16)) fr
         |  FROM documents),
         |f AS (
         |  SELECT doc_id, CAST(fr AS BIGINT) frame_no,
         |    list_reduce(list_concat([CAST(0 AS BIGINT)],
         |      list_transform(range(fr*16 + 1, fr*16 + 17),
         |        i -> ascii(substr(text, i, 1))::BIGINT)),
         |      (a, b) -> a + b) frame_sum
         |  FROM fr
         |  WHERE fr % 4 = 0)
         |SELECT doc_id, frame_no, frame_sum FROM f
         |ORDER BY doc_id, frame_no""".stripMargin),
    // m4: the image is pixel k = text byte (k mod len); PNG is lossless,
    // so the decoded pixel sum equals this direct arithmetic — verifying
    // the real encode→decode round-trip
    "m4_png_decode" ->
      ("""WITH f AS (SELECT doc_id, n_chars % 64 + 16 w, doc_id % 32 + 16 h,
         |                  text, length(text) len FROM documents)
         |SELECT doc_id, CAST(w AS BIGINT) width, CAST(h AS BIGINT) height,
         |  list_reduce(list_concat([CAST(0 AS BIGINT)],
         |    list_transform(range(0, w*h),
         |      k -> ascii(substr(text, CAST(k % len AS INT)+1, 1))::BIGINT)),
         |    (a, b) -> a + b) px_sum
         |FROM f ORDER BY doc_id""".stripMargin),
    // m5: the parsed-from-bytes IHDR fields must equal the source
    // geometry the encoder was GIVEN (and grayscale-8 settings) — the
    // oracle is the spec the real codec must have honored
    "m5_png_meta" ->
      ("""SELECT doc_id, CAST(1 AS BIGINT) sig_ok,
         |  CAST(n_chars % 64 + 16 AS BIGINT) width,
         |  CAST(doc_id % 32 + 16 AS BIGINT) height,
         |  CAST(8 AS BIGINT) bit_depth, CAST(0 AS BIGINT) color_type
         |FROM documents ORDER BY doc_id""".stripMargin),
    "m3_resize" ->
      ("""WITH t AS (SELECT doc_id, text,
         |    greatest(1, length(text) // 64) stride FROM documents)
         |SELECT doc_id,
         |  CAST(8 AS BIGINT) thumb_w, CAST(8 AS BIGINT) thumb_h,
         |  list_reduce(list_concat([CAST(0 AS BIGINT)],
         |    list_transform(range(0, 64),
         |      k -> CASE WHEN k * stride < length(text)
         |           THEN ascii(substr(text, k*stride + 1, 1))::BIGINT
         |           ELSE 0 END)),
         |    (a, b) -> a + b) thumb_sum
         |FROM t ORDER BY doc_id""".stripMargin),
  )
}
