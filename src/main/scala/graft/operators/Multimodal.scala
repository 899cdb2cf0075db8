package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, processed in batched per-partition passes.
  *
  * Every family member runs a REAL JDK codec (`javax.imageio` JPEG and
  * PNG, RIFF/WAV PCM) — no stub decodes remain. Oracle strategy per
  * codec class:
  *  - lossless paths (m4 PNG, m6 WAV, m2's flat-frame JPEG at quality
  *    1.0 — the JDK encoder's quantization tables degenerate to 1s, so
  *    uniform blocks round-trip bit-exactly) hash-match the decoded
  *    values against direct arithmetic recomputed by DuckDB;
  *  - lossy paths (m1/m3's textured JPEG at quality 0.9) emit
  *    codec-exact metadata (dimensions) plus band-stat TOLERANCE flags
  *    (decoded mean within 0.5/px of the source mean, thumbnail samples
  *    within ±32) — the oracle pins the flags at 1, so a codec drift or
  *    broken decode flips the hash. Measured JDK error at 0.9:
  *    ≤0.09/px mean, ≤18 per pixel — 5x/2x margins. */
object Multimodal {

  /** Batch size for the per-partition decode loop — the unit a real
    * vectorized decoder (or GPU transfer) would process at once. */
  private val DecodeBatch = 64

  /** Encode through the JDK's actual JPEG codec at an explicit quality
    * (ImageIO's bare `write(img, "jpg", out)` gives no quality control;
    * flat-frame exactness needs 1.0). One writer per partition, reused
    * across the batch — the codec-context amortization a production
    * (turbojpeg/GPU) decoder path uses. */
  private final class JpegCodec {
    javax.imageio.ImageIO.setUseCache(false)
    private val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    def encode(img: java.awt.image.BufferedImage, quality: Float): Array[Byte] = {
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(quality)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
      ios.close()
      bos.toByteArray
    }
    def decode(bytes: Array[Byte]): java.awt.image.BufferedImage =
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
  }

  private def grayImage(w: Int, h: Int, pixel: Int => Int)
      : java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    // bulk setSamples in the same row-major order the per-pixel
    // setSample(k%w, k/w) loop wrote — one raster call per image, not
    // w·h virtual dispatches (optimization round 17; this runs on
    // every encode of every media operator)
    val a = new Array[Int](w * h)
    var k = 0
    while (k < w * h) { a(k) = pixel(k); k += 1 }
    img.getRaster.setSamples(0, 0, w, h, 0, a)
    img
  }

  /** Sum of band-0 samples over the full raster — bulk `getSamples`
    * (identical values to the per-pixel getSample loops it replaces;
    * one raster call per frame). */
  private def sumBand0(raster: java.awt.image.Raster, w: Int, h: Int): Long = {
    val a = raster.getSamples(0, 0, w, h, 0, null: Array[Int])
    var s = 0L
    var i = 0
    while (i < a.length) { s += a(i); i += 1 }
    s
  }

  /** Fan the tiny pre-synthesis rows across the cluster before a codec
    * stage (optimization round 17, guide §2.5 input skew): at bench
    * scale the whole documents table is ONE parquet file — one scan
    * task — so every encode→decode chain above it ran SERIAL (m7
    * measured 4.0 s solo with 31 cores idle; the codec work is the
    * query). The exchange moves only id-grain rows (a few bytes each),
    * never media payloads. At 100 TB real media arrives as many files
    * and the scan parallelizes on its own, so the same exchange is
    * noise there. Hash-partitioned on the id column — deterministic
    * under task retry (guide §2.5's rand()-repartition warning). The
    * key column is asserted to be the id-typed head column (ADVICE
    * r17: a reordered select at a call site would otherwise silently
    * hash on a non-id column — still correct, but the fan could
    * collapse onto few partitions with no test failing). */
  private def fanOut[T](ds: org.apache.spark.sql.Dataset[T])
      : org.apache.spark.sql.Dataset[T] = {
    val key = ds.columns(0)
    require(ds.schema.head.dataType == org.apache.spark.sql.types.LongType,
      s"fanOut key '$key' must be the leading long id column, " +
        s"got ${ds.schema.head.dataType} — reorder the select")
    ds.repartition(ds.sparkSession.sparkContext.defaultParallelism, col(key))
  }

  final case class MediaRow(doc_id: Long, text: String, width: Int, height: Int)
  final case class Feature(doc_id: Long, width: Long, height: Long, mean_ok: Long)

  /** The one media source every JPEG-family operator reads: document
    * text + the derived geometry. A single definition keeps m1, m3, and
    * the spec-facing [[jpegEncoded]] pipeline provably encoding the
    * SAME images. */
  private def mediaRows(s: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[MediaRow] = {
    import s.implicits._
    fanOut(Tables.load(s, dir, "documents").select(
      col("doc_id").cast("long").as("doc_id"),
      col("text"),
      (col("n_chars") % 64 + 16).cast("int").as("width"),
      (col("doc_id") % 32 + 16).cast("int").as("height"))
      .as[MediaRow])
  }

  /** Grayscale codes of a media row (character domain, like m4's PNG
    * path; empty text renders one zero pixel). */
  private def mediaCodes(r: MediaRow): Array[Int] =
    if (r.text.isEmpty) Array(0)
    else Array.tabulate(r.text.length)(i => r.text.charAt(i) & 0xff)

  /** The textured quality-0.9 JPEG every m1/m3 decode runs on — ONE
    * encode definition shared by both operators and the spec probe. */
  private def encodeMedia(codec: JpegCodec, r: MediaRow): Array[Byte] = {
    val codes = mediaCodes(r)
    codec.encode(grayImage(r.width, r.height, k => codes(k % codes.length)), 0.9f)
  }

  /** m1: REAL JPEG decode features. Encode: the document's text renders
    * to a textured grayscale image (pixel k = char k mod len, m4's
    * geometry) pushed through the JDK JPEG codec at quality 0.9; decode:
    * a real `ImageIO` JPEG parse, then band statistics. JPEG is lossy,
    * so the oracle checks what a lossy codec guarantees: exact
    * dimensions, and the decoded mean within 0.5/px of the source mean
    * (`mean_ok` — DC coefficients carry block means nearly untouched at
    * 0.9; measured worst drift 0.09/px). The oracle pins
    * (width, height, 1); a wrong-size or drifting decode flips the hash. */
  def m1DecodeFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaRows(s, dir).mapPartitions { it =>
      val codec = new JpegCodec
      // Batched decode loop: one codec context amortized per batch — the
      // iterator shape a vectorized/GPU decode uses.
      it.grouped(DecodeBatch).flatMap(_.map { r =>
        val codes = mediaCodes(r)
        var srcSum = 0L
        var k = 0
        while (k < r.width * r.height) {
          srcSum += codes(k % codes.length)
          k += 1
        }
        val img = codec.decode(encodeMedia(codec, r))
        val decSum = sumBand0(img.getRaster, img.getWidth, img.getHeight)
        val n = r.width.toLong * r.height
        val meanOk =
          if (img.getWidth == r.width && img.getHeight == r.height &&
            math.abs(decSum - srcSum) * 2 <= n) 1L else 0L
        Feature(r.doc_id, img.getWidth.toLong, img.getHeight.toLong, meanOk)
      })
    }.toDF().orderBy("doc_id")
  }

  /** The textured quality-0.9 JPEG payloads m1/m3 decode — exposed for
    * the spec to verify they are genuine JPEG containers (FFD8 magic,
    * decodable by an independent `ImageIO.read`). */
  private[operators] def jpegEncoded(s: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[(Long, Array[Byte])] = {
    import s.implicits._
    mediaRows(s, dir).mapPartitions { it =>
      val codec = new JpegCodec
      it.map(r => (r.doc_id, encodeMedia(codec, r)))
    }
  }

  final case class Frame(doc_id: Long, frame_no: Long, frame_sum: Long)

  /** m2: frame sampling over a REAL JPEG "video": each document is a
    * sequence of `len(text)/16` frames, every 4th sampled and decoded.
    * Each frame is a 16x16 uniform gray (`(doc_id*7 + frame*13) % 256`)
    * JPEG at quality 1.0 — uniform blocks have only a DC coefficient and
    * the quality-1.0 quantization table is all 1s, so the JDK codec
    * round-trips them BIT-EXACTLY (verified over all 256 levels). The
    * emitted `frame_sum` is the sum of REAL DECODED pixels, and the
    * oracle recomputes `256 * gray` directly — a hash match proves the
    * full encode→decode chain, not arithmetic on source bytes. */
  def m2FrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = fanOut(Tables.load(s, dir, "documents").select(
      col("doc_id").cast("long").as("doc_id"),
      (length(col("text")) / FrameBytes).cast("int").as("n_frames"))
      .as[(Long, Int)])
    media.mapPartitions { it =>
      val codec = new JpegCodec
      it.flatMap { case (id, nFrames) =>
        (0 until nFrames by FrameStride).iterator.map { f =>
          val gray = ((id * 7 + f * 13) % 256).toInt
          val jpeg = codec.encode(grayImage(FrameSide, FrameSide, _ => gray), 1.0f)
          val img = codec.decode(jpeg)
          val sum = sumBand0(img.getRaster, FrameSide, FrameSide)
          Frame(id, f.toLong, sum)
        }
      }
    }.toDF().orderBy("doc_id", "frame_no")
  }

  private val FrameBytes = 16
  private val FrameSide = 16
  private val FrameStride = 4

  final case class Thumb(doc_id: Long, thumb_w: Long, thumb_h: Long, thumb_ok: Long)

  /** m3: resize over a REAL JPEG decode — the textured quality-0.9 image
    * of [[m1DecodeFeatures]] is decoded and nearest-neighbor downsampled
    * to 8x8 from the DECODED raster. Lossy-codec oracle: `thumb_ok` = 1
    * when every sampled decoded pixel is within ±32 of the source pixel
    * at the same position (measured JDK worst case: 18). */
  def m3Resize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaRows(s, dir).mapPartitions { it =>
      val codec = new JpegCodec
      it.grouped(DecodeBatch).flatMap(_.map { r =>
        val codes = mediaCodes(r)
        def src(k: Int): Int = codes(k % codes.length)
        val img = codec.decode(encodeMedia(codec, r))
        val raster = img.getRaster
        var maxErr = 0
        var ty = 0
        while (ty < ThumbSide) {
          var tx = 0
          while (tx < ThumbSide) {
            // nearest-neighbor: sample the decoded raster at the scaled
            // position, compare to the source pixel at the same spot
            val x = tx * r.width / ThumbSide
            val y = ty * r.height / ThumbSide
            val err = math.abs(raster.getSample(x, y, 0) - src(y * r.width + x))
            if (err > maxErr) maxErr = err
            tx += 1
          }
          ty += 1
        }
        Thumb(r.doc_id, ThumbSide.toLong, ThumbSide.toLong,
          if (maxErr <= 32) 1L else 0L)
      })
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
        val sum = sumBand0(img.getRaster, img.getWidth, img.getHeight)
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
  private[graft] def pngEncoded(s: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[(Long, Array[Byte])] = {
    import s.implicits._
    fanOut(Tables.load(s, dir, "documents").select(
      col("doc_id").cast("long").as("doc_id"),
      col("text"),
      (col("n_chars") % 64 + 16).cast("int").as("w"),
      (col("doc_id") % 32 + 16).cast("int").as("h"))
      .as[(Long, String, Int, Int)])
      .mapPartitions { it =>
        // ImageIO's default stream cache spills through a TEMP FILE per
        // image — memory-cached streams are ~10× faster and identical
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, text, w, h) =>
          val codes =
            if (text.isEmpty) Array(0)
            else Array.tabulate(text.length)(i => text.charAt(i) & 0xff)
          val img = grayImage(w, h, k => codes(k % codes.length))
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", out)
          (id, out.toByteArray)
        }
      }
  }

  final case class PHash(doc_id: Long, hi: Long, lo: Long)

  /** Grayscale-convert a decoded image — ONE definition for every
    * fingerprint stage (image dHash, video luminance): sampling a raw
    * raster band would hash an RGB frame's RED channel and an indexed
    * image's arbitrary palette INDEX, so the same picture in two
    * formats would never pair (review r13; factored r14 so the image
    * and video modalities cannot drift). */
  private def toGray(img: java.awt.image.BufferedImage)
      : java.awt.image.BufferedImage =
    if (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) img
    else {
      val g = new java.awt.image.BufferedImage(img.getWidth,
        img.getHeight, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val gr = g.createGraphics()
      gr.drawImage(img, 0, 0, null)
      gr.dispose()
      g
    }

  /** m8 corpus: `documents` plus a deterministic RE-ENCODED TWIN for
    * every 13th doc (id + 1e12 — above any plausible corpus id, guarded loudly; last character replaced — the one-char artifact a
    * lossy re-encode/scrape-dedup pass leaves), ONE definition mirrored
    * term-for-term in the oracle CTE (the synthesized-partsupp
    * discipline, q62–q65). Geometry is TEXT-ONLY (unlike m4's
    * doc_id-dependent height) so a twin renders identically to its
    * original except at the edited pixel positions. */
  /** The guarded base documents of the m8/m10 families. */
  private def m8Docs(s: SparkSession, dir: String): DataFrame = {
    // twin-id headroom guard (review r13): a corpus with doc_id ≥ 1e12
    // would let a twin id collide with a REAL document — and since the
    // oracle replays the same arithmetic, parity would stay green over
    // semantically wrong pairs. Fail loudly instead; the guard rides
    // the id column itself so pruning cannot drop it.
    Tables.load(s, dir, "documents")
      .select(when(col("doc_id").cast("long") < 1000000000000L,
          col("doc_id").cast("long"))
          .otherwise(raise_error(concat(
            lit("m8 twin-id headroom exhausted: doc_id "),
            col("doc_id").cast("string"),
            lit(" >= 1e12 would collide with a re-encode twin id; " +
              "raise the twin offset")))
            .cast("long")).as("doc_id"),
        col("text"))
  }

  /** The deterministic re-encode twins (id + 1e12, last char replaced)
    * — ONE definition for m8's corpus and m10's intake batch. */
  private def m8Twins(docs: DataFrame): DataFrame = docs
    .filter(col("doc_id") % 13 === 0 && length(col("text")) > 0)
    .select((col("doc_id") + 1000000000000L).as("doc_id"),
      concat(expr("substr(text, 1, length(text)-1)"), lit("x")).as("text"))

  private def m8Corpus(s: SparkSession, dir: String): DataFrame = {
    val docs = m8Docs(s, dir)
    docs.unionAll(m8Twins(docs))
  }

  /** The m8 hash stage: render → REAL PNG encode → REAL PNG decode →
    * dHash (difference hash) over the DECODED raster — 9×8
    * nearest-neighbor grid, bit (ty,tx) = sample < its right neighbor,
    * packed into two 32-bit words (BIGINT-safe in both engines; a
    * single 64-bit word would go sign-negative at bit 63). PNG is
    * lossless, so the oracle recomputes the identical bits from the
    * source characters — a hash match proves the full
    * encode→decode→hash chain, m4's proof shape. */
  private[operators] def m8Hashes(s: SparkSession, dir: String): DataFrame =
    renderHashes(s, m8Corpus(s, dir))

  /** The deterministic hash/signature stages cached per (session, dir,
    * corpus fingerprint) — d15's PersistedLru discipline: the render/
    * decode pass is each entry's dominant cost and is a PURE function
    * of the corpus, so entries SHARING a stage (m8+m10 the dHash
    * frame, m9+m11 the WAV fingerprints) pay it once per corpus, and a
    * bench rerun serves every stage warm. A regenerated corpus misses
    * the cache by fingerprint; lost blocks recompute deterministically
    * from lineage. */
  private val m8HashCache = new Dedup.PersistedLru(2)
  private val m9HashCache = new Dedup.PersistedLru(2)
  private val m12SigCache = new Dedup.PersistedLru(2)

  private def m8HashesCached(s: SparkSession, dir: String): DataFrame =
    m8HashCache.getOrElseUpdate(s, dir, "documents")(m8Hashes(s, dir))

  /** Render (doc_id, text) rows to real PNGs and dHash the decoded
    * rasters — m8's hash stage over an arbitrary doc frame, shared
    * with m10's corpus/batch split. */
  private def renderHashes(s: SparkSession, docsDf: DataFrame): DataFrame = {
    import s.implicits._
    fanOut(docsDf.as[(Long, String)]).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.grouped(DecodeBatch).flatMap(_.map { case (id, text) =>
        val codes =
          if (text.isEmpty) Array(0)
          else Array.tabulate(text.length)(i => text.charAt(i) & 0xff)
        val len = text.length
        val w = len % 48 + 16
        val h = len % 24 + 16
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(
          grayImage(w, h, k => codes(k % codes.length)), "png", out)
        val dec = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(out.toByteArray))
        val (hi, lo) = dHashWords(dec.getRaster, w, h)
        PHash(id, hi, lo)
      })
    }.toDF()
  }

  /** The 9×8 dHash grid → two packed 32-bit words — ONE definition for
    * m8's oracle-checked hash stage and the production
    * [[phashDedupCore]] (a tweak applied to one copy would silently
    * de-synchronize the entry from the CALL verb — review r13). The
    * nearest-neighbor positions generalize to any geometry (tx·w/9 < w
    * for every w ≥ 1). Expects a single-band (grayscale) raster. */
  private def dHashWords(raster: java.awt.image.Raster, w: Int, h: Int)
      : (Long, Long) = {
    var hi = 0L
    var lo = 0L
    var ty = 0
    while (ty < 8) {
      val y = ty * h / 8
      var tx = 0
      while (tx < 8) {
        val gL = raster.getSample(tx * w / 9, y, 0)
        val gR = raster.getSample((tx + 1) * w / 9, y, 0)
        if (gL < gR) {
          val b = ty * 8 + tx
          if (b < 32) hi |= 1L << b else lo |= 1L << (b - 32)
        }
        tx += 1
      }
      ty += 1
    }
    (hi, lo)
  }

  /** m8: IMAGE near-duplicate detection by perceptual hash — the
    * multimodal twin of d3/d4's banded text dedup and the op a
    * large-scale image-corpus pipeline runs before training (re-encoded
    * copies of the same picture carry different bytes, identical
    * dHashes). Pairs within Hamming distance 3 are found WITHOUT an
    * all-pairs scan: each 64-bit hash splits into 4×16-bit bands
    * (map-side explode), candidates come from a keyed EQUALITY
    * self-join on (band, value) — ≤3 flipped bits leave ≥1 of 4 bands
    * intact (pigeonhole), so recall at T=3 is EXACT by construction —
    * then the XOR+popcount Hamming check (s18's integer trick, here the
    * codegen'd `bit_count` builtin) verifies each candidate. At 100 TB:
    * hash cost ∝ corpus (one decode pass), join cost ∝ band-bucket
    * collision mass, never corpus²; a hot band (common texture) is
    * ordinary join skew AQE splits. */
  def m8PhashNeardup(s: SparkSession, dir: String): DataFrame =
    bandedHammingPairs(m8HashesCached(s, dir))

  /** The banded Hamming pair join — ONE definition shared by m8 (image
    * dHash) and m9 (audio sign fingerprint): 4×16-bit bands from the
    * two packed 32-bit words, map-side explode, keyed EQUALITY
    * self-join, XOR+popcount verify at T=3 (pigeonhole-exact recall —
    * BandingPropertySpec). Input: (doc_id, hi, lo). */
  /** Append the 4×16-bit (band_idx, band_val) rows to a frame carrying
    * packed `hi`/`lo` words — the map-side explode every banded
    * consumer shares (pair join, batch-vs-committed match, stream). */
  private def withBands(h: DataFrame): DataFrame =
    h.select(col("*"), posexplode(array(
        shiftrightunsigned(col("hi"), 16), col("hi").bitwiseAND(lit(0xffffL)),
        shiftrightunsigned(col("lo"), 16), col("lo").bitwiseAND(lit(0xffffL))))
      .as(Seq("band_idx", "band_val")))

  /** XOR+popcount Hamming distance between two packed word pairs. */
  private def hammingExpr(hiA: Column, loA: Column, hiB: Column,
      loB: Column): Column =
    (bit_count(hiA.bitwiseXOR(hiB)) + bit_count(loA.bitwiseXOR(loB)))
      .cast("long")

  private[operators] def bandedHammingPairs(hashes: DataFrame): DataFrame = {
    val banded = withBands(hashes.select("doc_id", "hi", "lo"))
    val a = banded.select(col("doc_id").as("doc_a"), col("hi").as("hi_a"),
      col("lo").as("lo_a"), col("band_idx"), col("band_val"))
    val b = banded.select(col("doc_id").as("doc_b"), col("hi").as("hi_b"),
      col("lo").as("lo_b"), col("band_idx"), col("band_val"))
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        hammingExpr(col("hi_a"), col("lo_a"), col("hi_b"), col("lo_b"))
          .as("hamming"))
      .filter(col("hamming") <= 3)
      .distinct() // a pair matching in k bands must count once
      .orderBy("doc_a", "doc_b")
  }

  /** INCREMENTAL fingerprint matching — the production intake shape
    * the full-corpus [[phashDedupCore]] lacks (VERDICT r13 missing #1):
    * an arriving BATCH of fingerprints is checked against the COMMITTED
    * corpus fingerprint table without re-hashing (or re-clustering) the
    * corpus, so daily cost is ∝ batch, not ∝ corpus. Machinery is
    * d15's, at fingerprint grain: the batch's distinct fingerprints
    * Bloom-sketch their band keys (one bounded driver action — ≤ 4
    * keys per distinct batch fingerprint); the corpus side collapses
    * to one representative per distinct fingerprint (min doc — lossless
    * for the min-match contract), bands map-side, and is
    * `might_contain`-prefiltered BEFORE the equality join — no false
    * negatives, so the prune cannot change the result, and the
    * corpus-side shuffle carries ≈ the batch's band mass. Output is
    * COLLAPSED, not pairs (the m9/SCALE_r16 lesson — a popular image
    * has thousands of committed copies and pair emission is
    * Θ(multiplicity)): ONE row per batch doc that near-duplicates the
    * committed corpus at T=3 — (doc_id, match_id = min matching corpus
    * doc, hamming = min distance), the drop-the-batch-copy decision an
    * intake pipeline applies directly. */
  private[graft] def matchAgainstFingerprints(corpusFps: DataFrame,
      batchFps: DataFrame): DataFrame =
    matchCollapsedAgainst(collapseFpsReps(corpusFps), batchFps)

  /** Collapse a fingerprint frame to ONE representative row per
    * distinct fingerprint — (hi, lo, rep = min doc_id). Lossless for
    * the min-match contract (min over matched docs = min over matched
    * groups of their min). Streams pre-collapse ONCE and persist the
    * result, so per-trigger work never re-shuffles the corpus
    * (review r14). */
  private[graft] def collapseFpsReps(corpusFps: DataFrame): DataFrame =
    corpusFps.groupBy("hi", "lo").agg(min("doc_id").as("rep"))

  /** [[matchAgainstFingerprints]] over an ALREADY-COLLAPSED corpus
    * side ([[collapseFpsReps]]' (hi, lo, rep)). */
  private[graft] def matchCollapsedAgainst(cReps: DataFrame,
      batchFps: DataFrame): DataFrame = {
    val bandKey = col("band_idx").cast("long") * 65536L + col("band_val")
    val bBand = withBands(
        batchFps.select("hi", "lo").distinct())
      .select(col("hi").as("b_hi"), col("lo").as("b_lo"),
        col("band_idx"), col("band_val"))
    val sketch = Bloom.sketchBytes(bBand, bandKey)
    val cBand = withBands(cReps)
      .select(col("rep"), col("hi").as("c_hi"), col("lo").as("c_lo"),
        col("band_idx"), col("band_val"))
    val cPre =
      if (sketch == null) cBand.limit(0) // empty batch: nothing matches
      else cBand.filter(Bloom.mightContain(sketch, bandKey))
    val matched = bBand.join(cPre, Seq("band_idx", "band_val"))
      .select(col("b_hi"), col("b_lo"), col("rep"),
        hammingExpr(col("b_hi"), col("b_lo"), col("c_hi"), col("c_lo"))
          .as("hamming"))
      .filter(col("hamming") <= 3)
      // multi-band matches collapse in the same aggregate that takes
      // the min over matched fingerprints — no distinct needed
      .groupBy("b_hi", "b_lo")
      .agg(min("rep").as("match_id"), min("hamming").as("hamming"))
      .withColumnRenamed("b_hi", "hi").withColumnRenamed("b_lo", "lo")
    batchFps.join(matched, Seq("hi", "lo"))
      .select(col("doc_id"), col("match_id"), col("hamming"))
      .orderBy("doc_id")
  }

  /** m10: INCREMENTAL image near-dup — [[matchAgainstFingerprints]]
    * over the m8 family's render: the committed corpus is every base
    * document's fingerprint (hashed once and served from the corpus
    * cache, the d15 discipline — the production artifact is the table
    * `CALL phash_index` commits), the intake batch is the re-encode
    * twins. Every twin whose re-encode stayed within T=3 reports its
    * original as `match_id`; twins that drifted past T report nothing
    * — exactly what the DuckDB oracle's quadratic batch×corpus join
    * finds. */
  def m10IncrementalPhash(s: SparkSession, dir: String): DataFrame = {
    // ONE shared render with m8: the cached frame is docs ∪ twins with
    // twin ids ≥ 1e12, exactly m10's committed-corpus/intake-batch
    // split — the entry pays no render of its own once either entry
    // has run this corpus
    val h = m8HashesCached(s, dir)
    matchAgainstFingerprints(
      h.filter(col("doc_id") < 1000000000000L),
      h.filter(col("doc_id") >= 1000000000000L))
  }

  /** CALL core (`CALL g.system.phash_dedup('db.imgs', 'db.clusters')`):
    * the production image-dedup verb over a user's REAL image bytes —
    * first two columns taken as (id → long, image payload: any
    * ImageIO-decodable format; dHash tolerates lossy codecs, which is
    * its point). Decode → GRAYSCALE conversion (sampling a raw raster
    * band would hash the red channel of an RGB JPEG and the arbitrary
    * palette INDEX of an indexed GIF/PNG — the same picture in two
    * formats would never pair; review r13) → the shared [[dHashWords]]
    * grid → the shared [[collapseFingerprints]] clustering, because a
    * real corpus has popular images duplicated thousands of times and
    * pair emission is Θ(cluster²) — the exact blowup SCALE_r16 records.
    * Output: (doc_id, cluster_id, keep) for every doc in a duplicate
    * cluster, d7's contract. Undecodable payloads refuse LOUDLY with
    * the offending id — for ImageIO's null return (unrecognized format)
    * AND its thrown IIOExceptions (truncated/CMYK variants a reader
    * claims but cannot decode); a silently skipped image reads as "no
    * duplicates" downstream. (The m8 entry renders synthetic media so
    * its DuckDB oracle can recompute the bits; this core is where real
    * corpora come in.) */
  def phashDedupCore(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    collapseFingerprints(s, phashFingerprints(df).localCheckpoint(true))
  }

  /** The decode → grayscale → dHash stage of [[phashDedupCore]], also
    * the body of `CALL g.system.phash_index` — the verb that COMMITS a
    * corpus's fingerprints as a first-class table so intake batches
    * can be checked against them (`CALL phash_match`) without
    * re-decoding the corpus: at 100 TB, re-hashing per daily batch is
    * the difference between ∝ batch and ∝ corpus daily cost. Takes the
    * frame's first two columns as (id → long, image bytes); output
    * (doc_id, hi, lo). Same loud-refusal contract as the dedup verb. */
  def phashFingerprints(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(
        col(df.columns(0)).cast("long").as("doc_id"),
        col(df.columns(1)).cast("binary").as("img"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.grouped(DecodeBatch).flatMap(_.map { case (id, bytes) =>
          require(bytes != null, s"null image payload for doc $id")
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case e: Exception =>
              throw new IllegalArgumentException(
                s"image payload for doc $id failed to decode: ${e.getMessage}", e)
            }
          require(img != null,
            s"image payload for doc $id does not decode (not an " +
              "ImageIO-readable format)")
          val gray = toGray(img)
          val (hi, lo) = dHashWords(gray.getRaster, gray.getWidth, gray.getHeight)
          PHash(id, hi, lo)
        })
      }.toDF()
  }

  /** CALL core (`CALL g.system.phash_match('db.batch', 'db.fps',
    * 'db.matches')`): check an intake image batch against a COMMITTED
    * fingerprint table (`CALL phash_index`'s output, or any (doc_id,
    * hi, lo) frame) — hash ∝ batch, corpus side Bloom-prefiltered,
    * collapsed min-match output ([[matchAgainstFingerprints]]). */
  def phashMatchCore(batchImgs: DataFrame, corpusFps: DataFrame): DataFrame =
    matchCoreAgainst(batchImgs, corpusFps, phashFingerprints, "phash_match")

  /** The intake loop's ACCEPT step (`CALL phash_index_append('db.new',
    * 'db.fps')` / `audio_index_append`): append a new batch's
    * fingerprints to the COMMITTED fingerprint table — after
    * `phash_match` said which batch docs to drop, the survivors join
    * the corpus so tomorrow's batch dedups against them too. Hygiene
    * is the ann_append discipline: ids already fingerprinted refuse
    * loudly (a double-insert would make the min-match contract pick
    * between two rows for one doc). One materialized hash evaluation
    * feeds the clash check and the append. Returns rows appended. */
  def fingerprintAppendCore(batch: DataFrame,
      fpsT: graft.storage.GraftTable,
      hash: DataFrame => DataFrame): Long = {
    val committed = fpsT.read()
    require(committed.columns.take(3).sameElements(Seq("doc_id", "hi", "lo")),
      s"target is not a committed fingerprint table (expected (doc_id, " +
        s"hi, lo), got ${committed.columns.mkString(", ")}) — create it " +
        "with phash_index/audio_index first")
    // FAST-FAIL id hygiene on the raw batch (review r14 #5): both
    // checks need only the id column (a pruned scan), so an obviously
    // bad batch refuses before paying any media decode…
    def checkIds(ids: DataFrame): Unit = {
      val selfDup = ids.groupBy("doc_id").count()
        .filter(col("count") > 1).count()
      require(selfDup == 0L,
        s"$selfDup id(s) appear more than once in the intake batch — " +
          "double-inserting a doc would break the min-match contract")
      val clash = ids.join(committed.select(col("doc_id")),
        Seq("doc_id"), "left_semi").count()
      require(clash == 0L,
        s"$clash id(s) already fingerprinted — an intake batch must " +
          "carry fresh ids (or erase the old rows first)")
    }
    checkIds(batch.select(col(batch.columns(0)).cast("long").as("doc_id")))
    // …then the AUTHORITATIVE checks re-run on the MATERIALIZED hashed
    // frame the append will commit (review r14 #6 / the
    // validateVectorFrame discipline): a nondeterministic or moving
    // batch source re-evaluated at write time could otherwise commit
    // rows the fast-fail never saw. The re-check is two id-only
    // aggregates over the 3-column checkpointed frame — cheap.
    val bfps = hash(batch).localCheckpoint(true)
    checkIds(bfps.select("doc_id"))
    fpsT.append(bfps)
  }

  /** The shared batch-vs-committed-fingerprints CALL body of
    * [[phashMatchCore]] and [[audioMatchCore]]: validate the committed
    * (doc_id, hi, lo) shape loudly, hash the batch with the modality's
    * fingerprint stage (ONE materialized evaluation — the Bloom sketch
    * action and the member-expansion join both consume it), match. */
  private def matchCoreAgainst(batch: DataFrame, corpusFps: DataFrame,
      hash: DataFrame => DataFrame, verb: String): DataFrame = {
    require(corpusFps.columns.length >= 3,
      s"$verb expects a committed fingerprint table with (doc_id, " +
        s"hi, lo) as its first three columns; got ${corpusFps.columns.mkString(", ")}")
    val fps = corpusFps.select(
      col(corpusFps.columns(0)).cast("long").as("doc_id"),
      col(corpusFps.columns(1)).cast("long").as("hi"),
      col(corpusFps.columns(2)).cast("long").as("lo"))
    matchAgainstFingerprints(fps, hash(batch).localCheckpoint(true))
  }

  /** CALL core (`CALL g.system.audio_dedup('db.clips', 'db.clusters')`):
    * the production audio-dedup verb over a user's REAL WAV bytes —
    * m9's collapse-first clustering composed over arbitrary `(id,
    * wav_bytes)` tables (m9's own corpus is the repo's synthesized
    * WAVs; this core is where user recordings come in — VERDICT r13
    * missing #2). First two columns taken positionally (id → long,
    * payload: a RIFF/WAVE container). The parser WALKS the chunk list
    * ([[wavPcm16Frames]]) instead of assuming the canonical 44-byte
    * layout, because real encoders interleave LIST/fact/cue chunks
    * between `fmt ` and `data`; it requires 16-bit integer PCM and
    * fingerprints channel 0 of each frame — the 64-bit sign
    * fingerprint m9 proves against its oracle, so exact copies share a
    * fingerprint and a ≤3-bit re-master (level tweak, dither) lands
    * within the banded join's T=3. Undecodable or non-PCM-16 payloads
    * refuse LOUDLY with the offending id (phashDedupCore's contract —
    * a silently skipped clip reads as "no duplicates" downstream).
    * Output: (doc_id, cluster_id, keep) per doc in a duplicate
    * cluster, d7's contract. */
  def audioDedupCore(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    collapseFingerprints(s, audioFingerprints(df).localCheckpoint(true))
  }

  /** The WAV-parse → sign-fingerprint stage of [[audioDedupCore]],
    * also the body of `CALL g.system.audio_index` — the committed
    * artifact `CALL audio_match` checks intake batches against without
    * re-parsing the corpus (phash_index's discipline on the sound
    * modality). Takes the frame's first two columns as (id → long,
    * WAV bytes); output (doc_id, hi, lo); same loud-refusal
    * contract. */
  def audioFingerprints(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(
        col(df.columns(0)).cast("long").as("doc_id"),
        col(df.columns(1)).cast("binary").as("wav"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        require(bytes != null, s"null audio payload for doc $id")
        val (get, n) = wavPcm16Frames(bytes, id)
        require(n > 0, s"audio payload for doc $id has no samples")
        var hi = 0L
        var lo = 0L
        var j = 0
        while (j < 64) {
          if (get((j.toLong * n / 64).toInt) > 0) {
            if (j < 32) hi |= 1L << j else lo |= 1L << (j - 32)
          }
          j += 1
        }
        PHash(id, hi, lo)
      }.toDF()
  }

  /** CALL core (`CALL g.system.audio_match('db.batch', 'db.fps',
    * 'db.hits')`): check an intake audio batch against a COMMITTED
    * fingerprint table (`CALL audio_index`'s output) — parse ∝ batch,
    * corpus side Bloom-prefiltered, collapsed min-match output; the
    * image verb's exact machinery ([[matchAgainstFingerprints]]) on
    * the sound modality. */
  def audioMatchCore(batchClips: DataFrame, corpusFps: DataFrame): DataFrame =
    matchCoreAgainst(batchClips, corpusFps, audioFingerprints, "audio_match")

  /** Parse a RIFF/WAVE container by walking its chunk list: returns
    * (frame → channel-0 sample, frame count). Requires 16-bit integer
    * PCM (format tag 1, or WAVE_FORMAT_EXTENSIBLE 0xFFFE whose
    * fmt-extension subformat the JDK also treats as PCM when the
    * bit depth says so — refused here for simplicity, loudly). Every
    * structural violation refuses with the doc id: truncation, missing
    * fmt/data, a chunk length overrunning the payload. (Public WAV
    * layout: "RIFF" + size + "WAVE", then chunks of fourcc + LE u32
    * length + payload, word-aligned.) */
  private[operators] def wavPcm16Frames(bytes: Array[Byte],
      id: Long): (Int => Int, Int) = {
    def refuse(why: String): Nothing =
      throw new IllegalArgumentException(
        s"audio payload for doc $id does not decode: $why")
    if (bytes.length < 12) refuse("shorter than a RIFF header")
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") refuse("not a RIFF/WAVE container")
    var off = 12
    var fmtOff = -1
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= bytes.length && (fmtOff < 0 || dataOff < 0)) {
      val cc = tag(off)
      val len = bb.getInt(off + 4)
      // LONG arithmetic: a malicious len near Int.MaxValue would wrap
      // the Int sum negative, pass the bound check, and crash with an
      // unattributed out-of-bounds instead of this refusal (review r14)
      if (len < 0 || off.toLong + 8L + len > bytes.length)
        refuse(s"chunk '$cc' overruns the payload (truncated container)")
      if (cc == "fmt ") {
        // the fields read below sit at +0..+15 of the fmt payload; a
        // short fmt chunk (len 14 files exist in the wild) would read
        // the NEXT chunk's bytes as bitsPerSample (review r14)
        if (len < 16) refuse(s"fmt chunk too short ($len bytes, need 16)")
        fmtOff = off + 8
      }
      else if (cc == "data") { dataOff = off + 8; dataLen = len }
      off += 8 + len + (len & 1) // RIFF chunks are word-aligned
    }
    if (fmtOff < 0) refuse("no fmt chunk")
    if (dataOff < 0) refuse("no data chunk")
    val formatTag = bb.getShort(fmtOff) & 0xffff
    val channels = bb.getShort(fmtOff + 2) & 0xffff
    val bits = bb.getShort(fmtOff + 14) & 0xffff
    if (formatTag != 1) refuse(s"format tag $formatTag is not integer PCM")
    if (bits != 16) refuse(s"$bits-bit samples are not 16-bit PCM")
    if (channels < 1) refuse("zero channels")
    val frameBytes = channels * 2
    val n = dataLen / frameBytes
    (frame => bb.getShort(dataOff + frame * frameBytes).toInt, n)
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
    fanOut(Tables.load(s, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id")).as[Long])
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

  /** Encode stage of [[m9AudioNeardup]]: WAV payloads whose waveform is
    * keyed on `gid = doc_id % 97` — docs sharing a gid carry the SAME
    * recording — and every 5th doc is a "re-mastered" variant (samples
    * at i % 101 == 0 sign-flipped: the localized artifact a re-encode
    * leaves). One definition mirrored in the m9 oracle CTE. */
  private[operators] def m9WavEncoded(s: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[(Long, Array[Byte])] = {
    import s.implicits._
    fanOut(Tables.load(s, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id")).as[Long])
      .mapPartitions { it =>
        it.map { id =>
          val gid = id % 97
          val n = (400 + gid % 200).toInt
          val pert = id % 5 == 0
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
            // ×40503 (odd → bijective mod 2^16) scrambles the linear
            // ramp across the full sample range — without it every
            // sample of a ≤600-sample clip sits below zero and the sign
            // fingerprint degenerates to all-zeros corpus-wide
            // % 65533 and the symmetric -32766 offset keep every value
            // in [-32766, 32766]: the re-master NEGATES samples, and
            // -(-32768) would wrap in a JVM short while the SQL oracle
            // keeps 32768 — the one value the two engines disagree on
            val base = (((gid * 31 + i * 7) * 40503L) % 65533L) - 32766L
            val v = if (pert && i % 101 == 0) -base else base
            bb.putShort(v.toShort)
            i += 1
          }
          (id, bb.array())
        }
      }
  }

  /** The m9 hash stage: REAL WAV container parse (m6's strict checks) →
    * 64-bit SIGN FINGERPRINT over the DECODED samples — bit j = sample
    * at position ⌊j·n/64⌋ is positive — packed as two 32-bit words (the
    * m8 discipline). PCM is lossless, so the oracle recomputes the
    * identical bits from the synthesis formula: a hash match proves the
    * container encode→parse→fingerprint chain. */
  private[operators] def m9Hashes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    m9WavEncoded(s, dir).map { case (id, bytes) =>
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(off: Int): String = new String(bytes, off, 4, "US-ASCII")
      require(tag(0) == "RIFF" && tag(8) == "WAVE" && tag(12) == "fmt " &&
        tag(36) == "data", s"not a canonical WAV container for doc $id")
      require(bb.getShort(20) == 1 && bb.getShort(34) == 16,
        s"expected 16-bit PCM for doc $id")
      val n = bb.getInt(40) / 2
      var hi = 0L
      var lo = 0L
      var j = 0
      while (j < 64) {
        val pos = (j.toLong * n / 64).toInt
        if (bb.getShort(44 + pos * 2) > 0) {
          if (j < 32) hi |= 1L << j else lo |= 1L << (j - 32)
        }
        j += 1
      }
      PHash(id, hi, lo)
    }.toDF()
  }

  /** m9: AUDIO near-duplicate CLUSTERS — the sound modality's dedup,
    * and deliberately NOT m8's pair report: a popular recording has
    * thousands of byte-identical-fingerprint copies, and emitting every
    * pair of an n-member duplicate cluster is Θ(n²) — profiling the m8
    * shape on the 100× copy (each recording's copy count grows with the
    * corpus) produced 1.3·10⁹ pairs and died. The scale-correct shape
    * collapses FIRST: group docs by exact fingerprint (one keyed
    * shuffle, output ∝ distinct recordings — ~2 fingerprints per
    * recording here at ANY corpus size), run the shared
    * [[bandedHammingPairs]] join over the group REPRESENTATIVES only,
    * union-find the tiny representative graph (d7's driver-side
    * union-find — the rep graph stays hundreds of vertices while the
    * corpus grows), and label each doc with its component's minimum
    * doc_id. Output ∝ docs-in-clusters, never pairs²; exact copies and
    * ≤3-bit re-masters land in one cluster, `keep` marks the winner —
    * d7's exact output contract on the audio modality. */
  def m9AudioNeardup(s: SparkSession, dir: String): DataFrame =
    // ONE synthesis+parse+fingerprint pass shared with m11 via the
    // fingerprint-keyed cache (persisted + counted — materialized for
    // collapseFingerprints' multi-plan consumption, the review-r13
    // requirement the localCheckpoint previously served)
    collapseFingerprints(s, m9HashesCached(s, dir))

  private def m9HashesCached(s: SparkSession, dir: String): DataFrame =
    m9HashCache.getOrElseUpdate(s, dir, "documents")(m9Hashes(s, dir))

  /** m11: INCREMENTAL audio near-dup — [[matchAgainstFingerprints]] on
    * the sound modality: the committed corpus is every unperturbed
    * recording's fingerprint, the intake batch is the re-mastered
    * variants (m9's `doc_id % 5 = 0` perturbation — the split rides
    * the SAME synthesized corpus m9's oracle replays). Each re-master
    * whose sign flips stayed within T=3 reports the min matching
    * original; the DuckDB oracle replays the fingerprint CTE and the
    * quadratic batch×corpus join the Bloom-prefiltered banding
    * replaces. ONE fingerprint pass feeds both sides (localCheckpoint
    * — the per-doc WAV stage dominates). */
  def m11IncrementalAudio(s: SparkSession, dir: String): DataFrame = {
    val h = m9HashesCached(s, dir) // shared with m9 — one WAV pass
    matchAgainstFingerprints(
      h.filter(col("doc_id") % 5 =!= 0),
      h.filter(col("doc_id") % 5 === 0))
  }

  /** Temporal luminance signature of ONE AVI payload — the video
    * modality's fingerprint: parse the container ([[parseAvi]]'s
    * strict chunk walk), decode AT MOST 64 DISTINCT sampled frames
    * (positions ⌊j·n/64⌋ — cost is bounded per video regardless of
    * length, the 100 TB property), grayscale-convert each (a color
    * MJPEG's band 0 is its red channel — the phashDedupCore lesson),
    * and set bit j when the sampled frame's mean luminance exceeds
    * 127. Spatially robust by construction (a re-encode moves pixels,
    * barely the frame MEAN); a single re-encoded/replaced frame flips
    * only the bits sampling it. */
  private def videoSignature(codec: JpegCodec, bytes: Array[Byte],
      id: Long): (Long, Long) = {
    val (nFrames, _, _, frames) = parseAvi(bytes, id)
    require(nFrames >= 1, s"video for doc $id has no frames")
    val meanCache = scala.collection.mutable.Map[Int, Double]()
    def mean(f: Int): Double = meanCache.getOrElseUpdate(f, {
      val (foff, flen) = frames(f)
      val img = codec.decode(
        java.util.Arrays.copyOfRange(bytes, foff, foff + flen))
      val gray = toGray(img)
      val (wp, hp) = (gray.getWidth, gray.getHeight)
      sumBand0(gray.getRaster, wp, hp).toDouble / (wp * hp)
    })
    var hi = 0L
    var lo = 0L
    var j = 0
    while (j < 64) {
      if (mean((j.toLong * nFrames / 64).toInt) > 127.0) {
        if (j < 32) hi |= 1L << j else lo |= 1L << (j - 32)
      }
      j += 1
    }
    (hi, lo)
  }

  /** The m12 corpus: every document's MJPEG AVI with ≥ 22 frames (so
    * the one-frame twin perturbation flips at most the 3 signature
    * bits sampling frame 0 — ⌊j·n/64⌋ = 0 for ≤ 3 values of j when
    * n ≥ 22), plus a RE-ENCODED TWIN per 11th such doc (id + 1e12;
    * frame 0's flat gray shifted +128 mod 256, which always crosses
    * the 127 threshold). One definition mirrored in the oracle CTE. */
  private def m12Corpus(s: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[(Long, Array[Byte])] = {
    import s.implicits._
    val base = Tables.load(s, dir, "documents")
      .select(when(col("doc_id").cast("long") < 1000000000000L,
          col("doc_id").cast("long"))
          .otherwise(raise_error(concat(
            lit("m12 twin-id headroom exhausted: doc_id "),
            col("doc_id").cast("string"),
            lit(" >= 1e12 would collide with a re-encode twin id")))
            .cast("long")).as("doc_id"),
        (length(col("text")) / FrameBytes).cast("int").as("n"))
      .filter(col("n") >= 22)
    val all = base.select(col("doc_id"), col("doc_id").as("orig"),
        col("n"), lit(0).as("sh"))
      .unionAll(base.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 1000000000000L).as("doc_id"),
          col("doc_id").as("orig"), col("n"), lit(1).as("sh")))
    fanOut(all.as[(Long, Long, Int, Int)]).mapPartitions { it =>
      val codec = new JpegCodec
      val fc = new Array[Array[Byte]](256)
      it.map { case (outId, orig, n, sh) =>
        (outId, aviBytes(codec, orig, n, shift0 = sh == 1, frameCache = fc))
      }
    }
  }

  /** The m12 signature stage over the rendered corpus — REAL AVI
    * encode → REAL chunk walk + JPEG decode → temporal signature. The
    * flat q=1.0 frames round-trip bit-exactly (m2/m7's proof), so the
    * oracle recomputes the identical bits from the gray formula. */
  private[operators] def m12Signatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    m12Corpus(s, dir).mapPartitions { it =>
      val codec = new JpegCodec
      it.map { case (id, bytes) =>
        val (hi, lo) = videoSignature(codec, bytes, id)
        PHash(id, hi, lo)
      }
    }.toDF()
  }

  /** m12: VIDEO near-duplicate CLUSTERS — the last modality of the
    * dedup family (text d-series, image m8/m10, audio m9/m11):
    * re-encoded/one-frame-replaced copies of a video carry different
    * bytes but near-identical temporal signatures, and a popular clip
    * is duplicated thousands of times, so the output contract is
    * collapse-first clusters (the m9/SCALE_r16 lesson), via the SAME
    * banding + dispatch core as every other fingerprint family. At
    * 100 TB: signature cost ∝ 64 decoded frames per video (never video
    * length), clustering ∝ distinct signatures. */
  def m12VideoNeardup(s: SparkSession, dir: String): DataFrame =
    collapseFingerprints(s, m12SigCache.getOrElseUpdate(s, dir, "documents")(
      m12Signatures(s, dir)))

  /** m13: INCREMENTAL video near-dup — [[matchAgainstFingerprints]] on
    * the video modality, closing the modality × (full/incremental)
    * matrix (VERDICT r14 #2): the committed corpus is every base
    * document's temporal signature (`CALL video_index`'s artifact
    * shape), the intake batch is m12's re-encoded twins (id ≥ 1e12,
    * frame 0 shifted). Each twin whose shift stayed within T=3 — all of
    * them, by the n ≥ 22 corpus bound — reports the min matching
    * original; the DuckDB oracle replays m12's signature CTE and runs
    * the quadratic batch×corpus Hamming join the Bloom-prefiltered
    * banding replaces. ONE signature pass (render + chunk walk + ≤64
    * sampled JPEG decodes per clip) feeds m12 AND both of m13's sides
    * via the shared corpus-keyed cache — the m8/m10 discipline. */
  def m13IncrementalVideo(s: SparkSession, dir: String): DataFrame = {
    val h = m12SigCache.getOrElseUpdate(s, dir, "documents")(
      m12Signatures(s, dir))
    matchAgainstFingerprints(
      h.filter(col("doc_id") < 1000000000000L),
      h.filter(col("doc_id") >= 1000000000000L))
  }

  /** CALL core (`CALL g.system.video_dedup('db.vids', 'db.clusters')`):
    * the production video-dedup verb over a user's REAL AVI bytes —
    * first two columns positionally (id → long, MJPEG AVI payload);
    * [[parseAvi]] refuses corrupt containers loudly with the offending
    * id, [[videoSignature]] decodes ≤ 64 sampled frames through the
    * real JPEG codec (color frames grayscale-converted), and the
    * shared collapse-first clustering labels duplicate clusters. */
  def videoDedupCore(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    collapseFingerprints(s, videoFingerprints(df).localCheckpoint(true))
  }

  /** The parse → sampled-decode → temporal-signature stage of
    * [[videoDedupCore]], also the body of `CALL video_index` — the
    * committed artifact `CALL video_match` checks intake batches
    * against (the phash_index discipline on the video modality). */
  def videoFingerprints(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(
        col(df.columns(0)).cast("long").as("doc_id"),
        col(df.columns(1)).cast("binary").as("avi"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val codec = new JpegCodec
        it.map { case (id, bytes) =>
          require(bytes != null, s"null video payload for doc $id")
          val (hi, lo) = videoSignature(codec, bytes, id)
          PHash(id, hi, lo)
        }
      }.toDF()
  }

  /** CALL core (`CALL g.system.video_match('db.batch', 'db.fps',
    * 'db.hits')`): intake video batch vs committed signatures — the
    * shared min-match machinery on the video modality. */
  def videoMatchCore(batchVids: DataFrame, corpusFps: DataFrame): DataFrame =
    matchCoreAgainst(batchVids, corpusFps, videoFingerprints, "video_match")

  /** Collapse-first fingerprint clustering — ONE definition for m9 and
    * the production [[phashDedupCore]] verb: exact-fingerprint groupBy
    * (output ∝ distinct fingerprints), [[bandedHammingPairs]] over the
    * group REPRESENTATIVES only, d7's COUNT-AND-DISPATCH clustering on
    * the rep graph, min-doc labels. This is the shape that survives
    * duplicate-heavy corpora (pair emission is Θ(cluster²) — SCALE_r16).
    * The rep graph is usually tiny (distinct fingerprints, not docs),
    * but `CALL phash_dedup` points at arbitrary user corpora — a mostly
    * unique, near-dup-rich image corpus (crops/re-encodes, exactly what
    * dHash tolerates) has distinct fingerprints ∝ corpus, so the pair
    * count routes graphs above [[Dedup.d7MaxPairs]] to the distributed
    * min-label propagation instead of unbounded driver arrays (VERDICT
    * r13 #1; both regimes are result-identical, spec-proven). Input
    * must be a MATERIALIZED (doc_id, hi, lo) frame — callers
    * localCheckpoint, since this body consumes it from four plans. */
  private def collapseFingerprints(s: SparkSession, h: DataFrame): DataFrame = {
    val groups = h.groupBy("hi", "lo")
      .agg(min("doc_id").as("rep"), count(lit(1)).as("n_members"))
    // materialized: clusterPairs counts it, then the clustering (either
    // regime) consumes it again — without the checkpoint the banded
    // self-join would re-run per consumer
    val repPairs = bandedHammingPairs(
      groups.select(col("rep").as("doc_id"), col("hi"), col("lo")))
      .select("doc_a", "doc_b")
      .localCheckpoint(true)
    val repLabels = Dedup.clusterPairs(s, repPairs)
      .select(col("doc_id").as("rep"), col("cluster_id").as("lab"))
    h.join(groups, Seq("hi", "lo"))
      .join(repLabels, Seq("rep"), "left")
      // in-cluster docs only: a shared fingerprint (n_members > 1) or a
      // representative with a ≤3-bit neighbor — d7's "dup clusters"
      .filter(col("n_members") > 1 || col("lab").isNotNull)
      .select(col("doc_id"),
        coalesce(col("lab"), col("rep")).as("cluster_id"),
        when(col("doc_id") === coalesce(col("lab"), col("rep")), 1)
          .otherwise(0).as("keep"))
      .orderBy("doc_id")
  }

  // -- m7: REAL video container path (RIFF/AVI, MJPEG frames) ----------

  final case class AviFrame(doc_id: Long, n_frames: Long, width: Long,
      height: Long, frame_no: Long, frame_sum: Long)

  private def leInt(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }
  private def leShort(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }
  private def fourcc(out: java.io.ByteArrayOutputStream, s: String): Unit =
    out.write(s.getBytes("US-ASCII"))

  /** Synthesize a canonical MJPEG AVI per document: `len(text)/16`
    * frames of uniform 16×16 gray (`(doc_id*9 + f*17) % 256`), each a
    * REAL quality-1.0 JDK JPEG (m2's bit-exact flat-frame trick), laid
    * out as RIFF('AVI ') → LIST(hdrl){avih, LIST(strl){strh 'vids'/
    * 'MJPG', strf BITMAPINFOHEADER}} → LIST(movi){'00dc' chunks} — the
    * container shape every MJPEG tool writes. */
  private[graft] def aviEncoded(s: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[(Long, Array[Byte])] = {
    import s.implicits._
    fanOut(Tables.load(s, dir, "documents").select(
      col("doc_id").cast("long").as("doc_id"),
      (length(col("text")) / FrameBytes).cast("int").as("n_frames"))
      .as[(Long, Int)])
      .mapPartitions { it =>
        val codec = new JpegCodec
        val fc = new Array[Array[Byte]](256)
        it.map { case (id, nFrames) =>
          (id, aviBytes(codec, id, nFrames, shift0 = false, frameCache = fc))
        }
      }
  }

  /** One canonical AVI without the codec plumbing — the video
    * fixtures of FingerprintStreamSpec (JpegCodec is private, so the
    * spec cannot call [[aviBytes]] directly). */
  private[graft] def aviFor(renderId: Long, nFrames: Int,
      shift0: Boolean = false): Array[Byte] =
    aviBytes(new JpegCodec, renderId, nFrames, shift0)

  /** Build ONE canonical MJPEG AVI — the body [[aviEncoded]] and m12's
    * re-encode twins share (`shift0` = frame 0's gray shifted +128 mod
    * 256, the one-frame perturbation a lossy re-encode pass leaves). */
  private def aviBytes(codec: JpegCodec, renderId: Long, nFrames: Int,
      shift0: Boolean, frameCache: Array[Array[Byte]] = null): Array[Byte] = {
    // Every frame is a FLAT gray image, so only 256 distinct JPEGs exist
    // across the whole synthesis; a caller-scoped (per-task) cache
    // encodes each gray once instead of once per frame (optimization
    // round 17 — this is fixture synthesis, the bytes are identical).
    def frameJpeg(gray: Int): Array[Byte] =
      if (frameCache == null)
        codec.encode(grayImage(FrameSide, FrameSide, _ => gray), 1.0f)
      else {
        if (frameCache(gray) == null)
          frameCache(gray) =
            codec.encode(grayImage(FrameSide, FrameSide, _ => gray), 1.0f)
        frameCache(gray)
      }
    val frames = Array.tabulate(nFrames) { f =>
      val base = ((renderId * 9 + f * 17) % 256).toInt
      val gray = if (shift0 && f == 0) (base + 128) % 256 else base
      frameJpeg(gray)
    }
    def chunk(cc: String)(body: java.io.ByteArrayOutputStream => Unit)
        : Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      body(b)
      val payload = b.toByteArray
      val o = new java.io.ByteArrayOutputStream()
      fourcc(o, cc); leInt(o, payload.length); o.write(payload)
      if (payload.length % 2 == 1) o.write(0) // RIFF even padding
      o.toByteArray
    }
    def list(tpe: String)(children: Array[Byte]*): Array[Byte] =
      chunk("LIST") { b => fourcc(b, tpe); children.foreach(b.write) }
    val avih = chunk("avih") { b =>
      leInt(b, 40000); leInt(b, 0); leInt(b, 0); leInt(b, 0) // usec/frame…
      leInt(b, nFrames); leInt(b, 0); leInt(b, 1); leInt(b, 0)
      leInt(b, FrameSide); leInt(b, FrameSide)
      (0 until 4).foreach(_ => leInt(b, 0))
    }
    val strh = chunk("strh") { b =>
      fourcc(b, "vids"); fourcc(b, "MJPG")
      leInt(b, 0); leShort(b, 0); leShort(b, 0); leInt(b, 0)
      leInt(b, 1); leInt(b, 25) // scale, rate → 25 fps
      leInt(b, 0); leInt(b, nFrames); leInt(b, 0); leInt(b, 0); leInt(b, 0)
      leShort(b, 0); leShort(b, 0); leShort(b, FrameSide.toShort)
      leShort(b, FrameSide.toShort)
    }
    val strf = chunk("strf") { b =>
      leInt(b, 40); leInt(b, FrameSide); leInt(b, FrameSide)
      leShort(b, 1); leShort(b, 24); fourcc(b, "MJPG")
      leInt(b, 0); leInt(b, 0); leInt(b, 0); leInt(b, 0); leInt(b, 0)
    }
    val movi = list("movi")(frames.map(f => chunk("00dc")(_.write(f))): _*)
    chunk("RIFF") { b =>
      fourcc(b, "AVI ")
      b.write(list("hdrl")(avih, list("strl")(strh, strf)))
      b.write(movi)
    }
  }

  /** RIFF chunk walk of an AVI payload: (n_frames, width, height, frame
    * chunk (offset, len) list). Refuses non-AVI bytes, chunks that
    * overrun their ENCLOSING extent (not just the file — a child
    * spilling past its LIST would otherwise be traversed twice and
    * accepted), an `avih` too short to hold the fields read from it,
    * and a declared frame count that disagrees with the chunks found. */
  private[operators] def parseAvi(bytes: Array[Byte], id: Long)
      : (Long, Long, Long, Seq[(Int, Int)]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    require(bytes.length >= 12 && cc(0) == "RIFF" && cc(8) == "AVI ",
      s"not an AVI container for doc $id")
    var nFrames = -1L; var w = -1L; var h = -1L
    val frames = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    // chunk walk: [off, end) of a chunk SEQUENCE; lists recurse
    def walk(off: Int, end: Int): Unit = {
      var p = off
      while (p + 8 <= end) {
        val tag = cc(p); val len = bb.getInt(p + 4)
        // bound check in Long: a corrupt len near Int.MaxValue would
        // wrap `p + 8 + len` negative and slip past an Int comparison
        require(len >= 0 && p + 8L + len <= end,
          s"truncated $tag chunk in AVI for doc $id")
        if (tag == "LIST") walk(p + 12, p + 8 + len)
        else if (tag == "avih") {
          require(len >= 40, s"avih chunk too short ($len) in AVI for doc $id")
          nFrames = bb.getInt(p + 8 + 16).toLong
          w = bb.getInt(p + 8 + 32).toLong
          h = bb.getInt(p + 8 + 36).toLong
        } else if (tag == "00dc") frames += ((p + 8, len))
        p += 8 + len + (len % 2) // even padding
      }
    }
    walk(12, bytes.length)
    require(nFrames == frames.length.toLong,
      s"declared $nFrames frames but found ${frames.length} chunks (doc $id)")
    (nFrames, w, h, frames.toSeq)
  }

  /** m7: REAL video decode — the AVI is parsed by [[parseAvi]]'s
    * genuine RIFF chunk walk (not fixed offsets), then every
    * [[FrameStride]]-th `00dc` frame is decoded through the real JPEG
    * codec and its DECODED pixel sum emitted alongside the
    * header-parsed n_frames/width/height. The flat q=1.0 frames
    * round-trip bit-exactly, so the DuckDB oracle recomputes `256·gray`
    * directly — a hash match proves container write → chunk walk →
    * frame extract → JPEG decode end-to-end. */
  def m7AviDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    aviEncoded(s, dir).mapPartitions { it =>
      val codec = new JpegCodec
      it.flatMap { case (id, bytes) =>
        val (nFrames, w, h, frames) = parseAvi(bytes, id)
        frames.iterator.zipWithIndex
          .filter(_._2 % FrameStride == 0)
          .map { case ((foff, flen), fno) =>
            val img = codec.decode(
              java.util.Arrays.copyOfRange(bytes, foff, foff + flen))
            // decoded geometry must match the header the row reports —
            // a mismatch is a diagnosable container error, not an AWT
            // index crash or a silently partial sum
            require(img.getWidth == w && img.getHeight == h &&
              w == FrameSide && h == FrameSide,
              s"frame $fno decodes ${img.getWidth}x${img.getHeight}, header says ${w}x$h, " +
                s"operator frames are ${FrameSide}x$FrameSide (doc $id)")
            val sum = sumBand0(img.getRaster, FrameSide, FrameSide)
            AviFrame(id, nFrames, w, h, fno.toLong, sum)
          }
      }
    }.toDF().orderBy("doc_id", "frame_no")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m7_avi_decode" -> m7AviDecode _,
    "m6_wav_decode" -> m6WavDecode _,
    "m1_media_decode" -> m1DecodeFeatures _,
    "m2_frame_sample" -> m2FrameSample _,
    "m3_resize" -> m3Resize _,
    "m4_png_decode" -> m4PngDecode _,
    "m5_png_meta" -> m5PngMeta _,
    "m8_phash_neardup" -> m8PhashNeardup _,
    "m9_audio_neardup" -> m9AudioNeardup _,
    "m10_incremental_phash" -> m10IncrementalPhash _,
    "m11_incremental_audio" -> m11IncrementalAudio _,
    "m12_video_neardup" -> m12VideoNeardup _,
    "m13_incremental_video" -> m13IncrementalVideo _,
  )

  val oracles: Map[String, String] = Map(
    // m7: the flat q=1.0 MJPEG frames round-trip bit-exactly (m2's
    // contract), so the decoded sum is 256·gray; n_frames/width/height
    // come from the avih header the chunk walk parsed — a hash match
    // proves container write → RIFF walk → frame extract → JPEG decode
    "m7_avi_decode" ->
      ("""WITH fr AS (
         |  SELECT doc_id, length(text) // 16 nf,
         |         unnest(range(0, length(text) // 16)) fr
         |  FROM documents)
         |SELECT doc_id, CAST(nf AS BIGINT) n_frames,
         |  CAST(16 AS BIGINT) width, CAST(16 AS BIGINT) height,
         |  CAST(fr AS BIGINT) frame_no,
         |  CAST(256 * ((doc_id * 9 + fr * 17) % 256) AS BIGINT) frame_sum
         |FROM fr WHERE fr % 4 = 0
         |ORDER BY doc_id, frame_no""".stripMargin),
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
    // m1 (lossy-codec contract): the decode must report the exact source
    // geometry and a mean within the tolerance the Spark side asserts —
    // the oracle pins the flag at 1, so a broken/drifting JPEG decode
    // (or a wrong-size image) flips the hash
    "m1_media_decode" ->
      ("""SELECT doc_id,
         |  CAST(n_chars % 64 + 16 AS BIGINT) width,
         |  CAST(doc_id % 32 + 16 AS BIGINT) height,
         |  CAST(1 AS BIGINT) mean_ok
         |FROM documents ORDER BY doc_id""".stripMargin),
    // m2 (lossless flat-frame contract): each sampled frame is a uniform
    // 16x16 gray JPEG at quality 1.0, which round-trips bit-exactly, so
    // the DECODED pixel sum must equal 256*gray recomputed here. The
    // frame index comes from a correlated scalar range() over each
    // document's own length (the table-function form can't be lateral in
    // DuckDB 1.0) — no fixed frame cap to silently diverge on long payloads
    "m2_frame_sample" ->
      ("""WITH fr AS (
         |  SELECT doc_id, unnest(range(0, length(text) // 16)) fr
         |  FROM documents)
         |SELECT doc_id, CAST(fr AS BIGINT) frame_no,
         |  CAST(256 * ((doc_id * 7 + fr * 13) % 256) AS BIGINT) frame_sum
         |FROM fr WHERE fr % 4 = 0
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
    // m8: PNG is lossless, so the dHash bits recompute from the source
    // characters directly; the oracle replays the twin CTE, the 9×8
    // grid, the two packed 32-bit words, and the T=3 Hamming pairs
    // (DuckDB's native xor/bit_count against Spark's banded join — the
    // oracle side is the all-pairs formulation the banding replaces)
    "m8_phash_neardup" ->
      ("""WITH tw AS (SELECT doc_id + 1000000000000 AS doc_id,
         |         substr(text, 1, CAST(length(text)-1 AS INT)) || 'x' AS text
         |       FROM documents WHERE doc_id % 13 = 0 AND length(text) > 0),
         |corpus AS (SELECT doc_id, text FROM documents UNION ALL SELECT * FROM tw),
         |f AS (SELECT doc_id, text, length(text) len,
         |             length(text) % 48 + 16 w, length(text) % 24 + 16 h
         |      FROM corpus),
         |gx AS (SELECT doc_id, w, h, len, text, unnest(range(0, 8)) ty FROM f),
         |gxy AS (SELECT doc_id, w, h, len, text, ty, unnest(range(0, 8)) tx
         |        FROM gx),
         |bits AS (SELECT doc_id, ty, tx,
         |  CASE WHEN (CASE WHEN len = 0 THEN 0 ELSE
         |      ascii(substr(text, CAST(((ty*h//8)*w + (tx*w//9)) % len AS INT)+1, 1)) END)
         |     < (CASE WHEN len = 0 THEN 0 ELSE
         |      ascii(substr(text, CAST(((ty*h//8)*w + ((tx+1)*w//9)) % len AS INT)+1, 1)) END)
         |  THEN 1 ELSE 0 END bv
         |  FROM gxy),
         |h AS (SELECT doc_id,
         |  CAST(sum(CASE WHEN ty < 4 THEN bv * (1::BIGINT << (ty*8+tx)) ELSE 0 END) AS BIGINT) hi,
         |  CAST(sum(CASE WHEN ty >= 4 THEN bv * (1::BIGINT << (ty*8+tx-32)) ELSE 0 END) AS BIGINT) lo
         |  FROM bits GROUP BY doc_id)
         |SELECT a.doc_id doc_a, b.doc_id doc_b,
         |  CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS BIGINT) hamming
         |FROM h a JOIN h b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
         |ORDER BY 1, 2""".stripMargin),
    // m10: the oracle replays m8's dHash CTE over base docs (the
    // committed corpus) and the twins (the intake batch), then runs
    // the quadratic batch×corpus Hamming join the Bloom-prefiltered
    // banded match replaces, collapsed to one min-match row per batch
    // doc — the d15 proof shape at fingerprint grain
    "m10_incremental_phash" ->
      ("""WITH tw AS (SELECT doc_id + 1000000000000 AS doc_id,
         |         substr(text, 1, CAST(length(text)-1 AS INT)) || 'x' AS text
         |       FROM documents WHERE doc_id % 13 = 0 AND length(text) > 0),
         |corpus AS (SELECT doc_id, text FROM documents UNION ALL SELECT * FROM tw),
         |f AS (SELECT doc_id, text, length(text) len,
         |             length(text) % 48 + 16 w, length(text) % 24 + 16 h
         |      FROM corpus),
         |gx AS (SELECT doc_id, w, h, len, text, unnest(range(0, 8)) ty FROM f),
         |gxy AS (SELECT doc_id, w, h, len, text, ty, unnest(range(0, 8)) tx
         |        FROM gx),
         |bits AS (SELECT doc_id, ty, tx,
         |  CASE WHEN (CASE WHEN len = 0 THEN 0 ELSE
         |      ascii(substr(text, CAST(((ty*h//8)*w + (tx*w//9)) % len AS INT)+1, 1)) END)
         |     < (CASE WHEN len = 0 THEN 0 ELSE
         |      ascii(substr(text, CAST(((ty*h//8)*w + ((tx+1)*w//9)) % len AS INT)+1, 1)) END)
         |  THEN 1 ELSE 0 END bv
         |  FROM gxy),
         |hh AS (SELECT doc_id,
         |  CAST(sum(CASE WHEN ty < 4 THEN bv * (1::BIGINT << (ty*8+tx)) ELSE 0 END) AS BIGINT) hi,
         |  CAST(sum(CASE WHEN ty >= 4 THEN bv * (1::BIGINT << (ty*8+tx-32)) ELSE 0 END) AS BIGINT) lo
         |  FROM bits GROUP BY doc_id)
         |SELECT b.doc_id,
         |  CAST(min(c.doc_id) AS BIGINT) match_id,
         |  CAST(min(bit_count(xor(b.hi, c.hi)) + bit_count(xor(b.lo, c.lo))) AS BIGINT) hamming
         |FROM hh b JOIN hh c
         |  ON b.doc_id >= 1000000000000 AND c.doc_id < 1000000000000
         |  AND bit_count(xor(b.hi, c.hi)) + bit_count(xor(b.lo, c.lo)) <= 3
         |GROUP BY b.doc_id
         |ORDER BY b.doc_id""".stripMargin),
    // m12: the flat q=1.0 MJPEG frames round-trip bit-exactly (m2/m7's
    // contract), so each sampled frame's MEAN equals its flat gray and
    // the oracle recomputes the temporal signature straight from the
    // gray formula — twin CTE, threshold bits, packed words — then
    // replays the collapse-first clustering via m9's recursive-CTE
    // connected components (every rep is already its group's min)
    "m12_video_neardup" ->
      ("""WITH RECURSIVE base AS (
         |  SELECT doc_id, CAST(length(text)//16 AS BIGINT) n FROM documents
         |  WHERE length(text)//16 >= 22),
         |alld AS (SELECT doc_id, doc_id orig, n, 0 sh FROM base
         |        UNION ALL
         |        SELECT doc_id + 1000000000000, doc_id, n, 1 FROM base
         |        WHERE doc_id % 11 = 0),
         |j64 AS (SELECT doc_id, orig, n, sh, unnest(range(0, 64)) j FROM alld),
         |g AS (SELECT doc_id, j,
         |        CASE WHEN sh = 1 AND (j*n)//64 = 0
         |             THEN ((orig*9 + ((j*n)//64)*17) % 256 + 128) % 256
         |             ELSE (orig*9 + ((j*n)//64)*17) % 256 END gray
         |      FROM j64),
         |hh AS (SELECT doc_id,
         |        CAST(sum(CASE WHEN j < 32 AND gray > 127 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) hi,
         |        CAST(sum(CASE WHEN j >= 32 AND gray > 127 THEN (1::BIGINT << (j-32)) ELSE 0 END) AS BIGINT) lo
         |      FROM g GROUP BY doc_id),
         |gg AS (SELECT hi, lo, min(doc_id) rep, count(*) n_members
         |      FROM hh GROUP BY hi, lo),
         |pr AS (SELECT a.rep ra, b.rep rb FROM gg a JOIN gg b ON a.rep < b.rep
         |       WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3),
         |edges AS (SELECT ra a, rb b FROM pr UNION ALL SELECT rb, ra FROM pr),
         |reach(vv, r) AS (
         |  SELECT DISTINCT a, a FROM edges
         |  UNION
         |  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.vv),
         |replab AS (SELECT vv rep, min(r) lab FROM reach GROUP BY vv),
         |docs2 AS (SELECT hh.doc_id, gg.rep, gg.n_members, replab.lab
         |          FROM hh JOIN gg ON hh.hi = gg.hi AND hh.lo = gg.lo
         |          LEFT JOIN replab ON gg.rep = replab.rep)
         |SELECT doc_id, coalesce(lab, rep) cluster_id,
         |  CASE WHEN doc_id = coalesce(lab, rep) THEN 1 ELSE 0 END keep
         |FROM docs2 WHERE n_members > 1 OR lab IS NOT NULL
         |ORDER BY doc_id""".stripMargin),
    // m13: the oracle replays m12's temporal-signature CTE (the flat
    // q=1.0 frames round-trip bit-exactly, so the gray formula IS the
    // frame mean), splits it into the committed base corpus and the
    // re-encoded-twin intake batch, and runs the quadratic
    // batch×corpus Hamming join the Bloom-prefiltered banded match
    // replaces — m10's proof shape on the video modality
    "m13_incremental_video" ->
      ("""WITH base AS (
         |  SELECT doc_id, CAST(length(text)//16 AS BIGINT) n FROM documents
         |  WHERE length(text)//16 >= 22),
         |alld AS (SELECT doc_id, doc_id orig, n, 0 sh FROM base
         |        UNION ALL
         |        SELECT doc_id + 1000000000000, doc_id, n, 1 FROM base
         |        WHERE doc_id % 11 = 0),
         |j64 AS (SELECT doc_id, orig, n, sh, unnest(range(0, 64)) j FROM alld),
         |g AS (SELECT doc_id, j,
         |        CASE WHEN sh = 1 AND (j*n)//64 = 0
         |             THEN ((orig*9 + ((j*n)//64)*17) % 256 + 128) % 256
         |             ELSE (orig*9 + ((j*n)//64)*17) % 256 END gray
         |      FROM j64),
         |hh AS (SELECT doc_id,
         |        CAST(sum(CASE WHEN j < 32 AND gray > 127 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) hi,
         |        CAST(sum(CASE WHEN j >= 32 AND gray > 127 THEN (1::BIGINT << (j-32)) ELSE 0 END) AS BIGINT) lo
         |      FROM g GROUP BY doc_id)
         |SELECT b.doc_id,
         |  CAST(min(c.doc_id) AS BIGINT) match_id,
         |  CAST(min(bit_count(xor(b.hi, c.hi)) + bit_count(xor(b.lo, c.lo))) AS BIGINT) hamming
         |FROM hh b JOIN hh c
         |  ON b.doc_id >= 1000000000000 AND c.doc_id < 1000000000000
         |  AND bit_count(xor(b.hi, c.hi)) + bit_count(xor(b.lo, c.lo)) <= 3
         |GROUP BY b.doc_id
         |ORDER BY b.doc_id""".stripMargin),
    // m11: the oracle replays m9's fingerprint CTE, splits it into the
    // unperturbed corpus and the re-mastered intake batch, and runs
    // the quadratic batch×corpus Hamming join the Bloom-prefiltered
    // banded match replaces, collapsed to one min-match row per batch
    // doc — m10's proof shape on the sound modality
    "m11_incremental_audio" ->
      ("""WITH d AS (SELECT doc_id, doc_id % 97 gid,
         |                  400 + (doc_id % 97) % 200 n,
         |                  CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END pert
         |           FROM documents),
         |jj AS (SELECT doc_id, gid, n, pert, unnest(range(0, 64)) j FROM d),
         |v AS (SELECT doc_id, j,
         |        CASE WHEN pert = 1 AND ((j*n)//64) % 101 = 0
         |             THEN -((((gid*31 + ((j*n)//64)*7) * 40503) % 65533) - 32766)
         |             ELSE (((gid*31 + ((j*n)//64)*7) * 40503) % 65533) - 32766 END val
         |      FROM jj),
         |hh AS (SELECT doc_id,
         |        CAST(sum(CASE WHEN j < 32 AND val > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) hi,
         |        CAST(sum(CASE WHEN j >= 32 AND val > 0 THEN (1::BIGINT << (j-32)) ELSE 0 END) AS BIGINT) lo
         |      FROM v GROUP BY doc_id)
         |SELECT b.doc_id,
         |  CAST(min(c.doc_id) AS BIGINT) match_id,
         |  CAST(min(bit_count(xor(b.hi, c.hi)) + bit_count(xor(b.lo, c.lo))) AS BIGINT) hamming
         |FROM hh b JOIN hh c
         |  ON b.doc_id % 5 = 0 AND c.doc_id % 5 <> 0
         |  AND bit_count(xor(b.hi, c.hi)) + bit_count(xor(b.lo, c.lo)) <= 3
         |GROUP BY b.doc_id
         |ORDER BY b.doc_id""".stripMargin),
    // m9: PCM is lossless — the oracle recomputes the sign fingerprint
    // straight from the synthesis formula (m6's proof shape), then runs
    // the ALL-PAIRS Hamming join over the distinct-fingerprint
    // representatives and the recursive-CTE connected components the
    // banded join + union-find replace (d7's oracle shape); every
    // component root is its minimum member because each rep is already
    // its group's min doc_id
    "m9_audio_neardup" ->
      ("""WITH RECURSIVE d AS (SELECT doc_id, doc_id % 97 gid,
         |                  400 + (doc_id % 97) % 200 n,
         |                  CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END pert
         |           FROM documents),
         |jj AS (SELECT doc_id, gid, n, pert, unnest(range(0, 64)) j FROM d),
         |v AS (SELECT doc_id, j,
         |        CASE WHEN pert = 1 AND ((j*n)//64) % 101 = 0
         |             THEN -((((gid*31 + ((j*n)//64)*7) * 40503) % 65533) - 32766)
         |             ELSE (((gid*31 + ((j*n)//64)*7) * 40503) % 65533) - 32766 END val
         |      FROM jj),
         |h AS (SELECT doc_id,
         |        CAST(sum(CASE WHEN j < 32 AND val > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) hi,
         |        CAST(sum(CASE WHEN j >= 32 AND val > 0 THEN (1::BIGINT << (j-32)) ELSE 0 END) AS BIGINT) lo
         |      FROM v GROUP BY doc_id),
         |g AS (SELECT hi, lo, min(doc_id) rep, count(*) n_members
         |      FROM h GROUP BY hi, lo),
         |pr AS (SELECT a.rep ra, b.rep rb FROM g a JOIN g b ON a.rep < b.rep
         |       WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3),
         |edges AS (SELECT ra a, rb b FROM pr UNION ALL SELECT rb, ra FROM pr),
         |reach(vv, r) AS (
         |  SELECT DISTINCT a, a FROM edges
         |  UNION
         |  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.vv),
         |replab AS (SELECT vv rep, min(r) lab FROM reach GROUP BY vv),
         |docs2 AS (SELECT h.doc_id, g.rep, g.n_members, replab.lab
         |          FROM h JOIN g ON h.hi = g.hi AND h.lo = g.lo
         |          LEFT JOIN replab ON g.rep = replab.rep)
         |SELECT doc_id, coalesce(lab, rep) cluster_id,
         |  CASE WHEN doc_id = coalesce(lab, rep) THEN 1 ELSE 0 END keep
         |FROM docs2 WHERE n_members > 1 OR lab IS NOT NULL
         |ORDER BY doc_id""".stripMargin),
    // m3 (lossy-codec contract): every nearest-neighbor-sampled DECODED
    // pixel must sit within ±32 of its source — flag pinned at 1
    "m3_resize" ->
      ("""SELECT doc_id,
         |  CAST(8 AS BIGINT) thumb_w, CAST(8 AS BIGINT) thumb_h,
         |  CAST(1 AS BIGINT) thumb_ok
         |FROM documents ORDER BY doc_id""".stripMargin),
  )
}
