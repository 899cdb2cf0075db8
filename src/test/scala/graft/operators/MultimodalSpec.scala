package graft.operators

import graft.SparkSpec

/** m4 is the no-stub multimodal path: the payload must be a genuine PNG
  * (real codec on both sides), and the decoded features must equal the
  * direct byte arithmetic — PNG grayscale is lossless. */
class MultimodalSpec extends SparkSpec {

  test("m4 payloads are real PNGs; decode recovers exact source bytes") {
    val enc = Multimodal.pngEncoded(spark, sf("sf0.001")).take(5)
    assert(enc.nonEmpty)
    val pngMagic = Array(0x89, 0x50, 0x4e, 0x47).map(_.toByte)
    enc.foreach { case (id, png) =>
      assert(png.take(4).sameElements(pngMagic), s"doc $id payload is not a PNG")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img != null, s"doc $id payload does not decode")
      assert(img.getColorModel.getPixelSize === 8, "grayscale 8-bit")
    }
  }

  test("m4 decoded features equal direct text-byte arithmetic (lossless codec)") {
    import org.apache.spark.sql.functions._
    val out = Multimodal.m4PngDecode(spark, sf("sf0.001"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
      .select(col("doc_id").cast("long"), col("text"), col("n_chars").cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(docs.nonEmpty)
    docs.take(20).foreach { case (id, text, nChars) =>
      val w = nChars % 64 + 16
      val h = id % 32 + 16
      // character domain (& 0xff), matching the oracle's ascii(substr(...))
      val expected = (0L until w * h)
        .map(k => (text.charAt((k % text.length).toInt) & 0xff).toLong).sum
      assert(out(id) === ((w, h, expected)), s"doc $id decode mismatch")
    }
  }

  test("m4 encode guards empty documents and uses the character domain") {
    import spark.implicits._
    val dir = tmpDir("m4-edge")
    Seq(
      (1L, "", 0L),                    // empty: must not divide by zero
      (2L, "café", 4L),           // é = codepoint 233, one CHAR (two UTF-8 bytes)
      (3L, "plain ascii", 11L))
      .toDF("doc_id", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Multimodal.m4PngDecode(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(1L) === 0L, "empty document renders as zero pixels")
    // é contributes 233 per occurrence — the character/codepoint domain,
    // not the 2-byte UTF-8 encoding (which would shift every later pixel)
    val w2 = 4 % 64 + 16; val h2 = 2 % 32 + 16
    val codes = "café".map(_ & 0xff)
    val expected2 = (0 until w2 * h2).map(k => codes(k % 4).toLong).sum
    assert(out(2L) === expected2)
  }

  test("m1/m3 payloads are real JPEGs: FFD8 magic, independently decodable, right geometry") {
    val enc = Multimodal.jpegEncoded(spark, sf("sf0.001")).take(5)
    assert(enc.nonEmpty)
    enc.foreach { case (id, jpeg) =>
      assert((jpeg(0) & 0xff) === 0xff && (jpeg(1) & 0xff) === 0xd8,
        s"doc $id payload is not a JPEG (SOI marker missing)")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
      assert(img != null, s"doc $id payload does not decode as JPEG")
      assert(img.getHeight === (id % 32 + 16).toInt, s"doc $id decoded height")
    }
  }

  test("m1 lossy-codec contract: exact dimensions, decoded mean within 0.5/px of source") {
    import org.apache.spark.sql.functions._
    val out = Multimodal.m1DecodeFeatures(spark, sf("sf0.001")).collect()
    assert(out.nonEmpty)
    val dims = graft.Tables.load(spark, sf("sf0.001"), "documents")
      .select(col("doc_id").cast("long"), col("n_chars").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val (id, w, h, ok) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(w === dims(id) % 64 + 16, s"doc $id width from the real decode")
      assert(h === id % 32 + 16, s"doc $id height from the real decode")
      assert(ok === 1L, s"doc $id decoded mean drifted past the JPEG tolerance")
    }
  }

  test("m2 flat frames at quality 1.0 round-trip bit-exactly through the real JPEG codec") {
    val rows = Multimodal.m2FrameSample(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, f, sum) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(sum === 256L * ((id * 7 + f * 13) % 256),
        s"doc $id frame $f: decoded pixel sum must equal the flat gray level x256")
    }
  }

  test("m3 thumbnails: every nearest-neighbor sample of the decoded raster within ±32") {
    val rows = Multimodal.m3Resize(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert((r.getLong(1), r.getLong(2)) === ((8L, 8L)))
      assert(r.getLong(3) === 1L,
        s"doc ${r.getLong(0)}: a decoded thumbnail sample drifted past ±32")
    }
  }

  test("m6 payloads are real WAVs: the JDK's own AudioSystem decodes them") {
    val enc = Multimodal.wavEncoded(spark, sf("sf0.001")).take(5)
    assert(enc.nonEmpty)
    enc.foreach { case (id, bytes) =>
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      assert(fmt.getSampleRate === 8000f && fmt.getChannels === 1 &&
        fmt.getSampleSizeInBits === 16)
      assert(in.getFrameLength === 400 + id % 200)
      // first sample, little-endian, matches the synthesis formula
      val frame = new Array[Byte](2)
      in.read(frame)
      val s0 = ((frame(1) << 8) | (frame(0) & 0xff)).toShort
      assert(s0 === (((id * 31) % 65536) - 32768).toShort)
      in.close()
    }
  }

  test("m7 payloads are real AVIs: RIFF structure, MJPG fourccs, well-formed JPEG chunks") {
    val enc = Multimodal.aviEncoded(spark, sf("sf0.001"))
      .filter(_._2.length > 300).take(5) // docs with at least one frame
    assert(enc.nonEmpty)
    enc.foreach { case (id, bytes) =>
      def cc(off: Int) = new String(bytes, off, 4, "US-ASCII")
      assert(cc(0) === "RIFF" && cc(8) === "AVI ")
      val s = new String(bytes, "ISO-8859-1")
      assert(s.contains("hdrl") && s.contains("avih") && s.contains("strl"))
      assert(s.contains("vids") && s.contains("MJPG") && s.contains("movi"))
      // ONE traversal definition: the production chunk walk supplies the
      // frame boundaries; every frame is a complete JPEG — SOI magic,
      // EOI trailer, independently decodable by a FRESH ImageIO call
      val (nFrames, w, h, frames) = Multimodal.parseAvi(bytes, id)
      assert(w === 16 && h === 16)
      assert(nFrames === frames.length.toLong && frames.nonEmpty,
        s"doc $id should carry at least one frame chunk")
      frames.foreach { case (foff, flen) =>
        assert((bytes(foff) & 0xff) === 0xff && (bytes(foff + 1) & 0xff) === 0xd8,
          s"frame chunk must start with JPEG SOI (doc $id)")
        assert((bytes(foff + flen - 2) & 0xff) === 0xff &&
          (bytes(foff + flen - 1) & 0xff) === 0xd9,
          s"frame chunk must end with JPEG EOI (doc $id)")
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
          java.util.Arrays.copyOfRange(bytes, foff, foff + flen)))
        assert(img.getWidth === 16 && img.getHeight === 16)
      }
    }
  }

  test("m7 chunk walk rejects a corrupted container instead of mis-decoding") {
    val good = Multimodal.aviEncoded(spark, sf("sf0.001"))
      .filter(_._2.length > 300).take(1).head._2
    // flip the RIFF magic: the walk must refuse, not return garbage
    val bad = good.clone(); bad(0) = 'X'.toByte
    val ex = intercept[IllegalArgumentException] { Multimodal.parseAvi(bad, -1L) }
    assert(ex.getMessage.contains("not an AVI container"))
    // truncation: the movi LIST now overruns its extent
    val short = java.util.Arrays.copyOfRange(good, 0, good.length - 10)
    val ex2 = intercept[IllegalArgumentException] { Multimodal.parseAvi(short, -1L) }
    assert(ex2.getMessage.contains("truncated"), ex2.getMessage)
    // declared-vs-found mismatch: bump avih TotalFrames (offset +16 into
    // the avih payload) in an otherwise-valid container
    val miscount = good.clone()
    val avihOff = new String(good, "ISO-8859-1").indexOf("avih")
    assert(avihOff > 0)
    val fOff = avihOff + 8 + 16 // fourcc + len, then dwTotalFrames
    miscount(fOff) = (miscount(fOff) + 1).toByte
    val ex3 = intercept[IllegalArgumentException] { Multimodal.parseAvi(miscount, -1L) }
    assert(ex3.getMessage.contains("frames but found"), ex3.getMessage)
    // Int-overflow length: a chunk len near Int.MaxValue must hit the
    // documented 'truncated' refusal, not wrap the bound check negative
    // and walk out of the array (ADVICE r10)
    val overflow = good.clone()
    val moviOff = new String(good, "ISO-8859-1").indexOf("LIST")
    assert(moviOff > 0)
    val lb = java.nio.ByteBuffer.wrap(overflow)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    lb.putInt(moviOff + 4, Int.MaxValue - 4)
    val ex4 = intercept[IllegalArgumentException] { Multimodal.parseAvi(overflow, -1L) }
    assert(ex4.getMessage.contains("truncated"), ex4.getMessage)
  }

  test("m5 header-parsed geometry equals m4 codec-decoded geometry") {
    val dir = sf("sf0.001")
    val meta = Multimodal.m5PngMeta(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    val decoded = Multimodal.m4PngDecode(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(meta.keySet === decoded.keySet)
    meta.foreach { case (id, (sigOk, w, h, depth, color)) =>
      assert(sigOk === 1L, s"doc $id: PNG signature")
      assert((w, h) === decoded(id), s"doc $id: header vs decoded geometry")
      assert(depth === 8L && color === 0L, s"doc $id: grayscale-8 settings")
    }
  }

  test("m8 banded pHash join ≡ the naive all-pairs Hamming scan; twins recovered; keyed-join plan") {
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    val got = Multimodal.m8PhashNeardup(spark, dir)
    val rows = got.collect()

    // exact recall at T=3: the banded candidates must equal the naive
    // all-pairs formulation over the SAME hash frame (quadratic — spec
    // scale only; 4×16-bit bands + ≤3 flips ⇒ ≥1 intact band)
    val h = Multimodal.m8Hashes(spark, dir)
    val a = h.select(col("doc_id").as("doc_a"), col("hi").as("hi_a"),
      col("lo").as("lo_a"))
    val b = h.select(col("doc_id").as("doc_b"), col("hi").as("hi_b"),
      col("lo").as("lo_b"))
    val naive = a.join(b, col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (bit_count(col("hi_a").bitwiseXOR(col("hi_b"))) +
          bit_count(col("lo_a").bitwiseXOR(col("lo_b")))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= 3)
      .orderBy("doc_a", "doc_b").collect()
    assert(rows.toSeq === naive.toSeq)

    // every planted twin whose edit stayed within T must surface as the
    // (id, id+1e6) pair — and at sf0.001 every one of the 38 does
    assert(rows.nonEmpty)
    val twinPairs = rows.filter(r => r.getLong(1) - r.getLong(0) == 1000000000000L)
    assert(twinPairs.length >= 30,
      s"expected the planted twins recovered, got ${twinPairs.length}")
    assert(rows.forall(_.getLong(2) <= 3L))

    // scale shape: the candidate join is a keyed equality join on the
    // band, never an all-pairs nested loop
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("m9 payloads are real WAVs; banded audio pairs ≡ naive; exact copies and re-masters both surface") {
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    // the payloads decode through the JDK's own audio stack
    Multimodal.m9WavEncoded(spark, dir).take(3).foreach { case (id, bytes) =>
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      assert(in.getFormat.getSampleSizeInBits === 16)
      assert(in.getFrameLength === 400 + (id % 97) % 200)
      in.close()
    }
    val rows = Multimodal.m9AudioNeardup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.nonEmpty)

    // independent reference: per-doc fingerprints → NAIVE all-pairs
    // Hamming edges → Scala BFS components → min-doc labels. The
    // collapse-first banded pipeline must reproduce it exactly.
    val fps = Multimodal.m9Hashes(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    val ids = fps.keys.toSeq.sorted
    val adj = scala.collection.mutable.Map[Long, List[Long]]().withDefaultValue(Nil)
    var anyEdge = Set.empty[Long]
    for (i <- ids.indices; j <- (i + 1) until ids.size) {
      val (x, y) = (ids(i), ids(j))
      if (ham(fps(x), fps(y)) <= 3) {
        adj(x) ::= y; adj(y) ::= x
        anyEdge += x; anyEdge += y
      }
    }
    val label = scala.collection.mutable.Map[Long, Long]()
    ids.foreach { v =>
      if (!label.contains(v) && anyEdge(v)) {
        var frontier = List(v); var comp = List.empty[Long]
        val seen = scala.collection.mutable.Set(v)
        while (frontier.nonEmpty) {
          val h0 = frontier.head; frontier = frontier.tail
          comp ::= h0
          adj(h0).foreach(w => if (!seen(w)) { seen += w; frontier ::= w })
        }
        val m = comp.min
        comp.foreach(c => label(c) = m)
      }
    }
    val expected = ids.filter(label.contains)
      .map(v => (v, label(v), if (v == label(v)) 1 else 0))
    assert(rows.toSeq === expected,
      s"collapse-first pipeline must equal the naive BFS clustering")
    // the corpus must actually exercise both duplicate classes: exact
    // copies (shared fingerprint) and ≤3-bit re-mastered variants
    val byFp = fps.groupBy(_._2)
    assert(byFp.exists(_._2.size > 1), "expected exact-fingerprint copies")
    assert(anyEdge.exists(v => byFp(fps(v)).size == 1),
      "expected a near-dup edge between DISTINCT fingerprints")
  }

  test("wavPcm16Frames refuses adversarial containers loudly: overflow chunk length, short fmt chunk") {
    def wav(n: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(16000)
        .putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(n * 2)
      var i = 0; while (i < n) { bb.putShort(100); i += 1 }
      bb.array()
    }
    // a declared chunk length near Int.MaxValue must hit the documented
    // refusal, not wrap the Int bound check negative and walk out of
    // the array (review r14 — the m7 AVI walk's own lesson)
    val overflow = wav(64)
    java.nio.ByteBuffer.wrap(overflow)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, Int.MaxValue - 4) // the data chunk's length field
    val e1 = intercept[IllegalArgumentException] {
      Multimodal.wavPcm16Frames(overflow, -1L)
    }
    assert(e1.getMessage.contains("overruns"), e1.getMessage)
    // a short fmt chunk (len 14 exists in old encoders) must refuse,
    // not read the next chunk's bytes as bitsPerSample
    val shortFmt = wav(64)
    java.nio.ByteBuffer.wrap(shortFmt)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(16, 14) // the fmt chunk's length field
    val e2 = intercept[IllegalArgumentException] {
      Multimodal.wavPcm16Frames(shortFmt, -1L)
    }
    assert(e2.getMessage.contains("fmt chunk too short"), e2.getMessage)
  }

  test("m10 scale shape: keyed banded equality join, Bloom-prefiltered corpus side, no nested-loop plan") {
    val got = Multimodal.m10IncrementalPhash(spark, sf("sf0.001"))
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(2000))
    // the corpus-side prefilter reaches the plan (might_contain rides
    // the banded scan before the join)
    assert(plan.contains("might_contain"),
      "the Bloom prefilter must land map-side on the corpus band stream")
    // every batch doc that reports must cite a genuine corpus doc at
    // hamming <= 3 (min-match contract sanity at entry scale)
    val rows = got.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) >= 1000000000000L &&
      r.getLong(1) < 1000000000000L && r.getLong(2) <= 3L))
  }

  /** One 64×64 grayscale PNG: pixel value = column index (every dHash
    * bit set), with chosen grid-sample pixels forced to 255 so exactly
    * those bits flip — a controlled ≤3-bit "re-encode" family. */
  private def gridPng(flipBits: Seq[(Int, Int)]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    for (y <- 0 until 64; x <- 0 until 64) raster.setSample(x, y, 0, x)
    flipBits.foreach { case (ty, tx) =>
      raster.setSample(tx * 64 / 9, ty * 64 / 8, 0, 255) // gL=255 > gR
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("phashDedupCore routes a rep graph above the gate to the distributed d7 path (identical clusters)") {
    import spark.implicits._
    // base (two byte-identical copies), a 1-bit variant, a 2-bit
    // variant, and an inverted unrelated image: rep pairs =
    // (base,v1)=1, (base,v2)=2, (v1,v2)=3 — three rep-graph pairs, all
    // within T=3, over a test-lowered gate of 1
    val base = gridPng(Nil)
    val v1 = gridPng(Seq((0, 0)))
    val v2 = gridPng(Seq((1, 1), (2, 2)))
    val inv = { // pixel = 63-x: every bit 0, Hamming 61+ from the family
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 64; x <- 0 until 64)
        img.getRaster.setSample(x, y, 0, 63 - x)
      val o = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", o); o.toByteArray
    }
    val corpus = Seq((10L, base), (11L, base), (12L, v1), (13L, v2),
      (14L, inv)).toDF("doc_id", "img")
    val expect = Seq((10L, 10L, 1), (11L, 10L, 0), (12L, 10L, 0), (13L, 10L, 0))
    val viaDriver = Multimodal.phashDedupCore(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(viaDriver === expect, "driver union-find path")
    spark.conf.set("spark.graft.d7.driverMaxPairs", "1")
    try {
      val viaDistributed = Multimodal.phashDedupCore(corpus).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
      assert(viaDistributed === viaDriver,
        "the distributed min-label path must produce identical clusters")
      // and the production m9 entry survives the lowered gate unchanged
      val m9Low = Multimodal.m9AudioNeardup(spark, sf("sf0.001")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
      spark.conf.unset("spark.graft.d7.driverMaxPairs")
      val m9Default = Multimodal.m9AudioNeardup(spark, sf("sf0.001")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
      assert(m9Low === m9Default,
        "m9 clusters must be gate-independent")
    } finally spark.conf.unset("spark.graft.d7.driverMaxPairs")
  }
}
