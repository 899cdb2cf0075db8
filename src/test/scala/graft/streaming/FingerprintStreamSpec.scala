package graft.streaming

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.operators.Multimodal
import graft.storage.GraftTable

/** Continuous image near-dup intake: a multi-batch image stream checked
  * against committed corpus fingerprints must produce exactly the
  * phash_match batch results, land them exactly-once, hold NO streaming
  * state, and replay nothing on restart. */
class FingerprintStreamSpec extends SparkSpec {

  /** 64×64 grayscale PNG: pixel = column index, with chosen dHash grid
    * samples forced to 255 so exactly those bits flip (the
    * MultimodalSpec family). */
  private def gridPng(flipBits: Seq[(Int, Int)]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    for (y <- 0 until 64; x <- 0 until 64) raster.setSample(x, y, 0, x)
    flipBits.foreach { case (ty, tx) =>
      raster.setSample(tx * 64 / 9, ty * 64 / 8, 0, 255)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("streamed fingerprint matches equal batch phash_match; stateless; replay appends nothing") {
    import spark.implicits._
    // committed corpus: two distinct images + an inverted decoy
    val base = gridPng(Nil)
    val far = gridPng(Seq((0, 0), (1, 1), (2, 2), (3, 3), (4, 4))) // 5 bits off base
    val corpusImgs = Seq((1L, base), (2L, far)).toDF("doc_id", "img")
    val fps = Multimodal.phashFingerprints(corpusImgs)
    // intake: batch A = exact copy of img1 + 1-bit variant of img2;
    // batch B = unrelated inverted image (no match) + 2-bit variant of
    // img1 — base-vs-far is 5 bits apart, so each variant matches ONLY
    // its own original
    val v2of1 = gridPng(Seq((5, 5), (6, 6)))
    val v1of2 = gridPng(Seq((0, 0), (1, 1), (2, 2), (3, 3), (4, 4), (7, 7)))
    val inv = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 64; x <- 0 until 64)
        img.getRaster.setSample(x, y, 0, 63 - x)
      val o = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", o); o.toByteArray
    }
    val batchA = Seq((101L, base), (102L, v1of2))
    val batchB = Seq((103L, inv), (104L, v2of1))
    val src = tmpDir("fps-stream-src")
    batchA.toDF("doc_id", "img").write.parquet(s"$src/part=a")
    batchB.toDF("doc_id", "img").write.parquet(s"$src/part=b")
    val expected = Multimodal.phashMatchCore(
      (batchA ++ batchB).toDF("doc_id", "img"), fps).collect()
    assert(expected.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq === Seq((101L, 1L, 0L), (102L, 2L, 1L), (104L, 1L, 2L)),
      "batch oracle: exact copy → its original, variants → theirs, decoy out")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("img", BinaryType)))
    def incoming = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .option("recursiveFileLookup", "true")
      .parquet(src)
    val destLoc = tmpDir("fps-stream-dest") + "/t"
    val dest = GraftTable.create(spark, destLoc,
      Multimodal.phashMatchCore(corpusImgs.limit(0), fps).schema)
    val ckpt = tmpDir("fps-stream-ckpt")
    val q = FingerprintStream.start(incoming, fps, dest, ckpt)
    assert(q.awaitTermination(120000), "fingerprint stream drain timed out")
    // STATELESS: the per-batch banded join needs no state store
    val progress = q.recentProgress
    assert(progress.nonEmpty && progress.forall(_.stateOperators.isEmpty),
      "fingerprint matching must hold no streaming state")
    val streamed = dest.read().orderBy("doc_id").collect()
    assert(streamed.map(_.toSeq).toSeq === expected.map(_.toSeq).toSeq,
      "the continuous fingerprint check must equal batch phash_match")
    // restart on the same checkpoint: replay must be a no-op
    val q2 = FingerprintStream.start(incoming, fps, dest, ckpt)
    assert(q2.awaitTermination(120000))
    assert(dest.read().count() === expected.length.toLong,
      "replay must be a no-op")
    GraftTable.drop(destLoc)
  }

  /** Minimal canonical 16-bit PCM WAV around the given samples. */
  private def wav(samples: Array[Short]): Array[Byte] = {
    val n = samples.length
    val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(n * 2)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("the audio modality streams through the same twin: WAV intake vs committed audio fingerprints") {
    import spark.implicits._
    // corpus: an all-positive clip (every fingerprint bit set) and an
    // all-negative one (no bits) — 64 bits apart
    val pos = Array.fill[Short](640)(1000)
    val neg = Array.fill[Short](640)(-1000)
    val corpus = Seq((1L, wav(pos)), (2L, wav(neg))).toDF("doc_id", "wav")
    val fps = Multimodal.audioFingerprints(corpus)
    // intake: an exact copy of clip 1 and a 2-bit re-master of clip 2
    // (sign-flip the samples at fingerprint positions j=0,1)
    val rem = neg.clone(); rem(0) = 1000; rem(10) = 1000
    val batch = Seq((201L, wav(pos)), (202L, wav(rem)))
    val src = tmpDir("afps-stream-src")
    batch.toDF("doc_id", "wav").write.parquet(s"$src/part=a")
    val expected = Multimodal.audioMatchCore(
      batch.toDF("doc_id", "wav"), fps).collect()
    assert(expected.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq === Seq((201L, 1L, 0L), (202L, 2L, 2L)))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("wav", BinaryType)))
    val incoming = spark.readStream.schema(schema)
      .option("recursiveFileLookup", "true").parquet(src)
    val destLoc = tmpDir("afps-stream-dest") + "/t"
    val dest = GraftTable.create(spark, destLoc,
      Multimodal.audioMatchCore(corpus.limit(0), fps).schema)
    val q = FingerprintStream.start(incoming, fps, dest,
      tmpDir("afps-stream-ckpt"),
      hash = Multimodal.audioFingerprints)
    assert(q.awaitTermination(120000), "audio fingerprint stream timed out")
    assert(dest.read().orderBy("doc_id").collect().map(_.toSeq).toSeq ===
      expected.map(_.toSeq).toSeq,
      "the audio stream must equal batch audio_match")
    GraftTable.drop(destLoc)
  }

  test("the video modality streams through the same twin: AVI intake vs committed video fingerprints") {
    import spark.implicits._
    // corpus: two 30-frame clips whose temporal signatures are 5 bits
    // apart (render ids 1 and 2); a re-encode twin (frame 0 shifted)
    // moves exactly 3 bits at n=30 — inside T=3
    val clip1 = Multimodal.aviFor(1L, 30)
    val clip2 = Multimodal.aviFor(2L, 30)
    val corpus = Seq((1L, clip1), (2L, clip2)).toDF("doc_id", "avi")
    val fps = Multimodal.videoFingerprints(corpus)
    // intake: exact copy of clip 1, a re-encode twin of clip 2, and a
    // far decoy (render id 7: 27/22 bits from clips 1/2)
    val twin2 = Multimodal.aviFor(2L, 30, shift0 = true)
    val decoy = Multimodal.aviFor(7L, 30)
    val batch = Seq((401L, clip1), (402L, twin2), (403L, decoy))
    val src = tmpDir("vfps-stream-src")
    batch.toDF("doc_id", "avi").write.parquet(s"$src/part=a")
    val expected = Multimodal.videoMatchCore(
      batch.toDF("doc_id", "avi"), fps).collect()
    assert(expected.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq === Seq((401L, 1L, 0L), (402L, 2L, 3L)),
      "batch oracle: copy → its original, twin → its original, decoy out")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("avi", BinaryType)))
    val incoming = spark.readStream.schema(schema)
      .option("recursiveFileLookup", "true").parquet(src)
    val destLoc = tmpDir("vfps-stream-dest") + "/t"
    val dest = GraftTable.create(spark, destLoc,
      Multimodal.videoMatchCore(corpus.limit(0), fps).schema)
    val q = FingerprintStream.start(incoming, fps, dest,
      tmpDir("vfps-stream-ckpt"),
      hash = Multimodal.videoFingerprints)
    assert(q.awaitTermination(120000), "video fingerprint stream timed out")
    val progress = q.recentProgress
    assert(progress.nonEmpty && progress.forall(_.stateOperators.isEmpty),
      "video fingerprint matching must hold no streaming state")
    assert(dest.read().orderBy("doc_id").collect().map(_.toSeq).toSeq ===
      expected.map(_.toSeq).toSeq,
      "the video stream must equal batch video_match")
    GraftTable.drop(destLoc)
  }

  test("refreshable fingerprint side: fingerprints ACCEPTED mid-stream dedup later batches; append hygiene refuses clashes") {
    import spark.implicits._
    val base = gridPng(Nil)
    val far = gridPng(Seq((0, 0), (1, 1), (2, 2), (3, 3), (4, 4)))
    // v1 committed fingerprints: base only
    val fpsLoc = tmpDir("fps-refresh") + "/fps"
    val v1 = Multimodal.phashFingerprints(Seq((1L, base)).toDF("doc_id", "img"))
    val fpsT = GraftTable.create(spark, fpsLoc, v1.schema)
    fpsT.append(v1)
    // stream: batch A = copy of base; batch B (written mid-stream) =
    // copy of `far`, which only matches AFTER its fingerprint is
    // accepted into the committed table
    val src = tmpDir("fps-refresh-src")
    Seq((301L, base)).toDF("doc_id", "img").write.parquet(s"$src/part=a")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("img", BinaryType)))
    val incoming = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .option("recursiveFileLookup", "true").parquet(src)
    val destLoc = tmpDir("fps-refresh-dest") + "/t"
    val dest = GraftTable.create(spark, destLoc,
      Multimodal.phashMatchCore(
        Seq((0L, base)).toDF("doc_id", "img").limit(0), v1).schema)
    val q = FingerprintStream.startRefreshable(spark, fpsLoc, incoming,
      dest, tmpDir("fps-refresh-ckpt"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(250L))
    def await(n: Long, what: String): Unit = {
      val t0 = System.nanoTime()
      while (dest.read().count() < n) {
        assert((System.nanoTime() - t0) / 1e9 < 90,
          s"timed out waiting for $what (have ${dest.read().count()}, want $n)")
        Thread.sleep(250)
      }
    }
    await(1L, "the v1 match")
    // ACCEPT step mid-stream: far's fingerprint joins the committed
    // table (the CALL phash_index_append body), version ticks
    assert(Multimodal.fingerprintAppendCore(
      Seq((2L, far)).toDF("doc_id", "img"), fpsT,
      Multimodal.phashFingerprints) === 1L)
    Seq((302L, far)).toDF("doc_id", "img").write.parquet(s"$src/part=b")
    await(2L, "the post-accept match")
    // a SECOND accept mid-stream: the delta stack is now two merges
    // deep (base + two append ticks) and must still serve exactly the
    // full re-collapse's results
    val mid = gridPng(Seq((7, 0), (7, 1), (7, 2), (7, 3), (7, 4)))
    assert(Multimodal.fingerprintAppendCore(
      Seq((3L, mid)).toDF("doc_id", "img"), fpsT,
      Multimodal.phashFingerprints) === 1L)
    Seq((303L, mid)).toDF("doc_id", "img").write.parquet(s"$src/part=c")
    await(3L, "the second post-accept match")
    q.stop()
    val got = dest.read().orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((301L, 1L, 0L), (302L, 2L, 0L), (303L, 3L, 0L)),
      s"the accepted fingerprint must serve later batches without a restart: $got")
    // hygiene: re-accepting an already-fingerprinted id refuses
    val eClash = intercept[IllegalArgumentException] {
      Multimodal.fingerprintAppendCore(
        Seq((2L, far)).toDF("doc_id", "img"), fpsT,
        Multimodal.phashFingerprints)
    }
    assert(eClash.getMessage.contains("already fingerprinted"))
    // …and so does a batch that duplicates an id WITHIN itself — both
    // rows would pass the committed-side check (review r14)
    val eSelf = intercept[IllegalArgumentException] {
      Multimodal.fingerprintAppendCore(
        Seq((9L, base), (9L, far)).toDF("doc_id", "img"), fpsT,
        Multimodal.phashFingerprints)
    }
    assert(eSelf.getMessage.contains("more than once"))
    GraftTable.drop(destLoc)
  }
}
