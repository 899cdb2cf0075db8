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
      val bytes = text.getBytes("UTF-8")
      val expected = (0L until w * h).map(k => (bytes((k % bytes.length).toInt) & 0xff).toLong).sum
      assert(out(id) === ((w, h, expected)), s"doc $id decode mismatch")
    }
  }
}
