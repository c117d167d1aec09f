package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.operators.Multimodal

/** Multimodal decode: the REAL javax.imageio branch against
  * hand-encoded containers (PNG/BMP/alpha), the deterministic stub
  * fallback for unrecognized payloads, and the end-to-end
  * encode→decode Dataset path over the testdata corpus.
  */
class MultimodalSpec extends SparkSpecBase {

  private def encode(fmt: String, w: Int, h: Int, imgType: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, imgType)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 31 + y * 17) % 255) << 8)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("real decode parses actual PNG and BMP containers") {
    val png = Multimodal.decodeMedia(1L,
      encode("png", 17, 11, java.awt.image.BufferedImage.TYPE_3BYTE_BGR))
    assert(png.width == 17 && png.height == 11 && png.channels == 3)
    assert(png.real_decode, "PNG took the stub branch")
    val bmp = Multimodal.decodeMedia(2L,
      encode("bmp", 9, 23, java.awt.image.BufferedImage.TYPE_3BYTE_BGR))
    assert(bmp.width == 9 && bmp.height == 23 && bmp.channels == 3)
    assert(bmp.real_decode, "BMP took the stub branch")
    // alpha channel is reported, not assumed
    val rgba = Multimodal.decodeMedia(3L,
      encode("png", 5, 7, java.awt.image.BufferedImage.TYPE_INT_ARGB))
    assert(rgba.channels == 4 && rgba.real_decode)
  }

  test("unrecognized payloads fall back to the deterministic stub") {
    val bytes = "no image header here".getBytes("UTF-8")
    val m = Multimodal.decodeMedia(7L, bytes)
    assert(!m.real_decode)
    assert(m.n_bytes == bytes.length)
    assert(m.width == 64 + bytes.length % 512)
    assert(m.height == 64 + (bytes(0) & 0xff) % 512)
    assert(m.channels == 3)
    // empty payload: total, stub-decoded
    val e = Multimodal.decodeMedia(8L, Array.emptyByteArray)
    assert(!e.real_decode && e.width == 64 && e.height == 64)
  }

  test("decodeFeatures over text stand-ins == the stub contract (q36 unchanged)") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val got = Multimodal.decodeFeatures(docs).toDF()
    assert(got.filter(col("real_decode")).count() == 0,
      "a text payload claimed a real decode")
    val bad = got.join(docs.select(col("doc_id"),
        length(col("text").cast("binary")).as("nb"),
        ascii(substring(col("text"), 1, 1)).cast("int").as("fb")), "doc_id")
      .filter(col("n_bytes") =!= col("nb") ||
        col("width") =!= lit(64) + col("nb") % 512 ||
        col("height") =!= lit(64) + col("fb") % 512 ||
        col("channels") =!= 3)
      .count()
    assert(bad == 0, "stub metadata drifted from the q36 oracle contract")
  }

  test("end-to-end: PNG fixture encode -> real imageio decode recovers the planted dims") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val got = Multimodal.decodePayloads(Multimodal.withImagePayload(docs)).toDF()
    assert(got.count() == docs.count())
    assert(got.filter(!col("real_decode")).count() == 0,
      "a generated PNG fell back to the stub")
    val bad = got.join(docs.select(col("doc_id"),
        length(col("text").cast("binary")).as("nb")), "doc_id")
      .filter(col("width") =!= lit(8) + col("doc_id") % 24 ||
        col("height") =!= lit(8) + col("nb") % 24 ||
        col("channels") =!= 3)
      .count()
    assert(bad == 0, "decoded dims differ from the planted fixture dims")
    // the compressed container is real: n_bytes is the PNG size, which
    // exceeds a trivial header and is not the raster size
    assert(got.filter(col("n_bytes") <= 8).count() == 0)
  }

  test("WAV fixture encode -> manual RIFF decode recovers rate, frames, exact energy") {
    import spark.implicits._
    val docs = Seq((3L, "hello world"), (10L, "x")).toDF("doc_id", "text")
    val got = Multimodal.decodeAudioPayloads(Multimodal.withAudioPayload(docs))
      .collect().map(m => m.doc_id -> m).toMap
    // doc 3: utf8len 11 -> 64 + 11 = 75 frames; energy replayed
    // independently from the synthesis formula
    val m3 = got(3L)
    assert(m3.real_decode && m3.sample_rate == 8000 && m3.channels == 1)
    assert(m3.n_samples == 75 && m3.n_bytes == 44 + 150)
    assert(m3.duration_ms == 75L * 1000L / 8000L)
    val want = (0 until 75).map { i =>
      val s = ((3L * 37L + i.toLong * 131L) % 4001L) - 2000L
      s * s
    }.sum
    assert(m3.sum_sq == want, s"energy ${m3.sum_sq} != replayed $want")
    // a payload that is not a WAV container falls back to the stub
    val junk = Seq((7L, Array[Byte](1, 2, 3, 4, 5))).toDF("doc_id", "payload")
    val stub = Multimodal.decodeAudioPayloads(junk).head()
    assert(!stub.real_decode && stub.n_bytes == 5 && stub.sum_sq == 0L)
    // a truncated RIFF header (claims WAVE, no usable chunks) is also safe
    val trunc = Seq((8L, "RIFFxxxxWAVE".getBytes("US-ASCII") ++
        Array.fill[Byte](40)(0))).toDF("doc_id", "payload")
    assert(!Multimodal.decodeAudioPayloads(trunc).head().real_decode)
  }
}
