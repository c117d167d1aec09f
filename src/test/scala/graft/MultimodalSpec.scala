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

  test("animated-GIF fixture encode -> real frame sampling recovers count, dims, planted grays") {
    import spark.implicits._
    val docs = Seq((3L, "hello world"), (10L, "x"), (257L, "abcdef"))
      .toDF("doc_id", "text")
    val got = Multimodal.sampleVideoFrames(
        Multimodal.withVideoPayload(docs), nSample = 4)
      .collect().groupBy(_.doc_id)
    assert(got.keySet == Set(3L, 10L, 257L))
    got.foreach { case (id, rows) =>
      val text = Map(3L -> "hello world", 10L -> "x", 257L -> "abcdef")(id)
      val nf = (2 + id % 5).toInt
      val w = (8 + id % 16).toInt
      val h = 8 + text.getBytes("UTF-8").length % 16
      assert(rows.length == 4)
      rows.sortBy(_.sample_idx).zipWithIndex.foreach { case (r, i) =>
        assert(r.real_decode, s"doc $id sample $i took the stub branch")
        assert(r.n_frames == nf, s"doc $id: n_frames ${r.n_frames} != $nf")
        assert(r.width == w && r.height == h,
          s"doc $id: dims ${r.width}x${r.height} != ${w}x$h")
        val fidx = ((i.toLong * nf) / 4).toInt
        assert(r.frame_idx == fidx)
        val g = ((id * 31L + fidx.toLong * 17L) % 256L).toInt
        assert(r.gray == g, s"doc $id frame $fidx: gray ${r.gray} != $g")
        assert(r.pixel_sum == g.toLong * w * h,
          s"doc $id frame $fidx: pixel_sum ${r.pixel_sum} != ${g.toLong * w * h}")
      }
    }
  }

  test("non-video payloads fall back to the video stub rows") {
    import spark.implicits._
    val junk = Seq((7L, "definitely not a gif".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val rows = Multimodal.sampleVideoFrames(junk, nSample = 4).collect()
    assert(rows.length == 4)
    assert(rows.forall(r => !r.real_decode && r.n_frames == 0 &&
      r.width == 0 && r.height == 0))
    val bytes = "definitely not a gif".getBytes("UTF-8")
    rows.sortBy(_.sample_idx).zipWithIndex.foreach { case (r, i) =>
      val off = ((i.toLong * bytes.length) / 4).toInt
      assert(r.gray == (bytes(off) & 0xff) && r.pixel_sum == r.gray.toLong)
    }
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

  test("dHash: real decode reproduces the closed-form bits; resize path exact on block upscales") {
    import spark.implicits._
    def formulaWords(id: Long): (Long, Long) = {
      val a = (id % 16) * 31 + id % 7
      def g(x: Int, y: Int): Long = (a + 7 * x + 13 * y) % 256
      var w0 = 0L; var w1 = 0L
      for (b <- 0 until 64) {
        val r = b / 8; val c = b % 8
        if (g(c + 1, r) > g(c, r)) {
          if (b < 32) w0 |= 1L << b else w1 |= 1L << (b - 32)
        }
      }
      (w0, w1)
    }
    val docs = Tables.documents(spark, sf("sf0.001")).filter(col("doc_id") < 20)
    val got = Multimodal.dHash(Multimodal.withPatternedImagePayload(docs))
      .collect().map(r => r.doc_id -> r).toMap
    assert(got.size == 20)
    got.values.foreach { r =>
      assert(r.real_decode && r.width == 9 && r.height == 8)
      assert((r.w0, r.w1) == formulaWords(r.doc_id),
        s"doc ${r.doc_id}: decoded hash != formula")
    }
    // 2x2 block-replicated 18x16 upscale: every block averages to the
    // original pixel exactly, so the hash is identical — pins the
    // area-average resize path with no rounding slack
    val up = docs.select("doc_id").as[Long].map { id =>
      val a = (id % 16) * 31 + id % 7
      val img = new java.awt.image.BufferedImage(18, 16,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until 16; x <- 0 until 18) {
        val g = ((a + 7 * (x / 2) + 13 * (y / 2)) % 256).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      (id, bos.toByteArray)
    }.toDF("doc_id", "payload")
    Multimodal.dHash(up).collect().foreach { r =>
      assert(r.real_decode && r.width == 18 && r.height == 16)
      assert((r.w0, r.w1) == formulaWords(r.doc_id),
        s"doc ${r.doc_id}: upscaled hash drifted")
    }
    // undecodable payloads take the stub branch
    val junk = Seq((5L, Array[Byte](9, 9, 9))).toDF("doc_id", "payload")
    val stub = Multimodal.dHash(junk).head()
    assert(!stub.real_decode && stub.w0 == 3L && stub.w1 == 0L)
  }
}
