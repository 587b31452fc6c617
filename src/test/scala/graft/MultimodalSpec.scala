package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Multimodal
import graft.llm.Multimodal.{BlobRow, Decoded}

/** The multimodal decoder is a REAL header parser — these cases feed it
  * byte-exact PNG/BMP/GIF headers (including ones built by hand, not by
  * our own synthesizer) and garbage, and check the parsed fields. */
class MultimodalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("PNG IHDR parse: big-endian dims, color type → channels") {
    // hand-built 640x480 grayscale (color type 0) PNG header
    val p = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a, // signature
      0, 0, 0, 13, 'I', 'H', 'D', 'R',                          // IHDR len+tag
      0, 0, 0x02, 0x80,                                         // width 640 BE
      0, 0, 0x01, 0xe0,                                         // height 480 BE
      8, 0, 0, 0, 0,                                            // depth, color 0
      0, 0, 0, 0).map(_.toByte)                                 // crc
    assert(Multimodal.decodeHeader(BlobRow(1L, p)) ===
      Decoded(1L, 640L, 480L, 1L, "png"))
    // and the synthesizer's RGBA output round-trips
    assert(Multimodal.decodeHeader(BlobRow(2L,
      Multimodal.pngBytes(257L, 19L, Array[Byte](1, 2)))) ===
      Decoded(2L, 257L, 19L, 4L, "png"))
  }

  test("BMP parse: little-endian dims, abs(height), bpp → channels") {
    assert(Multimodal.decodeHeader(BlobRow(3L,
      Multimodal.bmpBytes(1024L, 768L, Array.empty))) ===
      Decoded(3L, 1024L, 768L, 3L, "bmp"))
    // top-down BMPs store a negative height — dims must come back positive
    val topDown = Multimodal.bmpBytes(16L, 0L, Array.empty)
    val negH = -32L
    topDown(22) = (negH & 0xff).toByte
    topDown(23) = ((negH >> 8) & 0xff).toByte
    topDown(24) = ((negH >> 16) & 0xff).toByte
    topDown(25) = ((negH >> 24) & 0xff).toByte
    assert(Multimodal.decodeHeader(BlobRow(4L, topDown)) ===
      Decoded(4L, 16L, 32L, 3L, "bmp"))
  }

  test("GIF parse and unknown-payload fallback") {
    assert(Multimodal.decodeHeader(BlobRow(5L,
      Multimodal.gifBytes(320L, 200L, Array.empty))) ===
      Decoded(5L, 320L, 200L, 3L, "gif"))
    assert(Multimodal.decodeHeader(BlobRow(6L,
        Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)))
      === Decoded(6L, 0L, 0L, 0L, "unknown"))
    assert(Multimodal.decodeHeader(BlobRow(7L, Array.empty))
      === Decoded(7L, 0L, 0L, 0L, "unknown"))
  }

  test("blobTable → decode: distributed end-to-end over real headers") {
    val docs = Seq((0L, "alpha"), (1L, "bravo"), (2L, "charlie"),
      (3L, "delta")).toDF("doc_id", "text")
    val got = Multimodal.decode(
        Multimodal.blobTable(docs).as[BlobRow])
      .collect().map(d => d.doc_id -> d).toMap
    assert(got(0L).format === "png" && got(0L).channels === 4L)
    assert(got(1L).format === "bmp" && got(1L).channels === 3L)
    assert(got(2L).format === "gif" && got(2L).channels === 3L)
    // dims come from md5(text) leading bytes, embedded in the header
    val d0 = java.security.MessageDigest.getInstance("MD5")
      .digest("alpha".getBytes("UTF-8"))
    assert(got(0L).width === 1L + (d0(0) & 0xff))
    assert(got(0L).height === 1L + (d0(1) & 0xff))
  }

  test("BMP pixel decode: golden vector, stride padding, rejects") {
    // hand-built 2x2 24-bpp BMP: stride = 8 (2 padding bytes per row);
    // pixels (r,g,b) = (10,20,30), (40,50,60), (70,80,90), (200,150,100)
    val pxs = Array((10, 20, 30), (40, 50, 60), (70, 80, 90), (200, 150, 100))
    val blob = Multimodal.bmpFull(2, 2, pxs(_))
    assert(blob.length === 54 + 8 * 2)
    val s = Multimodal.decodeBmpPixels(5L, blob).get
    assert(s.n_px === 4L)
    assert(s.mean_r === (10 + 40 + 70 + 200) / 4.0)
    assert(s.mean_g === (20 + 50 + 80 + 150) / 4.0)
    assert(s.mean_b === (30 + 60 + 90 + 100) / 4.0)
    // integer Rec.601 luma: 18, 48, 78, 159 -> bins 0, 1, 2, 4
    assert(Seq(s.l0, s.l1, s.l2, s.l3, s.l4, s.l5, s.l6, s.l7)
      === Seq(1L, 1L, 1L, 0L, 1L, 0L, 0L, 0L))
    // truncated pixel array / non-24bpp / compressed are rejected
    assert(Multimodal.decodeBmpPixels(1L, blob.dropRight(1)).isEmpty)
    val md5Tail = Array.fill[Byte](16)(0)
    assert(Multimodal.decodeBmpPixels(1L,
      Multimodal.bmpBytes(2, 2, md5Tail)).isEmpty)
  }

  test("PNG encoder is readable by the JDK's independent ImageIO decoder") {
    // 4x7 exercises every scanline filter (row % 5 → None/Sub/Up/
    // Average/Paeth and a second None/Sub pass with a prior row).
    // ImageIO is a from-scratch PNG implementation shipped with the
    // JDK — agreement here rules out self-consistent filter bugs that
    // a pngFull→decodePngPixels round-trip alone could hide.
    val (w, h) = (4, 7)
    def px(i: Int) = ((i * 37 + 11) % 256, (i * 53 + 5) % 256, (i * 71) % 256)
    val blob = Multimodal.pngFull(w, h, px)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
    assert(img != null, "ImageIO could not parse the generated PNG")
    assert(img.getWidth === w && img.getHeight === h)
    for (y <- 0 until h; x <- 0 until w) {
      val argb = img.getRGB(x, y)
      val (er, eg, eb) = px(y * w + x)
      assert(((argb >> 16) & 0xff, (argb >> 8) & 0xff, argb & 0xff)
        === ((er, eg, eb)), s"pixel ($x,$y)")
    }
  }

  test("PNG pixel decode: round-trip through all five filters, rejects") {
    val (w, h) = (5, 11)
    def px(i: Int) = ((i * 29 + 3) % 256, (i * 41 + 7) % 256, (i * 59 + 13) % 256)
    val blob = Multimodal.pngFull(w, h, px)
    val s = Multimodal.decodePngPixels(9L, blob).get
    val n = w * h
    val pxs = (0 until n).map(px)
    assert(s.n_px === n.toLong)
    assert(s.mean_r === pxs.map(_._1).sum.toDouble / n)
    assert(s.mean_g === pxs.map(_._2).sum.toDouble / n)
    assert(s.mean_b === pxs.map(_._3).sum.toDouble / n)
    val bins = new Array[Long](8)
    pxs.foreach { case (r, g, b) =>
      bins((299 * r + 587 * g + 114 * b) / 1000 / 32) += 1 }
    assert(Seq(s.l0, s.l1, s.l2, s.l3, s.l4, s.l5, s.l6, s.l7)
      === bins.toSeq)
    // rejects: truncated chunk stream, truncated zlib data, RGBA color
    // type (header-only blobTable blob), undersized payload
    assert(Multimodal.decodePngPixels(1L, blob.dropRight(20)).isEmpty)
    // chop INSIDE the IDAT data: rebuild with a shortened IDAT chunk
    val idatAt = blob.indexOfSlice("IDAT".getBytes("US-ASCII")) - 4
    val idatLen = ((blob(idatAt) & 0xff) << 24) |
      ((blob(idatAt + 1) & 0xff) << 16) |
      ((blob(idatAt + 2) & 0xff) << 8) | (blob(idatAt + 3) & 0xff)
    val cut = idatLen / 2
    val shortened = blob.take(idatAt) ++
      Array[Byte](0, 0, ((cut >> 8) & 0xff).toByte, (cut & 0xff).toByte) ++
      blob.slice(idatAt + 4, idatAt + 8 + cut) ++ blob.slice(
        idatAt + 8 + idatLen, blob.length)
    assert(Multimodal.decodePngPixels(1L, shortened).isEmpty)
    assert(Multimodal.decodePngPixels(1L,
      Multimodal.pngBytes(2, 2, Array.fill[Byte](16)(0))).isEmpty)
  }

  test("bmpTable → extractBmpFeatures matches the pixel formula") {
    val docs = Seq((3L, "x"), (11L, "y")).toDF("doc_id", "text")
    val got = Multimodal.extractBmpFeatures(
        Multimodal.bmpTable(docs).as[BlobRow])
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(3L, 11L)) {
      val (w, h) = ((1 + id % 7).toInt, (1 + id % 5).toInt)
      val n = w * h
      val rs = (0 until n).map(i => (id * 7 + i * 13) % 256)
      assert(got(id).getLong(1) === n.toLong)
      assert(got(id).getDouble(2) ===
        math.rint(rs.sum.toDouble / n * 1e6) / 1e6)
    }
  }
}
