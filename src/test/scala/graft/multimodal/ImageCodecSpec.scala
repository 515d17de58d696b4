package graft.multimodal

import graft.SparkSpec

/** Real BMP decode: round-trips through the actual byte format,
  * including the quirks that distinguish a genuine decoder from a
  * stub — stride padding at every width residue, bottom-up vs
  * top-down row order, BGR channel order, bfOffBits gaps, and loud
  * rejection of malformed payloads. */
class ImageCodecSpec extends SparkSpec {
  import spark.implicits._

  private def pix(x: Int, y: Int, c: Int): Int = (x * 5 + y * 11 + c * 3) % 256

  test("encode/decode round-trip across every stride-padding residue") {
    // widths 3..8 cover row paddings 3,0,1,2,3,0 (w*3 mod 4 residues)
    for (w <- 3 to 8; h <- Seq(2, 5)) {
      val img = ImageCodec.decodeBmp24(ImageCodec.encodeBmp24(w, h, pix))
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        assert(img.rgb(3 * (y * w + x) + c) == pix(x, y, c),
          s"pixel ($x,$y,$c) at ${w}x$h")
    }
  }

  test("top-down (negative height) variant decodes to the same raster") {
    val bottomUp = ImageCodec.encodeBmp24(5, 4, pix)
    // rewrite height to -4 and reorder rows to top-down manually
    val stride = ((5 * 3 + 3) / 4) * 4
    val topDown = bottomUp.clone()
    val hOff = 22
    val v = -4
    topDown(hOff) = (v & 0xff).toByte
    topDown(hOff + 1) = ((v >> 8) & 0xff).toByte
    topDown(hOff + 2) = ((v >> 16) & 0xff).toByte
    topDown(hOff + 3) = ((v >> 24) & 0xff).toByte
    val off = 54
    for (row <- 0 until 4; b <- 0 until stride)
      topDown(off + row * stride + b) =
        bottomUp(off + (4 - 1 - row) * stride + b)
    assert(ImageCodec.decodeBmp24(topDown).rgb.toSeq ==
      ImageCodec.decodeBmp24(bottomUp).rgb.toSeq)
  }

  test("malformed payloads are rejected loudly") {
    val good = ImageCodec.encodeBmp24(4, 3, pix)
    intercept[IllegalArgumentException](ImageCodec.decodeBmp24(null))
    intercept[IllegalArgumentException](
      ImageCodec.decodeBmp24(Array[Byte](1, 2, 3)))
    val badMagic = good.clone(); badMagic(0) = 'X'
    intercept[IllegalArgumentException](ImageCodec.decodeBmp24(badMagic))
    val truncated = good.take(good.length - 4)
    intercept[IllegalArgumentException](ImageCodec.decodeBmp24(truncated))
    val compressed = good.clone(); compressed(30) = 1 // BI_RLE8
    intercept[IllegalArgumentException](ImageCodec.decodeBmp24(compressed))
  }

  test("decodeImageFeatures: distributed decode matches closed-form stats") {
    val rows = (0L until 20L).map { id =>
      val w = (3 + id % 6).toInt
      val h = (2 + id % 4).toInt
      Multimodal.MediaRow(id, "image/bmp",
        ImageCodec.encodeBmp24(w, h,
          (x, y, c) => ((id * 7 + (y * w + x) * 3 + c) % 256).toInt), w, h)
    }
    val got = Multimodal.decodeImageFeatures(rows.toDS().repartition(4))
      .collect().map(s => s.media_id -> s).toMap
    for (id <- 0L until 20L) {
      val w = (3 + id % 6).toInt
      val h = (2 + id % 4).toInt
      def v(i: Int, c: Int) = (id * 7 + i * 3 + c) % 256
      val n = w * h
      val s = got(id)
      assert(s.width == w && s.height == h)
      assert(s.r_sum == (0 until n).map(v(_, 0)).sum)
      assert(s.g_sum == (0 until n).map(v(_, 1)).sum)
      assert(s.b_sum == (0 until n).map(v(_, 2)).sum)
      assert(s.r_moment == (0 until n).map(i => v(i, 0) * i).sum)
    }
  }
}
