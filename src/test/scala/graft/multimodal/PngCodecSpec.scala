package graft.multimodal

import graft.SparkSpec

/** Real PNG decode: deflate + chunk framing + all five scanline
  * filters, in both truecolor variants — plus loud rejection of
  * corrupted streams (bad signature, CRC damage, truncation,
  * unsupported header fields). */
class PngCodecSpec extends SparkSpec {
  import spark.implicits._

  private def pix(x: Int, y: Int, c: Int): Int = (x * 5 + y * 11 + c * 3) % 256

  test("round-trip: every filter × both color types × varied dims") {
    for (f <- 0 to 4; ch <- Seq(3, 4); (w, h) <- Seq((1, 1), (3, 2), (7, 5))) {
      val img = PngCodec.decodePng(
        PngCodec.encodePng(w, h, ch, pix, rowFilter = _ => f))
      assert(img.width == w && img.height == h && img.channels == ch)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
        assert(img.pixels(ch * (y * w + x) + c) == pix(x, y, c),
          s"pixel ($x,$y,$c) filter=$f ch=$ch ${w}x$h")
    }
  }

  test("mixed filters per row (the q95 shape) reconstruct exactly") {
    val w = 6; val h = 10; val ch = 4
    val img = PngCodec.decodePng(
      PngCodec.encodePng(w, h, ch, pix, rowFilter = y => y % 5))
    for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
      assert(img.pixels(ch * (y * w + x) + c) == pix(x, y, c))
  }

  test("multi-IDAT framing and ancillary chunks are really exercised") {
    // a 32x32 RGBA raster deflates well past the 32-byte IDAT split,
    // and the encoder always emits a tEXt chunk the decoder must skip
    val bytes = PngCodec.encodePng(32, 32, 4, pix, rowFilter = y => y % 5)
    def countChunks(t: String): Int = {
      var pos = 8; var n = 0
      while (pos + 8 <= bytes.length) {
        val len = ((bytes(pos) & 0xff) << 24) | ((bytes(pos + 1) & 0xff) << 16) |
          ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
        if (new String(bytes, pos + 4, 4, "US-ASCII") == t) n += 1
        pos += 12 + len
      }
      n
    }
    assert(countChunks("IDAT") > 1, "payload must split across IDAT chunks")
    assert(countChunks("tEXt") == 1)
    val img = PngCodec.decodePng(bytes)
    assert(img.width == 32 && img.height == 32)
    assert(img.pixels(4 * (31 * 32 + 31)) == pix(31, 31, 0))
  }

  test("corrupted payloads are rejected loudly") {
    val good = PngCodec.encodePng(4, 3, 3, pix, rowFilter = _ => 4)
    intercept[IllegalArgumentException](PngCodec.decodePng(null))
    intercept[IllegalArgumentException](
      PngCodec.decodePng(Array[Byte](1, 2, 3)))
    val badSig = good.clone(); badSig(0) = 'X'
    intercept[IllegalArgumentException](PngCodec.decodePng(badSig))
    // flip one bit inside the IHDR data: the chunk CRC must catch it
    val badCrc = good.clone(); badCrc(16) = (badCrc(16) ^ 1).toByte
    intercept[IllegalArgumentException](PngCodec.decodePng(badCrc))
    val truncated = good.take(good.length - 6)
    intercept[IllegalArgumentException](PngCodec.decodePng(truncated))
  }

  test("unsupported header fields are named in the rejection") {
    val good = PngCodec.encodePng(2, 2, 3, pix)
    // patch bit depth to 16 and re-CRC the IHDR chunk so ONLY the
    // unsupported-field check can fire (not the CRC check)
    val patched = good.clone()
    patched(8 + 8 + 8) = 16.toByte // sig(8) + len/type(8) + depth offset 8
    val crc = new java.util.zip.CRC32
    crc.update(patched, 12, 4 + 13)
    val v = crc.getValue.toInt
    patched(12 + 4 + 13) = ((v >>> 24) & 0xff).toByte
    patched(12 + 4 + 13 + 1) = ((v >>> 16) & 0xff).toByte
    patched(12 + 4 + 13 + 2) = ((v >>> 8) & 0xff).toByte
    patched(12 + 4 + 13 + 3) = (v & 0xff).toByte
    val e = intercept[IllegalArgumentException](PngCodec.decodePng(patched))
    assert(e.getMessage.contains("bit depth"))
  }

  test("resizePng: nearest-neighbor up/downscale through the real codec") {
    // 2x2 RGB checker upscaled 4x4: each source pixel becomes a 2x2
    // block under (x*srcW div dstW); then a downscale back picks the
    // block corners — recovering the original exactly
    def checker(x: Int, y: Int, c: Int): Int =
      if ((x + y) % 2 == 0) (c + 1) * 10 else 200 + c
    val src = Seq(Multimodal.MediaRow(1L, "image/png",
      PngCodec.encodePng(2, 2, 3, checker), 2, 2)).toDS()
    val up = Multimodal.resizePng(src, 4, 4).collect().head
    assert(up.width == 4 && up.height == 4)
    val upImg = PngCodec.decodePng(up.payload)
    for (y <- 0 until 4; x <- 0 until 4; c <- 0 until 3)
      assert(upImg.pixels(3 * (y * 4 + x) + c) == checker(x * 2 / 4, y * 2 / 4, c),
        s"up ($x,$y,$c)")
    val back = Multimodal.resizePng(Seq(up).toDS(), 2, 2).collect().head
    val backImg = PngCodec.decodePng(back.payload)
    for (y <- 0 until 2; x <- 0 until 2; c <- 0 until 3)
      assert(backImg.pixels(3 * (y * 2 + x) + c) == checker(x, y, c),
        s"back ($x,$y,$c)")
  }

  test("decodePngFeatures: distributed decode matches closed-form stats") {
    val rows = (0L until 20L).map { id =>
      val w = (3 + id % 6).toInt
      val h = (2 + id % 4).toInt
      val ch = (3 + id % 2).toInt
      Multimodal.MediaRow(id, "image/png",
        PngCodec.encodePng(w, h, ch,
          (x, y, c) => ((id * 11 + (y * w + x).toLong * ch + c) % 256).toInt,
          rowFilter = y => ((id + y) % 5).toInt), w, h)
    }
    val got = Multimodal.decodePngFeatures(rows.toDS().repartition(4))
      .collect().map(s => s.media_id -> s).toMap
    for (id <- 0L until 20L) {
      val w = (3 + id % 6).toInt
      val h = (2 + id % 4).toInt
      val ch = (3 + id % 2).toInt
      def v(i: Int, c: Int): Long = (id * 11 + i.toLong * ch + c) % 256
      val n = w * h
      val s = got(id)
      assert(s.width == w && s.height == h && s.channels == ch)
      assert(s.c0_sum == (0 until n).map(v(_, 0)).sum)
      assert(s.c1_sum == (0 until n).map(v(_, 1)).sum)
      assert(s.c2_sum == (0 until n).map(v(_, 2)).sum)
      assert(s.a_sum == (if (ch == 4) (0 until n).map(v(_, 3)).sum else 0L))
      assert(s.c0_moment == (0 until n).map(i => v(i, 0) * i).sum)
    }
  }
}
