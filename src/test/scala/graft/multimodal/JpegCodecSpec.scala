package graft.multimodal

import graft.SparkSpec

/** Baseline JPEG encode + decode. JPEG is lossy, so the suite uses
  * three regimes:
  *  1. the exactly-invertible corner (block-constant grayscale + unit
  *     quant tables) must round-trip BIT-exactly — this is what the
  *     oracle-backed query (q100) relies on;
  *  2. both directions cross-checked against the JDK's own INDEPENDENT
  *     JPEG codec (`javax.imageio`, a libjpeg-derived implementation):
  *     our decoder must read ImageIO's output (including its 4:2:0
  *     subsampled color streams) and ImageIO must read ours, each
  *     within a small tolerance of the source raster;
  *  3. malformed/unsupported payloads rejected loudly. */
class JpegCodecSpec extends SparkSpec {

  private def maxErr(a: Array[Int], b: Array[Int]): Int = {
    require(a.length == b.length, s"raster sizes differ: ${a.length} vs ${b.length}")
    var m = 0
    var i = 0
    while (i < a.length) { m = math.max(m, math.abs(a(i) - b(i))); i += 1 }
    m
  }
  private def meanErr(a: Array[Int], b: Array[Int]): Double = {
    var s = 0L
    var i = 0
    while (i < a.length) { s += math.abs(a(i) - b(i)); i += 1 }
    s.toDouble / a.length
  }

  // smooth color field: JPEG-friendly (bounded error at q85)
  private def smooth(x: Int, y: Int, c: Int): Int =
    (128 + 100 * math.sin((x + 3 * c) / 7.0) * math.cos(y / 9.0)).toInt

  test("exact corner: block-constant grayscale + unit quant tables is bit-exact") {
    val ones = Array.fill(64)(1)
    for ((w, h) <- Seq((8, 8), (24, 16), (40, 32))) {
      def blockVal(x: Int, y: Int): Int = (7 + 31 * (y / 8) * (w / 8) + 13 * (x / 8)) % 256
      val bytes = JpegCodec.encodeJpeg(w, h, 1, (x, y, _) => blockVal(x, y),
        quantOverride = Some((ones, ones)))
      val d = JpegCodec.decodeJpeg(bytes)
      assert(d.width == w && d.height == h && d.channels == 1)
      for (y <- 0 until h; x <- 0 until w)
        assert(d.pixels(y * w + x) == blockVal(x, y),
          s"pixel ($x,$y) of ${w}x$h: got ${d.pixels(y * w + x)}, want ${blockVal(x, y)}")
    }
  }

  test("our gray encode → our decode stays close on smooth content (q85)") {
    val w = 40; val h = 24
    val src = Array.tabulate(w * h)(i => smooth(i % w, i / w, 0) & 0xff)
    val bytes = JpegCodec.encodeJpeg(w, h, 1, (x, y, _) => src(y * w + x))
    val d = JpegCodec.decodeJpeg(bytes)
    assert(maxErr(d.pixels, src) <= 16, s"max err ${maxErr(d.pixels, src)}")
    assert(meanErr(d.pixels, src) <= 3.0, s"mean err ${meanErr(d.pixels, src)}")
  }

  test("our color 4:4:4 encode → our decode stays close on smooth content") {
    val w = 32; val h = 24
    val src = Array.tabulate(w * h * 3)(i => smooth((i / 3) % w, i / 3 / w, i % 3) & 0xff)
    val bytes = JpegCodec.encodeJpeg(w, h, 3,
      (x, y, c) => src(3 * (y * w + x) + c), quality = 90)
    val d = JpegCodec.decodeJpeg(bytes)
    assert(d.channels == 3 && d.width == w && d.height == h)
    assert(maxErr(d.pixels, src) <= 24, s"max err ${maxErr(d.pixels, src)}")
    assert(meanErr(d.pixels, src) <= 4.0, s"mean err ${meanErr(d.pixels, src)}")
  }

  test("restart intervals: DRI + RSTn markers encode and resync on decode") {
    val w = 48; val h = 32
    val ones = Array.fill(64)(1)
    def blockVal(x: Int, y: Int): Int = (11 + 17 * (y / 8) + 29 * (x / 8)) % 256
    val bytes = JpegCodec.encodeJpeg(w, h, 1, (x, y, _) => blockVal(x, y),
      quantOverride = Some((ones, ones)), restartInterval = 3)
    // the stream must actually contain RST markers
    var rsts = 0
    for (i <- 0 until bytes.length - 1)
      if ((bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) >= 0xd0
          && (bytes(i + 1) & 0xff) <= 0xd7) rsts += 1
    assert(rsts >= 2, s"expected RST markers in stream, found $rsts")
    val d = JpegCodec.decodeJpeg(bytes)
    for (y <- 0 until h; x <- 0 until w)
      assert(d.pixels(y * w + x) == blockVal(x, y), s"pixel ($x,$y) with restarts")
  }

  test("cross-check: ImageIO decodes OUR gray and color output within tolerance") {
    val w = 40; val h = 32
    // gray
    val gsrc = Array.tabulate(w * h)(i => smooth(i % w, i / w, 0) & 0xff)
    val gb = JpegCodec.encodeJpeg(w, h, 1, (x, y, _) => gsrc(y * w + x), quality = 90)
    val gimg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gb))
    assert(gimg != null, "ImageIO failed to parse our grayscale JPEG")
    assert(gimg.getWidth == w && gimg.getHeight == h)
    val gdec = Array.tabulate(w * h)(i =>
      gimg.getRaster.getSample(i % w, i / w, 0))
    assert(maxErr(gdec, gsrc) <= 16, s"ImageIO-vs-source gray max err ${maxErr(gdec, gsrc)}")
    // color
    val csrc = Array.tabulate(w * h * 3)(i => smooth((i / 3) % w, i / 3 / w, i % 3) & 0xff)
    val cb = JpegCodec.encodeJpeg(w, h, 3, (x, y, c) => csrc(3 * (y * w + x) + c),
      quality = 90)
    val cimg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(cb))
    assert(cimg != null, "ImageIO failed to parse our color JPEG")
    val cdec = new Array[Int](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = cimg.getRGB(x, y)
      cdec(3 * (y * w + x)) = (rgb >> 16) & 0xff
      cdec(3 * (y * w + x) + 1) = (rgb >> 8) & 0xff
      cdec(3 * (y * w + x) + 2) = rgb & 0xff
    }
    assert(maxErr(cdec, csrc) <= 28, s"ImageIO-vs-source color max err ${maxErr(cdec, csrc)}")
    assert(meanErr(cdec, csrc) <= 5.0)
  }

  test("cross-check: WE decode ImageIO's output (incl. its subsampled color)") {
    val w = 48; val h = 40
    // gray via ImageIO
    val gimg = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      gimg.getRaster.setSample(x, y, 0, smooth(x, y, 0) & 0xff)
    val gos = new java.io.ByteArrayOutputStream
    assert(javax.imageio.ImageIO.write(gimg, "jpg", gos))
    val gd = JpegCodec.decodeJpeg(gos.toByteArray)
    assert(gd.width == w && gd.height == h && gd.channels == 1)
    val gsrc = Array.tabulate(w * h)(i => smooth(i % w, i / w, 0) & 0xff)
    assert(maxErr(gd.pixels, gsrc) <= 20,
      s"our-decode-of-ImageIO gray max err ${maxErr(gd.pixels, gsrc)}")
    // color via ImageIO (the JDK writer subsamples chroma by default —
    // this exercises our 2x2/4:2:0 MCU walk and upsampler)
    val cimg = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      cimg.setRGB(x, y, (smooth(x, y, 0) & 0xff) << 16 |
        (smooth(x, y, 1) & 0xff) << 8 | (smooth(x, y, 2) & 0xff))
    val cos = new java.io.ByteArrayOutputStream
    assert(javax.imageio.ImageIO.write(cimg, "jpg", cos))
    val cd = JpegCodec.decodeJpeg(cos.toByteArray)
    assert(cd.width == w && cd.height == h && cd.channels == 3)
    val csrc = Array.tabulate(w * h * 3)(i => smooth((i / 3) % w, i / 3 / w, i % 3) & 0xff)
    assert(maxErr(cd.pixels, csrc) <= 32,
      s"our-decode-of-ImageIO color max err ${maxErr(cd.pixels, csrc)}")
    assert(meanErr(cd.pixels, csrc) <= 6.0)
  }

  test("non-multiple-of-8 dims round-trip (edge replication + crop)") {
    val w = 13; val h = 9
    val src = Array.tabulate(w * h)(i => smooth(i % w, i / w, 0) & 0xff)
    val bytes = JpegCodec.encodeJpeg(w, h, 1, (x, y, _) => src(y * w + x), quality = 95)
    val d = JpegCodec.decodeJpeg(bytes)
    assert(d.width == w && d.height == h)
    assert(maxErr(d.pixels, src) <= 12)
  }

  test("malformed/unsupported payloads are rejected loudly") {
    intercept[IllegalArgumentException](JpegCodec.decodeJpeg(null))
    intercept[IllegalArgumentException](JpegCodec.decodeJpeg(Array[Byte](1, 2, 3)))
    val good = JpegCodec.encodeJpeg(16, 16, 1, (x, y, _) => (x * y) % 256)
    val badSoi = good.clone(); badSoi(1) = 0x00
    intercept[IllegalArgumentException](JpegCodec.decodeJpeg(badSoi))
    intercept[Exception](
      JpegCodec.decodeJpeg(java.util.Arrays.copyOf(good, good.length / 2)))
    // declare progressive (SOF2): must be rejected, not mis-decoded
    val prog = good.clone()
    var i = 0
    while (i < prog.length - 1 &&
      !((prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0)) i += 1
    prog(i + 1) = 0xc2.toByte
    intercept[IllegalArgumentException](JpegCodec.decodeJpeg(prog))
  }
}
