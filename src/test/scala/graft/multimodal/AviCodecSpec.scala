package graft.multimodal

import graft.SparkSpec

/** MJPEG-in-AVI container: RIFF framing, header parsing, lazy frame
  * iteration, JPEG-per-frame decode, loud rejection of damage. */
class AviCodecSpec extends SparkSpec {

  private val ones = Array.fill(64)(1)
  private def frameJpeg(w: Int, h: Int, f: Int): Array[Byte] =
    JpegCodec.encodeJpeg(w, h, 1,
      (x, y, _) => (3 + 7 * f + 11 * (y / 8) + 5 * (x / 8)) % 256,
      quantOverride = Some((ones, ones)))

  test("round-trip: header + every frame decodes bit-exactly (exact JPEG corner)") {
    val w = 24; val h = 16; val nf = 5
    val avi = AviCodec.encodeMjpegAvi(w, h, fps = 10, nFrames = nf,
      jpegFrame = f => frameJpeg(w, h, f))
    val (hdr, it) = AviCodec.frameIterator(avi)
    assert(hdr.width == w && hdr.height == h && hdr.frames == nf)
    assert(hdr.usPerFrame == 100000)
    val frames = it.toVector
    assert(frames.size == nf)
    for (fr <- frames; y <- 0 until h; x <- 0 until w)
      assert(fr.image.pixels(y * w + x) ==
        (3 + 7 * fr.index + 11 * (y / 8) + 5 * (x / 8)) % 256,
        s"frame ${fr.index} pixel ($x,$y)")
  }

  test("container structure is real RIFF: LIST hdrl/movi present, idx1 indexed") {
    val avi = AviCodec.encodeMjpegAvi(16, 8, 5, 3, f => frameJpeg(16, 8, f))
    def ascii(off: Int) = new String(avi, off, 4, "US-ASCII")
    assert(ascii(0) == "RIFF" && ascii(8) == "AVI ")
    val s = new String(avi.map(b => if (b >= 32 && b < 127) b.toChar else '.'))
    assert(s.contains("hdrl") && s.contains("strl") && s.contains("movi"))
    assert(s.contains("MJPG") && s.contains("idx1") && s.contains("00dc"))
  }

  test("frame iterator is lazy: malformed later frame only fails when reached") {
    val w = 16; val h = 8
    val avi = AviCodec.encodeMjpegAvi(w, h, 5, 3, f => frameJpeg(w, h, f))
    // corrupt the LAST frame's JPEG body (flip a byte near the end of movi)
    val s = new String(avi.map(b => if (b >= 32 && b < 127) b.toChar else '.'))
    val lastDc = s.lastIndexOf("00dc", s.indexOf("idx1"))
    val bad = avi.clone()
    bad(lastDc + 12) = (bad(lastDc + 12) ^ 0x7f).toByte
    val (_, it) = AviCodec.frameIterator(bad)
    assert(it.next().index == 0) // first two frames still decode
    assert(it.next().index == 1)
    intercept[Exception](it.next())
  }

  test("odd-size JPEG frames carry the RIFF pad byte and still parse") {
    val w = 8; val h = 8
    // quality/content chosen so some frame encodes to an odd byte count
    val avi = AviCodec.encodeMjpegAvi(w, h, 5, 6, f =>
      JpegCodec.encodeJpeg(w, h, 1, (x, y, _) => (x * 31 + y * 17 + f * 53) % 256,
        quality = 40 + f * 7))
    val (hdr, it) = AviCodec.frameIterator(avi)
    assert(it.size == 6 && hdr.frames == 6)
  }

  test("damage is rejected loudly") {
    intercept[IllegalArgumentException](AviCodec.frameIterator(null))
    intercept[IllegalArgumentException](
      AviCodec.frameIterator("RIFFxxxxNOPE".getBytes))
    val avi = AviCodec.encodeMjpegAvi(16, 8, 5, 2, f => frameJpeg(16, 8, f))
    val truncated = java.util.Arrays.copyOf(avi, avi.length / 3)
    intercept[Exception] {
      val (_, it) = AviCodec.frameIterator(truncated)
      it.toVector
    }
  }
}
