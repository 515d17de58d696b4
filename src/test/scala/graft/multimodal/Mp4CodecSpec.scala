package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** MJPEG-in-MP4 (ISO BMFF): box framing, sample-table reconstruction
  * (stsc runs × stco × stsz), lazy frame iteration, AVI→MP4 remux
  * losslessness, loud rejection of damage. */
class Mp4CodecSpec extends AnyFunSuite {

  private val ones = Array.fill(64)(1)
  private def frameJpeg(w: Int, h: Int, f: Int): Array[Byte] =
    JpegCodec.encodeJpeg(w, h, 1,
      (x, y, _) => (3 + 7 * f + 11 * (y / 8) + 5 * (x / 8)) % 256,
      quantOverride = Some((ones, ones)))

  test("round-trip: header + every frame decodes bit-exactly (exact JPEG corner)") {
    val w = 24; val h = 16; val nf = 5 // odd count → trailing partial chunk
    val mp4 = Mp4Codec.encodeMjpegMp4(w, h, fps = 10, nFrames = nf,
      jpegFrame = f => frameJpeg(w, h, f), samplesPerChunk = 2)
    val (hdr, it) = Mp4Codec.frameIterator(mp4)
    assert(hdr.width == w && hdr.height == h && hdr.frames == nf)
    assert(hdr.timescale == 10 && hdr.duration == nf)
    val frames = it.toVector
    assert(frames.size == nf)
    for (fr <- frames; y <- 0 until h; x <- 0 until w)
      assert(fr.image.pixels(y * w + x) ==
        (3 + 7 * fr.index + 11 * (y / 8) + 5 * (x / 8)) % 256,
        s"frame ${fr.index} pixel ($x,$y)")
  }

  test("container structure is real ISO BMFF: required boxes present in order") {
    val mp4 = Mp4Codec.encodeMjpegMp4(16, 8, 5, 3, f => frameJpeg(16, 8, f))
    def ascii(off: Int) = new String(mp4, off, 4, "US-ASCII")
    assert(ascii(4) == "ftyp" && ascii(8) == "isom")
    val s = new String(mp4.map(b => if (b >= 32 && b < 127) b.toChar else '.'))
    for (b <- Seq("mdat", "moov", "mvhd", "trak", "tkhd", "mdia", "mdhd",
                  "hdlr", "vide", "minf", "vmhd", "dinf", "dref", "url ",
                  "stbl", "stsd", "jpeg", "stts", "stsc", "stsz", "stco"))
      assert(s.contains(b), s"missing box '$b'")
    // mdat precedes moov (streaming-unfriendly but valid; offsets absolute)
    assert(s.indexOf("mdat") < s.indexOf("moov"))
  }

  test("sample-table chunking is real: spc=3 over 7 frames → 3 chunks, 2 stsc runs") {
    val w = 8; val h = 8; val nf = 7
    val mp4 = Mp4Codec.encodeMjpegMp4(w, h, 6, nf,
      f => frameJpeg(w, h, f), samplesPerChunk = 3)
    val (hdr, it) = Mp4Codec.frameIterator(mp4)
    assert(hdr.frames == nf)
    val frames = it.toVector
    assert(frames.map(_.index) == (0 until nf).toVector)
    // every frame raster intact across the chunk boundaries
    for (fr <- frames)
      assert(fr.image.pixels(0) == (3 + 7 * fr.index) % 256)
  }

  test("samplesPerChunk=1 and spc>nFrames degenerate layouts both parse") {
    val w = 8; val h = 8
    for (spc <- Seq(1, 10)) {
      val mp4 = Mp4Codec.encodeMjpegMp4(w, h, 5, 4,
        f => frameJpeg(w, h, f), samplesPerChunk = spc)
      val (hdr, it) = Mp4Codec.frameIterator(mp4)
      assert(hdr.frames == 4 && it.size == 4, s"spc=$spc")
    }
  }

  test("frame iterator is lazy: corrupt later sample only fails when reached") {
    val w = 16; val h = 8
    val mp4 = Mp4Codec.encodeMjpegMp4(w, h, 5, 3, f => frameJpeg(w, h, f))
    val (_, rawIt) = Mp4Codec.rawFrameIterator(mp4)
    val raw = rawIt.toVector
    // find the last sample's bytes in the file and break its SOI marker
    val s3 = raw(2)._2
    val bad = mp4.clone()
    val pos = indexOfSlice(bad, s3)
    assert(pos > 0)
    bad(pos + 1) = (bad(pos + 1) ^ 0x7f).toByte // 0xFFD8 → invalid magic
    val (_, it) = Mp4Codec.frameIterator(bad)
    assert(it.next().index == 0)
    assert(it.next().index == 1)
    intercept[Exception](it.next())
  }

  test("remux AVI→MP4 is byte-lossless on the compressed samples") {
    val w = 16; val h = 16; val nf = 5
    val avi = AviCodec.encodeMjpegAvi(w, h, fps = 8, nFrames = nf,
      jpegFrame = f => frameJpeg(w, h, f))
    val mp4 = Mp4Codec.remuxAviToMp4(avi)
    val (_, aviRaw) = AviCodec.rawFrameIterator(avi)
    val (hdr, mp4Raw) = Mp4Codec.rawFrameIterator(mp4)
    assert(hdr.width == w && hdr.height == h && hdr.frames == nf)
    assert(hdr.timescale == 8) // fps carried over from usPerFrame
    val a = aviRaw.toVector; val m = mp4Raw.toVector
    assert(a.size == m.size)
    for (((_, ab), (_, mb)) <- a.zip(m))
      assert(java.util.Arrays.equals(ab, mb), "sample bytes changed in remux")
  }

  test("damage is rejected loudly") {
    intercept[IllegalArgumentException](Mp4Codec.rawFrameIterator(null))
    intercept[IllegalArgumentException](
      Mp4Codec.rawFrameIterator("........nope............".getBytes))
    val mp4 = Mp4Codec.encodeMjpegMp4(16, 8, 5, 2, f => frameJpeg(16, 8, f))
    // truncating the moov away → no sample table
    val truncated = java.util.Arrays.copyOf(mp4, mp4.length / 2)
    intercept[Exception](Mp4Codec.rawFrameIterator(truncated))
    // box-size overrun is caught by the walker
    val overrun = mp4.clone()
    // ftyp size field → absurd value
    overrun(0) = 0x7f.toByte
    intercept[Exception](Mp4Codec.rawFrameIterator(overrun))
  }

  private def indexOfSlice(hay: Array[Byte], needle: Array[Byte]): Int = {
    var i = 0
    while (i + needle.length <= hay.length) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }
}
