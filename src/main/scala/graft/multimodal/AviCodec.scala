package graft.multimodal

/** Pure-JVM MJPEG-in-AVI (RIFF) encode + decode — the COMPRESSED video
  * container, completing the compressed-format triple (PNG images,
  * FLAC audio, MJPEG video). Motion-JPEG is real compressed video with
  * a trivial GOP structure (every frame is an intra-coded baseline
  * JPEG), which keeps the container honest without ffmpeg-class
  * inter-frame work: each `00dc` chunk is a complete [[JpegCodec]]
  * stream.
  *
  * Implemented subset of the AVI RIFF form (msdn AVI RIFF spec):
  *  - encode: `RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
  *    LIST('movi' 00dc...) idx1)` with correct MainAVIHeader /
  *    AVIStreamHeader / BITMAPINFOHEADER fields ('MJPG' fourcc), the
  *    spec's even-byte chunk padding, and a full `idx1` index;
  *  - decode: chunk walking with pad-byte handling (unknown LIST/chunk
  *    types skipped, as a compliant reader must), header validation
  *    against the per-frame JPEG dimensions, and a LAZY frame iterator
  *    so a `flatMap` fan-out streams frames without materializing a
  *    whole video ([[VideoCodec]]'s contract).
  *
  * Scale stance: row-local byte work inside `mapPartitions` /
  * `flatMap`; no shuffle, no driver involvement.
  */
object AviCodec {

  /** Parsed container header. */
  final case class AviHeader(width: Int, height: Int, frames: Int,
                             usPerFrame: Int)

  /** One frame: its index and decoded JPEG raster. */
  final case class AviFrame(index: Int, image: JpegCodec.DecodedJpeg)

  private def putIntLe(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >>> 8) & 0xff)
    o.write((v >>> 16) & 0xff); o.write((v >>> 24) & 0xff)
  }
  private def putShortLe(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >>> 8) & 0xff)
  }
  private def fourcc(o: java.io.ByteArrayOutputStream, s: String): Unit =
    o.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))

  private def getIntLe(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Encode an MJPEG AVI: `jpegFrame(i)` returns frame i as a complete
    * JPEG stream (all frames must share dimensions `width`x`height`). */
  def encodeMjpegAvi(width: Int, height: Int, fps: Int,
                     nFrames: Int, jpegFrame: Int => Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0 && nFrames > 0,
      "encodeMjpegAvi: positive dims/fps/frames")
    val frames = Array.tabulate(nFrames)(jpegFrame)

    // LIST hdrl: avih + LIST strl(strh, strf)
    val hdrl = new java.io.ByteArrayOutputStream
    fourcc(hdrl, "hdrl")
    fourcc(hdrl, "avih"); putIntLe(hdrl, 56)     // MainAVIHeader
    putIntLe(hdrl, 1000000 / fps)                // dwMicroSecPerFrame
    putIntLe(hdrl, 0)                            // dwMaxBytesPerSec
    putIntLe(hdrl, 0)                            // dwPaddingGranularity
    putIntLe(hdrl, 0x10)                         // dwFlags: AVIF_HASINDEX
    putIntLe(hdrl, nFrames)                      // dwTotalFrames
    putIntLe(hdrl, 0)                            // dwInitialFrames
    putIntLe(hdrl, 1)                            // dwStreams
    putIntLe(hdrl, 0)                            // dwSuggestedBufferSize
    putIntLe(hdrl, width); putIntLe(hdrl, height)
    putIntLe(hdrl, 0); putIntLe(hdrl, 0); putIntLe(hdrl, 0); putIntLe(hdrl, 0)

    val strl = new java.io.ByteArrayOutputStream
    fourcc(strl, "strl")
    fourcc(strl, "strh"); putIntLe(strl, 56)     // AVIStreamHeader
    fourcc(strl, "vids"); fourcc(strl, "MJPG")
    putIntLe(strl, 0)                            // dwFlags
    putShortLe(strl, 0); putShortLe(strl, 0)     // priority, language
    putIntLe(strl, 0)                            // dwInitialFrames
    putIntLe(strl, 1); putIntLe(strl, fps)       // rate: fps = dwRate/dwScale
    putIntLe(strl, 0)                            // dwStart
    putIntLe(strl, nFrames)                      // dwLength
    putIntLe(strl, 0)                            // dwSuggestedBufferSize
    putIntLe(strl, -1)                           // dwQuality
    putIntLe(strl, 0)                            // dwSampleSize
    putShortLe(strl, 0); putShortLe(strl, 0)     // rcFrame
    putShortLe(strl, width); putShortLe(strl, height)
    fourcc(strl, "strf"); putIntLe(strl, 40)     // BITMAPINFOHEADER
    putIntLe(strl, 40)
    putIntLe(strl, width); putIntLe(strl, height)
    putShortLe(strl, 1); putShortLe(strl, 24)    // planes, bpp
    fourcc(strl, "MJPG")                         // biCompression
    putIntLe(strl, width * height * 3)           // biSizeImage
    putIntLe(strl, 0); putIntLe(strl, 0); putIntLe(strl, 0); putIntLe(strl, 0)
    val strlBytes = strl.toByteArray
    fourcc(hdrl, "LIST"); putIntLe(hdrl, strlBytes.length); hdrl.write(strlBytes)
    val hdrlBytes = hdrl.toByteArray

    // LIST movi (chunks padded to even length, offsets recorded for idx1)
    val movi = new java.io.ByteArrayOutputStream
    fourcc(movi, "movi")
    val offsets = new Array[Int](nFrames) // offset of '00dc' from movi LIST data start
    var i = 0
    while (i < nFrames) {
      offsets(i) = movi.size
      fourcc(movi, "00dc"); putIntLe(movi, frames(i).length)
      movi.write(frames(i))
      if ((frames(i).length & 1) == 1) movi.write(0) // pad to even
      i += 1
    }
    val moviBytes = movi.toByteArray

    val idx1 = new java.io.ByteArrayOutputStream
    i = 0
    while (i < nFrames) {
      fourcc(idx1, "00dc")
      putIntLe(idx1, 0x10)          // AVIIF_KEYFRAME (every MJPEG frame)
      putIntLe(idx1, offsets(i))
      putIntLe(idx1, frames(i).length)
      i += 1
    }
    val idx1Bytes = idx1.toByteArray

    val riffSize = 4 + (8 + hdrlBytes.length) + (8 + moviBytes.length) +
      (8 + idx1Bytes.length)
    val out = new java.io.ByteArrayOutputStream(riffSize + 8)
    fourcc(out, "RIFF"); putIntLe(out, riffSize); fourcc(out, "AVI ")
    fourcc(out, "LIST"); putIntLe(out, hdrlBytes.length); out.write(hdrlBytes)
    fourcc(out, "LIST"); putIntLe(out, moviBytes.length); out.write(moviBytes)
    fourcc(out, "idx1"); putIntLe(out, idx1Bytes.length); out.write(idx1Bytes)
    out.toByteArray
  }

  /** Parse the container and return its header plus a LAZY frame
    * iterator: each `00dc` chunk's JPEG decodes only when the iterator
    * reaches it, and decoded frames are validated against the header
    * dimensions. Malformed payloads fail loudly. */
  def frameIterator(bytes: Array[Byte]): (AviHeader, Iterator[AviFrame]) = {
    val (hdr, raw) = rawFrameIterator(bytes)
    val it = raw.map { case (idx, jpeg) =>
      val img = JpegCodec.decodeJpeg(jpeg)
      require(img.width == hdr.width && img.height == hdr.height,
        s"decodeAvi: frame $idx is ${img.width}x${img.height}, " +
          s"header says ${hdr.width}x${hdr.height}")
      AviFrame(idx, img)
    }
    (hdr, it)
  }

  /** Parse the container and return its header plus a LAZY iterator of
    * the COMPRESSED per-frame sample bytes (index, jpegBytes) — the
    * demux half of a remux: a container transcode (e.g. AVI→MP4)
    * copies these bytes into the target container without touching
    * the entropy-coded stream. */
  def rawFrameIterator(bytes: Array[Byte]): (AviHeader, Iterator[(Int, Array[Byte])]) = {
    require(bytes != null && bytes.length >= 12,
      s"decodeAvi: ${if (bytes == null) "null" else s"${bytes.length}-byte"} " +
        "payload shorter than the RIFF header")
    require(tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "AVI ",
      "decodeAvi: missing RIFF/AVI magic")
    val riffEnd = math.min(bytes.length.toLong, 8L + getIntLe(bytes, 4)).toInt

    var width = -1; var height = -1; var frames = -1; var usPerFrame = -1
    var moviStart = -1; var moviEnd = -1

    // walk top-level chunks; descend into LIST hdrl for avih only
    var o = 12
    while (o + 8 <= riffEnd) {
      val id = tag(bytes, o)
      val size = getIntLe(bytes, o + 4)
      require(size >= 0 && o + 8 + size <= riffEnd,
        s"decodeAvi: chunk '$id' size $size overruns $riffEnd-byte RIFF body")
      if (id == "LIST") {
        val listType = tag(bytes, o + 8)
        if (listType == "hdrl") {
          // find avih inside
          var ho = o + 12
          val hEnd = o + 8 + size
          while (ho + 8 <= hEnd && width < 0) {
            val hid = tag(bytes, ho)
            val hsz = getIntLe(bytes, ho + 4)
            require(hsz >= 0 && ho + 8 + hsz <= hEnd,
              s"decodeAvi: hdrl chunk '$hid' overruns list")
            if (hid == "avih") {
              require(hsz >= 40, s"decodeAvi: avih too small ($hsz)")
              usPerFrame = getIntLe(bytes, ho + 8)
              frames = getIntLe(bytes, ho + 8 + 16)
              width = getIntLe(bytes, ho + 8 + 32)
              height = getIntLe(bytes, ho + 8 + 36)
            }
            ho += 8 + hsz + (hsz & 1)
          }
        } else if (listType == "movi") {
          moviStart = o + 12
          moviEnd = o + 8 + size
        } // other list types (INFO, ...): skip
      } // non-LIST top-level chunks (idx1, JUNK): skip
      o += 8 + size + (size & 1)
    }
    require(width > 0 && height > 0 && frames >= 0,
      "decodeAvi: missing or invalid avih header")
    require(moviStart >= 0, "decodeAvi: no movi list")
    val hdr = AviHeader(width, height, frames, usPerFrame)

    val it = new Iterator[(Int, Array[Byte])] {
      private var pos = moviStart
      private var idx = 0
      private var nextChunk: Int = -1
      private def seek(): Unit = {
        while (nextChunk < 0 && pos + 8 <= moviEnd) {
          val id = tag(bytes, pos)
          val size = getIntLe(bytes, pos + 4)
          require(size >= 0 && pos + 8 + size <= moviEnd,
            s"decodeAvi: movi chunk '$id' size $size overruns list")
          if (id == "00dc") nextChunk = pos
          else pos += 8 + size + (size & 1) // 00db/wb/JUNK/rec lists: skip
        }
      }
      override def hasNext: Boolean = { seek(); nextChunk >= 0 }
      override def next(): (Int, Array[Byte]) = {
        seek()
        require(nextChunk >= 0, "decodeAvi: no more frames")
        val size = getIntLe(bytes, nextChunk + 4)
        val jpeg = java.util.Arrays.copyOfRange(bytes, nextChunk + 8,
          nextChunk + 8 + size)
        pos = nextChunk + 8 + size + (size & 1)
        nextChunk = -1
        val f = (idx, jpeg)
        idx += 1
        f
      }
    }
    (hdr, it)
  }
}
