package graft.multimodal

/** Pure-JVM Y4M (YUV4MPEG2) encode + decode — a REAL decoder for the
  * video modality, replacing the byte-slicing frame stub for
  * `video/y4m` payloads (the container has no ffmpeg-class libraries;
  * Y4M needs none: it is THE standard uncompressed interchange format,
  * an ASCII stream header plus raw planar YUV frames). Handles the
  * format's actual quirks: tagged space-separated header parameters
  * (`W`/`H`/`F`/`I`/`A`/`C`/`X` in any order), per-frame `FRAME`
  * headers that may carry their own `X` parameters, and the
  * chroma-subsampling plane geometry (4:2:0 / 4:2:2 / 4:4:4).
  *
  * Mirrors the reference's multimodal intent (IHOP-Reddit carries
  * media only as opaque references); the decode layer itself follows
  * the published YUV4MPEG2 specification (mjpegtools).
  *
  * Scale stance: decode is row-local byte work; [[frameIterator]] is
  * LAZY so a `flatMap` fan-out (1:N frames) streams frames through the
  * operator without ever materializing a whole video's frames — the
  * same contract a real container-index seek would honor at 100 TB.
  */
object VideoCodec {

  /** Parsed stream parameters. Chroma plane dims are derived:
    * 4:2:0 → (w/2, h/2); 4:2:2 → (w/2, h); 4:4:4 → (w, h). */
  final case class StreamHeader(width: Int, height: Int,
                                fpsNum: Int, fpsDen: Int,
                                colorspace: String) {
    val chromaWidth: Int =
      if (colorspace.startsWith("C444")) width else width / 2
    val chromaHeight: Int =
      if (colorspace.startsWith("C420")) height / 2 else height
    def ySize: Int = width * height
    def cSize: Int = chromaWidth * chromaHeight
    def frameSize: Int = ySize + 2 * cSize
  }

  /** One decoded frame: planar, `y(row*width + col)`, chroma planes on
    * the subsampled grid `u(crow*chromaWidth + ccol)`. */
  final case class DecodedFrame(index: Int, y: Array[Byte],
                                u: Array[Byte], v: Array[Byte])

  final case class DecodedVideo(header: StreamHeader,
                                frames: IndexedSeq[DecodedFrame])

  private val Magic = "YUV4MPEG2"
  private val NL = '\n'.toByte

  /** Encode a Y4M stream in the given colorspace (default `C420jpeg`,
    * the format's own default). Plane callbacks receive
    * `(frameIdx, x, y)` on the plane's OWN grid (chroma callbacks get
    * subsampled coordinates) and are masked to 0..255. Every third
    * frame header carries an `Xf=<idx>` parameter, so only a decoder
    * that actually tokenizes frame headers — rather than assuming bare
    * `FRAME\n` — can parse the stream back. */
  def encodeY4m(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
                nFrames: Int,
                yPix: (Int, Int, Int) => Int,
                uPix: (Int, Int, Int) => Int,
                vPix: (Int, Int, Int) => Int,
                colorspace: String = "C420jpeg"): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames >= 0 && fpsNum > 0 && fpsDen > 0,
      "encodeY4m: positive dims/fps, non-negative frame count")
    val hdr = StreamHeader(width, height, fpsNum, fpsDen, colorspace)
    if (!colorspace.startsWith("C444"))
      require(width % 2 == 0, s"encodeY4m: $colorspace needs even width")
    if (colorspace.startsWith("C420"))
      require(height % 2 == 0, s"encodeY4m: $colorspace needs even height")
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"$Magic W$width H$height F$fpsNum:$fpsDen Ip A1:1 $colorspace Xgraft\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    var f = 0
    while (f < nFrames) {
      val params = if (f % 3 == 0) s" Xf=$f" else ""
      out.write(s"FRAME$params\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      val buf = new Array[Byte](hdr.frameSize)
      var i = 0
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { buf(i) = (yPix(f, x, y) & 0xff).toByte; i += 1; x += 1 }
        y += 1
      }
      var cy = 0
      while (cy < hdr.chromaHeight) {
        var cx = 0
        while (cx < hdr.chromaWidth) { buf(i) = (uPix(f, cx, cy) & 0xff).toByte; i += 1; cx += 1 }
        cy += 1
      }
      cy = 0
      while (cy < hdr.chromaHeight) {
        var cx = 0
        while (cx < hdr.chromaWidth) { buf(i) = (vPix(f, cx, cy) & 0xff).toByte; i += 1; cx += 1 }
        cy += 1
      }
      out.write(buf)
      f += 1
    }
    out.toByteArray
  }

  private def readLine(bytes: Array[Byte], from: Int): (String, Int) = {
    var i = from
    while (i < bytes.length && bytes(i) != NL) i += 1
    require(i < bytes.length,
      s"y4m: unterminated header line at offset $from")
    (new String(bytes, from, i - from,
      java.nio.charset.StandardCharsets.US_ASCII), i + 1)
  }

  /** Parse the stream header. Tagged parameters may appear in any
    * order; `W` and `H` are required; `F` defaults to 30:1 and `C` to
    * `C420jpeg` per the spec; unknown `X` extensions are skipped. */
  def parseHeader(bytes: Array[Byte]): (StreamHeader, Int) = {
    require(bytes != null && bytes.length >= Magic.length,
      s"y4m: ${if (bytes == null) "null" else s"${bytes.length}-byte"} " +
        "payload is shorter than the stream magic")
    val (line, off) = readLine(bytes, 0)
    val toks = line.split(' ')
    require(toks.nonEmpty && toks(0) == Magic,
      s"y4m: missing '$Magic' magic (got '${toks.headOption.getOrElse("")}')")
    var w = -1; var h = -1; var fn = 30; var fd = 1; var cs = "C420jpeg"
    toks.iterator.drop(1).filter(_.nonEmpty).foreach { t =>
      t.charAt(0) match {
        case 'W' => w = t.substring(1).toInt
        case 'H' => h = t.substring(1).toInt
        case 'F' =>
          val p = t.substring(1).split(':')
          require(p.length == 2, s"y4m: bad frame-rate token '$t'")
          fn = p(0).toInt; fd = p(1).toInt
        case 'C' => cs = t
        case 'I' | 'A' | 'X' => () // interlacing / aspect / extensions: skipped
        case c => throw new IllegalArgumentException(
          s"y4m: unknown stream parameter tag '$c' in '$t'")
      }
    }
    require(w > 0 && h > 0, s"y4m: missing or bad W/H (got ${w}x$h)")
    require(cs.startsWith("C420") || cs.startsWith("C422") || cs.startsWith("C444"),
      s"y4m: unsupported colorspace '$cs'")
    if (!cs.startsWith("C444"))
      require(w % 2 == 0, s"y4m: $cs needs even width, got $w")
    if (cs.startsWith("C420"))
      require(h % 2 == 0, s"y4m: $cs needs even height, got $h")
    (StreamHeader(w, h, fn, fd, cs), off)
  }

  /** LAZY frame iterator — parses each `FRAME` header (tolerating
    * per-frame parameters) and slices the three planes, one frame at a
    * time. A truncated frame fails loudly rather than yielding a short
    * plane. */
  def frameIterator(bytes: Array[Byte]): (StreamHeader, Iterator[DecodedFrame]) = {
    val (hdr, start) = parseHeader(bytes)
    val it = new Iterator[DecodedFrame] {
      private var off = start
      private var idx = 0
      def hasNext: Boolean = off < bytes.length
      def next(): DecodedFrame = {
        val (line, dataOff) = readLine(bytes, off)
        require(line == "FRAME" || line.startsWith("FRAME "),
          s"y4m: expected FRAME header at offset $off, got '${line.take(20)}'")
        require(dataOff.toLong + hdr.frameSize <= bytes.length,
          s"y4m: truncated frame $idx (need ${hdr.frameSize} bytes at " +
            s"$dataOff, have ${bytes.length - dataOff})")
        val y = java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + hdr.ySize)
        val u = java.util.Arrays.copyOfRange(bytes, dataOff + hdr.ySize,
          dataOff + hdr.ySize + hdr.cSize)
        val v = java.util.Arrays.copyOfRange(bytes, dataOff + hdr.ySize + hdr.cSize,
          dataOff + hdr.frameSize)
        off = dataOff + hdr.frameSize
        val fr = DecodedFrame(idx, y, u, v)
        idx += 1
        fr
      }
    }
    (hdr, it)
  }

  /** Strict decode (all frames materialized) — test/driver convenience;
    * operators use [[frameIterator]]. */
  def decodeY4m(bytes: Array[Byte]): DecodedVideo = {
    val (hdr, it) = frameIterator(bytes)
    DecodedVideo(hdr, it.toIndexedSeq)
  }
}
