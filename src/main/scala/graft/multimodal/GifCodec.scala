package graft.multimodal

/** Pure-JVM GIF89a encode + decode — the palette-indexed compressed
  * image family next to [[PngCodec]] (predictive+deflate) and
  * [[JpegCodec]] (transform-coded): GIF is the third genuinely
  * distinct compression scheme, variable-width LZW over color-table
  * indices. Animated GIFs make it double as a multi-frame format, so
  * the lazy frame-sampling contract ([[AviCodec]]/[[Mp4Codec]])
  * applies to an image container too.
  *
  * Implemented subset of GIF89a:
  *  - encode: logical screen descriptor + global color table, optional
  *    per-frame LOCAL color tables, optional interlacing, Graphic
  *    Control Extension per frame (animation delay), NETSCAPE2.0 loop
  *    extension for multi-frame files, and a real LZW compressor
  *    (variable code width 3..12 bits, LSB-first packing, clear-code
  *    dictionary resets at 4096, 255-byte sub-block framing);
  *  - decode: screen/image descriptor parsing, global+local color
  *    tables, extension-block skipping (sub-block walk), LZW
  *    decompression (incl. the c==next corner and deferred growth at
  *    width 12), FOUR-PASS de-interlacing, and a LAZY frame iterator
  *    yielding palette-resolved RGB rasters.
  *
  * Not implemented (out of scope): transparency compositing, partial-
  * frame disposal blending (frames must be full-logical-screen),
  * sort flags, aspect ratio.
  *
  * Scale stance: row-local byte work inside `mapPartitions` /
  * `flatMap`; no shuffle, no driver involvement.
  */
object GifCodec {

  /** Parsed logical screen. `gctBits` = bits per global-palette index
    * (0 if no GCT). */
  final case class GifHeader(width: Int, height: Int, gctBits: Int)

  /** One frame: index and palette-resolved RGB raster (3 bytes/px,
    * row-major, already de-interlaced). */
  final case class GifFrame(index: Int, rgb: Array[Byte])

  // ---------------------------------------------------------------- encode

  private def putShortLe(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >>> 8) & 0xff)
  }

  private def paletteBits(n: Int): Int = {
    require(n >= 2 && n <= 256, s"palette size $n outside [2,256]")
    var b = 1
    while ((1 << b) < n) b += 1
    b
  }

  /** Write a color table padded to 2^bits entries (0xRRGGBB ints). */
  private def writePalette(o: java.io.ByteArrayOutputStream,
                           palette: Array[Int], bits: Int): Unit = {
    var i = 0
    val n = 1 << bits
    while (i < n) {
      val c = if (i < palette.length) palette(i) else 0
      o.write((c >>> 16) & 0xff); o.write((c >>> 8) & 0xff); o.write(c & 0xff)
      i += 1
    }
  }

  /** GIF interlace row order: the four passes' y offsets/steps. */
  private val InterlacePasses = Array((0, 8), (4, 8), (2, 4), (1, 2))

  /** Rows in transmission order for an interlaced frame. */
  private def interlacedRows(h: Int): Array[Int] = {
    val rows = new Array[Int](h)
    var k = 0
    for ((start, step) <- InterlacePasses) {
      var y = start
      while (y < h) { rows(k) = y; k += 1; y += step }
    }
    rows
  }

  /** LZW-compress `indices` with the given min code size; returns the
    * raw code stream (NOT sub-block framed). */
  private[multimodal] def lzwCompress(indices: Array[Byte],
                                      minCodeSize: Int): Array[Byte] = {
    require(minCodeSize >= 2 && minCodeSize <= 8, s"minCodeSize $minCodeSize")
    val clear = 1 << minCodeSize
    val end = clear + 1
    val out = new java.io.ByteArrayOutputStream
    var bitBuf = 0L
    var bitCnt = 0
    def emit(code: Int, width: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += width
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8
      }
    }
    // dictionary: (prefixCode << 8 | byte) → code
    var dict = new java.util.HashMap[Integer, Integer]()
    var width = minCodeSize + 1
    var next = end + 1
    emit(clear, width)
    if (indices.nonEmpty) {
      var prev: Int = indices(0) & 0xff
      var i = 1
      while (i < indices.length) {
        val k = indices(i) & 0xff
        val key = Integer.valueOf((prev << 8) | k)
        val hit = dict.get(key)
        if (hit != null) prev = hit.intValue()
        else {
          emit(prev, width)
          dict.put(key, Integer.valueOf(next))
          // decoder grows its width when ITS next (== this code) hits
          // 1<<width — mirror that here, cap at 12 bits
          if (next == (1 << width) && width < 12) width += 1
          next += 1
          if (next == 4096) { // dictionary full: reset
            emit(clear, width)
            dict = new java.util.HashMap[Integer, Integer]()
            width = minCodeSize + 1
            next = end + 1
          }
          prev = k
        }
        i += 1
      }
      emit(prev, width)
    }
    emit(end, width)
    if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  /** Frame spec for [[encodeGif]]: palette indices in row-major order,
    * optional local palette, interlace flag. */
  final case class FrameSpec(indices: Array[Byte],
                             localPalette: Option[Array[Int]] = None,
                             interlaced: Boolean = false)

  /** Encode a (possibly animated) GIF89a. All frames cover the full
    * logical screen. `globalPalette` entries are packed 0xRRGGBB. */
  def encodeGif(width: Int, height: Int, globalPalette: Array[Int],
                frames: IndexedSeq[FrameSpec], delayCs: Int = 4): Array[Byte] = {
    require(width > 0 && width <= 0xffff && height > 0 && height <= 0xffff,
      s"encodeGif: bad dims ${width}x$height")
    require(frames.nonEmpty, "encodeGif: no frames")
    val gctBits = paletteBits(globalPalette.length)
    val o = new java.io.ByteArrayOutputStream
    o.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    putShortLe(o, width); putShortLe(o, height)
    o.write(0x80 | ((gctBits - 1) << 4) | (gctBits - 1)) // GCT flag, res, size
    o.write(0) // background color index
    o.write(0) // aspect
    writePalette(o, globalPalette, gctBits)

    if (frames.length > 1) { // NETSCAPE2.0 loop-forever application ext
      o.write(0x21); o.write(0xff); o.write(11)
      o.write("NETSCAPE2.0".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      o.write(3); o.write(1); putShortLe(o, 0); o.write(0)
    }

    for ((f, idx) <- frames.zipWithIndex) {
      require(f.indices.length == width * height,
        s"encodeGif: frame $idx has ${f.indices.length} indices, " +
          s"need ${width * height}")
      // Graphic Control Extension (delay; disposal = none)
      o.write(0x21); o.write(0xf9); o.write(4)
      o.write(0); putShortLe(o, delayCs); o.write(0); o.write(0)
      // Image descriptor
      o.write(0x2c)
      putShortLe(o, 0); putShortLe(o, 0)
      putShortLe(o, width); putShortLe(o, height)
      val lctBits = f.localPalette.map(p => paletteBits(p.length))
      val packed = (if (lctBits.isDefined) 0x80 else 0) |
        (if (f.interlaced) 0x40 else 0) |
        lctBits.map(_ - 1).getOrElse(0)
      o.write(packed)
      f.localPalette.foreach(p => writePalette(o, p, lctBits.get))

      val effBits = lctBits.getOrElse(gctBits)
      val minCodeSize = math.max(2, effBits)
      // transmission order: interlaced frames send pass-ordered rows
      val data =
        if (!f.interlaced) f.indices
        else {
          val t = new Array[Byte](f.indices.length)
          val rows = interlacedRows(height)
          var k = 0
          while (k < height) {
            System.arraycopy(f.indices, rows(k) * width, t, k * width, width)
            k += 1
          }
          t
        }
      o.write(minCodeSize)
      val lzw = lzwCompress(data, minCodeSize)
      var p = 0
      while (p < lzw.length) { // 255-byte sub-block framing
        val n = math.min(255, lzw.length - p)
        o.write(n); o.write(lzw, p, n); p += n
      }
      o.write(0) // block terminator
    }
    o.write(0x3b) // trailer
    o.toByteArray
  }

  // ---------------------------------------------------------------- decode

  private def getShortLe(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** LZW-decompress a raw code stream to exactly `expected` indices. */
  private[multimodal] def lzwDecompress(data: Array[Byte], minCodeSize: Int,
                                        expected: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val end = clear + 1
    val out = new Array[Byte](expected)
    var outPos = 0
    // dictionary as (prefix link, last byte); roots are implicit
    val prefix = new Array[Int](4096)
    val last = new Array[Byte](4096)
    val buf = new Array[Byte](4096) // scratch for reversed expansion
    var width = minCodeSize + 1
    var next = end + 1
    var prevCode = -1
    var bitBuf = 0L
    var bitCnt = 0
    var pos = 0
    def expand(code: Int): Int = { // → length written into buf (reversed)
      var c = code
      var n = 0
      while (c >= end + 1) { buf(n) = last(c); n += 1; c = prefix(c) }
      require(c < clear, s"lzw: dangling code chain at $c")
      buf(n) = c.toByte; n + 1
    }
    def writeExpanded(n: Int): Byte = { // reversed buf[0..n) → out; returns FIRST byte
      require(outPos + n <= expected,
        s"lzw: output overrun (${outPos + n} > $expected)")
      var i = n - 1
      while (i >= 0) { out(outPos) = buf(i); outPos += 1; i -= 1 }
      buf(n - 1)
    }
    while (outPos < expected) {
      while (bitCnt < width) {
        require(pos < data.length, s"lzw: ran out of code bytes at $outPos/$expected")
        bitBuf |= (data(pos) & 0xffL) << bitCnt
        bitCnt += 8; pos += 1
      }
      val code = (bitBuf & ((1 << width) - 1)).toInt
      bitBuf >>>= width; bitCnt -= width
      if (code == clear) {
        width = minCodeSize + 1; next = end + 1; prevCode = -1
      } else if (code == end) {
        require(outPos == expected,
          s"lzw: EOI after $outPos of $expected indices")
      } else if (prevCode < 0) {
        require(code < clear, s"lzw: first code $code not a root")
        out(outPos) = code.toByte; outPos += 1
        prevCode = code
      } else {
        val firstByte: Byte =
          if (code < next) writeExpanded(expand(code))
          else if (code == next) { // the K-omega-K corner
            val n = expand(prevCode)
            // entry = str(prev) + first(str(prev)): shift reversed buf
            System.arraycopy(buf, 0, buf, 1, n)
            buf(0) = buf(n) // first byte of prev is at reversed end
            writeExpanded(n + 1)
          } else throw new IllegalArgumentException(
            s"lzw: code $code beyond dictionary ($next)")
        if (next < 4096) {
          prefix(next) = prevCode; last(next) = firstByte
          if (next + 1 == (1 << width) && width < 12) width += 1
          next += 1
        }
        prevCode = code
      }
    }
    out
  }

  /** Parse the container and return its header plus a LAZY frame
    * iterator: each image block's LZW stream decompresses only when
    * the iterator reaches it; interlaced frames are reordered to
    * raster order and indices resolved through the applicable
    * (local-over-global) color table. Malformed payloads fail
    * loudly. */
  def frameIterator(bytes: Array[Byte]): (GifHeader, Iterator[GifFrame]) = {
    require(bytes != null && bytes.length >= 13,
      s"decodeGif: ${if (bytes == null) "null" else s"${bytes.length}-byte"} " +
        "payload shorter than the screen descriptor")
    val magic = new String(bytes, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    require(magic == "GIF89a" || magic == "GIF87a",
      s"decodeGif: bad magic '$magic'")
    val width = getShortLe(bytes, 6)
    val height = getShortLe(bytes, 8)
    val packed = bytes(10) & 0xff
    val hasGct = (packed & 0x80) != 0
    val gctBits = (packed & 7) + 1
    require(width > 0 && height > 0, s"decodeGif: bad dims ${width}x$height")
    var off = 13
    val gct: Array[Int] =
      if (!hasGct) null
      else {
        val n = 1 << gctBits
        require(off + 3 * n <= bytes.length, "decodeGif: truncated GCT")
        val t = Array.tabulate(n)(i =>
          ((bytes(off + 3 * i) & 0xff) << 16) |
            ((bytes(off + 3 * i + 1) & 0xff) << 8) |
            (bytes(off + 3 * i + 2) & 0xff))
        off += 3 * n
        t
      }
    val hdr = GifHeader(width, height, if (hasGct) gctBits else 0)

    val it = new Iterator[GifFrame] {
      private var pos = off
      private var idx = 0
      private var done = false
      private def skipSubBlocks(): Unit = {
        var n = bytes(pos) & 0xff
        while (n != 0) {
          pos += 1 + n
          require(pos < bytes.length, "decodeGif: sub-blocks overrun file")
          n = bytes(pos) & 0xff
        }
        pos += 1
      }
      private def seek(): Unit = {
        while (!done) {
          require(pos < bytes.length, "decodeGif: missing trailer")
          (bytes(pos) & 0xff) match {
            case 0x3b => done = true // trailer
            case 0x21 => // extension: label + sub-blocks
              require(pos + 2 <= bytes.length, "decodeGif: truncated extension")
              pos += 2
              skipSubBlocks()
            case 0x2c => return // image descriptor: stop here
            case b => throw new IllegalArgumentException(
              f"decodeGif: unknown block 0x$b%02x at $pos")
          }
        }
      }
      override def hasNext: Boolean = { seek(); !done }
      override def next(): GifFrame = {
        seek()
        require(!done, "decodeGif: no more frames")
        require(pos + 10 <= bytes.length, "decodeGif: truncated image descriptor")
        val fx = getShortLe(bytes, pos + 1)
        val fy = getShortLe(bytes, pos + 3)
        val fw = getShortLe(bytes, pos + 5)
        val fh = getShortLe(bytes, pos + 7)
        val ip = bytes(pos + 9) & 0xff
        require(fx == 0 && fy == 0 && fw == width && fh == height,
          s"decodeGif: partial frame ($fx,$fy ${fw}x$fh) unsupported " +
            s"(logical screen ${width}x$height)")
        val interlaced = (ip & 0x40) != 0
        pos += 10
        val palette: Array[Int] =
          if ((ip & 0x80) != 0) {
            val n = 1 << ((ip & 7) + 1)
            require(pos + 3 * n <= bytes.length, "decodeGif: truncated LCT")
            val t = Array.tabulate(n)(i =>
              ((bytes(pos + 3 * i) & 0xff) << 16) |
                ((bytes(pos + 3 * i + 1) & 0xff) << 8) |
                (bytes(pos + 3 * i + 2) & 0xff))
            pos += 3 * n
            t
          } else {
            require(gct != null, "decodeGif: frame without any color table")
            gct
          }
        require(pos < bytes.length, "decodeGif: missing LZW min code size")
        val minCodeSize = bytes(pos) & 0xff
        require(minCodeSize >= 2 && minCodeSize <= 11,
          s"decodeGif: bad LZW min code size $minCodeSize")
        pos += 1
        // collect sub-blocks into one code stream
        val dataOut = new java.io.ByteArrayOutputStream
        var n = bytes(pos) & 0xff
        while (n != 0) {
          require(pos + 1 + n < bytes.length, "decodeGif: image data overrun")
          dataOut.write(bytes, pos + 1, n)
          pos += 1 + n
          n = bytes(pos) & 0xff
        }
        pos += 1
        val indices = lzwDecompress(dataOut.toByteArray, minCodeSize,
          width * height)
        val raster =
          if (!interlaced) indices
          else {
            val t = new Array[Byte](indices.length)
            val rows = interlacedRows(height)
            var k = 0
            while (k < height) {
              System.arraycopy(indices, k * width, t, rows(k) * width, width)
              k += 1
            }
            t
          }
        val rgb = new Array[Byte](3 * width * height)
        var i = 0
        while (i < raster.length) {
          val ci = raster(i) & 0xff
          require(ci < palette.length,
            s"decodeGif: index $ci outside ${palette.length}-entry palette")
          val c = palette(ci)
          rgb(3 * i) = ((c >>> 16) & 0xff).toByte
          rgb(3 * i + 1) = ((c >>> 8) & 0xff).toByte
          rgb(3 * i + 2) = (c & 0xff).toByte
          i += 1
        }
        val f = GifFrame(idx, rgb)
        idx += 1
        f
      }
    }
    (hdr, it)
  }

  /** Decode a single-frame GIF (convenience for the image-decode
    * operator): header + first frame's RGB raster. */
  def decodeGif(bytes: Array[Byte]): (GifHeader, Array[Byte]) = {
    val (hdr, it) = frameIterator(bytes)
    require(it.hasNext, "decodeGif: no image block")
    (hdr, it.next().rgb)
  }
}
