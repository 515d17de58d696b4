package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG (ISO/IEC 15948) encode + decode for 8-bit truecolor
  * rasters — the first genuinely COMPRESSED modality format in the
  * library (BMP/WAV/Y4M are real but uncompressed). Needs no native
  * library: DEFLATE is `java.util.zip` and the rest of PNG is chunk
  * framing plus the five scanline predictors.
  *
  * Supported subset (the common truecolor case): bit depth 8, color
  * types 2 (RGB) and 6 (RGBA), compression 0 (deflate), filter
  * method 0 with ALL FIVE per-row filters (None/Sub/Up/Average/Paeth),
  * interlace 0 (non-interlaced). The decoder walks real chunk framing
  * — multi-IDAT streams, ancillary chunks (skipped), per-chunk CRC32
  * verification — and rejects malformed or unsupported payloads
  * loudly instead of returning garbage rasters.
  *
  * Scale stance: identical to [[ImageCodec]] — encode/decode are
  * row-local byte work inside `mapPartitions`; no shuffle, no driver
  * involvement.
  */
object PngCodec {

  /** Decoded raster, rows top-down: `pixels(channels*(y*width+x) + c)`
    * with c in 0..channels-1 (RGB or RGBA order), values 0..255. */
  final case class DecodedPng(width: Int, height: Int, channels: Int,
                              pixels: Array[Int])

  private[multimodal] val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  // keep encoder IDAT chunks small so every real payload exercises the
  // decoder's multi-IDAT reassembly path
  private val EncodeIdatChunk = 32

  private[multimodal] def putIntBe(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = ((v >>> 24) & 0xff).toByte
    b(off + 1) = ((v >>> 16) & 0xff).toByte
    b(off + 2) = ((v >>> 8) & 0xff).toByte
    b(off + 3) = (v & 0xff).toByte
  }

  private[multimodal] def getIntBe(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** RFC 2083 Paeth predictor: closest of left/up/up-left to a+b-c,
    * ties resolved left, then up. */
  private[multimodal] def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private[multimodal] def writeChunk(out: java.io.ByteArrayOutputStream,
                         chunkType: String, data: Array[Byte]): Unit = {
    val len = new Array[Byte](4)
    putIntBe(len, 0, data.length)
    out.write(len)
    val t = chunkType.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    out.write(t)
    out.write(data)
    val crc = new CRC32
    crc.update(t)
    crc.update(data)
    val c = new Array[Byte](4)
    putIntBe(c, 0, crc.getValue.toInt)
    out.write(c)
  }

  /** Filtered scanline stream for a raster (one filter byte + filtered
    * data per row) — the byte stream PNG deflates into IDAT and APNG
    * deflates into fdAT (frame rasters use the identical per-row
    * filtering, just frame-sized rows). Shared by [[encodePng]] and
    * [[ApngCodec]]. */
  private[multimodal] def filterRaster(width: Int, height: Int,
      channels: Int, pixel: (Int, Int, Int) => Int,
      rowFilter: Int => Int): Array[Byte] = {
    val rowBytes = width * channels
    val raw = new Array[Byte]((1 + rowBytes) * height)
    val cur = new Array[Int](rowBytes)
    val prior = new Array[Int](rowBytes) // zeros above row 0, per spec
    var y = 0
    while (y < height) {
      var i = 0
      while (i < rowBytes) {
        cur(i) = pixel(i / channels, y, i % channels) & 0xff
        i += 1
      }
      val f = rowFilter(y)
      require(f >= 0 && f <= 4, s"filterRaster: filter $f out of range")
      val base = y * (1 + rowBytes)
      raw(base) = f.toByte
      i = 0
      while (i < rowBytes) {
        val a = if (i >= channels) cur(i - channels) else 0
        val b = prior(i)
        val c = if (i >= channels) prior(i - channels) else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) >> 1
          case 4 => paeth(a, b, c)
        }
        raw(base + 1 + i) = ((cur(i) - pred) & 0xff).toByte
        i += 1
      }
      System.arraycopy(cur, 0, prior, 0, rowBytes)
      y += 1
    }
    raw
  }

  private[multimodal] def deflateBytes(raw: Array[Byte]): Array[Byte] = {
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(raw)
    deflater.finish()
    val zBuf = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val tmp = new Array[Byte](4096)
    while (!deflater.finished()) {
      val n = deflater.deflate(tmp)
      zBuf.write(tmp, 0, n)
    }
    deflater.end()
    zBuf.toByteArray
  }

  /** Inflate a deflate stream that must hold EXACTLY `expected` bytes —
    * short, stalled, or over-long streams are malformed payloads. */
  private[multimodal] def inflateExact(z: Array[Byte], expected: Int,
                                       what: String): Array[Byte] = {
    val raw = new Array[Byte](expected)
    val inflater = new Inflater
    inflater.setInput(z)
    var got = 0
    while (got < expected && !inflater.finished()) {
      val n = inflater.inflate(raw, got, expected - got)
      require(n > 0 || inflater.finished(),
        s"$what: deflate stream stalled (truncated data?)")
      got += n
    }
    require(got == expected, s"$what: inflated $got bytes, expected $expected")
    val extraProbe = new Array[Byte](1)
    val extra = if (inflater.finished()) 0 else inflater.inflate(extraProbe)
    inflater.end()
    require(extra == 0, s"$what: deflate stream longer than the raster")
    raw
  }

  /** Reverse the per-row filter of a scanline stream (the inverse of
    * [[filterRaster]]); prior row is zeros, per spec. */
  private[multimodal] def unfilterRaster(raw: Array[Byte], width: Int,
      height: Int, channels: Int, what: String): Array[Int] = {
    val rowBytes = width * channels
    val pixels = new Array[Int](rowBytes * height)
    var y = 0
    while (y < height) {
      val f = raw(y * (1 + rowBytes)) & 0xff
      require(f <= 4, s"$what: filter byte $f out of range on row $y")
      val base = y * (1 + rowBytes) + 1
      val out = y * rowBytes
      val up = out - rowBytes
      var k = 0
      while (k < rowBytes) {
        val x = raw(base + k) & 0xff
        val a = if (k >= channels) pixels(out + k - channels) else 0
        val b = if (y > 0) pixels(up + k) else 0
        val c = if (y > 0 && k >= channels) pixels(up + k - channels) else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) >> 1
          case 4 => paeth(a, b, c)
        }
        pixels(out + k) = (x + pred) & 0xff
        k += 1
      }
      y += 1
    }
    pixels
  }

  /** Encode an 8-bit PNG. `channels` is 3 (RGB) or 4 (RGBA);
    * `pixel(x, y, c)` returns channel c of the top-down raster, masked
    * to 0..255. `rowFilter(y)` picks the scanline filter (0..4) for
    * row y — vary it to exercise every predictor in one payload. The
    * stream is framed as real PNG: signature, IHDR, an ancillary tEXt
    * chunk (so decoders must actually skip unknown chunks), the
    * deflated image data split across multiple small IDAT chunks, and
    * IEND — all CRC'd. */
  def encodePng(width: Int, height: Int, channels: Int,
                pixel: (Int, Int, Int) => Int,
                rowFilter: Int => Int = _ => 0): Array[Byte] = {
    require(width > 0 && height > 0, "encodePng: positive dims")
    require(channels == 3 || channels == 4,
      s"encodePng: $channels channels unsupported (3=RGB, 4=RGBA)")
    val z = deflateBytes(filterRaster(width, height, channels, pixel, rowFilter))

    val out = new java.io.ByteArrayOutputStream(z.length + 128)
    out.write(Signature)
    val ihdr = new Array[Byte](13)
    putIntBe(ihdr, 0, width)
    putIntBe(ihdr, 4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = (if (channels == 3) 2 else 6).toByte // color type
    ihdr(10) = 0 // compression: deflate
    ihdr(11) = 0 // filter method 0
    ihdr(12) = 0 // non-interlaced
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "tEXt",
      "Software\u0000graft".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    var off = 0
    while (off < z.length) {
      val n = math.min(EncodeIdatChunk, z.length - off)
      writeChunk(out, "IDAT", java.util.Arrays.copyOfRange(z, off, off + n))
      off += n
    }
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decode an 8-bit truecolor PNG (color type 2 or 6, non-interlaced)
    * to a top-down raster. Walks the chunk stream verifying every
    * CRC32, reassembles split IDAT data, inflates, and reverses the
    * per-row filter. Rejects unsupported or malformed payloads with a
    * specific message. */
  def decodePng(bytes: Array[Byte]): DecodedPng = {
    require(bytes != null && bytes.length >= Signature.length + 12,
      s"decodePng: ${if (bytes == null) "null" else s"${bytes.length}-byte"} " +
        "payload is shorter than signature + one chunk")
    var i = 0
    while (i < Signature.length) {
      require(bytes(i) == Signature(i), "decodePng: bad PNG signature")
      i += 1
    }
    var pos = Signature.length
    var width = 0
    var height = 0
    var channels = 0
    var sawIhdr = false
    var sawIend = false
    val idat = new java.io.ByteArrayOutputStream(bytes.length)
    while (!sawIend) {
      require(pos + 8 <= bytes.length, "decodePng: truncated chunk header")
      val len = getIntBe(bytes, pos)
      require(len >= 0 && pos + 12 + len <= bytes.length,
        s"decodePng: chunk length $len overruns ${bytes.length}-byte payload")
      val chunkType = new String(bytes, pos + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new CRC32
      crc.update(bytes, pos + 4, 4 + len)
      val stored = getIntBe(bytes, pos + 8 + len)
      require(crc.getValue.toInt == stored,
        s"decodePng: CRC mismatch on $chunkType chunk")
      chunkType match {
        case "IHDR" =>
          require(!sawIhdr, "decodePng: duplicate IHDR")
          require(len == 13, s"decodePng: IHDR length $len (need 13)")
          width = getIntBe(bytes, pos + 8)
          height = getIntBe(bytes, pos + 12)
          require(width > 0 && height > 0,
            s"decodePng: bad dimensions ${width}x$height")
          val bitDepth = bytes(pos + 16) & 0xff
          val colorType = bytes(pos + 17) & 0xff
          val compression = bytes(pos + 18) & 0xff
          val filterMethod = bytes(pos + 19) & 0xff
          val interlace = bytes(pos + 20) & 0xff
          require(bitDepth == 8,
            s"decodePng: bit depth $bitDepth unsupported (need 8)")
          require(colorType == 2 || colorType == 6,
            s"decodePng: color type $colorType unsupported (2=RGB, 6=RGBA)")
          require(compression == 0,
            s"decodePng: compression $compression unsupported (need deflate)")
          require(filterMethod == 0,
            s"decodePng: filter method $filterMethod unsupported (need 0)")
          require(interlace == 0,
            s"decodePng: interlaced images unsupported")
          channels = if (colorType == 2) 3 else 4
          sawIhdr = true
        case "IDAT" =>
          require(sawIhdr, "decodePng: IDAT before IHDR")
          idat.write(bytes, pos + 8, len)
        case "IEND" =>
          sawIend = true
        case _ => // ancillary chunk (tEXt, gAMA, ...): skip
      }
      pos += 12 + len
    }
    require(sawIhdr, "decodePng: missing IHDR")
    require(idat.size > 0, "decodePng: no IDAT data")

    // inflate the filtered scanline stream to its exact expected size,
    // then reverse the per-row filter (prior row = zeros)
    val rowBytes = width * channels
    val raw = inflateExact(idat.toByteArray, (1 + rowBytes) * height,
      "decodePng")
    val pixels = unfilterRaster(raw, width, height, channels, "decodePng")
    DecodedPng(width, height, channels, pixels)
  }
}
