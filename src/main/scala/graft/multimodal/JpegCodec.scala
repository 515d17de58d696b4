package graft.multimodal

/** Pure-JVM baseline JPEG (ITU-T T.81 / ISO 10918-1, JFIF framing)
  * encode + decode — the transform-coded image format next to
  * [[PngCodec]]'s predictive one: real 8x8 DCT, quantization,
  * zig-zag, and canonical Huffman entropy coding, no native library.
  *
  * Implemented subset (baseline sequential DCT, the format's common
  * core):
  *  - encode: grayscale (1 component) or YCbCr 4:4:4 (3 components),
  *    ITU Annex K quantization tables scaled by IJG quality (or
  *    caller-supplied tables), Annex K Huffman tables, optional
  *    restart intervals, JFIF APP0 framing, 0xFF byte stuffing;
  *  - decode: baseline SOF0, 1 or 3 components, per-component
  *    sampling factors up to 2x2 (so 4:4:4, 4:2:2 and 4:2:0 streams
  *    all decode — including libjpeg/ImageIO default 4:2:0 output),
  *    arbitrary DHT/DQT placement, DRI + RSTn restart handling,
  *    0xFF00 unstuffing, nearest-neighbor chroma upsampling, and loud
  *    rejection of progressive/arithmetic/12-bit streams.
  *
  * JPEG is lossy, so unlike [[PngCodec]]/[[FlacCodec]] round-trips are
  * only near-exact in general. Two verification regimes follow:
  * ScalaTest cross-checks both directions against the JDK's own
  * INDEPENDENT codec (`javax.imageio`), and the oracle-backed query
  * uses the format's one exactly-invertible corner — per-8x8-block
  * constant grayscale with unit quantization tables, where the DCT has
  * a single integral DC coefficient and decode reproduces the source
  * bit-for-bit (q100).
  *
  * Scale stance: identical to [[PngCodec]] — encode/decode are
  * row-local byte work inside `mapPartitions`; no shuffle, no driver
  * involvement.
  */
object JpegCodec {

  /** Decoded raster, rows top-down: `pixels(channels*(y*width+x) + c)`,
    * channels 1 (gray) or 3 (RGB), values 0..255. */
  final case class DecodedJpeg(width: Int, height: Int, channels: Int,
                               pixels: Array[Int])

  // ---------------------------------------------------------------
  // constant tables (ITU T.81 Annex K — public spec)

  /** Zig-zag scan order: zigzag(i) = raster index of i-th coefficient. */
  private val Zigzag: Array[Int] = Array(
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.1 luminance quantization table (raster order). */
  private val QLumBase: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Annex K.2 chrominance quantization table (raster order). */
  private val QChromBase: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  // Annex K.3-K.6 Huffman specs: (bits(1..16), values)
  private val DcLumBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals: Array[Int] = (0 to 11).toArray
  private val DcChromBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromVals: Array[Int] = (0 to 11).toArray

  private val AcLumBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)
  private val AcChromBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromVals: Array[Int] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  // cosine basis: CosT(n)(k) = cos((2n+1) k π / 16); Cscale(0)=1/√2
  private val CosT: Array[Array[Double]] = Array.tabulate(8, 8)((n, k) =>
    math.cos((2 * n + 1) * k * math.Pi / 16.0))
  private val Cscale: Array[Double] =
    Array.tabulate(8)(k => if (k == 0) 1.0 / math.sqrt(2.0) else 1.0)

  /** IJG quality → scaled Annex K table (raster order), clamped 1..255. */
  def scaledQuantTable(base: Array[Int], quality: Int): Array[Int] = {
    require(quality >= 1 && quality <= 100, s"quality $quality out of 1..100")
    val scale = if (quality < 50) 5000 / quality else 200 - 2 * quality
    base.map(v => math.max(1, math.min(255, (v * scale + 50) / 100)))
  }

  // ---------------------------------------------------------------
  // canonical Huffman (shared by encode table build and decode)

  /** codes(value) = (code, length) from a (bits, values) spec. */
  private def buildCodes(bits: Array[Int], vals: Array[Int]): Array[(Int, Int)] = {
    val out = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len)) {
        out(vals(k)) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    out
  }

  // ---------------------------------------------------------------
  // encode

  private final class BitSink(out: java.io.ByteArrayOutputStream) {
    private var acc = 0L
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1))
      n += len
      while (n >= 8) {
        val b = ((acc >>> (n - 8)) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0x00) // byte stuffing
        n -= 8
      }
    }
    /** pad to byte boundary with 1-bits (T.81 F.1.2.3). */
    def flush(): Unit = if (n > 0) put(0x7f, 8 - n)
  }

  private def fdct(block: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64)
    val out = new Array[Double](64)
    var y = 0
    while (y < 8) { // rows
      var k = 0
      while (k < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += block(y * 8 + x) * CosT(x)(k); x += 1 }
        tmp(y * 8 + k) = 0.5 * Cscale(k) * s
        k += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) { // columns
      var k = 0
      while (k < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 8) { s += tmp(yy * 8 + x) * CosT(yy)(k); yy += 1 }
        out(k * 8 + x) = 0.5 * Cscale(k) * s
        k += 1
      }
      x += 1
    }
    out
  }

  private def idct(coef: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64)
    val out = new Array[Double](64)
    var x = 0
    while (x < 8) { // columns first (inverse of fdct order; separable either way)
      var n = 0
      while (n < 8) {
        var s = 0.0
        var k = 0
        while (k < 8) { s += Cscale(k) * coef(k * 8 + x) * CosT(n)(k); k += 1 }
        tmp(n * 8 + x) = 0.5 * s
        n += 1
      }
      x += 1
    }
    var y = 0
    while (y < 8) { // rows
      var n = 0
      while (n < 8) {
        var s = 0.0
        var k = 0
        while (k < 8) { s += Cscale(k) * tmp(y * 8 + k) * CosT(n)(k); k += 1 }
        out(y * 8 + n) = 0.5 * s
        n += 1
      }
      y += 1
    }
    out
  }

  /** magnitude category: smallest s with |v| < 2^s (0 for v == 0). */
  private def category(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  private def writeMarker(out: java.io.ByteArrayOutputStream, m: Int,
                          payload: Array[Byte]): Unit = {
    out.write(0xff); out.write(m)
    val len = payload.length + 2
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    out.write(payload)
  }

  /** Encode a baseline JFIF JPEG. `channels` 1 (grayscale) or 3 (RGB
    * in, YCbCr 4:4:4 on the wire); `pixel(x, y, c)` masked to 0..255.
    * `quantOverride` replaces the quality-scaled Annex K tables with
    * caller tables (raster order; table 0 = luma, table 1 = chroma) —
    * unit tables make the block-constant grayscale case bit-exact.
    * `restartInterval > 0` emits DRI + RSTn markers every that many
    * MCUs (exercises the decoder's restart resync). */
  def encodeJpeg(width: Int, height: Int, channels: Int,
                 pixel: (Int, Int, Int) => Int, quality: Int = 85,
                 quantOverride: Option[(Array[Int], Array[Int])] = None,
                 restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0, "encodeJpeg: positive dims")
    require(channels == 1 || channels == 3,
      s"encodeJpeg: $channels channels unsupported (1=gray, 3=RGB)")
    val (qLum, qChrom) = quantOverride.getOrElse(
      (scaledQuantTable(QLumBase, quality), scaledQuantTable(QChromBase, quality)))
    require(qLum.length == 64 && qChrom.length == 64, "encodeJpeg: 64-entry quant tables")

    // component planes, level-shifted, edge-replicated to block multiples
    val bw = (width + 7) / 8
    val bh = (height + 7) / 8
    val planes = Array.ofDim[Double](channels, bw * 8 * bh * 8)
    var y = 0
    while (y < bh * 8) {
      val sy = math.min(y, height - 1)
      var x = 0
      while (x < bw * 8) {
        val sx = math.min(x, width - 1)
        if (channels == 1)
          planes(0)(y * bw * 8 + x) = (pixel(sx, sy, 0) & 0xff) - 128.0
        else {
          val r = pixel(sx, sy, 0) & 0xff
          val g = pixel(sx, sy, 1) & 0xff
          val b = pixel(sx, sy, 2) & 0xff
          planes(0)(y * bw * 8 + x) = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
          planes(1)(y * bw * 8 + x) = -0.168736 * r - 0.331264 * g + 0.5 * b
          planes(2)(y * bw * 8 + x) = 0.5 * r - 0.418688 * g - 0.081312 * b
        }
        x += 1
      }
      y += 1
    }

    val out = new java.io.ByteArrayOutputStream(width * height / 2 + 1024)
    out.write(0xff); out.write(0xd8) // SOI
    writeMarker(out, 0xe0, Array[Byte]( // APP0 JFIF 1.1, no thumbnail
      'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    def dqt(id: Int, t: Array[Int]): Unit =
      writeMarker(out, 0xdb, (id.toByte +: Array.tabulate(64)(i =>
        t(Zigzag(i)).toByte)))
    dqt(0, qLum)
    if (channels == 3) dqt(1, qChrom)
    // SOF0: 8-bit precision, h/v sampling all 1 (4:4:4)
    val sof = new java.io.ByteArrayOutputStream
    sof.write(8)
    sof.write((height >> 8) & 0xff); sof.write(height & 0xff)
    sof.write((width >> 8) & 0xff); sof.write(width & 0xff)
    sof.write(channels)
    var c = 0
    while (c < channels) {
      sof.write(c + 1)            // component id
      sof.write(0x11)             // h=1, v=1
      sof.write(if (c == 0) 0 else 1) // quant table id
      c += 1
    }
    writeMarker(out, 0xc0, sof.toByteArray)
    def dht(clazz: Int, id: Int, bits: Array[Int], vals: Array[Int]): Unit =
      writeMarker(out, 0xc4, ((clazz << 4 | id).toByte +:
        (Array.tabulate(16)(i => bits(i + 1).toByte) ++ vals.map(_.toByte))))
    dht(0, 0, DcLumBits, DcLumVals)
    dht(1, 0, AcLumBits, AcLumVals)
    if (channels == 3) {
      dht(0, 1, DcChromBits, DcChromVals)
      dht(1, 1, AcChromBits, AcChromVals)
    }
    if (restartInterval > 0)
      writeMarker(out, 0xdd, Array[Byte](
        ((restartInterval >> 8) & 0xff).toByte, (restartInterval & 0xff).toByte))
    // SOS
    val sos = new java.io.ByteArrayOutputStream
    sos.write(channels)
    c = 0
    while (c < channels) {
      sos.write(c + 1)
      sos.write(if (c == 0) 0x00 else 0x11) // DC/AC table ids
      c += 1
    }
    sos.write(0); sos.write(63); sos.write(0) // spectral selection (baseline)
    writeMarker(out, 0xda, sos.toByteArray)

    val dcCodes = Array(buildCodes(DcLumBits, DcLumVals),
      buildCodes(DcChromBits, DcChromVals))
    val acCodes = Array(buildCodes(AcLumBits, AcLumVals),
      buildCodes(AcChromBits, AcChromVals))
    val sink = new BitSink(out)
    val dcPred = new Array[Int](channels)
    var mcu = 0
    var rstIdx = 0
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          sink.flush()
          out.write(0xff); out.write(0xd0 + (rstIdx & 7))
          rstIdx += 1
          java.util.Arrays.fill(dcPred, 0)
        }
        c = 0
        while (c < channels) {
          val tbl = if (c == 0) 0 else 1
          val q = if (c == 0) qLum else qChrom
          // gather block, FDCT, quantize in zig-zag order
          val block = new Array[Double](64)
          var i = 0
          while (i < 64) {
            block(i) = planes(c)((by * 8 + i / 8) * bw * 8 + bx * 8 + i % 8)
            i += 1
          }
          val f = fdct(block)
          val zz = new Array[Int](64)
          i = 0
          while (i < 64) {
            val ri = Zigzag(i)
            zz(i) = math.round(f(ri) / q(ri)).toInt
            i += 1
          }
          // DC
          val diff = zz(0) - dcPred(c)
          dcPred(c) = zz(0)
          val cat = category(diff)
          val (dcode, dlen) = dcCodes(tbl)(cat)
          sink.put(dcode, dlen)
          if (cat > 0) {
            val v = if (diff < 0) diff + (1 << cat) - 1 else diff
            sink.put(v, cat)
          }
          // AC with ZRL/EOB
          var run = 0
          var k = 1
          while (k < 64) {
            val v = zz(k)
            if (v == 0) run += 1
            else {
              while (run >= 16) {
                val (zc, zl) = acCodes(tbl)(0xf0); sink.put(zc, zl); run -= 16
              }
              val acat = category(v)
              val (acode, alen) = acCodes(tbl)(run << 4 | acat)
              sink.put(acode, alen)
              val bitsV = if (v < 0) v + (1 << acat) - 1 else v
              sink.put(bitsV, acat)
              run = 0
            }
            k += 1
          }
          if (run > 0) { val (ec, el) = acCodes(tbl)(0x00); sink.put(ec, el) }
          c += 1
        }
        mcu += 1
        bx += 1
      }
      by += 1
    }
    sink.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // decode

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // canonical mincode/maxcode per length (T.81 F.2.2.3 DECODE)
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l); k += bits(l)
        maxCode(l) = if (bits(l) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    def value(len: Int, code: Int): Int = vals(valPtr(len) + (code - minCode(len)))
  }

  private final class BitSource(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    var sawMarker = 0 // nonzero = hit a marker byte (e.g. RST/EOI)
    def align(): Unit = { acc = 0; n = 0 }
    private def fill(): Unit = {
      if (sawMarker != 0) { acc = (acc << 8) | 0; n += 8; return } // pad past marker (T.81 allows)
      require(pos < bytes.length, "decodeJpeg: entropy stream truncated")
      val b = bytes(pos) & 0xff
      if (b == 0xff) {
        require(pos + 1 < bytes.length, "decodeJpeg: dangling 0xFF")
        val b2 = bytes(pos + 1) & 0xff
        if (b2 == 0x00) { pos += 2; acc = (acc << 8) | 0xff; n += 8 }
        else { sawMarker = b2; acc = (acc << 8) | 0; n += 8 } // stop before marker
      } else { pos += 1; acc = (acc << 8) | b; n += 8 }
    }
    def bit(): Int = {
      if (n == 0) fill()
      n -= 1
      (acc >>> n) & 1
    }
    def bits(k: Int): Int = {
      var v = 0
      var i = 0
      while (i < k) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def decodeHuff(t: HuffTable): Int = {
      var code = bit()
      var l = 1
      while (l <= 16 && (t.maxCode(l) < 0 || code > t.maxCode(l))) {
        code = (code << 1) | bit()
        l += 1
      }
      require(l <= 16, "decodeJpeg: invalid Huffman code")
      t.value(l, code)
    }
    /** T.81 EXTEND: the cat-bit magnitude value → signed. */
    def receiveExtend(cat: Int): Int = {
      if (cat == 0) 0
      else {
        val v = bits(cat)
        if (v < (1 << (cat - 1))) v - (1 << cat) + 1 else v
      }
    }
  }

  private def u16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** Decode a baseline JPEG (subset in the object doc). */
  def decodeJpeg(bytes: Array[Byte]): DecodedJpeg = {
    require(bytes != null && bytes.length > 4,
      s"decodeJpeg: ${if (bytes == null) "null" else s"${bytes.length}-byte"} payload too short")
    require((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
      "decodeJpeg: missing SOI marker")
    val quant = new Array[Array[Int]](4)     // zig-zag order as stored
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var restartInterval = 0
    var width = 0; var height = 0
    var nComp = 0
    var compId: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var compQ: Array[Int] = null
    var pos = 2
    var sofSeen = false

    def parseDht(seg: Array[Byte]): Unit = {
      var o = 0
      while (o < seg.length) {
        val cls = (seg(o) >> 4) & 0xf
        val id = seg(o) & 0xf
        require(cls <= 1 && id <= 3, s"decodeJpeg: bad DHT class/id $cls/$id")
        val bits = new Array[Int](17)
        var total = 0
        var l = 1
        while (l <= 16) { bits(l) = seg(o + l) & 0xff; total += bits(l); l += 1 }
        val vals = new Array[Int](total)
        var i = 0
        while (i < total) { vals(i) = seg(o + 17 + i) & 0xff; i += 1 }
        val t = new HuffTable(bits, vals)
        if (cls == 0) dcTabs(id) = t else acTabs(id) = t
        o += 17 + total
      }
    }
    def parseDqt(seg: Array[Byte]): Unit = {
      var o = 0
      while (o < seg.length) {
        val prec = (seg(o) >> 4) & 0xf
        val id = seg(o) & 0xf
        require(prec == 0, "decodeJpeg: 16-bit quant tables unsupported (baseline is 8)")
        require(id <= 3, s"decodeJpeg: bad DQT id $id")
        val t = new Array[Int](64)
        var i = 0
        while (i < 64) { t(i) = seg(o + 1 + i) & 0xff; i += 1 }
        quant(id) = t
        o += 65
      }
    }

    var scanDone = false
    var result: Array[Array[Int]] = null // per-component planes at full res

    while (!scanDone) {
      require(pos + 1 < bytes.length, "decodeJpeg: truncated marker stream")
      require((bytes(pos) & 0xff) == 0xff, s"decodeJpeg: expected marker at byte $pos")
      val m = bytes(pos + 1) & 0xff
      pos += 2
      m match {
        case 0xd9 => throw new IllegalArgumentException("decodeJpeg: EOI before scan data")
        case 0x01 => // TEM, no payload
        case x if x >= 0xd0 && x <= 0xd7 => // stray RST outside scan
        case 0xc0 | 0xc1 =>
          val len = u16(bytes, pos)
          val seg = java.util.Arrays.copyOfRange(bytes, pos + 2, pos + len)
          require((seg(0) & 0xff) == 8, "decodeJpeg: only 8-bit precision supported")
          height = u16(seg, 1); width = u16(seg, 3)
          require(width > 0 && height > 0, "decodeJpeg: bad dimensions")
          nComp = seg(5) & 0xff
          require(nComp == 1 || nComp == 3,
            s"decodeJpeg: $nComp components unsupported (1=gray, 3=YCbCr)")
          compId = new Array[Int](nComp); compH = new Array[Int](nComp)
          compV = new Array[Int](nComp); compQ = new Array[Int](nComp)
          var c = 0
          while (c < nComp) {
            compId(c) = seg(6 + 3 * c) & 0xff
            compH(c) = (seg(7 + 3 * c) >> 4) & 0xf
            compV(c) = seg(7 + 3 * c) & 0xf
            compQ(c) = seg(8 + 3 * c) & 0xff
            require(compH(c) >= 1 && compH(c) <= 2 && compV(c) >= 1 && compV(c) <= 2,
              s"decodeJpeg: sampling ${compH(c)}x${compV(c)} unsupported (max 2x2)")
            c += 1
          }
          sofSeen = true
          pos += len
        case 0xc2 => throw new IllegalArgumentException(
          "decodeJpeg: progressive JPEG unsupported (baseline only)")
        case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          throw new IllegalArgumentException(
            f"decodeJpeg: SOF marker 0xff$m%02x unsupported (baseline only)")
        case 0xc4 =>
          val len = u16(bytes, pos)
          parseDht(java.util.Arrays.copyOfRange(bytes, pos + 2, pos + len))
          pos += len
        case 0xdb =>
          val len = u16(bytes, pos)
          parseDqt(java.util.Arrays.copyOfRange(bytes, pos + 2, pos + len))
          pos += len
        case 0xdd =>
          restartInterval = u16(bytes, pos + 2)
          pos += u16(bytes, pos)
        case 0xda =>
          require(sofSeen, "decodeJpeg: SOS before SOF")
          val len = u16(bytes, pos)
          val seg = java.util.Arrays.copyOfRange(bytes, pos + 2, pos + len)
          val ns = seg(0) & 0xff
          require(ns == nComp, s"decodeJpeg: scan components $ns != frame $nComp")
          val scanDc = new Array[Int](nComp)
          val scanAc = new Array[Int](nComp)
          var c = 0
          while (c < ns) {
            val cid = seg(1 + 2 * c) & 0xff
            val idx = compId.indexOf(cid)
            require(idx >= 0, s"decodeJpeg: scan references unknown component $cid")
            scanDc(idx) = (seg(2 + 2 * c) >> 4) & 0xf
            scanAc(idx) = seg(2 + 2 * c) & 0xf
            c += 1
          }
          pos += len
          result = decodeScan(bytes, pos, width, height, nComp, compH, compV,
            compQ, scanDc, scanAc, dcTabs, acTabs, quant, restartInterval) match {
            case (planes, endPos) => pos = endPos; planes
          }
          scanDone = true
        case _ => // APPn, COM, unknown: skip by length
          val len = u16(bytes, pos)
          require(len >= 2 && pos + len <= bytes.length,
            f"decodeJpeg: marker 0xff$m%02x segment overruns payload")
          pos += len
      }
    }

    // color conversion + pack
    val px = new Array[Int](width * height * nComp)
    if (nComp == 1) {
      var i = 0
      while (i < width * height) { px(i) = result(0)(i); i += 1 }
    } else {
      var i = 0
      while (i < width * height) {
        val yv = result(0)(i)
        val cb = result(1)(i) - 128
        val cr = result(2)(i) - 128
        def clamp(d: Double): Int = math.max(0, math.min(255, math.round(d).toInt))
        px(3 * i) = clamp(yv + 1.402 * cr)
        px(3 * i + 1) = clamp(yv - 0.344136 * cb - 0.714136 * cr)
        px(3 * i + 2) = clamp(yv + 1.772 * cb)
        i += 1
      }
    }
    DecodedJpeg(width, height, nComp, px)
  }

  /** Entropy-decode the (single, baseline) scan → full-resolution
    * component planes; returns (planes, position after scan data). */
  private def decodeScan(bytes: Array[Byte], start: Int, width: Int, height: Int,
                         nComp: Int, compH: Array[Int], compV: Array[Int],
                         compQ: Array[Int], scanDc: Array[Int], scanAc: Array[Int],
                         dcTabs: Array[HuffTable], acTabs: Array[HuffTable],
                         quant: Array[Array[Int]],
                         restartInterval: Int): (Array[Array[Int]], Int) = {
    val hMax = compH.max
    val vMax = compV.max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    // per-component subsampled plane dims (block-padded)
    val planeW = Array.tabulate(nComp)(c => mcusX * compH(c) * 8)
    val planeH = Array.tabulate(nComp)(c => mcusY * compV(c) * 8)
    val planes = Array.tabulate(nComp)(c => new Array[Int](planeW(c) * planeH(c)))
    val dcPred = new Array[Int](nComp)
    val src = new BitSource(bytes, start)
    var mcu = 0
    val totalMcus = mcusX * mcusY
    var rstExpect = 0
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        // consume the RSTn marker between entropy segments
        src.align()
        var p = src.pos
        require(src.sawMarker != 0 || (bytes(p) & 0xff) == 0xff,
          "decodeJpeg: expected restart marker")
        val mk = if (src.sawMarker != 0) src.sawMarker
                 else { p += 1; bytes(p) & 0xff }
        require(mk == 0xd0 + (rstExpect & 7),
          f"decodeJpeg: expected RST${rstExpect & 7} got 0xff$mk%02x")
        // reposition after the marker bytes
        if (src.sawMarker != 0) {
          // sawMarker: pos points at the 0xFF; skip 2
          src.pos += 2
          src.sawMarker = 0
        } else src.pos = p + 1
        src.align()
        rstExpect += 1
        java.util.Arrays.fill(dcPred, 0)
      }
      val my = mcu / mcusX
      val mx = mcu % mcusX
      var c = 0
      while (c < nComp) {
        val q = quant(compQ(c))
        require(q != null, s"decodeJpeg: missing quant table ${compQ(c)}")
        val dct = dcTabs(scanDc(c)); val act = acTabs(scanAc(c))
        require(dct != null && act != null, "decodeJpeg: missing Huffman table")
        var v = 0
        while (v < compV(c)) {
          var h = 0
          while (h < compH(c)) {
            // one 8x8 block
            val zz = new Array[Int](64)
            val cat = src.decodeHuff(dct)
            require(cat <= 15, "decodeJpeg: bad DC category")
            val diff = src.receiveExtend(cat)
            dcPred(c) += diff
            zz(0) = dcPred(c)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = src.decodeHuff(act)
              val run = rs >> 4
              val acat = rs & 0xf
              if (acat == 0) {
                if (run == 15) k += 16 // ZRL
                else eob = true
              } else {
                k += run
                require(k < 64, "decodeJpeg: AC run overruns block")
                zz(k) = src.receiveExtend(acat)
                k += 1
              }
            }
            // dequantize + inverse zig-zag + IDCT
            val coef = new Array[Double](64)
            k = 0
            while (k < 64) { coef(Zigzag(k)) = zz(k).toDouble * q(k); k += 1 }
            val sp = idct(coef)
            // place into plane
            val px0 = (mx * compH(c) + h) * 8
            val py0 = (my * compV(c) + v) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                val s = math.max(0, math.min(255, math.round(sp(yy * 8 + xx) + 128.0).toInt))
                planes(c)((py0 + yy) * planeW(c) + px0 + xx) = s
                xx += 1
              }
              yy += 1
            }
            h += 1
          }
          v += 1
        }
        c += 1
      }
      mcu += 1
    }
    // advance to the next marker (skip pad bits / stuffing already handled)
    var end = src.pos
    if (src.sawMarker == 0) {
      while (end + 1 < bytes.length &&
        !((bytes(end) & 0xff) == 0xff && (bytes(end + 1) & 0xff) != 0x00)) end += 1
    }
    // upsample to full resolution (nearest neighbor)
    val full = Array.tabulate(nComp) { c =>
      val o = new Array[Int](width * height)
      val sh = hMax / compH(c)
      val sv = vMax / compV(c)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          o(y * width + x) = planes(c)((y / sv) * planeW(c) + x / sh)
          x += 1
        }
        y += 1
      }
      o
    }
    (full, end)
  }
}
