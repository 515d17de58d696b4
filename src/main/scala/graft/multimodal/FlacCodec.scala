package graft.multimodal

/** Pure-JVM FLAC (RFC 9639 / xiph.org spec) encode + decode for 16-bit
  * PCM — the first genuinely COMPRESSED audio format in the library
  * (WAV is real but uncompressed; PNG covers compressed images). FLAC
  * is LOSSLESS, so unlike JPEG the decoded samples are bit-exact and a
  * SQL oracle can verify the full encode→decode loop analytically.
  *
  * Implemented subset (the common CD-audio shape):
  *  - stream framing: `fLaC` magic, STREAMINFO metadata block (with
  *    the interleaved-PCM MD5, verified on decode), arbitrary skipped
  *    metadata blocks (the encoder emits a PADDING block so decoders
  *    must actually walk block headers), frame sequence;
  *  - frame headers: 14-bit sync, fixed-blocksize strategy with
  *    UTF-8-coded frame numbers, tail-coded block sizes (8/16-bit
  *    "blocksize-1" forms) plus the common 4-bit table codes, CRC-8
  *    (poly 0x07) header check, CRC-16 (poly 0x8005) frame check;
  *  - subframes: CONSTANT, VERBATIM, FIXED predictor orders 0–4, and
  *    (decode side) LPC orders 1–32 with quantized coefficients —
  *    Rice-coded residuals in both 4-bit and 5-bit parameter variants,
  *    arbitrary partition orders, raw-bits escape code;
  *  - channels: any count of independent channels, plus the stereo
  *    decorrelation modes LEFT/SIDE, RIGHT/SIDE, MID/SIDE (side channel
  *    carries bits-per-sample+1, per spec);
  *  - "wasted bits" subframe flag (decode side).
  *
  * The encoder picks the cheapest subframe by EXACT bit count among
  * CONSTANT, VERBATIM, FIXED orders 0–4, and quantized-coefficient LPC
  * orders 1–8 (autocorrelation → Levinson–Durbin recursion →
  * error-feedback coefficient quantization at 15-bit precision, the
  * published FLAC-format algorithm), the cheapest Rice parameter per
  * candidate, and optional mid/side decorrelation on stereo input —
  * the real decision structure of a full `flac` encode, not just the
  * `--fast` FIXED family. LPC is lossless by construction: residuals
  * are computed with the QUANTIZED integer coefficients and the same
  * `acc >> shift` arithmetic the decoder applies.
  *
  * Scale stance: identical to [[PngCodec]] — encode/decode are
  * row-local byte work inside `mapPartitions`; no shuffle, no driver
  * involvement.
  */
object FlacCodec {

  /** Decoded PCM audio: `samples(i * channels + c)` = frame i, channel
    * c, signed `bps`-bit range. Same layout as
    * [[AudioCodec.DecodedAudio]]. */
  final case class DecodedFlac(sampleRate: Int, channels: Int,
                               bitsPerSample: Int, frames: Int,
                               samples: Array[Int])

  // ---------------------------------------------------------------
  // bit-level IO (MSB-first, as FLAC requires)

  private[multimodal] final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream(1 << 12)
    private var acc = 0L
    private var nbits = 0
    def writeBits(v: Long, n: Int): Unit = {
      require(n >= 0 && n <= 56, s"writeBits: $n bits") // 56 + ≤7 buffered ≤ 63
      acc = (acc << n) | (v & ((1L << n) - 1))
      nbits += n
      while (nbits >= 8) {
        buf.write(((acc >>> (nbits - 8)) & 0xff).toInt)
        nbits -= 8
      }
    }
    /** FLAC unary: `v` zero-bits followed by a one-bit. */
    def writeUnary(v: Int): Unit = {
      var r = v
      while (r >= 32) { writeBits(0L, 32); r -= 32 }
      writeBits(1L, r + 1)
    }
    def alignToByte(): Unit = if (nbits > 0) writeBits(0L, 8 - nbits)
    def toBytes: Array[Byte] = {
      require(nbits == 0, "BitWriter: unaligned")
      buf.toByteArray
    }
  }

  private final class BitReader(bytes: Array[Byte], startByte: Int) {
    private var pos = startByte // byte position
    private var bit = 0        // bits consumed within bytes(pos)
    def bytePos: Int = pos
    def aligned: Boolean = bit == 0
    def readBit(): Int = {
      require(pos < bytes.length, "FLAC: bitstream truncated")
      val b = (bytes(pos) >> (7 - bit)) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      b
    }
    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readSigned(n: Int): Int = {
      val v = readBits(n)
      (v << (64 - n) >> (64 - n)).toInt
    }
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) q += 1
      q
    }
    def alignToByte(): Unit = if (bit != 0) { bit = 0; pos += 1 }
  }

  // ---------------------------------------------------------------
  // CRCs (FLAC frame-header CRC-8 poly 0x07, frame CRC-16 poly 0x8005)

  private[multimodal] def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  private[multimodal] def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  /** MD5 of the unencoded audio as FLAC defines it: frames in order,
    * channels interleaved, each sample little-endian (2 bytes for
    * 16-bit). */
  private[multimodal] def pcmMd5(samples: Array[Int]): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val b = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      b(2 * i) = (samples(i) & 0xff).toByte
      b(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    md.digest(b)
  }

  /** FLAC's "UTF-8-style" variable-length code for frame numbers. */
  private[multimodal] def writeUtf8Number(w: BitWriter, v: Long): Unit = {
    if (v < 0x80) w.writeBits(v, 8)
    else {
      // count payload bits -> number of continuation bytes
      var cont = 1
      while (cont < 6 && v >= (1L << (6 * cont + (6 - cont)))) cont += 1
      // header byte: cont+1 leading ones, a zero, then the top bits
      val headerPayloadBits = 6 - cont
      val mask = (0xff << (7 - cont)) & 0xff
      w.writeBits(mask | ((v >>> (6 * cont)) & ((1 << headerPayloadBits) - 1)), 8)
      var k = cont - 1
      while (k >= 0) {
        w.writeBits(0x80L | ((v >>> (6 * k)) & 0x3f), 8)
        k -= 1
      }
    }
  }

  private def readUtf8Number(r: BitReader): Long = {
    val b0 = r.readBits(8).toInt
    if ((b0 & 0x80) == 0) b0.toLong
    else {
      var cont = 0
      var probe = b0
      while ((probe & 0x40) != 0) { cont += 1; probe <<= 1 }
      require(cont >= 1 && cont <= 6, s"FLAC: bad UTF-8 number lead byte $b0")
      var v = (b0 & (0x3f >> cont)).toLong
      var k = 0
      while (k < cont) {
        val b = r.readBits(8).toInt
        require((b & 0xc0) == 0x80, s"FLAC: bad UTF-8 continuation byte $b")
        v = (v << 6) | (b & 0x3f)
        k += 1
      }
      v
    }
  }

  // ---------------------------------------------------------------
  // fixed predictors (orders 0-4); residual r[i] for i >= order

  private def fixedResidual(x: Array[Int], order: Int): Array[Long] = {
    val n = x.length - order
    val r = new Array[Long](n)
    var i = order
    while (i < x.length) {
      r(i - order) = order match {
        case 0 => x(i).toLong
        case 1 => x(i).toLong - x(i - 1)
        case 2 => x(i).toLong - 2L * x(i - 1) + x(i - 2)
        case 3 => x(i).toLong - 3L * x(i - 1) + 3L * x(i - 2) - x(i - 3)
        case 4 => x(i).toLong - 4L * x(i - 1) + 6L * x(i - 2) - 4L * x(i - 3) + x(i - 4)
      }
      i += 1
    }
    r
  }

  private def zigzag(v: Long): Long = if (v >= 0) v << 1 else (-v << 1) - 1

  /** Exact Rice cost in bits of one partition at parameter p. */
  private def riceCost(res: Array[Long], p: Int): Long = {
    var bits = 0L
    var i = 0
    while (i < res.length) {
      bits += (zigzag(res(i)) >>> p) + 1 + p
      i += 1
    }
    bits
  }

  // ---------------------------------------------------------------
  // LPC analysis (encode side) — autocorrelation + Levinson–Durbin,
  // then error-feedback quantization; the residual is computed with
  // the QUANTIZED coefficients and the decoder's exact `acc >> shift`
  // integer arithmetic, so any coefficient estimate yields a lossless
  // subframe (a poor estimate only costs bits, never correctness).

  private val LpcPrecision = 15 // qlp coefficient bits (precM1=14 ≠ escape 15)
  private val MaxLpcOrder = 8

  /** Quantize one order's double coefficients: pick the largest
    * non-negative shift (≤ 15, the common encoder bound well inside
    * the 5-bit signed field) keeping every rounded coefficient in the
    * precision's two's-complement range, then round with error
    * feedback (each coefficient absorbs the accumulated rounding error
    * of its predecessors — the published FLAC-format scheme). */
  private def quantizeLpc(a: Array[Double], order: Int): Option[(Array[Int], Int)] = {
    var cmax = 0.0
    var j = 0
    while (j < order) {
      val m = math.abs(a(j))
      if (m > cmax) cmax = m
      j += 1
    }
    if (cmax <= 0.0 || !java.lang.Double.isFinite(cmax)) return None
    val qmax = (1 << (LpcPrecision - 1)) - 1
    val qmin = -(1 << (LpcPrecision - 1))
    var shift = 15
    while (shift > 0 && cmax * (1L << shift).toDouble > qmax) shift -= 1
    val q = new Array[Int](order)
    var errFb = 0.0
    j = 0
    while (j < order) {
      val v = a(j) * (1L << shift).toDouble + errFb
      val r = math.round(v)
      val clamped = math.max(qmin.toLong, math.min(qmax.toLong, r)).toInt
      errFb = v - clamped
      q(j) = clamped
      j += 1
    }
    var allZero = true
    j = 0
    while (allZero && j < order) { allZero = q(j) == 0; j += 1 }
    if (allZero) None else Some((q, shift))
  }

  /** Residual under quantized LPC — the decoder's arithmetic inverted:
    * r[i] = x[i] − ((Σ q[j]·x[i−1−j]) >> shift). Overflow-safe: |q| <
    * 2^14, |x| ≤ 2^17 (side channel), order ≤ 8 → |acc| < 2^34. */
  private def lpcResidual(x: Array[Int], q: Array[Int], shift: Int): Array[Long] = {
    val order = q.length
    val r = new Array[Long](x.length - order)
    var i = order
    while (i < x.length) {
      var acc = 0L
      var j = 0
      while (j < order) { acc += q(j).toLong * x(i - 1 - j); j += 1 }
      r(i - order) = x(i).toLong - (acc >> shift)
      i += 1
    }
    r
  }

  /** All quantizable LPC candidates for one subframe: (order, quantized
    * coefs, shift, residual) for each order 1..min(8, n−1) the
    * Levinson–Durbin recursion reaches with positive finite prediction
    * error. Rectangular window (no windowing) — affects only the
    * coefficient ESTIMATE, never losslessness. */
  private def lpcCandidates(x: Array[Int]): List[(Int, Array[Int], Int, Array[Long])] = {
    val n = x.length
    val mo = math.min(MaxLpcOrder, n - 1)
    if (mo < 1) return Nil
    val autoc = new Array[Double](mo + 1)
    var lag = 0
    while (lag <= mo) {
      var s = 0.0
      var i = lag
      while (i < n) { s += x(i).toDouble * x(i - lag).toDouble; i += 1 }
      autoc(lag) = s
      lag += 1
    }
    if (autoc(0) == 0.0) return Nil // silent block (CONSTANT wins anyway)
    val out = List.newBuilder[(Int, Array[Int], Int, Array[Long])]
    var err = autoc(0)
    val a = new Array[Double](mo) // a(j) predicts with x[i-1-j]
    var m = 1
    while (m <= mo && err > 0.0 && java.lang.Double.isFinite(err)) {
      var k = autoc(m)
      var j = 1
      while (j < m) { k -= a(j - 1) * autoc(m - j); j += 1 }
      k /= err
      val prev = java.util.Arrays.copyOf(a, math.max(0, m - 1))
      a(m - 1) = k
      j = 0
      while (j < m - 1) { a(j) = prev(j) - k * prev(m - 2 - j); j += 1 }
      err *= (1.0 - k * k)
      quantizeLpc(a, m).foreach { case (q, shift) =>
        out += ((m, q, shift, lpcResidual(x, q, shift)))
      }
      m += 1
    }
    out.result()
  }

  // ---------------------------------------------------------------
  // encode

  private val EncodePadding = 16 // bytes of PADDING metadata (decoders must skip it)

  /** Encode 16-bit PCM as a spec-conformant FLAC stream. `sample(f, c)`
    * in [-32768, 32767]. `blockSize` is the fixed inter-frame block
    * size (last frame may be shorter); small values exercise the
    * multi-frame path. `midSide` applies stereo decorrelation when
    * `channels == 2` (ignored otherwise). */
  def encodeFlac(sampleRate: Int, channels: Int, frames: Int,
                 sample: (Int, Int) => Int, blockSize: Int = 4096,
                 midSide: Boolean = false): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20), "encodeFlac: bad sample rate")
    require(channels >= 1 && channels <= 8, "encodeFlac: 1..8 channels")
    require(frames > 0, "encodeFlac: need at least one frame")
    require(blockSize >= 16 && blockSize <= 65535, "encodeFlac: blockSize 16..65535")
    val bps = 16
    val interleaved = new Array[Int](frames * channels)
    var f = 0
    while (f < frames) {
      var c = 0
      while (c < channels) {
        val v = sample(f, c)
        require(v >= -32768 && v <= 32767, s"encodeFlac: sample $v out of 16-bit range")
        interleaved(f * channels + c) = v
        c += 1
      }
      f += 1
    }
    val md5 = pcmMd5(interleaved)

    val out = new java.io.ByteArrayOutputStream(frames * channels + 128)
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO (type 0, 34 bytes, NOT last — a PADDING block follows)
    val si = new BitWriter
    si.writeBits(blockSize.toLong, 16)       // min block size
    si.writeBits(blockSize.toLong, 16)       // max block size
    si.writeBits(0L, 24)                     // min frame size unknown
    si.writeBits(0L, 24)                     // max frame size unknown
    si.writeBits(sampleRate.toLong, 20)
    si.writeBits((channels - 1).toLong, 3)
    si.writeBits((bps - 1).toLong, 5)
    si.writeBits(frames.toLong, 36)          // total inter-channel samples
    val siBytes = si.toBytes
    out.write(0x00)                          // last=0, type=0 (STREAMINFO)
    out.write(0); out.write(0); out.write(34)
    out.write(siBytes)
    out.write(md5)
    // PADDING (type 1, last) — forces decoders to walk metadata headers
    out.write(0x81)
    out.write(0); out.write(0); out.write(EncodePadding)
    out.write(new Array[Byte](EncodePadding))

    var frameNo = 0L
    var start = 0
    while (start < frames) {
      val bs = math.min(blockSize, frames - start)
      val chans: Array[Array[Int]] =
        if (midSide && channels == 2) {
          val mid = new Array[Int](bs)
          val side = new Array[Int](bs)
          var i = 0
          while (i < bs) {
            val l = interleaved((start + i) * 2)
            val r = interleaved((start + i) * 2 + 1)
            mid(i) = (l + r) >> 1
            side(i) = l - r
            i += 1
          }
          Array(mid, side)
        } else
          Array.tabulate(channels) { c =>
            val a = new Array[Int](bs)
            var i = 0
            while (i < bs) { a(i) = interleaved((start + i) * channels + c); i += 1 }
            a
          }

      val w = new BitWriter
      w.writeBits(0x3ffe, 14)                 // sync
      w.writeBits(0L, 1)                      // reserved
      w.writeBits(0L, 1)                      // fixed-blocksize strategy
      // block size: prefer a table code when one matches, else tail form
      // prefer a 4-bit table code when one matches (192; 576·2^k, k≤3;
      // 2^k for k in 8..15), else the 8/16-bit "blocksize-1" tail form
      val bsCode =
        if (bs == 192) 1
        else if (bs % 576 == 0 && Integer.bitCount(bs / 576) == 1 && bs / 576 <= 8)
          2 + Integer.numberOfTrailingZeros(bs / 576)
        else if (Integer.bitCount(bs) == 1 && bs >= 256 && bs <= 32768)
          Integer.numberOfTrailingZeros(bs) // 2^8..2^15 -> codes 8..15
        else if (bs <= 256) 6
        else 7
      w.writeBits(bsCode.toLong, 4)
      w.writeBits(0L, 4)                      // sample rate: from STREAMINFO
      val chanAssign = if (midSide && channels == 2) 10 else channels - 1
      w.writeBits(chanAssign.toLong, 4)
      w.writeBits(4L, 3)                      // sample size: 16-bit
      w.writeBits(0L, 1)                      // reserved
      writeUtf8Number(w, frameNo)
      if (bsCode == 6) w.writeBits((bs - 1).toLong, 8)
      else if (bsCode == 7) w.writeBits((bs - 1).toLong, 16)
      val headerBytes = { w.alignToByte(); w.toBytes } // header is byte-aligned here
      val crc8v = crc8(headerBytes, 0, headerBytes.length)

      val body = new BitWriter
      var ci = 0
      while (ci < chans.length) {
        val sbps = if (chanAssign == 10 && ci == 1) bps + 1 else bps
        writeSubframe(body, chans(ci), sbps)
        ci += 1
      }
      body.alignToByte()
      val bodyBytes = body.toBytes

      val frameBuf = new Array[Byte](headerBytes.length + 1 + bodyBytes.length)
      System.arraycopy(headerBytes, 0, frameBuf, 0, headerBytes.length)
      frameBuf(headerBytes.length) = crc8v.toByte
      System.arraycopy(bodyBytes, 0, frameBuf, headerBytes.length + 1, bodyBytes.length)
      val crc16v = crc16(frameBuf, 0, frameBuf.length)
      out.write(frameBuf)
      out.write((crc16v >> 8) & 0xff)
      out.write(crc16v & 0xff)

      frameNo += 1
      start += bs
    }
    out.toByteArray
  }

  /** One subframe: CONSTANT if flat, else the exact-bit-count cheapest
    * of FIXED orders 0–4, LPC orders 1–8 (quantized coefficients, each
    * charged its 4+5+order·precision side info), and VERBATIM —
    * cheapest Rice parameter per candidate, single partition. */
  private def writeSubframe(w: BitWriter, x: Array[Int], bps: Int): Unit = {
    var allSame = true
    var i = 1
    while (allSame && i < x.length) { allSame = x(i) == x(0); i += 1 }
    if (allSame) {
      w.writeBits(0L, 1); w.writeBits(0L, 6); w.writeBits(0L, 1) // CONSTANT, no wasted bits
      w.writeBits(x(0).toLong, bps)
      return
    }
    // pick fixed order + rice parameter with exact bit accounting
    var bestOrder = 0
    var bestParam = 0
    var bestBits = Long.MaxValue
    var bestRes: Array[Long] = null
    var order = 0
    while (order <= 4 && order < x.length) {
      val res = fixedResidual(x, order)
      var p = 0
      while (p <= 14) {
        val bits = order.toLong * bps + riceCost(res, p)
        if (bits < bestBits) {
          bestBits = bits; bestOrder = order; bestParam = p; bestRes = res
        }
        p += 1
      }
      order += 1
    }
    // LPC candidates, charged their coefficient side info (4-bit
    // precision code + 5-bit shift + order·precision coefficient bits)
    // so the comparison against FIXED stays exact; the residual header
    // (2+4+4 bits) is identical across FIXED/LPC and cancels
    var bestLpc: (Int, Array[Int], Int, Array[Long]) = null
    var bestLpcParam = 0
    lpcCandidates(x).foreach { case cand @ (ord, _, _, res) =>
      var p = 0
      while (p <= 14) {
        val bits = ord.toLong * bps + 4 + 5 + ord.toLong * LpcPrecision +
          riceCost(res, p)
        if (bits < bestBits) {
          bestBits = bits; bestLpc = cand; bestLpcParam = p
        }
        p += 1
      }
    }
    val verbatimBits = x.length.toLong * bps
    if (verbatimBits < bestBits) {
      w.writeBits(0L, 1); w.writeBits(1L, 6); w.writeBits(0L, 1) // VERBATIM
      var k = 0
      while (k < x.length) { w.writeBits(x(k).toLong, bps); k += 1 }
      return
    }
    if (bestLpc != null) {
      val (ord, q, shift, res) = bestLpc
      w.writeBits(0L, 1)
      w.writeBits((0x20 | (ord - 1)).toLong, 6) // LPC, order-1 in low bits
      w.writeBits(0L, 1)                        // no wasted bits
      var k = 0
      while (k < ord) { w.writeBits(x(k).toLong, bps); k += 1 }
      w.writeBits((LpcPrecision - 1).toLong, 4)
      w.writeBits(shift.toLong, 5)              // non-negative, fits signed field
      k = 0
      while (k < ord) { w.writeBits(q(k).toLong, LpcPrecision); k += 1 }
      w.writeBits(0L, 2)                        // residual method: RICE (4-bit)
      w.writeBits(0L, 4)                        // partition order 0
      w.writeBits(bestLpcParam.toLong, 4)
      k = 0
      while (k < res.length) {
        val z = zigzag(res(k))
        w.writeUnary((z >>> bestLpcParam).toInt)
        w.writeBits(z, bestLpcParam)
        k += 1
      }
      return
    }
    w.writeBits(0L, 1)
    w.writeBits((8 + bestOrder).toLong, 6)   // FIXED, order in low bits
    w.writeBits(0L, 1)                       // no wasted bits
    var k = 0
    while (k < bestOrder) { w.writeBits(x(k).toLong, bps); k += 1 }
    w.writeBits(0L, 2)                       // residual method: RICE (4-bit)
    w.writeBits(0L, 4)                       // partition order 0
    w.writeBits(bestParam.toLong, 4)
    k = 0
    while (k < bestRes.length) {
      val z = zigzag(bestRes(k))
      w.writeUnary((z >>> bestParam).toInt)
      w.writeBits(z, bestParam)
      k += 1
    }
  }

  // ---------------------------------------------------------------
  // decode

  /** Decode a FLAC stream (subset above, including LPC subframes —
    * what `flac` default settings emit). Verifies metadata framing,
    * every frame's CRC-8 and CRC-16, and the STREAMINFO MD5 of the
    * decoded PCM. */
  def decodeFlac(bytes: Array[Byte]): DecodedFlac = decodeFlac(bytes, _ => ())

  /** Decode with a per-subframe callback receiving the raw 6-bit
    * subframe type code (0 CONSTANT, 1 VERBATIM, 8+o FIXED, 0x20|(o−1)
    * LPC) — the test hook that proves the encoder actually EMITS a
    * given subframe family, not just that decode round-trips. */
  private[multimodal] def decodeFlac(bytes: Array[Byte],
                                     onSubframe: Int => Unit): DecodedFlac = {
    require(bytes != null && bytes.length > 42,
      s"decodeFlac: ${if (bytes == null) "null" else s"${bytes.length}-byte"} " +
        "payload shorter than magic + STREAMINFO")
    require(bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' && bytes(3) == 'C',
      "decodeFlac: missing fLaC magic")
    var pos = 4
    var sampleRate = -1; var channels = -1; var bps = -1
    var totalSamples = -1L
    var md5Stored: Array[Byte] = null
    var last = false
    var sawStreamInfo = false
    while (!last) {
      require(pos + 4 <= bytes.length, "decodeFlac: truncated metadata header")
      val h = bytes(pos) & 0xff
      last = (h & 0x80) != 0
      val btype = h & 0x7f
      val blen = ((bytes(pos + 1) & 0xff) << 16) | ((bytes(pos + 2) & 0xff) << 8) |
        (bytes(pos + 3) & 0xff)
      require(pos + 4 + blen <= bytes.length,
        s"decodeFlac: metadata block overruns payload")
      if (btype == 0) {
        require(!sawStreamInfo, "decodeFlac: duplicate STREAMINFO")
        require(blen == 34, s"decodeFlac: STREAMINFO length $blen (need 34)")
        val r = new BitReader(bytes, pos + 4)
        r.readBits(16); r.readBits(16)      // min/max block size
        r.readBits(24); r.readBits(24)      // min/max frame size
        sampleRate = r.readBits(20).toInt
        channels = r.readBits(3).toInt + 1
        bps = r.readBits(5).toInt + 1
        totalSamples = r.readBits(36)
        md5Stored = java.util.Arrays.copyOfRange(bytes, pos + 22, pos + 38)
        sawStreamInfo = true
      } // else: skip (PADDING, VORBIS_COMMENT, ...)
      pos += 4 + blen
    }
    require(sawStreamInfo, "decodeFlac: missing STREAMINFO")
    require(sampleRate > 0, "decodeFlac: zero sample rate")
    require(bps == 16, s"decodeFlac: $bps bits/sample unsupported (need 16)")
    require(totalSamples > 0 && totalSamples <= Int.MaxValue / channels,
      s"decodeFlac: total samples $totalSamples unsupported")

    val out = new Array[Int](totalSamples.toInt * channels)
    var decoded = 0L
    while (decoded < totalSamples) {
      val frameStart = pos
      val r = new BitReader(bytes, pos)
      require(r.readBits(14) == 0x3ffe, s"decodeFlac: lost frame sync at byte $pos")
      require(r.readBit() == 0, "decodeFlac: reserved bit set")
      val variableBlocking = r.readBit() == 1
      val bsCode = r.readBits(4).toInt
      val srCode = r.readBits(4).toInt
      val chanAssign = r.readBits(4).toInt
      val ssCode = r.readBits(3).toInt
      require(r.readBit() == 0, "decodeFlac: reserved bit set")
      val startSample = readUtf8Number(r)
      val bs = bsCode match {
        case 0 => throw new IllegalArgumentException("decodeFlac: reserved block size 0")
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => r.readBits(8).toInt + 1
        case 7 => r.readBits(16).toInt + 1
        case c => 256 << (c - 8)
      }
      srCode match {
        case 0 => // from STREAMINFO
        case 12 => r.readBits(8)
        case 13 | 14 => r.readBits(16)
        case 15 => throw new IllegalArgumentException("decodeFlac: invalid sample-rate code")
        case _ => // table code; STREAMINFO governs
      }
      val frameBps = ssCode match {
        case 0 => bps
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case 7 => 32
        case c => throw new IllegalArgumentException(s"decodeFlac: reserved sample size $c")
      }
      require(frameBps == bps, s"decodeFlac: frame bps $frameBps != stream $bps")
      require(r.aligned, "decodeFlac: header not byte-aligned before CRC-8")
      val crcByte = r.readBits(8).toInt
      require(crc8(bytes, frameStart, r.bytePos - 1) == crcByte,
        s"decodeFlac: frame header CRC-8 mismatch at byte $frameStart")

      val nch = chanAssign match {
        case a if a <= 7 => a + 1
        case 8 | 9 | 10 => 2
        case a => throw new IllegalArgumentException(s"decodeFlac: reserved channel assignment $a")
      }
      require(nch == channels, s"decodeFlac: frame channels $nch != stream $channels")
      val chanData = new Array[Array[Int]](nch)
      var ci = 0
      while (ci < nch) {
        val sbps = chanAssign match {
          case 8 if ci == 1 => bps + 1  // left/side
          case 9 if ci == 0 => bps + 1  // right/side (side first)
          case 10 if ci == 1 => bps + 1 // mid/side
          case _ => bps
        }
        chanData(ci) = readSubframe(r, bs, sbps, onSubframe)
        ci += 1
      }
      r.alignToByte()
      val crc16Stored = r.readBits(16).toInt
      require(crc16(bytes, frameStart, r.bytePos - 2) == crc16Stored,
        s"decodeFlac: frame CRC-16 mismatch at byte $frameStart")
      pos = r.bytePos

      // undo stereo decorrelation
      val lr: Array[Array[Int]] = chanAssign match {
        case 8 => // left/side: right = left - side
          val l = chanData(0); val s = chanData(1)
          Array(l, Array.tabulate(bs)(i => l(i) - s(i)))
        case 9 => // right/side: left = right + side... side is channel 0
          val s = chanData(0); val rr = chanData(1)
          Array(Array.tabulate(bs)(i => rr(i) + s(i)), rr)
        case 10 => // mid/side
          val m = chanData(0); val s = chanData(1)
          val l = new Array[Int](bs); val rr = new Array[Int](bs)
          var i = 0
          while (i < bs) {
            var mid = m(i) << 1
            mid |= s(i) & 1
            l(i) = (mid + s(i)) >> 1
            rr(i) = (mid - s(i)) >> 1
            i += 1
          }
          Array(l, rr)
        case _ => chanData
      }

      val frameIdx = if (variableBlocking) startSample
                     else startSample * bs // fixed: frame number × block size
      // (for fixed blocking the spec's frame number × nominal block size
      //  equals `decoded` on a conformant stream; trust our running count
      //  but sanity-check ordering)
      require(decoded + bs <= totalSamples,
        s"decodeFlac: frame at byte $frameStart overruns total sample count")
      require(variableBlocking || frameIdx == 0 || frameIdx <= decoded + bs,
        "decodeFlac: frame numbering out of order")
      var i = 0
      while (i < bs) {
        ci = 0
        while (ci < nch) {
          out((decoded.toInt + i) * nch + ci) = lr(ci)(i)
          ci += 1
        }
        i += 1
      }
      decoded += bs
    }
    require(java.util.Arrays.equals(pcmMd5(out), md5Stored),
      "decodeFlac: decoded PCM fails the STREAMINFO MD5 check")
    DecodedFlac(sampleRate, channels, bps, totalSamples.toInt, out)
  }

  private def readSubframe(r: BitReader, bs: Int, bps: Int,
                           onSubframe: Int => Unit): Array[Int] = {
    require(r.readBit() == 0, "decodeFlac: subframe pad bit set")
    val t = r.readBits(6).toInt
    onSubframe(t)
    val wastedFlag = r.readBit()
    val wasted = if (wastedFlag == 1) r.readUnary() + 1 else 0
    val ebps = bps - wasted
    val x = t match {
      case 0 => // CONSTANT
        val v = r.readSigned(ebps)
        Array.fill(bs)(v)
      case 1 => // VERBATIM
        Array.fill(bs)(r.readSigned(ebps))
      case ft if ft >= 8 && ft <= 12 => // FIXED order 0-4
        val order = ft - 8
        val x = new Array[Int](bs)
        var i = 0
        while (i < order) { x(i) = r.readSigned(ebps); i += 1 }
        readResidual(r, order, bs) { (idx, res) =>
          x(idx) = (res + fixedPredict(x, idx, order)).toInt
        }
        x
      case lp if (lp & 0x20) != 0 => // LPC, order 1-32
        val order = (lp & 0x1f) + 1
        require(order <= bs, s"decodeFlac: LPC order $order exceeds block size $bs")
        val x = new Array[Int](bs)
        var i = 0
        while (i < order) { x(i) = r.readSigned(ebps); i += 1 }
        val precM1 = r.readBits(4).toInt
        require(precM1 != 15, "decodeFlac: invalid QLP precision code")
        val precision = precM1 + 1
        val shift = r.readSigned(5)
        require(shift >= 0, s"decodeFlac: negative QLP shift $shift unsupported (per spec)")
        val coefs = new Array[Int](order)
        i = 0
        while (i < order) { coefs(i) = r.readSigned(precision); i += 1 }
        readResidual(r, order, bs) { (idx, res) =>
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j).toLong * x(idx - 1 - j); j += 1 }
          x(idx) = (res + (acc >> shift)).toInt
        }
        x
      case other =>
        throw new IllegalArgumentException(s"decodeFlac: reserved subframe type $other")
    }
    if (wasted > 0) {
      var i = 0
      while (i < bs) { x(i) = x(i) << wasted; i += 1 }
    }
    x
  }

  /** Rice-coded residual: decodes each residual and hands `(index,
    * residual)` to `emit` (which applies the subframe's predictor —
    * fixed or LPC — and stores the sample). Handles both 4- and 5-bit
    * parameter variants, arbitrary partition orders, and the raw-bits
    * escape. */
  private def readResidual(r: BitReader, order: Int, bs: Int)
                          (emit: (Int, Long) => Unit): Unit = {
    val method = r.readBits(2).toInt
    require(method == 0 || method == 1, s"decodeFlac: reserved residual method $method")
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val partOrder = r.readBits(4).toInt
    val nparts = 1 << partOrder
    require(bs % nparts == 0, s"decodeFlac: block size $bs not divisible into $nparts partitions")
    var idx = order
    var p = 0
    while (p < nparts) {
      val count = (bs >> partOrder) - (if (p == 0) order else 0)
      require(count >= 0, "decodeFlac: partition smaller than predictor order")
      val param = r.readBits(paramBits).toInt
      var i = 0
      if (param == escape) {
        val rawBits = r.readBits(5).toInt
        while (i < count) {
          val res = if (rawBits == 0) 0 else r.readSigned(rawBits)
          emit(idx, res.toLong); idx += 1; i += 1
        }
      } else {
        while (i < count) {
          val q = r.readUnary()
          val rem = r.readBits(param)
          val z = (q.toLong << param) | rem
          val res = if ((z & 1) == 0) z >>> 1 else -((z + 1) >>> 1)
          emit(idx, res); idx += 1; i += 1
        }
      }
      p += 1
    }
    require(idx == bs, "decodeFlac: residual count mismatch")
  }

  private def fixedPredict(x: Array[Int], i: Int, order: Int): Long = order match {
    case 0 => 0L
    case 1 => x(i - 1).toLong
    case 2 => 2L * x(i - 1) - x(i - 2)
    case 3 => 3L * x(i - 1) - 3L * x(i - 2) + x(i - 3)
    case 4 => 4L * x(i - 1) - 6L * x(i - 2) + 4L * x(i - 3) - x(i - 4)
  }
}
