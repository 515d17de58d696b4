package graft.multimodal

import graft.SparkSpec

/** Real FLAC encode + decode: Rice coding, fixed predictors, CRC-8/
  * CRC-16, STREAMINFO MD5, stereo decorrelation — FLAC is lossless, so
  * every round-trip must be BIT-exact. Plus loud rejection of damaged
  * streams. */
class FlacCodecSpec extends SparkSpec {

  // a waveform rich enough to exercise several predictor orders: a
  // ramp (order-2-friendly) + periodic detail + channel offsets
  private def wave(f: Int, c: Int): Int = {
    val v = f * 7 + (f % 13) * 40 - (f % 37) * 11 + c * 997
    ((v % 30000) + 30000) % 30000 - 15000
  }

  test("bit-exact round-trip: mono/stereo × block sizes incl. multi-frame") {
    for (ch <- Seq(1, 2); bsz <- Seq(16, 192, 256, 576, 100); frames <- Seq(50, 700)) {
      val bytes = FlacCodec.encodeFlac(44100, ch, frames, wave, blockSize = bsz)
      val d = FlacCodec.decodeFlac(bytes)
      assert(d.sampleRate == 44100 && d.channels == ch && d.frames == frames,
        s"header ch=$ch bsz=$bsz frames=$frames")
      for (f <- 0 until frames; c <- 0 until ch)
        assert(d.samples(f * ch + c) == wave(f, c),
          s"sample ($f,$c) ch=$ch bsz=$bsz frames=$frames")
    }
  }

  test("mid/side stereo decorrelation round-trips bit-exactly") {
    val frames = 333
    val bytes = FlacCodec.encodeFlac(8000, 2, frames, wave,
      blockSize = 64, midSide = true)
    val d = FlacCodec.decodeFlac(bytes)
    assert(d.channels == 2 && d.frames == frames)
    for (f <- 0 until frames; c <- 0 until 2)
      assert(d.samples(f * 2 + c) == wave(f, c), s"mid/side sample ($f,$c)")
  }

  test("constant and extreme-value signals round-trip (CONSTANT/VERBATIM paths)") {
    // flat signal → CONSTANT subframes
    val flat = FlacCodec.decodeFlac(
      FlacCodec.encodeFlac(8000, 1, 40, (_, _) => -1234, blockSize = 16))
    assert(flat.samples.forall(_ == -1234))
    // white-noise-ish full-range signal → rice cost near bps, VERBATIM competitive
    def noise(f: Int, c: Int): Int =
      (((f * 2654435761L + c) ^ (f << 7)) % 32768).toInt
    val n = FlacCodec.decodeFlac(
      FlacCodec.encodeFlac(8000, 1, 300, noise, blockSize = 64))
    for (f <- 0 until 300) assert(n.samples(f) == noise(f, 0), s"noise $f")
    // boundary samples survive
    val ext = FlacCodec.decodeFlac(FlacCodec.encodeFlac(8000, 1, 20,
      (f, _) => if (f % 2 == 0) -32768 else 32767, blockSize = 16))
    assert(ext.samples(0) == -32768 && ext.samples(1) == 32767)
  }

  test("compression is real: ramp signal encodes well below raw PCM size") {
    val frames = 4000
    val bytes = FlacCodec.encodeFlac(44100, 1, frames, (f, _) => f % 8192, blockSize = 1024)
    val rawPcm = frames * 2
    assert(bytes.length < rawPcm / 2,
      s"FLAC ${bytes.length}B should be < half of raw ${rawPcm}B for a ramp")
  }

  test("the stream really is framed FLAC: magic, metadata walk, sync codes") {
    val bytes = FlacCodec.encodeFlac(22050, 2, 500, wave, blockSize = 128)
    assert(new String(bytes, 0, 4, "US-ASCII") == "fLaC")
    // STREAMINFO (type 0, not last) then PADDING (type 1, last)
    assert((bytes(4) & 0xff) == 0x00)
    val siLen = ((bytes(5) & 0xff) << 16) | ((bytes(6) & 0xff) << 8) | (bytes(7) & 0xff)
    assert(siLen == 34)
    val padPos = 8 + 34
    assert((bytes(padPos) & 0xff) == 0x81, "PADDING block must be present and last")
    val padLen = ((bytes(padPos + 1) & 0xff) << 16) |
      ((bytes(padPos + 2) & 0xff) << 8) | (bytes(padPos + 3) & 0xff)
    val firstFrame = padPos + 4 + padLen
    // 14-bit sync 11111111111110 → bytes 0xFF 0xF8+
    assert((bytes(firstFrame) & 0xff) == 0xff &&
      (bytes(firstFrame + 1) & 0xfc) == 0xf8, "frame sync code")
    // 500 frames / 128 block = 4 frames → at least 4 sync patterns
  }

  test("corrupted payloads are rejected loudly") {
    val good = FlacCodec.encodeFlac(8000, 1, 100, wave, blockSize = 32)
    intercept[IllegalArgumentException](FlacCodec.decodeFlac(null))
    intercept[IllegalArgumentException](FlacCodec.decodeFlac("not flac at all, clearly not enough".getBytes))
    val badMagic = good.clone(); badMagic(0) = 'X'
    intercept[IllegalArgumentException](FlacCodec.decodeFlac(badMagic))
    // flip a bit inside the first frame's audio data → CRC-16 or MD5 must catch it
    val badBody = good.clone(); badBody(good.length - 10) = (badBody(good.length - 10) ^ 0x10).toByte
    intercept[Exception](FlacCodec.decodeFlac(badBody))
    // damage the stored MD5 → decode must fail the PCM check
    val badMd5 = good.clone(); badMd5(8 + 18) = (badMd5(8 + 18) ^ 0x01).toByte
    intercept[IllegalArgumentException](FlacCodec.decodeFlac(badMd5))
  }

  test("LPC subframes decode (hand-built stream — real-world FLAC is LPC-coded)") {
    // x[i] = res[i] + ((c0*x[i-1] + c1*x[i-2]) >> shift): order-2 LPC,
    // coefs (3, -2), shift 1, warmup (100, 110)
    val bs = 16
    val coefs = Array(3, -2)
    val shift = 1
    val res = Array(0, 0, 5, -3, 2, 0, -1, 4, -2, 1, 0, 3, -4, 2) // bs - order
    val x = new Array[Int](bs)
    x(0) = 100; x(1) = 110
    for (i <- 2 until bs)
      x(i) = res(i - 2) + ((coefs(0).toLong * x(i - 1) + coefs(1).toLong * x(i - 2)) >> shift).toInt

    val out = new java.io.ByteArrayOutputStream
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    val si = new FlacCodec.BitWriter
    si.writeBits(bs, 16); si.writeBits(bs, 16)
    si.writeBits(0, 24); si.writeBits(0, 24)
    si.writeBits(8000, 20); si.writeBits(0, 3); si.writeBits(15, 5)
    si.writeBits(bs, 36)
    out.write(0x80); out.write(0); out.write(0); out.write(34) // last, STREAMINFO
    out.write(si.toBytes); out.write(FlacCodec.pcmMd5(x))

    val w = new FlacCodec.BitWriter
    w.writeBits(0x3ffe, 14); w.writeBits(0, 1); w.writeBits(0, 1)
    w.writeBits(6, 4)  // block size: 8-bit tail
    w.writeBits(0, 4)  // sample rate from STREAMINFO
    w.writeBits(0, 4)  // 1 channel
    w.writeBits(4, 3)  // 16-bit
    w.writeBits(0, 1)
    FlacCodec.writeUtf8Number(w, 0L)
    w.writeBits(bs - 1, 8)
    val header = w.toBytes
    val body = new FlacCodec.BitWriter
    body.writeBits(0, 1)       // subframe pad
    body.writeBits(32 | (2 - 1), 6) // LPC order 2
    body.writeBits(0, 1)       // no wasted bits
    body.writeBits(x(0), 16); body.writeBits(x(1), 16) // warmup
    body.writeBits(4 - 1, 4)   // precision 4
    body.writeBits(shift, 5)
    body.writeBits(coefs(0), 4); body.writeBits(coefs(1), 4)
    body.writeBits(0, 2)       // rice, 4-bit params
    body.writeBits(0, 4)       // partition order 0
    body.writeBits(2, 4)       // rice parameter 2
    for (r <- res) {
      val z = if (r >= 0) r.toLong << 1 else (-r.toLong << 1) - 1
      body.writeUnary((z >>> 2).toInt)
      body.writeBits(z, 2)
    }
    body.alignToByte()
    val frame = header ++ Array(FlacCodec.crc8(header, 0, header.length).toByte) ++
      body.toBytes
    val c16 = FlacCodec.crc16(frame, 0, frame.length)
    out.write(frame); out.write((c16 >> 8) & 0xff); out.write(c16 & 0xff)

    val d = FlacCodec.decodeFlac(out.toByteArray)
    assert(d.frames == bs && d.channels == 1)
    assert(d.samples.toSeq == x.toSeq, "LPC reconstruction must be bit-exact")
  }

  test("encoder EMITS LPC subframes on a sinusoid and they round-trip bit-exactly") {
    // a HIGH-frequency sine: FIXED order k scales the amplitude by
    // (2·sin(ω/2))^k, which AMPLIFIES for ω > π/3 (at ω=2 the 4th
    // difference is ~8× the input), while LPC order 2 with coefficient
    // 2·cos(ω) predicts it almost perfectly — so the exact-bit-count
    // selection must pick LPC (a slow sine would legitimately go FIXED)
    val frames = 2048
    def sine(f: Int, c: Int): Int =
      (12000.0 * math.sin(2.0 * f + c)).toInt
    val bytes = FlacCodec.encodeFlac(16000, 1, frames, sine, blockSize = 256)
    val types = scala.collection.mutable.ArrayBuffer[Int]()
    val d = FlacCodec.decodeFlac(bytes, types += _)
    for (f <- 0 until frames)
      assert(d.samples(f) == sine(f, 0), s"LPC-coded sample $f")
    assert(types.exists(t => (t & 0x20) != 0),
      s"expected at least one LPC subframe, got types ${types.distinct.sorted}")
    // and LPC must beat what FIXED can do here: the int-truncated sine
    // leaves ~50-magnitude LPC residuals (~7.5 bits/sample ≈ 2.2 KB)
    // where FIXED-4's 8×-amplified residuals need 17 bits/sample —
    // i.e. FIXED would be FORCED to verbatim-sized output (≥ 4 KB)
    assert(bytes.length < frames * 2 * 2 / 3,
      s"sine FLAC ${bytes.length}B should be well under raw ${frames * 2}B")
  }

  test("LPC-emitting encode survives the full verification decode (CRCs + MD5), stereo mid/side too") {
    def sig(f: Int, c: Int): Int =
      (9000.0 * math.sin(1.9 * f) + 4000.0 * math.sin(2.6 * f + 1.3) + c * 500).toInt
    for ((ch, ms) <- Seq((1, false), (2, false), (2, true))) {
      val bytes = FlacCodec.encodeFlac(22050, ch, 1500, sig, blockSize = 192,
        midSide = ms)
      val types = scala.collection.mutable.ArrayBuffer[Int]()
      val d = FlacCodec.decodeFlac(bytes, types += _) // verifies CRC-8/16 + MD5
      for (f <- 0 until 1500; c <- 0 until ch)
        assert(d.samples(f * ch + c) == sig(f, c), s"ch=$ch ms=$ms sample ($f,$c)")
      assert(types.exists(t => (t & 0x20) != 0), s"ch=$ch ms=$ms emitted no LPC")
    }
  }

  test("seeded-random stress: 40 mixed waveforms round-trip bit-exactly with LPC in play") {
    val rnd = new scala.util.Random(1711)
    var sawLpc = false
    for (trial <- 0 until 40) {
      val ch = 1 + rnd.nextInt(2)
      val frames = 64 + rnd.nextInt(400)
      val bsz = Seq(16, 32, 64, 192)(rnd.nextInt(4))
      val ms = ch == 2 && rnd.nextBoolean()
      // mixed regime: two sinusoids at random frequencies + uniform
      // noise + occasional full-range clip — exercises LPC, FIXED and
      // VERBATIM selection across blocks of one stream
      val w1 = rnd.nextDouble() * 3.0
      val w2 = rnd.nextDouble() * 3.0
      val a1 = rnd.nextInt(12000)
      val a2 = rnd.nextInt(6000)
      val noise = rnd.nextInt(2000)
      val sig = Array.tabulate(frames, ch) { (f, c) =>
        val base = a1 * math.sin(w1 * f + c) + a2 * math.sin(w2 * f) +
          (new scala.util.Random(trial * 100003 + f * ch + c).nextInt(2 * noise + 1) - noise)
        val v = base.toInt
        if (f % 97 == 13) (if (v < 0) -32768 else 32767) else
          math.max(-32768, math.min(32767, v))
      }
      val bytes = FlacCodec.encodeFlac(8000 + rnd.nextInt(40000), ch, frames,
        (f, c) => sig(f)(c), blockSize = bsz, midSide = ms)
      val types = scala.collection.mutable.ArrayBuffer[Int]()
      val d = FlacCodec.decodeFlac(bytes, types += _) // CRCs + MD5 verified
      for (f <- 0 until frames; c <- 0 until ch)
        assert(d.samples(f * ch + c) == sig(f)(c),
          s"trial $trial ch=$ch bsz=$bsz ms=$ms sample ($f,$c)")
      sawLpc ||= types.exists(t => (t & 0x20) != 0)
    }
    assert(sawLpc, "40 mixed random waveforms should emit at least one LPC subframe")
  }

  test("truncated stream is rejected, not silently short") {
    val good = FlacCodec.encodeFlac(8000, 1, 200, wave, blockSize = 64)
    intercept[Exception](
      FlacCodec.decodeFlac(java.util.Arrays.copyOf(good, good.length - 20)))
  }
}
