package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** dHash perceptual-hash properties, tested through the real PNG
  * decode path via a local driver-side replica of the operator's
  * per-row math (the Spark operator itself is exercised by q109's
  * oracle gate). */
class DhashSpec extends AnyFunSuite {

  /** Driver-side replica of [[Multimodal.dhashPng]]'s per-row math. */
  private def dhash(png: Array[Byte]): Long = {
    val img = PngCodec.decodePng(png)
    val ch = img.channels
    val g = new Array[Int](9 * 8)
    for (y <- 0 until 8; x <- 0 until 9) {
      val sx = x * img.width / 9
      val sy = y * img.height / 8
      val base = ch * (sy * img.width + sx)
      g(y * 9 + x) = (299 * img.pixels(base) + 587 * img.pixels(base + 1) +
        114 * img.pixels(base + 2)) / 1000
    }
    var h = 0L
    for (k <- 0 until 63) {
      val yy = k / 8; val xx = k % 8
      if (g(yy * 9 + xx + 1) > g(yy * 9 + xx)) h |= 1L << k
    }
    h
  }

  private def contentPng(c: Int, scale: Int, filterSeed: Int): Array[Byte] =
    PngCodec.encodePng(9 * scale, 8 * scale, 3,
      (x, y, _) => (c * 7 + (x / scale) * 13 + (y / scale) * 29) % 256,
      rowFilter = y => (filterSeed + y) % 5)

  test("resize invariance: same content at 1x/2x/3x hashes identically") {
    for (c <- Seq(0, 7, 31)) {
      val hashes = (1 to 3).map(s => dhash(contentPng(c, s, filterSeed = s)))
      assert(hashes.distinct.size == 1, s"content $c: $hashes")
    }
  }

  test("encoding invariance: different PNG filters, same hash") {
    val a = dhash(contentPng(5, 2, filterSeed = 0))
    val b = dhash(contentPng(5, 2, filterSeed = 3))
    assert(a == b)
  }

  test("content sensitivity: different contents hash differently") {
    val hs = (0 until 40).map(c => dhash(contentPng(c, 1, 0)))
    // the gradient family is adversarially uniform; still expect many
    // distinct hashes across 40 contents
    assert(hs.distinct.size > 1, "all 40 contents collided")
  }

  test("a single-cell luminance flip changes the hash") {
    val base = contentPng(3, 1, 0)
    val tweaked = PngCodec.encodePng(9, 8, 3,
      (x, y, _) =>
        if (x == 4 && y == 4) 255 - ((3 * 7 + 4 * 13 + 4 * 29) % 256)
        else (3 * 7 + x * 13 + y * 29) % 256,
      rowFilter = _ => 0)
    assert(dhash(base) != dhash(tweaked))
  }

  /** Driver-side replica of [[Multimodal.fingerprintFlac]]'s per-row
    * math (64 windows over channel 0). */
  private def audioFp(flac: Array[Byte]): Long = {
    val a = FlacCodec.decodeFlac(flac)
    require(a.frames % 64 == 0)
    val per = a.frames / 64
    val e = Array.tabulate(64)(w =>
      (w * per until (w + 1) * per).map(f =>
        math.abs(a.samples(f * a.channels).toLong)).sum)
    var h = 0L
    for (k <- 0 until 63) if (e(k + 1) > e(k)) h |= 1L << k
    h
  }

  private def contentFlac(c: Int, gain: Int, sr: Int): Array[Byte] =
    FlacCodec.encodeFlac(sr, 1, 512,
      (f, _) => gain * (((c * 13 + f * 7) % 201) - 100),
      blockSize = 32, midSide = false)

  test("audio fingerprint: gain- and sample-rate-invariant, content-sensitive") {
    val base = audioFp(contentFlac(5, 1, 8000))
    assert(audioFp(contentFlac(5, 2, 12000)) == base)
    assert(audioFp(contentFlac(5, 3, 16000)) == base)
    val others = (0 until 30).map(c => audioFp(contentFlac(c, 1, 8000)))
    assert(others.distinct.size > 1, "all contents collided")
  }

  test("hash is non-negative (63-bit) for adversarial extremes") {
    val black = PngCodec.encodePng(9, 8, 3, (_, _, _) => 0, rowFilter = _ => 0)
    val noise = PngCodec.encodePng(27, 24, 3,
      (x, y, c) => (x * 31 + y * 17 + c * 97) % 256, rowFilter = y => y % 5)
    assert(dhash(black) == 0L)
    assert(dhash(noise) >= 0L)
  }
}
