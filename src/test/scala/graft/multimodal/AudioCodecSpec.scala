package graft.multimodal

import graft.SparkSpec

/** Real PCM16 WAV decode: round-trips through the actual RIFF
  * container — chunk walking past a JUNK chunk, LE samples, negative
  * values, mono/stereo interleaving — and rejects malformed payloads
  * loudly. */
class AudioCodecSpec extends SparkSpec {
  import spark.implicits._

  private def wave(f: Int, c: Int): Int = ((f * 7 + c * 5) % 4001) - 2000

  test("encode/decode round-trip, mono and stereo, negative samples") {
    for (nc <- 1 to 2) {
      val a = AudioCodec.decodePcm16(AudioCodec.encodePcm16(8000, nc, 40, wave))
      assert(a.sampleRate == 8000 && a.channels == nc && a.frames == 40)
      for (f <- 0 until 40; c <- 0 until nc)
        assert(a.samples(f * nc + c) == wave(f, c), s"sample ($f,$c) nc=$nc")
    }
  }

  test("extreme sample values survive the int16 round-trip") {
    val vals = Seq(-32768, 32767, -1, 0, 1)
    val a = AudioCodec.decodePcm16(
      AudioCodec.encodePcm16(44100, 1, vals.size, (f, _) => vals(f)))
    assert(a.samples.toSeq == vals)
  }

  test("decoder walks chunks (JUNK between fmt and data is skipped)") {
    // encodePcm16 always writes the JUNK chunk — a fixed-offset reader
    // would see 'JUNK' where it expects 'data'; reaching the samples at
    // all proves the walk. Assert the layout really contains it.
    val bytes = AudioCodec.encodePcm16(8000, 1, 3, (f, _) => f)
    val s = new String(bytes, java.nio.charset.StandardCharsets.US_ASCII)
    assert(s.contains("JUNK"))
    assert(AudioCodec.decodePcm16(bytes).samples.toSeq == Seq(0, 1, 2))
  }

  test("malformed payloads are rejected loudly") {
    val good = AudioCodec.encodePcm16(8000, 2, 10, wave)
    intercept[IllegalArgumentException](AudioCodec.decodePcm16(null))
    intercept[IllegalArgumentException](
      AudioCodec.decodePcm16("RIFFxxxx".getBytes))
    val badMagic = good.clone(); badMagic(8) = 'X'
    intercept[IllegalArgumentException](AudioCodec.decodePcm16(badMagic))
    intercept[IllegalArgumentException](
      AudioCodec.decodePcm16(good.take(good.length - 3)))
    val nonPcm = good.clone(); nonPcm(20) = 3 // IEEE float format tag
    intercept[IllegalArgumentException](AudioCodec.decodePcm16(nonPcm))
  }

  test("decodeAudioFeatures: distributed decode matches closed-form stats") {
    val rows = (0L until 12L).map { id =>
      val nf = (50 + id % 32).toInt
      val nc = (1 + id % 2).toInt
      val sr = (8000 + (id % 3) * 4000).toInt
      Multimodal.MediaRow(id, "audio/wav",
        AudioCodec.encodePcm16(sr, nc, nf,
          (f, c) => ((id * 13 + f * 7 + c * 5) % 4001).toInt - 2000), 0, 0)
    }
    val got = Multimodal.decodeAudioFeatures(rows.toDS().repartition(3))
      .collect().map(s => s.media_id -> s).toMap
    for (id <- 0L until 12L) {
      val nf = (50 + id % 32).toInt
      val nc = (1 + id % 2).toInt
      def v(f: Int, c: Int) = ((id * 13 + f * 7 + c * 5) % 4001) - 2000
      val s = got(id)
      assert(s.sample_rate == 8000 + (id % 3) * 4000)
      assert(s.channels == nc && s.frames == nf)
      assert(s.c0_sum == (0 until nf).map(v(_, 0)).sum)
      assert(s.abs_sum ==
        (for (f <- 0 until nf; c <- 0 until nc) yield math.abs(v(f, c))).sum)
      assert(s.c0_moment == (0 until nf).map(f => v(f, 0) * f).sum)
    }
  }
}
