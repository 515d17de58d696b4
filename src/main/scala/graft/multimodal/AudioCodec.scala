package graft.multimodal

/** Pure-JVM WAV (RIFF/WAVE, PCM signed 16-bit LE) encode + decode —
  * the REAL decoder for the audio modality, companion to
  * [[ImageCodec]]'s BMP path. Handles the container's actual quirks:
  * chunk walking (a compliant reader must SKIP unknown chunks like
  * `LIST`/`fact` rather than assume `data` follows `fmt ` directly),
  * little-endian headers and samples, mono/stereo interleaving, and
  * the odd-size chunk pad byte.
  *
  * Scale stance: row-local byte work inside `mapPartitions` — no
  * shuffle, no driver involvement.
  */
object AudioCodec {

  /** Decoded PCM audio: `samples(i * channels + c)` = frame i,
    * channel c, signed 16-bit range. */
  final case class DecodedAudio(sampleRate: Int, channels: Int,
                                frames: Int, samples: Array[Int])

  private def putIntLe(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >>> 8) & 0xff).toByte
    b(off + 2) = ((v >>> 16) & 0xff).toByte
    b(off + 3) = ((v >>> 24) & 0xff).toByte
  }

  private def putShortLe(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >>> 8) & 0xff).toByte
  }

  private def getIntLe(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def getShortLe(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Encode PCM16: `sample(frame, channel)` in [-32768, 32767]. A
    * 10-byte `JUNK` chunk is written between `fmt ` and `data` so any
    * decoder that hard-codes the data offset (instead of walking
    * chunks) fails loudly against our own fixtures. */
  def encodePcm16(sampleRate: Int, channels: Int, frames: Int,
                  sample: (Int, Int) => Int): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && frames >= 0,
      "encodePcm16: positive rate/channels, non-negative frames")
    val dataSize = frames * channels * 2
    val junkSize = 10
    val riffSize = 4 + (8 + 16) + (8 + junkSize) + (8 + dataSize)
    val out = new Array[Byte](8 + riffSize)
    var o = 0
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putIntLe(out, 4, riffSize)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    o = 12
    out(o) = 'f'; out(o + 1) = 'm'; out(o + 2) = 't'; out(o + 3) = ' '
    putIntLe(out, o + 4, 16)
    putShortLe(out, o + 8, 1) // PCM
    putShortLe(out, o + 10, channels)
    putIntLe(out, o + 12, sampleRate)
    putIntLe(out, o + 16, sampleRate * channels * 2) // byte rate
    putShortLe(out, o + 20, channels * 2) // block align
    putShortLe(out, o + 22, 16) // bits per sample
    o += 24
    out(o) = 'J'; out(o + 1) = 'U'; out(o + 2) = 'N'; out(o + 3) = 'K'
    putIntLe(out, o + 4, junkSize)
    o += 8 + junkSize // zero-filled junk payload
    out(o) = 'd'; out(o + 1) = 'a'; out(o + 2) = 't'; out(o + 3) = 'a'
    putIntLe(out, o + 4, dataSize)
    o += 8
    var f = 0
    while (f < frames) {
      var c = 0
      while (c < channels) {
        putShortLe(out, o, sample(f, c) & 0xffff)
        o += 2
        c += 1
      }
      f += 1
    }
    out
  }

  /** Decode a PCM16 WAV by walking RIFF chunks (skipping unknown ones,
    * honoring the odd-size pad byte). Rejects malformed or unsupported
    * payloads loudly. */
  def decodePcm16(bytes: Array[Byte]): DecodedAudio = {
    require(bytes != null && bytes.length >= 12,
      s"decodePcm16: ${if (bytes == null) "null" else s"${bytes.length}-byte"} " +
        "payload is shorter than the RIFF header")
    require(tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE",
      "decodePcm16: missing RIFF/WAVE magic")
    var sampleRate = -1
    var channels = -1
    var dataOff = -1
    var dataLen = -1
    var o = 12
    while (o + 8 <= bytes.length && (sampleRate < 0 || dataOff < 0)) {
      val id = tag(bytes, o)
      val size = getIntLe(bytes, o + 4)
      require(size >= 0 && o + 8 + size <= bytes.length,
        s"decodePcm16: chunk '$id' size $size overruns ${bytes.length}-byte payload")
      if (id == "fmt ") {
        require(size >= 16, s"decodePcm16: fmt chunk too small ($size)")
        val fmt = getShortLe(bytes, o + 8)
        require(fmt == 1, s"decodePcm16: audio format $fmt unsupported (need PCM=1)")
        channels = getShortLe(bytes, o + 10)
        sampleRate = getIntLe(bytes, o + 12)
        val bps = getShortLe(bytes, o + 22)
        require(bps == 16, s"decodePcm16: $bps bits/sample unsupported (need 16)")
        require(channels > 0, "decodePcm16: zero channels")
      } else if (id == "data") {
        dataOff = o + 8
        dataLen = size
      }
      o += 8 + size + (size & 1) // odd chunk sizes carry a pad byte
    }
    require(sampleRate > 0, "decodePcm16: no fmt chunk")
    require(dataOff >= 0, "decodePcm16: no data chunk")
    require(dataLen % (channels * 2) == 0,
      s"decodePcm16: data size $dataLen not a multiple of the $channels-channel frame")
    val n = dataLen / 2
    val samples = new Array[Int](n)
    var i = 0
    while (i < n) {
      samples(i) = getShortLe(bytes, dataOff + i * 2).toShort.toInt
      i += 1
    }
    DecodedAudio(sampleRate, channels, n / channels, samples)
  }
}
