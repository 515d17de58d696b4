package graft.multimodal

/** Pure-JVM BMP (Windows DIB, 24-bit uncompressed BI_RGB) encode +
  * decode — a REAL decoder for one image modality, replacing the FNV
  * pseudo-feature stub for `image/bmp` payloads (the container has no
  * native image libraries; BMP needs none). Handles the format's
  * actual quirks: little-endian headers, BGR channel order, 4-byte row
  * stride padding, bottom-up row order (and the negative-height
  * top-down variant), and `bfOffBits` gaps before the pixel array.
  *
  * Scale stance: encode/decode are row-local byte work inside
  * `mapPartitions` — no shuffle, no driver involvement; the 100 TB
  * shape is identical to the stub pipeline's (payload bytes in, fixed
  * schema out).
  */
object ImageCodec {

  /** Decoded raster: `rgb(3*(y*width+x) + c)` with c = 0/1/2 → R/G/B,
    * rows TOP-DOWN regardless of the file's on-disk row order. */
  final case class DecodedImage(width: Int, height: Int, rgb: Array[Int])

  private val FileHeaderSize = 14
  private val InfoHeaderSize = 40

  private def stride(width: Int): Int = ((width * 3 + 3) / 4) * 4

  private def putIntLe(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >>> 8) & 0xff).toByte
    b(off + 2) = ((v >>> 16) & 0xff).toByte
    b(off + 3) = ((v >>> 24) & 0xff).toByte
  }

  private def getIntLe(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def getShortLe(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Encode a 24-bit bottom-up BMP; `pixel(x, y, c)` returns channel
    * c (0/1/2 → R/G/B) of the TOP-DOWN raster, masked to 0..255. */
  def encodeBmp24(width: Int, height: Int,
                  pixel: (Int, Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, "encodeBmp24: positive dims")
    val rowBytes = stride(width)
    val dataSize = rowBytes * height
    val out = new Array[Byte](FileHeaderSize + InfoHeaderSize + dataSize)
    out(0) = 'B'; out(1) = 'M'
    putIntLe(out, 2, out.length)
    putIntLe(out, 10, FileHeaderSize + InfoHeaderSize) // bfOffBits
    putIntLe(out, 14, InfoHeaderSize)
    putIntLe(out, 18, width)
    putIntLe(out, 22, height) // positive → bottom-up
    out(26) = 1 // planes
    out(28) = 24 // bpp
    putIntLe(out, 30, 0) // BI_RGB
    putIntLe(out, 34, dataSize)
    var y = 0
    while (y < height) {
      // file row 0 is the BOTTOM raster row
      val base = FileHeaderSize + InfoHeaderSize + (height - 1 - y) * rowBytes
      var x = 0
      while (x < width) {
        out(base + x * 3) = (pixel(x, y, 2) & 0xff).toByte // B
        out(base + x * 3 + 1) = (pixel(x, y, 1) & 0xff).toByte // G
        out(base + x * 3 + 2) = (pixel(x, y, 0) & 0xff).toByte // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode a 24-bit uncompressed BMP to a top-down RGB raster.
    * Rejects malformed or unsupported payloads loudly (truncated
    * buffers, wrong magic, compressed or non-24-bpp variants) instead
    * of returning garbage features. */
  def decodeBmp24(bytes: Array[Byte]): DecodedImage = {
    require(bytes != null && bytes.length >= FileHeaderSize + InfoHeaderSize,
      s"decodeBmp24: ${if (bytes == null) "null" else s"${bytes.length}-byte"} " +
        "payload is shorter than the BMP headers")
    require(bytes(0) == 'B' && bytes(1) == 'M',
      "decodeBmp24: missing 'BM' magic")
    val offBits = getIntLe(bytes, 10)
    val infoSize = getIntLe(bytes, 14)
    require(infoSize >= InfoHeaderSize,
      s"decodeBmp24: unsupported $infoSize-byte info header (need >= 40)")
    val width = getIntLe(bytes, 18)
    val rawHeight = getIntLe(bytes, 22)
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    val planes = getShortLe(bytes, 26)
    val bpp = getShortLe(bytes, 28)
    val compression = getIntLe(bytes, 30)
    require(width > 0 && height > 0,
      s"decodeBmp24: bad dimensions ${width}x$rawHeight")
    require(planes == 1, s"decodeBmp24: planes=$planes (need 1)")
    require(bpp == 24, s"decodeBmp24: $bpp bpp unsupported (need 24)")
    require(compression == 0,
      s"decodeBmp24: compression=$compression unsupported (need BI_RGB)")
    val rowBytes = stride(width)
    require(offBits >= FileHeaderSize + InfoHeaderSize &&
      offBits.toLong + rowBytes.toLong * height <= bytes.length,
      s"decodeBmp24: pixel array [$offBits, $offBits + ${rowBytes.toLong * height}) " +
        s"out of bounds for ${bytes.length}-byte payload")
    val rgb = new Array[Int](3 * width * height)
    var y = 0
    while (y < height) {
      val fileRow = if (topDown) y else height - 1 - y
      val base = offBits + fileRow * rowBytes
      var x = 0
      while (x < width) {
        val o = 3 * (y * width + x)
        rgb(o) = bytes(base + x * 3 + 2) & 0xff // R
        rgb(o + 1) = bytes(base + x * 3 + 1) & 0xff // G
        rgb(o + 2) = bytes(base + x * 3) & 0xff // B
        x += 1
      }
      y += 1
    }
    DecodedImage(width, height, rgb)
  }
}
