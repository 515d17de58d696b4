package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** GIF89a: LZW round-trips (incl. dictionary growth, the K-omega-K
  * corner, and 4096-entry resets), interlacing, local color tables,
  * animation framing, cross-check against the JDK's independent GIF
  * reader, loud rejection of damage. */
class GifCodecSpec extends AnyFunSuite {

  private def pal(n: Int): Array[Int] =
    Array.tabulate(n)(j =>
      (((j * 3 + 1) % 256) << 16) | (((j * 5 + 2) % 256) << 8) |
        ((j * 7 + 3) % 256))

  test("LZW round-trip: structured, random, and constant streams") {
    val rnd = new Random(7)
    val cases = Seq(
      Array.tabulate[Byte](1000)(i => (i % 7).toByte),
      Array.fill[Byte](5000)(3),
      Array.tabulate[Byte](40000)(_ => (rnd.nextInt(64)).toByte), // forces width growth + reset
      Array[Byte](0),
      Array.tabulate[Byte](200)(i => ((i * i) % 4).toByte)
    )
    for ((data, k) <- cases.zipWithIndex) {
      val min = math.max(2, {
        var b = 1; while ((1 << b) <= data.map(_ & 0xff).max) b += 1; b
      })
      val packed = GifCodec.lzwCompress(data, min)
      val back = GifCodec.lzwDecompress(packed, min, data.length)
      assert(java.util.Arrays.equals(back, data), s"case $k (min=$min)")
    }
  }

  test("LZW compresses: repetitive stream shrinks well below raw size") {
    val data = Array.tabulate[Byte](10000)(i => ((i / 100) % 8).toByte)
    val packed = GifCodec.lzwCompress(data, 3)
    assert(packed.length < data.length / 4,
      s"only ${data.length}→${packed.length}")
  }

  test("single-frame round-trip: palette-resolved RGB is exact") {
    val w = 13; val h = 9
    val p = pal(64)
    val indices = Array.tabulate[Byte](w * h)(i => (i % 64).toByte)
    val gif = GifCodec.encodeGif(w, h, p, Vector(GifCodec.FrameSpec(indices)))
    val (hdr, rgb) = GifCodec.decodeGif(gif)
    assert(hdr.width == w && hdr.height == h && hdr.gctBits == 6)
    for (i <- 0 until w * h) {
      val c = p(i % 64)
      assert((rgb(3 * i) & 0xff) == ((c >>> 16) & 0xff), s"R at $i")
      assert((rgb(3 * i + 1) & 0xff) == ((c >>> 8) & 0xff), s"G at $i")
      assert((rgb(3 * i + 2) & 0xff) == (c & 0xff), s"B at $i")
    }
  }

  test("interlaced frame decodes to the same raster as progressive") {
    val w = 11; val h = 17 // odd dims hit all four passes unevenly
    val p = pal(32)
    val indices = Array.tabulate[Byte](w * h)(i => ((i * 7 + 3) % 32).toByte)
    val prog = GifCodec.encodeGif(w, h, p, Vector(GifCodec.FrameSpec(indices)))
    val inter = GifCodec.encodeGif(w, h, p,
      Vector(GifCodec.FrameSpec(indices, interlaced = true)))
    assert(!java.util.Arrays.equals(prog, inter)) // bytes differ...
    val (_, a) = GifCodec.decodeGif(prog)
    val (_, b) = GifCodec.decodeGif(inter)
    assert(java.util.Arrays.equals(a, b)) // ...rasters identical
  }

  test("animated: lazy iterator, local color tables override global") {
    val w = 8; val h = 6
    val base = pal(16)
    val frames = Vector.tabulate(4) { f =>
      GifCodec.FrameSpec(
        Array.tabulate[Byte](w * h)(i => ((i + f) % 16).toByte),
        localPalette = if (f == 0) None
                       else Some(Array.tabulate(16)(j => base((j + f) % 16))),
        interlaced = f % 2 == 1)
    }
    val gif = GifCodec.encodeGif(w, h, base, frames)
    val (hdr, it) = GifCodec.frameIterator(gif)
    assert(hdr.width == w && hdr.height == h)
    val out = it.toVector
    assert(out.map(_.index) == Vector(0, 1, 2, 3))
    for (fr <- out; i <- 0 until w * h) {
      // resolved color = base[((i+f) + f) % 16] for f>0; base[i%16] for f=0
      val j = (((i + fr.index) % 16) + (if (fr.index == 0) 0 else fr.index)) % 16
      val c = base(j)
      assert((fr.rgb(3 * i) & 0xff) == ((c >>> 16) & 0xff),
        s"frame ${fr.index} px $i")
    }
  }

  test("cross-check: the JDK's independent GIF reader agrees with ours") {
    val w = 21; val h = 13
    val p = pal(64)
    val indices = Array.tabulate[Byte](w * h)(i => ((i * 11 + 5) % 64).toByte)
    for (interlaced <- Seq(false, true)) {
      val gif = GifCodec.encodeGif(w, h, p,
        Vector(GifCodec.FrameSpec(indices, interlaced = interlaced)))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gif))
      assert(img != null, s"JDK reader rejected our GIF (interlaced=$interlaced)")
      assert(img.getWidth == w && img.getHeight == h)
      val (_, rgb) = GifCodec.decodeGif(gif)
      for (y <- 0 until h; x <- 0 until w) {
        val jdk = img.getRGB(x, y)
        val i = y * w + x
        assert(((jdk >>> 16) & 0xff) == (rgb(3 * i) & 0xff) &&
          ((jdk >>> 8) & 0xff) == (rgb(3 * i + 1) & 0xff) &&
          (jdk & 0xff) == (rgb(3 * i + 2) & 0xff),
          s"JDK disagrees at ($x,$y) interlaced=$interlaced")
      }
    }
  }

  test("JDK-encoded GIF decodes through our reader") {
    val w = 10; val h = 7
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 37) % 256 << 16) | ((y * 53) % 256 << 8) | 128)
    val bos = new java.io.ByteArrayOutputStream
    assert(javax.imageio.ImageIO.write(img, "gif", bos))
    val (hdr, rgb) = GifCodec.decodeGif(bos.toByteArray)
    assert(hdr.width == w && hdr.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      val want = img.getRGB(x, y)
      val i = y * w + x
      assert(((want >>> 16) & 0xff) == (rgb(3 * i) & 0xff),
        s"our reader disagrees with JDK encoder at ($x,$y)")
    }
  }

  test("damage is rejected loudly") {
    intercept[IllegalArgumentException](GifCodec.decodeGif(null))
    intercept[IllegalArgumentException](GifCodec.decodeGif("NOTAGIF........".getBytes))
    val gif = GifCodec.encodeGif(8, 8, pal(8),
      Vector(GifCodec.FrameSpec(Array.tabulate[Byte](64)(i => (i % 8).toByte))))
    // truncation mid-image-data
    intercept[Exception](GifCodec.decodeGif(
      java.util.Arrays.copyOf(gif, gif.length - 10)))
    // corrupt LZW stream: garbage codes → loud dictionary error
    val bad = gif.clone()
    bad(gif.length - 8) = 0x5a
    bad(gif.length - 7) = 0x5a
    intercept[Exception](GifCodec.decodeGif(bad))
  }
}
