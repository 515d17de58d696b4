package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class ApngCodecSpec extends AnyFunSuite {
  import ApngCodec._

  private def px(canvas: Array[Int], w: Int, x: Int, y: Int): Seq[Int] = {
    val b = (y * w + x) * 4
    Seq(canvas(b), canvas(b + 1), canvas(b + 2), canvas(b + 3))
  }

  private def solid(r: Int, g: Int, b: Int, a: Int) =
    (x: Int, y: Int, c: Int) => c match {
      case 0 => r; case 1 => g; case 2 => b; case _ => a
    }

  test("single full-canvas frame round-trips like a plain PNG") {
    val f = (x: Int, y: Int, c: Int) => (x * 7 + y * 13 + c * 29) % 256
    val apng = encodeApng(5, 4,
      Seq(FrameSpec(5, 4, 0, 0, DisposeNone, BlendSource, f)),
      rowFilter = y => y % 5)
    val d = decodeApng(apng)
    assert(d.width == 5 && d.height == 4 && d.frames.length == 1)
    for (y <- 0 until 4; x <- 0 until 5; c <- 0 until 4)
      assert(d.frames.head.pixels((y * 5 + x) * 4 + c) == f(x, y, c))
  }

  test("SOURCE blend replaces only the frame rect") {
    val apng = encodeApng(4, 3, Seq(
      FrameSpec(4, 3, 0, 0, DisposeNone, BlendSource, solid(10, 20, 30, 255)),
      FrameSpec(2, 1, 1, 1, DisposeNone, BlendSource, solid(200, 0, 0, 255))))
    val fr = decodeApng(apng).frames
    assert(px(fr(1).pixels, 4, 1, 1) == Seq(200, 0, 0, 255)) // inside rect
    assert(px(fr(1).pixels, 4, 0, 0) == Seq(10, 20, 30, 255)) // outside
    assert(px(fr(1).pixels, 4, 3, 2) == Seq(10, 20, 30, 255))
  }

  test("OVER blend: a=255 takes src, a=0 keeps dst, fractional is exact-rational") {
    val mask = (x: Int, y: Int, c: Int) =>
      if (c == 3) (if (x == 0) 255 else if (x == 1) 0 else 128)
      else Seq(100, 50, 200)(c)
    val apng = encodeApng(3, 1, Seq(
      FrameSpec(3, 1, 0, 0, DisposeNone, BlendSource, solid(20, 30, 40, 255)),
      FrameSpec(3, 1, 0, 0, DisposeNone, BlendOver, mask)))
    val f1 = decodeApng(apng).frames(1).pixels
    assert(px(f1, 3, 0, 0) == Seq(100, 50, 200, 255)) // src a=255
    assert(px(f1, 3, 1, 0) == Seq(20, 30, 40, 255))   // src a=0
    // a=128 over opaque dst: out = round((s*128 + d*127)/255)
    // r=(100*128+20*127)/255=60.16->60  g=(50*128+30*127)/255=40.04->40
    // b=(200*128+40*127)/255=120.3->120
    assert(px(f1, 3, 2, 0) == Seq(60, 40, 120, 255))
  }

  test("dispose BACKGROUND clears the rect before the next frame") {
    val apng = encodeApng(4, 3, Seq(
      FrameSpec(4, 3, 0, 0, DisposeNone, BlendSource, solid(9, 9, 9, 255)),
      FrameSpec(2, 2, 0, 0, DisposeBackground, BlendSource,
        solid(200, 0, 0, 255)),
      FrameSpec(1, 1, 3, 2, DisposeNone, BlendSource, solid(0, 200, 0, 255))))
    val fr = decodeApng(apng).frames
    assert(px(fr(1).pixels, 4, 0, 0) == Seq(200, 0, 0, 255))
    // frame 2: the 2x2 rect was disposed to transparent black
    assert(px(fr(2).pixels, 4, 0, 0) == Seq(0, 0, 0, 0))
    assert(px(fr(2).pixels, 4, 3, 2) == Seq(0, 200, 0, 255))
    assert(px(fr(2).pixels, 4, 2, 0) == Seq(9, 9, 9, 255)) // untouched
  }

  test("dispose PREVIOUS reverts the canvas for the next frame") {
    val apng = encodeApng(4, 3, Seq(
      FrameSpec(4, 3, 0, 0, DisposeNone, BlendSource, solid(9, 9, 9, 255)),
      FrameSpec(2, 2, 1, 0, DisposePrevious, BlendSource,
        solid(200, 0, 0, 255)),
      FrameSpec(1, 1, 0, 0, DisposeNone, BlendSource, solid(0, 200, 0, 255))))
    val fr = decodeApng(apng).frames
    assert(px(fr(1).pixels, 4, 1, 0) == Seq(200, 0, 0, 255))
    // frame 2: the red rect reverted to frame-0 state
    assert(px(fr(2).pixels, 4, 1, 0) == Seq(9, 9, 9, 255))
    assert(px(fr(2).pixels, 4, 0, 0) == Seq(0, 200, 0, 255))
  }

  test("sequence-number corruption is rejected") {
    val apng = encodeApng(4, 3, Seq(
      FrameSpec(4, 3, 0, 0, DisposeNone, BlendSource, solid(9, 9, 9, 255)),
      FrameSpec(2, 2, 1, 0, DisposeNone, BlendSource, solid(1, 2, 3, 255))))
    // find the second fcTL and bump its sequence number, refreshing CRC
    def find(t: String, from: Int): Int = {
      var p = PngCodec.Signature.length
      var hits = 0
      while (p + 8 <= apng.length) {
        val len = PngCodec.getIntBe(apng, p)
        if (new String(apng, p + 4, 4, "US-ASCII") == t) {
          if (hits == from) return p
          hits += 1
        }
        p += 12 + len
      }
      -1
    }
    val p = find("fcTL", 1)
    assert(p >= 0)
    val bad = apng.clone()
    PngCodec.putIntBe(bad, p + 8, 99) // wrong sequence
    val len = PngCodec.getIntBe(bad, p)
    val crc = new java.util.zip.CRC32
    crc.update(bad, p + 4, 4 + len)
    PngCodec.putIntBe(bad, p + 8 + len, crc.getValue.toInt)
    val e = intercept[IllegalArgumentException](decodeApng(bad))
    assert(e.getMessage.contains("sequence"))
  }

  test("frame rect outside the canvas is rejected at encode and decode") {
    intercept[IllegalArgumentException](encodeApng(4, 3, Seq(
      FrameSpec(4, 3, 0, 0, DisposeNone, BlendSource, solid(1, 1, 1, 255)),
      FrameSpec(3, 2, 2, 2, DisposeNone, BlendSource, solid(1, 1, 1, 255)))))
  }
}
