package graft.multimodal

import graft.SparkSpec

/** Real Y4M decode: round-trips through the actual YUV4MPEG2 container
  * — tokenized stream header (tags in any order, X extensions), FRAME
  * headers with per-frame parameters, 4:2:0/4:2:2/4:4:4 plane geometry
  * — and rejects malformed payloads loudly. */
class VideoCodecSpec extends SparkSpec {
  import spark.implicits._

  private def yp(f: Int, x: Int, y: Int): Int = (f * 17 + (y * 6 + x) * 3) % 256
  private def up(f: Int, cx: Int, cy: Int): Int = (f * 17 + (cy * 3 + cx) * 5 + 1) % 256
  private def vp(f: Int, cx: Int, cy: Int): Int = (f * 17 + (cy * 3 + cx) * 7 + 2) % 256

  test("encode/decode round-trip across all three chroma geometries") {
    for (cs <- Seq("C420jpeg", "C422", "C444")) {
      val v = VideoCodec.decodeY4m(
        VideoCodec.encodeY4m(6, 4, 25, 1, 5, yp, up, vp, cs))
      val h = v.header
      assert(h.width == 6 && h.height == 4 && h.fpsNum == 25 && h.fpsDen == 1)
      assert(h.colorspace == cs && v.frames.size == 5)
      val (cw, ch) = cs match {
        case "C420jpeg" => (3, 2)
        case "C422"     => (3, 4)
        case _          => (6, 4)
      }
      assert(h.chromaWidth == cw && h.chromaHeight == ch, cs)
      for (fr <- v.frames) {
        for (y <- 0 until 4; x <- 0 until 6)
          assert((fr.y(y * 6 + x) & 0xff) == yp(fr.index, x, y), s"$cs Y($x,$y)")
        for (cy <- 0 until ch; cx <- 0 until cw) {
          assert((fr.u(cy * cw + cx) & 0xff) == up(fr.index, cx, cy),
            s"$cs U($cx,$cy)")
          assert((fr.v(cy * cw + cx) & 0xff) == vp(fr.index, cx, cy),
            s"$cs V($cx,$cy)")
        }
      }
    }
  }

  test("frame headers with X parameters are tokenized, not assumed bare") {
    val bytes = VideoCodec.encodeY4m(4, 2, 30, 1, 7, yp, up, vp)
    val s = new String(bytes.take(200), java.nio.charset.StandardCharsets.US_ASCII)
    assert(s.contains("FRAME Xf=0"), "encoder must plant per-frame params")
    assert(VideoCodec.decodeY4m(bytes).frames.size == 7)
  }

  test("header tags parse in any order; F and C default when absent") {
    val body = VideoCodec.encodeY4m(4, 2, 30, 1, 1, yp, up, vp)
    val nl = body.indexOf('\n'.toByte)
    val rest = body.drop(nl + 1)
    val hdr = "YUV4MPEG2 H2 Xmeta=1 W4\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val v = VideoCodec.decodeY4m(hdr ++ rest)
    assert(v.header.width == 4 && v.header.height == 2)
    assert(v.header.fpsNum == 30 && v.header.fpsDen == 1)
    assert(v.header.colorspace == "C420jpeg")
    assert(v.frames.size == 1)
  }

  test("frameIterator is lazy: a truncated second frame fails only on pull") {
    val bytes = VideoCodec.encodeY4m(4, 2, 30, 1, 2, yp, up, vp)
    val truncated = bytes.take(bytes.length - 3)
    val (_, it) = VideoCodec.frameIterator(truncated)
    val first = it.next() // frame 0 intact
    assert((first.y(0) & 0xff) == yp(0, 0, 0))
    intercept[IllegalArgumentException](it.next())
  }

  test("malformed payloads are rejected loudly") {
    intercept[IllegalArgumentException](VideoCodec.decodeY4m(null))
    intercept[IllegalArgumentException](
      VideoCodec.decodeY4m("MPEG4 W4 H2\n".getBytes))
    intercept[IllegalArgumentException]( // odd width under 420
      VideoCodec.decodeY4m("YUV4MPEG2 W5 H2\nFRAME\n".getBytes))
    intercept[IllegalArgumentException]( // unsupported colorspace
      VideoCodec.decodeY4m("YUV4MPEG2 W4 H2 Cmono\nFRAME\n".getBytes))
    intercept[IllegalArgumentException]( // missing W
      VideoCodec.decodeY4m("YUV4MPEG2 H2\n".getBytes))
    intercept[IllegalArgumentException]( // garbage where FRAME expected
      VideoCodec.decodeY4m("YUV4MPEG2 W4 H2\nFRAMX\n".getBytes))
  }

  test("sampleVideoFrameStats: distributed 1:N decode matches closed-form") {
    val rows = (0L until 10L).map { id =>
      val w = (4 + 2 * (id % 4)).toInt
      val h = (2 + 2 * (id % 3)).toInt
      val nf = (3 + id % 5).toInt
      Multimodal.MediaRow(id, "video/y4m",
        VideoCodec.encodeY4m(w, h, 30, 1, nf,
          (f, x, y) => ((id * 11 + f * 17 + (y * w + x) * 3) % 256).toInt,
          (f, cx, cy) => ((id * 11 + f * 17 + (cy * (w / 2) + cx) * 5 + 1) % 256).toInt,
          (f, cx, cy) => ((id * 11 + f * 17 + (cy * (w / 2) + cx) * 7 + 2) % 256).toInt),
        w, h)
    }
    val got = Multimodal.sampleVideoFrameStats(rows.toDS().repartition(3), everyN = 2)
      .collect().map(s => (s.media_id, s.frame_idx) -> s).toMap
    var checked = 0
    for (id <- 0L until 10L) {
      val w = (4 + 2 * (id % 4)).toInt
      val h = (2 + 2 * (id % 3)).toInt
      val nf = (3 + id % 5).toInt
      for (f <- 0 until nf) {
        if (f % 2 == 0) {
          val s = got((id, f.toLong))
          def yv(i: Int) = (id * 11 + f * 17 + i * 3) % 256
          val n = w * h; val cn = (w / 2) * (h / 2)
          assert(s.width == w && s.height == h)
          assert(s.y_sum == (0 until n).map(yv).sum)
          assert(s.y_moment == (0 until n).map(i => yv(i) * i).sum)
          assert(s.uv_sum == (0 until cn).map(j =>
            (id * 11 + f * 17 + j * 5 + 1) % 256 +
              (id * 11 + f * 17 + j * 7 + 2) % 256).sum)
          checked += 1
        } else assert(!got.contains((id, f.toLong)), "odd frames must be dropped")
      }
    }
    assert(checked > 10)
  }
}
