package graft.multimodal

import java.util.zip.CRC32

/** APNG (Animated PNG — PNG Third Edition / W3C TR png-3 §"APNG:
  * frame-based animation") encode + decode with REAL inter-frame
  * composition: frames are sub-rectangles of the canvas carrying
  * dispose ops (NONE / BACKGROUND / PREVIOUS) and blend ops (SOURCE /
  * OVER), so decoding frame N requires the composed state of frames
  * 0..N-1 — the temporal dependency that separates an animation codec
  * from "many stills in one file" (GifCodec's frames are also
  * composed, but GIF's model has no alpha blending; this is the
  * alpha-compositing variant from the published PNG spec).
  *
  * Built on [[PngCodec]]'s machinery: identical chunk framing + CRC32
  * verification, identical per-row scanline filtering (fdAT frame
  * rasters filter exactly like IDAT, just frame-sized rows), deflate
  * via `java.util.zip`. APNG specifics implemented here: acTL / fcTL /
  * fdAT chunk layout, sequence-number continuity (VERIFIED — a
  * reordered or missing chunk fails the decode), frame-0 special
  * rules (blend forced to SOURCE; dispose PREVIOUS demoted to
  * BACKGROUND), region bounds checks, and the compositor itself.
  *
  * OVER compositing follows the spec's straight-alpha Porter-Duff
  * equations; the spec states them over reals, so this implementation
  * fixes the rounding: exact rational arithmetic with round-half-up
  * division (documented because oracle-backed pipelines need a defined
  * answer; payloads with alpha ∈ {0, 255} never reach the division and
  * are bit-exact by construction).
  *
  * Scale stance: row-local byte work inside `mapPartitions` — frames
  * of one animation compose inside the task holding the row; no
  * shuffle, no driver.
  */
object ApngCodec extends Serializable {

  val DisposeNone = 0
  val DisposeBackground = 1
  val DisposePrevious = 2
  val BlendSource = 0
  val BlendOver = 1

  /** One frame to encode: a `width`x`height` rect at (`xOff`,`yOff`)
    * on the canvas; `pixel(x, y, c)` is FRAME-local (c in 0..3, RGBA).
    * Frame 0 must cover the full canvas at (0,0) per spec. */
  final case class FrameSpec(width: Int, height: Int, xOff: Int, yOff: Int,
                             disposeOp: Int, blendOp: Int,
                             pixel: (Int, Int, Int) => Int)

  /** A fully COMPOSED canvas raster as displayed at frame `idx`
    * (RGBA, top-down, same layout as [[PngCodec.DecodedPng]]). */
  final case class ComposedFrame(idx: Int, pixels: Array[Int])

  final case class DecodedApng(width: Int, height: Int, numPlays: Int,
                               frames: Seq[ComposedFrame])

  private val FdatChunk = 32 // small chunks: decoder must reassemble

  /** Encode an APNG: RGBA canvas, frame 0 as IDAT (also the default
    * image), frames 1..n-1 as fcTL+fdAT sub-rectangles. `rowFilter`
    * cycles scanline predictors exactly like [[PngCodec.encodePng]]. */
  def encodeApng(canvasW: Int, canvasH: Int, frames: Seq[FrameSpec],
                 rowFilter: Int => Int = _ => 0,
                 numPlays: Int = 0): Array[Byte] = {
    require(canvasW > 0 && canvasH > 0, "encodeApng: positive canvas dims")
    require(frames.nonEmpty, "encodeApng: need at least one frame")
    val f0 = frames.head
    require(f0.width == canvasW && f0.height == canvasH &&
      f0.xOff == 0 && f0.yOff == 0,
      "encodeApng: frame 0 must cover the full canvas at (0,0)")
    frames.foreach { f =>
      require(f.width > 0 && f.height > 0 &&
        f.xOff >= 0 && f.yOff >= 0 &&
        f.xOff + f.width <= canvasW && f.yOff + f.height <= canvasH,
        s"encodeApng: frame rect ${f.width}x${f.height}+${f.xOff}+${f.yOff}" +
          s" outside ${canvasW}x$canvasH canvas")
      require(f.disposeOp >= 0 && f.disposeOp <= 2 &&
        f.blendOp >= 0 && f.blendOp <= 1, "encodeApng: bad dispose/blend op")
    }
    val out = new java.io.ByteArrayOutputStream(1024)
    out.write(PngCodec.Signature)
    val ihdr = new Array[Byte](13)
    PngCodec.putIntBe(ihdr, 0, canvasW)
    PngCodec.putIntBe(ihdr, 4, canvasH)
    ihdr(8) = 8   // bit depth
    ihdr(9) = 6   // color type RGBA
    PngCodec.writeChunk(out, "IHDR", ihdr)
    val actl = new Array[Byte](8)
    PngCodec.putIntBe(actl, 0, frames.length)
    PngCodec.putIntBe(actl, 4, numPlays)
    PngCodec.writeChunk(out, "acTL", actl)

    var seq = 0
    def writeFctl(f: FrameSpec): Unit = {
      val b = new Array[Byte](26)
      PngCodec.putIntBe(b, 0, seq); seq += 1
      PngCodec.putIntBe(b, 4, f.width)
      PngCodec.putIntBe(b, 8, f.height)
      PngCodec.putIntBe(b, 12, f.xOff)
      PngCodec.putIntBe(b, 16, f.yOff)
      b(20) = 0; b(21) = 1  // delay_num = 1
      b(22) = 0; b(23) = 10 // delay_den = 10
      b(24) = f.disposeOp.toByte
      b(25) = f.blendOp.toByte
      PngCodec.writeChunk(out, "fcTL", b)
    }

    // frame 0: fcTL + IDAT (the default image IS the first frame)
    writeFctl(f0)
    val z0 = PngCodec.deflateBytes(
      PngCodec.filterRaster(canvasW, canvasH, 4, f0.pixel, rowFilter))
    var off = 0
    while (off < z0.length) {
      val n = math.min(FdatChunk, z0.length - off)
      PngCodec.writeChunk(out, "IDAT",
        java.util.Arrays.copyOfRange(z0, off, off + n))
      off += n
    }
    // frames 1..n-1: fcTL + fdAT (4-byte sequence prefix per chunk)
    frames.drop(1).foreach { f =>
      writeFctl(f)
      val z = PngCodec.deflateBytes(
        PngCodec.filterRaster(f.width, f.height, 4, f.pixel, rowFilter))
      var o = 0
      while (o < z.length) {
        val n = math.min(FdatChunk, z.length - o)
        val d = new Array[Byte](4 + n)
        PngCodec.putIntBe(d, 0, seq); seq += 1
        System.arraycopy(z, o, d, 4, n)
        PngCodec.writeChunk(out, "fdAT", d)
        o += n
      }
    }
    PngCodec.writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Round-half-up p/q for non-negative p, positive q. */
  private def divRound(p: Long, q: Long): Int = ((2 * p + q) / (2 * q)).toInt

  /** Straight-alpha OVER per the spec's equations, exact rational with
    * round-half-up division. Fast paths (src a=255 / a=0) are exact. */
  private def over(canvas: Array[Int], base: Int, sr: Int, sg: Int,
                   sb: Int, sa: Int): Unit = {
    if (sa == 255) {
      canvas(base) = sr; canvas(base + 1) = sg
      canvas(base + 2) = sb; canvas(base + 3) = 255
    } else if (sa > 0) {
      val da = canvas(base + 3)
      // out_a = sa + da*(1-sa);   (alphas as fractions of 255)
      val oa255 = sa * 255L + da.toLong * (255 - sa) // out_a scaled by 255
      if (oa255 == 0) {
        canvas(base) = 0; canvas(base + 1) = 0
        canvas(base + 2) = 0; canvas(base + 3) = 0
      } else {
        // out_c = (src_c*sa + dst_c*da*(1-sa)) / out_a
        def c(i: Int, s: Int): Int =
          divRound(s * sa * 255L + canvas(base + i).toLong * da * (255 - sa),
            oa255)
        val r = c(0, sr); val g = c(1, sg); val b = c(2, sb)
        canvas(base) = r; canvas(base + 1) = g; canvas(base + 2) = b
        canvas(base + 3) = divRound(oa255, 255L)
      }
    } // sa == 0: destination unchanged
  }

  /** Decode an APNG into its COMPOSED per-frame canvas rasters,
    * verifying chunk CRCs, sequence-number continuity, and region
    * bounds; applies blend before capture and dispose after, per
    * spec order. */
  def decodeApng(bytes: Array[Byte]): DecodedApng = {
    require(bytes != null && bytes.length >= PngCodec.Signature.length + 12,
      "decodeApng: payload shorter than signature + one chunk")
    var i = 0
    while (i < PngCodec.Signature.length) {
      require(bytes(i) == PngCodec.Signature(i), "decodeApng: bad signature")
      i += 1
    }
    var pos = PngCodec.Signature.length
    var w = 0; var h = 0
    var numFrames = -1; var numPlays = 0
    final case class Ctl(width: Int, height: Int, x: Int, y: Int,
                         dispose: Int, blend: Int)
    val ctls = scala.collection.mutable.ArrayBuffer.empty[Ctl]
    val datas = scala.collection.mutable.ArrayBuffer
      .empty[java.io.ByteArrayOutputStream]
    var expectSeq = 0
    var sawIend = false
    while (!sawIend) {
      require(pos + 8 <= bytes.length, "decodeApng: truncated chunk header")
      val len = PngCodec.getIntBe(bytes, pos)
      require(len >= 0 && pos + 12 + len <= bytes.length,
        s"decodeApng: chunk length $len overruns payload")
      val chunkType = new String(bytes, pos + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new CRC32
      crc.update(bytes, pos + 4, 4 + len)
      require(crc.getValue.toInt == PngCodec.getIntBe(bytes, pos + 8 + len),
        s"decodeApng: CRC mismatch on $chunkType chunk")
      val d = pos + 8
      chunkType match {
        case "IHDR" =>
          w = PngCodec.getIntBe(bytes, d)
          h = PngCodec.getIntBe(bytes, d + 4)
          require((bytes(d + 8) & 0xff) == 8 && (bytes(d + 9) & 0xff) == 6,
            "decodeApng: need 8-bit RGBA")
          require((bytes(d + 12) & 0xff) == 0,
            "decodeApng: interlaced APNG unsupported")
        case "acTL" =>
          numFrames = PngCodec.getIntBe(bytes, d)
          numPlays = PngCodec.getIntBe(bytes, d + 4)
          require(numFrames > 0, "decodeApng: acTL with no frames")
        case "fcTL" =>
          require(len == 26, s"decodeApng: fcTL length $len (need 26)")
          require(PngCodec.getIntBe(bytes, d) == expectSeq,
            s"decodeApng: fcTL sequence ${PngCodec.getIntBe(bytes, d)}, " +
              s"expected $expectSeq")
          expectSeq += 1
          val c = Ctl(PngCodec.getIntBe(bytes, d + 4),
            PngCodec.getIntBe(bytes, d + 8),
            PngCodec.getIntBe(bytes, d + 12),
            PngCodec.getIntBe(bytes, d + 16),
            bytes(d + 24) & 0xff, bytes(d + 25) & 0xff)
          require(c.width > 0 && c.height > 0 && c.x >= 0 && c.y >= 0 &&
            c.x + c.width <= w && c.y + c.height <= h,
            s"decodeApng: frame rect outside ${w}x$h canvas")
          ctls += c
          datas += new java.io.ByteArrayOutputStream(256)
        case "IDAT" =>
          require(ctls.size == 1,
            "decodeApng: IDAT must follow the first fcTL")
          datas.head.write(bytes, d, len)
        case "fdAT" =>
          require(ctls.size >= 2, "decodeApng: fdAT before second fcTL")
          require(PngCodec.getIntBe(bytes, d) == expectSeq,
            s"decodeApng: fdAT sequence ${PngCodec.getIntBe(bytes, d)}, " +
              s"expected $expectSeq")
          expectSeq += 1
          datas.last.write(bytes, d + 4, len - 4)
        case "IEND" => sawIend = true
        case _ => // ancillary: skip
      }
      pos += 12 + len
    }
    require(numFrames == ctls.size,
      s"decodeApng: acTL declared $numFrames frames, found ${ctls.size}")

    // compose
    val canvas = new Array[Int](w * h * 4) // transparent black
    val outFrames = Seq.newBuilder[ComposedFrame]
    var fi = 0
    while (fi < ctls.size) {
      val c = ctls(fi)
      val rowBytes = c.width * 4
      val raw = PngCodec.inflateExact(datas(fi).toByteArray,
        (1 + rowBytes) * c.height, s"decodeApng frame $fi")
      val rect = PngCodec.unfilterRaster(raw, c.width, c.height, 4,
        s"decodeApng frame $fi")
      // frame-0 special rules per spec
      val blend = if (fi == 0) BlendSource else c.blend
      val dispose =
        if (fi == 0 && c.dispose == DisposePrevious) DisposeBackground
        else c.dispose
      val before =
        if (dispose == DisposePrevious) canvas.clone() else null
      var y = 0
      while (y < c.height) {
        var x = 0
        while (x < c.width) {
          val s = (y * c.width + x) * 4
          val base = ((c.y + y) * w + (c.x + x)) * 4
          if (blend == BlendSource) {
            canvas(base) = rect(s); canvas(base + 1) = rect(s + 1)
            canvas(base + 2) = rect(s + 2); canvas(base + 3) = rect(s + 3)
          } else {
            over(canvas, base, rect(s), rect(s + 1), rect(s + 2),
              rect(s + 3))
          }
          x += 1
        }
        y += 1
      }
      outFrames += ComposedFrame(fi, canvas.clone())
      dispose match {
        case DisposeNone =>
        case DisposeBackground =>
          var yy = 0
          while (yy < c.height) {
            var xx = 0
            while (xx < c.width) {
              val base = ((c.y + yy) * w + (c.x + xx)) * 4
              canvas(base) = 0; canvas(base + 1) = 0
              canvas(base + 2) = 0; canvas(base + 3) = 0
              xx += 1
            }
            yy += 1
          }
        case DisposePrevious =>
          System.arraycopy(before, 0, canvas, 0, canvas.length)
        case other =>
          throw new IllegalArgumentException(
            s"decodeApng: dispose op $other out of range")
      }
      fi += 1
    }
    DecodedApng(w, h, numPlays, outFrames.result())
  }
}
