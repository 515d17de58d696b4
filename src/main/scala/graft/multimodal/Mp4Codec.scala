package graft.multimodal

/** Pure-JVM MJPEG-in-MP4 (ISO Base Media File Format, ISO/IEC
  * 14496-12) encode + decode — the second compressed video CONTAINER
  * next to [[AviCodec]]'s RIFF form. Motion-JPEG keeps the sample
  * payloads honest ([[JpegCodec]] baseline streams) while the
  * container side exercises the real ISO BMFF machinery a 100 TB
  * video corpus is actually stored in (MP4/MOV): the box tree, and —
  * unlike AVI's flat chunk list — the full SAMPLE TABLE indirection
  * (`stsd`/`stts`/`stsc`/`stsz`/`stco`), where frame locations are
  * derived by joining chunk offsets × samples-per-chunk runs × sample
  * sizes.
  *
  * Implemented subset:
  *  - encode: `ftyp` + `mdat` (concatenated JPEG samples, grouped
  *    into multi-sample chunks) + `moov` with a single `vide` track:
  *    `mvhd`/`tkhd`/`mdhd`/`hdlr`/`vmhd`/`dinf(dref(url ))` and a
  *    complete `stbl` — a 'jpeg' VisualSampleEntry, one `stts` run,
  *    run-length-encoded `stsc`, explicit `stsz`, absolute `stco`;
  *  - decode: size/type box walking (64-bit `largesize` accepted,
  *    unknown boxes skipped as a compliant reader must), sample-table
  *    reconstruction (`stsc` run expansion × `stco` × `stsz` → exact
  *    per-sample byte ranges), header validation against per-frame
  *    JPEG dimensions, and a LAZY frame iterator so a `flatMap`
  *    fan-out streams frames without materializing a whole video;
  *  - remux: [[remuxAviToMp4]] demuxes an MJPEG-AVI's compressed
  *    samples ([[AviCodec.rawFrameIterator]]) and rewraps them
  *    byte-identically — a real curation operation (normalize a
  *    mixed-container corpus to MP4) that never touches the
  *    entropy-coded stream.
  *
  * Scale stance: row-local byte work inside `mapPartitions` /
  * `flatMap`; no shuffle, no driver involvement.
  */
object Mp4Codec {

  /** Parsed container header: dims from the sample entry, frame count
    * from `stsz`, track timescale/duration from `mdhd`. */
  final case class Mp4Header(width: Int, height: Int, frames: Int,
                             timescale: Int, duration: Long)

  /** One frame: its index and decoded JPEG raster. */
  final case class Mp4Frame(index: Int, image: JpegCodec.DecodedJpeg)

  private def putInt(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >>> 24) & 0xff); o.write((v >>> 16) & 0xff)
    o.write((v >>> 8) & 0xff); o.write(v & 0xff)
  }
  private def putShort(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >>> 8) & 0xff); o.write(v & 0xff)
  }
  private def fourcc(o: java.io.ByteArrayOutputStream, s: String): Unit =
    o.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))

  /** Wrap `body` in a box: [size][type][body]. */
  private def box(tpe: String, body: Array[Byte]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream(body.length + 8)
    putInt(o, body.length + 8); fourcc(o, tpe); o.write(body)
    o.toByteArray
  }
  private def box(tpe: String, bodies: Array[Byte]*): Array[Byte] =
    box(tpe, bodies.reduce(_ ++ _))

  /** FullBox body prefix: version + 24-bit flags. */
  private def full(version: Int, flags: Int): Array[Byte] =
    Array[Byte](version.toByte, ((flags >>> 16) & 0xff).toByte,
      ((flags >>> 8) & 0xff).toByte, (flags & 0xff).toByte)

  private val IdentityMatrix: Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream(36)
    putInt(o, 0x00010000); putInt(o, 0); putInt(o, 0)
    putInt(o, 0); putInt(o, 0x00010000); putInt(o, 0)
    putInt(o, 0); putInt(o, 0); putInt(o, 0x40000000)
    o.toByteArray
  }

  /** Encode an MJPEG MP4: `jpegFrame(i)` returns frame i as a complete
    * JPEG stream (all frames must share dimensions `width`×`height`).
    * Track timescale is `fps` with one tick per frame. Samples are
    * grouped `samplesPerChunk` to a chunk so the decoder's
    * `stsc`×`stco` join is exercised for real (a trailing partial
    * chunk produces a second `stsc` run). */
  def encodeMjpegMp4(width: Int, height: Int, fps: Int, nFrames: Int,
                     jpegFrame: Int => Array[Byte],
                     samplesPerChunk: Int = 2): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0 && nFrames > 0 &&
      samplesPerChunk > 0, "encodeMjpegMp4: positive dims/fps/frames/spc")
    val frames = Array.tabulate(nFrames)(jpegFrame)

    val ftyp = {
      val o = new java.io.ByteArrayOutputStream
      fourcc(o, "isom"); putInt(o, 0x200); fourcc(o, "isom"); fourcc(o, "mp41")
      box("ftyp", o.toByteArray)
    }

    // chunk layout: full chunks of samplesPerChunk, one trailing partial
    val nChunks = (nFrames + samplesPerChunk - 1) / samplesPerChunk
    val mdatPayload = frames.reduce(_ ++ _)
    // absolute file offsets: ftyp, then mdat header (8), then payload
    val chunkOffsets = new Array[Int](nChunks)
    var off = ftyp.length + 8
    var s = 0
    var c = 0
    while (c < nChunks) {
      chunkOffsets(c) = off
      var k = 0
      while (k < samplesPerChunk && s < nFrames) {
        off += frames(s).length; s += 1; k += 1
      }
      c += 1
    }

    val stsd = {
      val e = new java.io.ByteArrayOutputStream // VisualSampleEntry 'jpeg'
      e.write(Array.fill[Byte](6)(0)) // reserved
      putShort(e, 1)                  // data_reference_index
      putShort(e, 0); putShort(e, 0)  // pre_defined, reserved
      putInt(e, 0); putInt(e, 0); putInt(e, 0) // pre_defined[3]
      putShort(e, width); putShort(e, height)
      putInt(e, 0x00480000); putInt(e, 0x00480000) // 72 dpi
      putInt(e, 0)                    // reserved
      putShort(e, 1)                  // frame_count
      val name = "graft mjpeg".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      e.write(name.length)            // compressorname: pascal string in 32 bytes
      e.write(name); e.write(Array.fill[Byte](31 - name.length)(0))
      putShort(e, 24)                 // depth
      putShort(e, 0xffff)             // pre_defined = -1
      val o = new java.io.ByteArrayOutputStream
      o.write(full(0, 0)); putInt(o, 1) // entry_count
      o.write(box("jpeg", e.toByteArray))
      box("stsd", o.toByteArray)
    }
    val stts = {
      val o = new java.io.ByteArrayOutputStream
      o.write(full(0, 0)); putInt(o, 1)
      putInt(o, nFrames); putInt(o, 1) // one run: every sample lasts 1 tick
      box("stts", o.toByteArray)
    }
    val stsc = {
      // run-length encode samples-per-chunk: (1, spc); trailing partial
      // chunk gets its own run
      val lastCount = nFrames - (nChunks - 1) * samplesPerChunk
      val runs =
        if (nChunks == 1) Seq((1, lastCount))
        else if (lastCount == samplesPerChunk) Seq((1, samplesPerChunk))
        else Seq((1, samplesPerChunk), (nChunks, lastCount))
      val o = new java.io.ByteArrayOutputStream
      o.write(full(0, 0)); putInt(o, runs.length)
      runs.foreach { case (first, spc) =>
        putInt(o, first); putInt(o, spc); putInt(o, 1) // sample_description_index
      }
      box("stsc", o.toByteArray)
    }
    val stsz = {
      val o = new java.io.ByteArrayOutputStream
      o.write(full(0, 0)); putInt(o, 0) // sample_size 0 → explicit table
      putInt(o, nFrames)
      frames.foreach(f => putInt(o, f.length))
      box("stsz", o.toByteArray)
    }
    val stco = {
      val o = new java.io.ByteArrayOutputStream
      o.write(full(0, 0)); putInt(o, nChunks)
      chunkOffsets.foreach(putInt(o, _))
      box("stco", o.toByteArray)
    }
    val stbl = box("stbl", stsd, stts, stsc, stsz, stco)

    val dinf = box("dinf", box("dref", {
      val o = new java.io.ByteArrayOutputStream
      o.write(full(0, 0)); putInt(o, 1)
      o.write(box("url ", full(0, 1))) // flags=1: media in same file
      o.toByteArray
    }))
    val vmhd = box("vmhd", {
      val o = new java.io.ByteArrayOutputStream
      o.write(full(0, 1))
      putShort(o, 0); putShort(o, 0); putShort(o, 0); putShort(o, 0)
      o.toByteArray
    })
    val minf = box("minf", vmhd, dinf, stbl)
    val hdlr = box("hdlr", {
      val o = new java.io.ByteArrayOutputStream
      o.write(full(0, 0)); putInt(o, 0)
      fourcc(o, "vide")
      putInt(o, 0); putInt(o, 0); putInt(o, 0)
      o.write("GraftVideo".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      o.write(0)
      o.toByteArray
    })
    val mdhd = box("mdhd", {
      val o = new java.io.ByteArrayOutputStream
      o.write(full(0, 0))
      putInt(o, 0); putInt(o, 0)       // creation, modification
      putInt(o, fps); putInt(o, nFrames) // timescale, duration
      putShort(o, 0x55c4); putShort(o, 0) // language 'und', pre_defined
      o.toByteArray
    })
    val mdia = box("mdia", mdhd, hdlr, minf)
    val tkhd = box("tkhd", {
      val o = new java.io.ByteArrayOutputStream
      o.write(full(0, 3))              // enabled + in movie
      putInt(o, 0); putInt(o, 0)       // creation, modification
      putInt(o, 1); putInt(o, 0)       // track_ID, reserved
      putInt(o, nFrames)               // duration (movie timescale = fps too)
      putInt(o, 0); putInt(o, 0)       // reserved[2]
      putShort(o, 0); putShort(o, 0)   // layer, alternate_group
      putShort(o, 0); putShort(o, 0)   // volume (video: 0), reserved
      o.write(IdentityMatrix)
      putInt(o, width << 16); putInt(o, height << 16) // 16.16 fixed
      o.toByteArray
    })
    val trak = box("trak", tkhd, mdia)
    val mvhd = box("mvhd", {
      val o = new java.io.ByteArrayOutputStream
      o.write(full(0, 0))
      putInt(o, 0); putInt(o, 0)       // creation, modification
      putInt(o, fps); putInt(o, nFrames) // timescale, duration
      putInt(o, 0x00010000)            // rate 1.0
      putShort(o, 0x0100)              // volume 1.0
      putShort(o, 0)                   // reserved
      putInt(o, 0); putInt(o, 0)       // reserved[2]
      o.write(IdentityMatrix)
      for (_ <- 0 until 6) putInt(o, 0) // pre_defined[6]
      putInt(o, 2)                     // next_track_ID
      o.toByteArray
    })
    val moov = box("moov", mvhd, trak)

    val out = new java.io.ByteArrayOutputStream(
      ftyp.length + 8 + mdatPayload.length + moov.length)
    out.write(ftyp)
    putInt(out, mdatPayload.length + 8); fourcc(out, "mdat")
    out.write(mdatPayload)
    out.write(moov)
    out.toByteArray
  }

  private def getInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  private def getLong(b: Array[Byte], off: Int): Long =
    ((getInt(b, off) & 0xffffffffL) << 32) | (getInt(b, off + 4) & 0xffffffffL)
  private def getShort(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Walk sibling boxes in [start, end); invoke `f(type, bodyStart,
    * bodyEnd)` for each. Handles 64-bit `largesize` and rejects
    * overruns loudly. */
  private def walkBoxes(bytes: Array[Byte], start: Int, end: Int)
                       (f: (String, Int, Int) => Unit): Unit = {
    var o = start
    while (o + 8 <= end) {
      val size32 = getInt(bytes, o)
      val tpe = tag(bytes, o + 4)
      var bodyStart = o + 8
      val size: Long =
        if (size32 == 1) {
          require(o + 16 <= end, s"decodeMp4: truncated largesize box '$tpe'")
          bodyStart = o + 16
          getLong(bytes, o + 8)
        } else if (size32 == 0) (end - o).toLong // box extends to end
        else size32.toLong
      require(size >= (bodyStart - o) && o + size <= end,
        s"decodeMp4: box '$tpe' size $size overruns [$start,$end)")
      f(tpe, bodyStart, (o + size).toInt)
      o = (o + size).toInt
    }
  }

  /** First child box of the given type, as (bodyStart, bodyEnd). */
  private def findBox(bytes: Array[Byte], start: Int, end: Int,
                      tpe: String): Option[(Int, Int)] = {
    var res: Option[(Int, Int)] = None
    walkBoxes(bytes, start, end) { (t, bs, be) =>
      if (res.isEmpty && t == tpe) res = Some((bs, be))
    }
    res
  }

  /** Parse the container and return its header plus a LAZY frame
    * iterator over compressed sample bytes: the sample table
    * (`stsc` run expansion × `stco` chunk offsets × `stsz` sizes)
    * yields exact byte ranges; each range decodes only when the
    * iterator reaches it. Malformed payloads fail loudly. */
  def rawFrameIterator(bytes: Array[Byte]): (Mp4Header, Iterator[(Int, Array[Byte])]) = {
    require(bytes != null && bytes.length >= 16,
      s"decodeMp4: ${if (bytes == null) "null" else s"${bytes.length}-byte"} " +
        "payload shorter than any box header")
    require(tag(bytes, 4) == "ftyp", "decodeMp4: missing ftyp box")

    val (moovS, moovE) = findBox(bytes, 0, bytes.length, "moov")
      .getOrElse(throw new IllegalArgumentException("decodeMp4: no moov box"))
    val (trakS, trakE) = findBox(bytes, moovS, moovE, "trak")
      .getOrElse(throw new IllegalArgumentException("decodeMp4: no trak box"))
    val (mdiaS, mdiaE) = findBox(bytes, trakS, trakE, "mdia")
      .getOrElse(throw new IllegalArgumentException("decodeMp4: no mdia box"))
    val (mdhdS, _) = findBox(bytes, mdiaS, mdiaE, "mdhd")
      .getOrElse(throw new IllegalArgumentException("decodeMp4: no mdhd box"))
    val mdhdVer = bytes(mdhdS) & 0xff
    val (timescale, duration) =
      if (mdhdVer == 1) (getInt(bytes, mdhdS + 20), getLong(bytes, mdhdS + 24))
      else (getInt(bytes, mdhdS + 12), getInt(bytes, mdhdS + 16).toLong)
    val (minfS, minfE) = findBox(bytes, mdiaS, mdiaE, "minf")
      .getOrElse(throw new IllegalArgumentException("decodeMp4: no minf box"))
    val (stblS, stblE) = findBox(bytes, minfS, minfE, "stbl")
      .getOrElse(throw new IllegalArgumentException("decodeMp4: no stbl box"))

    // stsd: first sample entry must be 'jpeg'; dims live at fixed
    // VisualSampleEntry offsets
    val (stsdS, stsdE) = findBox(bytes, stblS, stblE, "stsd")
      .getOrElse(throw new IllegalArgumentException("decodeMp4: no stsd box"))
    require(getInt(bytes, stsdS + 4) >= 1, "decodeMp4: empty stsd")
    val entryS = stsdS + 8
    val entryFmt = tag(bytes, entryS + 4)
    require(entryFmt == "jpeg",
      s"decodeMp4: unsupported sample entry '$entryFmt' (only 'jpeg')")
    require(entryS + 36 <= stsdE, "decodeMp4: truncated VisualSampleEntry")
    val width = getShort(bytes, entryS + 32)
    val height = getShort(bytes, entryS + 34)
    require(width > 0 && height > 0, s"decodeMp4: bad dims ${width}x$height")

    // stsz: sample count + per-sample sizes
    val (stszS, _) = findBox(bytes, stblS, stblE, "stsz")
      .getOrElse(throw new IllegalArgumentException("decodeMp4: no stsz box"))
    val uniformSize = getInt(bytes, stszS + 4)
    val nSamples = getInt(bytes, stszS + 8)
    require(nSamples >= 0, s"decodeMp4: negative sample count $nSamples")
    val sizes = Array.tabulate(nSamples)(i =>
      if (uniformSize != 0) uniformSize else getInt(bytes, stszS + 12 + 4 * i))

    // stco / co64: chunk offsets
    val chunkOffsets: Array[Long] =
      findBox(bytes, stblS, stblE, "stco") match {
        case Some((s, _)) =>
          Array.tabulate(getInt(bytes, s + 4))(i =>
            getInt(bytes, s + 8 + 4 * i) & 0xffffffffL)
        case None =>
          val (s, _) = findBox(bytes, stblS, stblE, "co64").getOrElse(
            throw new IllegalArgumentException("decodeMp4: no stco/co64 box"))
          Array.tabulate(getInt(bytes, s + 4))(i => getLong(bytes, s + 8 + 8 * i))
      }

    // stsc: expand (first_chunk, samples_per_chunk) runs over the
    // actual chunk count
    val (stscS, _) = findBox(bytes, stblS, stblE, "stsc")
      .getOrElse(throw new IllegalArgumentException("decodeMp4: no stsc box"))
    val nRuns = getInt(bytes, stscS + 4)
    val runs = Array.tabulate(nRuns)(i =>
      (getInt(bytes, stscS + 8 + 12 * i), getInt(bytes, stscS + 12 + 12 * i)))
    require(runs.nonEmpty || nSamples == 0, "decodeMp4: empty stsc")
    val samplesPerChunk = new Array[Int](chunkOffsets.length)
    var r = 0
    var ci = 0
    while (ci < chunkOffsets.length) {
      while (r + 1 < nRuns && runs(r + 1)._1 <= ci + 1) r += 1
      require(nRuns > 0 && runs(r)._1 <= ci + 1,
        s"decodeMp4: chunk ${ci + 1} precedes first stsc run")
      samplesPerChunk(ci) = runs(r)._2
      ci += 1
    }

    // per-sample absolute byte offsets from the chunk walk
    val offsets = new Array[Long](nSamples)
    var si = 0
    ci = 0
    while (ci < chunkOffsets.length && si < nSamples) {
      var o = chunkOffsets(ci)
      var k = 0
      while (k < samplesPerChunk(ci) && si < nSamples) {
        offsets(si) = o
        o += sizes(si)
        si += 1; k += 1
      }
      ci += 1
    }
    require(si == nSamples,
      s"decodeMp4: sample table covers $si of $nSamples samples")
    var v = 0
    while (v < nSamples) {
      require(offsets(v) >= 0 && offsets(v) + sizes(v) <= bytes.length,
        s"decodeMp4: sample $v [${offsets(v)}, +${sizes(v)}) outside file")
      v += 1
    }

    val hdr = Mp4Header(width, height, nSamples, timescale, duration)
    val it = Iterator.tabulate(nSamples) { i =>
      (i, java.util.Arrays.copyOfRange(bytes, offsets(i).toInt,
        offsets(i).toInt + sizes(i)))
    }
    (hdr, it)
  }

  /** [[rawFrameIterator]] + lazy JPEG decode, validated against the
    * sample-entry dimensions. */
  def frameIterator(bytes: Array[Byte]): (Mp4Header, Iterator[Mp4Frame]) = {
    val (hdr, raw) = rawFrameIterator(bytes)
    val it = raw.map { case (idx, jpeg) =>
      val img = JpegCodec.decodeJpeg(jpeg)
      require(img.width == hdr.width && img.height == hdr.height,
        s"decodeMp4: frame $idx is ${img.width}x${img.height}, " +
          s"sample entry says ${hdr.width}x${hdr.height}")
      Mp4Frame(idx, img)
    }
    (hdr, it)
  }

  /** REMUX an MJPEG-AVI to MP4: demux the compressed samples
    * ([[AviCodec.rawFrameIterator]]) and rewrap them byte-identically —
    * the container-normalization operation of a mixed-format corpus.
    * The entropy-coded JPEG streams are never touched, so the
    * operation is exactly lossless (frame k of the MP4 is bitwise
    * frame k of the AVI). */
  def remuxAviToMp4(avi: Array[Byte], samplesPerChunk: Int = 2): Array[Byte] = {
    val (hdr, raw) = AviCodec.rawFrameIterator(avi)
    val frames = raw.map(_._2).toArray
    require(frames.length == hdr.frames,
      s"remuxAviToMp4: avih says ${hdr.frames} frames, movi has ${frames.length}")
    val fps = if (hdr.usPerFrame > 0) math.max(1, 1000000 / hdr.usPerFrame) else 25
    encodeMjpegMp4(hdr.width, hdr.height, fps, frames.length, frames(_),
      samplesPerChunk)
  }
}
