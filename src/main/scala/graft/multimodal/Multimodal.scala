package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media
  * payloads as opaque `binary` columns with typed metadata, and a
  * partition-mapped feature-extraction operator with a real batch
  * shape.
  *
  * All three modalities decode FOR REAL, uncompressed AND compressed:
  * images as 24-bit BMP ([[ImageCodec]], q75), deflate-compressed PNG
  * ([[PngCodec]], q95/q98/q102), transform-coded baseline JPEG
  * ([[JpegCodec]], q100/q103), and LZW-compressed GIF incl. animation
  * ([[GifCodec]], q107/q108); audio as PCM16 WAV ([[AudioCodec]],
  * q76) and lossless FLAC ([[FlacCodec]], q99/q104); video as Y4M
  * ([[VideoCodec]], q79) and MJPEG in both real containers — RIFF/AVI
  * ([[AviCodec]], q101) and ISO-BMFF/MP4 ([[Mp4Codec]], q105/q106) —
  * every path oracle-backed end-to-end. The `pseudo*` family
  * ([[PseudoFeatureDecoder]], [[pseudoFeatures]], [[pseudoResize]],
  * [[pseudoSampleFrames]]) is the explicitly named deterministic
  * NON-codec path — the q60/x16 mirror shape over payloads with no
  * pure-JVM codec (ffmpeg-class inter-frame video, or plain text) —
  * and it REFUSES payload kinds the real codecs handle, so a real
  * format can never silently take the pseudo path. Everything
  * Spark-side is real either way: the schema, the `mapPartitions`
  * batch boundary (one decoder init per partition, streaming rows
  * through it — the same shape a JNI/FFI decoder needs), partitioning,
  * and the typed output contract.
  */
object Multimodal {

  /** A media row: opaque payload + metadata. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                            width: Int, height: Int)

  /** Extracted features: fixed-width embedding + scalar stats. */
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                                 checksum: Long, embedding: Array[Float])

  /** Payload kinds with a REAL pure-JVM codec in this library. The
    * pseudo paths refuse these: anything listed here must go through
    * its real decode operator, never the deterministic fake. */
  private[multimodal] val RealCodecKinds: Set[String] = Set(
    "image/bmp", "image/png", "image/jpeg", "image/gif",
    "audio/wav", "audio/flac",
    "video/y4m", "video/x-mjpeg", "video/mp4")

  private def requireNoRealCodec(row: MediaRow, op: String): Unit =
    require(!RealCodecKinds.contains(row.kind),
      s"$op: kind '${row.kind}' has a real codec — use the real decode " +
        "operator; the pseudo path is only for codec-less payloads")

  /** PSEUDO-FEATURES decoder — the explicitly named deterministic
    * NON-codec: derives a pseudo-embedding from a byte fold, standing
    * in for formats with no pure-JVM codec while keeping the full
    * pipeline shape (per-partition init modeled by the constructor)
    * testable. Refused for [[RealCodecKinds]] payloads at the operator
    * level. */
  final class PseudoFeatureDecoder(dim: Int = 8) {
    def features(row: MediaRow): MediaFeatures = {
      var h = 1125899906842597L // deterministic FNV-ish fold of payload
      row.payload.foreach(b => h = h * 31 + (b & 0xff))
      val emb = Array.tabulate(dim) { i =>
        val x = h ^ (0x9e3779b97f4a7c15L * (i + 1))
        ((x >>> 11).toDouble / (1L << 53).toDouble).toFloat
      }
      MediaFeatures(row.media_id, row.kind, row.payload.length.toLong, h, emb)
    }
  }

  /** The pseudo-feature operator (x16's registered shape): decoder
    * initialized once per partition, rows streamed through — never
    * materializes a partition in memory. Refuses real-codec kinds. */
  def pseudoFeatures(ds: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val decoder = new PseudoFeatureDecoder(dim) // per-partition init
      it.map { row =>
        requireNoRealCodec(row, "pseudoFeatures")
        decoder.features(row)
      }
    }
  }

  /** Engine-portable features (nullable: a NULL payload NULL-propagates
    * instead of crashing the decoder — same convention as the q46
    * simhash mirror). */
  final case class PortableMediaFeatures(media_id: Long, kind: String,
                                         n_bytes: Option[Long],
                                         checksum: Option[Long],
                                         embedding: Option[String])

  /** Engine-portable twin of [[PseudoFeatureDecoder]]: identical per-partition
    * init + streamed-rows execution shape, but every derived value is
    * modular integer math in the 2^31-1 Mersenne domain
    * ([[graft.functions.HashFns.MersennePrime]]) instead of wrapping
    * 64-bit folds — so a DuckDB oracle reproduces checksum AND
    * pseudo-embedding bit-for-bit (see the multimodal mirror query in
    * [[graft.Queries]]). The pseudo-embedding is the checksum pushed
    * through a splitmix64-derived universal-hash family `(a·h+b) mod p`,
    * emitted as a comma-joined string (hashable by the driver). */
  final class PortablePseudoDecoder(params: Seq[(Long, Long)]) {
    private val p = graft.functions.HashFns.MersennePrime
    def features(row: MediaRow): PortableMediaFeatures =
      if (row.payload == null)
        PortableMediaFeatures(row.media_id, row.kind, None, None, None)
      else {
        var h = 0L
        row.payload.foreach(b => h = (h * 31 + (b & 0xff)) % p)
        val emb = params.map { case (a, b) => (a * h + b) % p }
        PortableMediaFeatures(row.media_id, row.kind,
          Some(row.payload.length.toLong), Some(h), Some(emb.mkString(",")))
      }
  }

  /** [[pseudoFeatures]] with the portable decoder — the oracle-backed
    * mirror of the pseudo pipeline. `params` must be derived on the
    * driver ([[graft.functions.HashFns.hashParams]]) so the SQL oracle
    * can interpolate the same family. */
  def pseudoFeaturesPortable(ds: Dataset[MediaRow],
                              params: Seq[(Long, Long)]): Dataset[PortableMediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val decoder = new PortablePseudoDecoder(params) // per-partition init
      it.map(decoder.features)
    }
  }

  /** Real decoded-raster statistics for the image modality. The sums
    * are exact integers (engine-portable); `moment` weights channel-0
    * values by raster position `y*width + x`, so a decoder that
    * mis-handles row order or stride padding produces a DIFFERENT
    * moment even when the order-invariant sums agree. */
  final case class ImageStats(media_id: Long, width: Long, height: Long,
                              r_sum: Long, g_sum: Long, b_sum: Long,
                              r_moment: Long)

  /** REAL image decode: parse each payload as 24-bit BMP
    * ([[ImageCodec.decodeBmp24]]) and reduce the raster to integer
    * channel statistics. Same per-partition batch shape as the pseudo
    * operators; malformed payloads fail loudly (a curation pipeline
    * filters by `kind` first). */
  def decodeImageFeatures(ds: Dataset[MediaRow]): Dataset[ImageStats] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { row =>
        val img = ImageCodec.decodeBmp24(row.payload)
        var r = 0L; var g = 0L; var b = 0L; var mom = 0L
        val npx = img.width * img.height
        var i = 0
        while (i < npx) {
          r += img.rgb(3 * i)
          g += img.rgb(3 * i + 1)
          b += img.rgb(3 * i + 2)
          mom += img.rgb(3 * i).toLong * i
          i += 1
        }
        ImageStats(row.media_id, img.width.toLong, img.height.toLong,
          r, g, b, mom)
      }
    }
  }

  /** Real decoded-raster statistics for COMPRESSED (PNG) images —
    * q75's integer-stat shape extended with the channel count and an
    * alpha sum (0 for RGB payloads), since PNG carries both truecolor
    * variants. `c0_moment` weights channel-0 values by raster
    * position: it catches filter-reconstruction and row-order defects
    * the order-invariant sums cannot. */
  final case class PngStats(media_id: Long, width: Long, height: Long,
                            channels: Long, c0_sum: Long, c1_sum: Long,
                            c2_sum: Long, a_sum: Long, c0_moment: Long)

  /** REAL compressed-image decode: parse each payload as 8-bit PNG
    * ([[PngCodec.decodePng]] — deflate, chunk CRCs, all five scanline
    * filters) and reduce the raster to integer channel statistics.
    * Same per-partition batch shape as the other decode operators;
    * malformed payloads fail loudly. */
  def decodePngFeatures(ds: Dataset[MediaRow]): Dataset[PngStats] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { row =>
        val img = PngCodec.decodePng(row.payload)
        val ch = img.channels
        var c0 = 0L; var c1 = 0L; var c2 = 0L; var a = 0L; var mom = 0L
        val npx = img.width * img.height
        var i = 0
        while (i < npx) {
          val base = ch * i
          c0 += img.pixels(base)
          c1 += img.pixels(base + 1)
          c2 += img.pixels(base + 2)
          if (ch == 4) a += img.pixels(base + 3)
          mom += img.pixels(base).toLong * i
          i += 1
        }
        PngStats(row.media_id, img.width.toLong, img.height.toLong,
          ch.toLong, c0, c1, c2, a, mom)
      }
    }
  }

  /** REAL palette-indexed compressed-image decode: parse each payload
    * as GIF ([[GifCodec.decodeGif]] — variable-width LZW, global/local
    * color tables, four-pass de-interlacing) and reduce the resolved
    * RGB raster to integer channel statistics in [[PngStats]]' shape
    * (channels = 3, a_sum = 0). `c0_moment` weights the red channel by
    * raster position: it catches de-interlace row-order and LZW
    * dictionary defects the order-invariant sums cannot. */
  def decodeGifFeatures(ds: Dataset[MediaRow]): Dataset[PngStats] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { row =>
        val (hdr, rgb) = GifCodec.decodeGif(row.payload)
        var c0 = 0L; var c1 = 0L; var c2 = 0L; var mom = 0L
        val npx = hdr.width * hdr.height
        var i = 0
        while (i < npx) {
          val r = rgb(3 * i) & 0xff
          c0 += r
          c1 += rgb(3 * i + 1) & 0xff
          c2 += rgb(3 * i + 2) & 0xff
          mom += r.toLong * i
          i += 1
        }
        PngStats(row.media_id, hdr.width.toLong, hdr.height.toLong,
          3L, c0, c1, c2, 0L, mom)
      }
    }
  }

  /** Per-sampled-frame statistics for ANIMATED GIFs: the multi-frame
    * image container under the same lazy 1:N flatMap contract as the
    * video containers. Each kept frame reduces to RGB sums + a
    * position-weighted red moment. */
  final case class GifFrameStats(media_id: Long, frame_idx: Long,
                                 width: Long, height: Long,
                                 r_sum: Long, g_sum: Long, b_sum: Long,
                                 r_moment: Long)

  /** REAL animated-GIF decode + frame sampling: parse each payload via
    * [[GifCodec.frameIterator]] (LZW per frame, per-frame LOCAL color
    * tables honored), keep every `everyN`-th frame, reduce each to
    * integer statistics. The iterator is LAZY — a whole animation's
    * frames are never materialized. */
  def sampleGifFrameStats(ds: Dataset[MediaRow],
                          everyN: Int): Dataset[GifFrameStats] = {
    import ds.sparkSession.implicits._
    require(everyN > 0, "sampleGifFrameStats: everyN must be positive")
    ds.flatMap { row =>
      val (hdr, frames) = GifCodec.frameIterator(row.payload)
      frames.collect { case fr if fr.index % everyN == 0 =>
        var r = 0L; var g = 0L; var b = 0L; var mom = 0L
        val npx = hdr.width * hdr.height
        var i = 0
        while (i < npx) {
          val rv = fr.rgb(3 * i) & 0xff
          r += rv
          g += fr.rgb(3 * i + 1) & 0xff
          b += fr.rgb(3 * i + 2) & 0xff
          mom += rv.toLong * i
          i += 1
        }
        GifFrameStats(row.media_id, fr.index.toLong,
          hdr.width.toLong, hdr.height.toLong, r, g, b, mom)
      }
    }
  }

  /** Real decoded-audio statistics. Sums are exact integers; `moment`
    * weights channel-0 samples by frame index, so a decoder that
    * mis-walks chunks or mis-orders samples produces a different
    * moment even when order-invariant sums agree (q75's r_moment
    * rationale). `abs_sum` is the integer L1 energy. */
  final case class AudioStats(media_id: Long, sample_rate: Long,
                              channels: Long, frames: Long,
                              c0_sum: Long, abs_sum: Long, c0_moment: Long)

  /** REAL audio decode: parse each payload as PCM16 WAV
    * ([[AudioCodec.decodePcm16]]) and reduce samples to integer
    * statistics. Same per-partition batch shape as the other
    * operators; malformed payloads fail loudly. */
  def decodeAudioFeatures(ds: Dataset[MediaRow]): Dataset[AudioStats] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { row =>
        val a = AudioCodec.decodePcm16(row.payload)
        var c0 = 0L; var l1 = 0L; var mom = 0L
        var f = 0
        while (f < a.frames) {
          val v0 = a.samples(f * a.channels)
          c0 += v0
          mom += v0.toLong * f
          var c = 0
          while (c < a.channels) {
            l1 += math.abs(a.samples(f * a.channels + c))
            c += 1
          }
          f += 1
        }
        AudioStats(row.media_id, a.sampleRate.toLong, a.channels.toLong,
          a.frames.toLong, c0, l1, mom)
      }
    }
  }

  /** REAL compressed-audio decode: parse each payload as FLAC
    * ([[FlacCodec.decodeFlac]] — Rice coding, fixed predictors,
    * CRC-8/CRC-16, STREAMINFO MD5 verification, mid/side stereo) and
    * reduce samples to the same integer statistics as
    * [[decodeAudioFeatures]] — FLAC is lossless, so the stats are
    * bit-identical to the pre-encode waveform and a SQL oracle
    * verifies the full encode→decode loop exactly (q99; the audio
    * counterpart of q95's PNG upgrade over q75's BMP). Same
    * per-partition batch shape; malformed payloads fail loudly. */
  def decodeFlacFeatures(ds: Dataset[MediaRow]): Dataset[AudioStats] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { row =>
        val a = FlacCodec.decodeFlac(row.payload)
        var c0 = 0L; var l1 = 0L; var mom = 0L
        var f = 0
        while (f < a.frames) {
          val v0 = a.samples(f * a.channels)
          c0 += v0
          mom += v0.toLong * f
          var c = 0
          while (c < a.channels) {
            l1 += math.abs(a.samples(f * a.channels + c))
            c += 1
          }
          f += 1
        }
        AudioStats(row.media_id, a.sampleRate.toLong, a.channels.toLong,
          a.frames.toLong, c0, l1, mom)
      }
    }
  }

  /** One acoustic fingerprint per audio doc: the dedup key. */
  final case class AudioFingerprint(media_id: Long, sample_rate: Long,
                                    channels: Long, fp63: Long)

  /** REAL audio fingerprint for near-duplicate detection — the audio
    * analog of [[dhashPng]]: decode the FLAC payload, split channel-0
    * into `windows` equal windows, take each window's integer L1
    * energy, and emit bit k (k < 63) as 1 iff `E(k+1) > E(k)`. The
    * energy-DIFFERENCE encoding makes the fingerprint invariant to
    * positive amplitude scaling (a re-mastered/gain-adjusted copy of
    * the same recording maps to the SAME key), so an exact
    * `groupBy(fp63)` finds near-duplicate audio with one hash
    * shuffle. All integer arithmetic — an SQL oracle reproduces the
    * fingerprint bit-for-bit. Row-local `mapPartitions`. */
  def fingerprintFlac(ds: Dataset[MediaRow],
                      windows: Int = 64): Dataset[AudioFingerprint] = {
    import ds.sparkSession.implicits._
    require(windows >= 2 && windows <= 64, s"fingerprintFlac: windows=$windows")
    ds.mapPartitions { it =>
      it.map { row =>
        val a = FlacCodec.decodeFlac(row.payload)
        require(a.frames % windows == 0,
          s"fingerprintFlac: ${a.frames} frames not divisible by $windows windows")
        val per = a.frames / windows
        val e = new Array[Long](windows)
        var w = 0
        while (w < windows) {
          var s = 0L
          var f = w * per
          val end = f + per
          while (f < end) {
            s += math.abs(a.samples(f * a.channels))
            f += 1
          }
          e(w) = s
          w += 1
        }
        var h = 0L
        var k = 0
        val kMax = math.min(63, windows - 1)
        while (k < kMax) {
          if (e(k + 1) > e(k)) h |= 1L << k
          k += 1
        }
        AudioFingerprint(row.media_id, a.sampleRate.toLong,
          a.channels.toLong, h)
      }
    }
  }

  /** Decoded-JPEG raster statistics: q95's integer-stat shape for the
    * transform-coded image format. `c0_moment` weights channel-0
    * values by raster position — it catches MCU-order, restart-resync
    * and upsampling defects the order-invariant sum cannot. */
  final case class JpegStats(media_id: Long, width: Long, height: Long,
                             channels: Long, c0_sum: Long, c0_moment: Long)

  /** REAL transform-coded image decode: parse each payload as baseline
    * JPEG ([[JpegCodec.decodeJpeg]] — Huffman entropy decode, dequant,
    * IDCT, restart markers, chroma upsampling) and reduce the raster
    * to integer statistics. Same per-partition batch shape as the
    * other decoders; malformed payloads fail loudly. */
  def decodeJpegFeatures(ds: Dataset[MediaRow]): Dataset[JpegStats] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { row =>
        val img = JpegCodec.decodeJpeg(row.payload)
        val ch = img.channels
        var c0 = 0L; var mom = 0L
        val npx = img.width * img.height
        var i = 0
        while (i < npx) {
          c0 += img.pixels(ch * i)
          mom += img.pixels(ch * i).toLong * i
          i += 1
        }
        JpegStats(row.media_id, img.width.toLong, img.height.toLong,
          ch.toLong, c0, mom)
      }
    }
  }

  /** One perceptual hash per image: the dedup key. `dhash63` is the
    * classic difference hash over a 9×8 NN-downsampled grayscale grid,
    * restricted to its first 63 bits so the value stays in non-negative
    * BIGINT range for engine-portable SQL comparison. */
  final case class ImageHash(media_id: Long, width: Long, height: Long,
                             dhash63: Long)

  /** REAL image perceptual hash (dHash) for near-duplicate detection —
    * the image-modality analog of the text near-dedup family (MinHash/
    * SimHash/embedding-cosine): decode the PNG payload, nearest-
    * neighbor downsample to a 9×8 grayscale grid (source pixel
    * `(x·w div 9, y·h div 8)`, gray = `(299·r + 587·g + 114·b) div
    * 1000` — all integer arithmetic, so an SQL oracle reproduces the
    * hash bit-for-bit), then emit bit k = y·8+x (k < 63) as 1 iff
    * `gray(x+1,y) > gray(x,y)`. Scaled/re-encoded variants of the same
    * content map to the SAME hash (resize invariance is the point of a
    * perceptual hash), so an exact `groupBy(dhash63)` downstream finds
    * near-duplicate images with ONE hash shuffle — the same
    * cost shape as exact text dedup, at any corpus scale. Row-local
    * `mapPartitions`; no shuffle inside the operator. */
  def dhashPng(ds: Dataset[MediaRow]): Dataset[ImageHash] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { row =>
        val img = PngCodec.decodePng(row.payload)
        ImageHash(row.media_id, img.width.toLong, img.height.toLong,
          dhashRaster(img.pixels, img.width, img.height, img.channels))
      }
    }
  }

  /** The dHash core over any interleaved raster (1 gray or 3+ RGB
    * channels): integer NN-downsample to 9×8, integer grayscale, 63
    * difference bits. Shared by [[dhashPng]] and
    * [[dhashMjpegFrames]]. */
  private[multimodal] def dhashRaster(pixels: Array[Int], width: Int,
                                      height: Int, channels: Int): Long = {
    val g = new Array[Int](9 * 8) // 9 wide, 8 tall
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 9) {
        val sx = x * width / 9
        val sy = y * height / 8
        val base = channels * (sy * width + sx)
        g(y * 9 + x) =
          if (channels == 1) pixels(base)
          else (299 * pixels(base) + 587 * pixels(base + 1) +
            114 * pixels(base + 2)) / 1000
        x += 1
      }
      y += 1
    }
    var h = 0L
    var k = 0
    while (k < 63) {
      val yy = k / 8; val xx = k % 8
      if (g(yy * 9 + xx + 1) > g(yy * 9 + xx)) h |= 1L << k
      k += 1
    }
    h
  }

  /** One perceptual hash per VIDEO FRAME: the frame-dedup key. */
  final case class FrameHash(media_id: Long, frame_idx: Long, dhash63: Long)

  /** REAL video-frame perceptual hashing for cross-video frame
    * dedup: decode each MJPEG-AVI payload, dHash every decoded frame
    * ([[dhashRaster]]), emit (video, frame, hash). Downstream a plain
    * `groupBy(dhash63)` finds frames repeated across videos (title
    * cards, static scenes, duplicated clips) with one hash shuffle —
    * near-dup detection for the video modality at exact-dedup cost.
    * Lazy frame iterator + flatMap: no video is ever materialized. */
  def dhashMjpegFrames(ds: Dataset[MediaRow]): Dataset[FrameHash] = {
    import ds.sparkSession.implicits._
    ds.flatMap { row =>
      val (_, frames) = AviCodec.frameIterator(row.payload)
      frames.map { fr =>
        FrameHash(row.media_id, fr.index.toLong,
          dhashRaster(fr.image.pixels, fr.image.width, fr.image.height,
            fr.image.channels))
      }
    }
  }

  /** Wrap a text table as a media table (payload = UTF-8 bytes) — lets
    * the pipeline be exercised end-to-end without binary fixtures. */
  def fromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("media_id"), lit("text/plain").as("kind"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit(0).as("width"), lit(0).as("height"))

  /** REAL image resize for PNG payloads: decode
    * ([[PngCodec.decodePng]]), nearest-neighbor sample to `w`×`h`
    * (source pixel `(x*srcW div w, y*srcH div h)` — pure integer
    * arithmetic, so an SQL oracle reproduces the mapping exactly), and
    * RE-ENCODE as PNG with the per-row filter cycling — the full
    * decode→transform→encode loop a thumbnailing/normalization stage
    * runs, exercising the compressed codec in both directions
    * (q98). Row-local; same `mapPartitions` shape as the decoders. */
  def resizePng(ds: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import ds.sparkSession.implicits._
    require(w > 0 && h > 0, "resizePng: target dims must be positive")
    ds.mapPartitions { it =>
      it.map { row =>
        val src = PngCodec.decodePng(row.payload)
        val ch = src.channels
        val out = PngCodec.encodePng(w, h, ch,
          (x, y, c) => {
            val sx = x * src.width / w
            val sy = y * src.height / h
            src.pixels(ch * (sy * src.width + sx) + c)
          },
          rowFilter = y => y % 5)
        row.copy(payload = out, width = w, height = h)
      }
    }
  }

  /** PSEUDO resize for formats without a JVM codec — a real
    * implementation decodes, scales and re-encodes (libvips/
    * Pillow-SIMD class work; [[resizePng]] IS that implementation for
    * PNG, and this operator REFUSES any [[RealCodecKinds]] payload so
    * PNG can never take the fake path); the pseudo path derives a
    * deterministic payload of size ∝ w·h so size accounting and the
    * 1:1 `mapPartitions` shape (per-partition codec init, streamed
    * rows, metadata rewritten alongside the payload) are real. */
  def pseudoResize(ds: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import ds.sparkSession.implicits._
    require(w > 0 && h > 0, "pseudoResize: target dims must be positive")
    ds.mapPartitions { it =>
      val decoder = new PseudoFeatureDecoder() // per-partition init
      it.map { row =>
        requireNoRealCodec(row, "pseudoResize")
        val seed = decoder.features(row).checksum
        val out = Array.tabulate(math.max(1, w * h / 64))(i =>
          ((seed ^ (0x9e3779b97f4a7c15L * (i + 1))) & 0xff).toByte)
        row.copy(payload = out, width = w, height = h)
      }
    }
  }

  /** Real decoded-frame statistics for the video modality: one row per
    * SAMPLED frame (the 1:N fan-out). Sums are exact integers;
    * `y_moment` weights luma by raster position, so a decoder that
    * mis-slices planes or mis-orders rasters produces a different
    * moment even when order-invariant sums agree (q75's r_moment
    * rationale); `uv_sum` covers both subsampled chroma planes, so
    * wrong chroma geometry (420 vs 444 plane sizes) breaks it. */
  final case class VideoFrameStats(media_id: Long, frame_idx: Long,
                                   width: Long, height: Long,
                                   y_sum: Long, y_moment: Long, uv_sum: Long)

  /** REAL video decode + frame sampling: parse each payload as Y4M
    * ([[VideoCodec.frameIterator]]), keep every `everyN`-th frame, and
    * reduce each kept frame to integer plane statistics. The frame
    * iterator is LAZY and the fan-out is a `flatMap`, so frames stream
    * through the operator one at a time — a whole video's frames are
    * never materialized, the contract a container-index keyframe seek
    * honors at scale. Malformed payloads fail loudly. */
  def sampleVideoFrameStats(ds: Dataset[MediaRow],
                            everyN: Int): Dataset[VideoFrameStats] = {
    import ds.sparkSession.implicits._
    require(everyN > 0, "sampleVideoFrameStats: everyN must be positive")
    ds.flatMap { row =>
      val (hdr, frames) = VideoCodec.frameIterator(row.payload)
      frames.collect { case fr if fr.index % everyN == 0 =>
        var ySum = 0L; var yMom = 0L; var uvSum = 0L
        var i = 0
        while (i < fr.y.length) {
          val v = fr.y(i) & 0xff
          ySum += v
          yMom += v.toLong * i
          i += 1
        }
        i = 0
        while (i < fr.u.length) {
          uvSum += (fr.u(i) & 0xff) + (fr.v(i) & 0xff)
          i += 1
        }
        VideoFrameStats(row.media_id, fr.index.toLong,
          hdr.width.toLong, hdr.height.toLong, ySum, yMom, uvSum)
      }
    }
  }

  /** Per-sampled-frame statistics for COMPRESSED (MJPEG-AVI) video:
    * q79's shape for a transform-coded container. `c0_sum`/`c0_moment`
    * over the decoded channel-0 raster; the moment catches MCU-order,
    * restart and frame-order defects. */
  final case class MjpegFrameStats(media_id: Long, frame_idx: Long,
                                   width: Long, height: Long,
                                   c0_sum: Long, c0_moment: Long)

  /** REAL compressed-video decode + frame sampling: parse each payload
    * as MJPEG-AVI ([[AviCodec.frameIterator]] — RIFF chunk walk, idx1,
    * per-frame baseline JPEG), keep every `everyN`-th frame, and
    * reduce each kept frame to integer raster statistics. The frame
    * iterator is LAZY and the fan-out a `flatMap`, so a whole video's
    * frames are never materialized ([[sampleVideoFrameStats]]'s
    * contract, now over a compressed container). */
  def sampleMjpegFrameStats(ds: Dataset[MediaRow],
                            everyN: Int): Dataset[MjpegFrameStats] = {
    import ds.sparkSession.implicits._
    require(everyN > 0, "sampleMjpegFrameStats: everyN must be positive")
    ds.flatMap { row =>
      val (hdr, frames) = AviCodec.frameIterator(row.payload)
      frames.collect { case fr if fr.index % everyN == 0 =>
        val img = fr.image
        val ch = img.channels
        var c0 = 0L; var mom = 0L
        val npx = img.width * img.height
        var i = 0
        while (i < npx) {
          c0 += img.pixels(ch * i)
          mom += img.pixels(ch * i).toLong * i
          i += 1
        }
        MjpegFrameStats(row.media_id, fr.index.toLong,
          hdr.width.toLong, hdr.height.toLong, c0, mom)
      }
    }
  }

  /** REAL ISO-BMFF (MP4) decode + frame sampling: parse each payload
    * as MJPEG-in-MP4 ([[Mp4Codec.frameIterator]] — box-tree walk and
    * full `stsc`×`stco`×`stsz` sample-table reconstruction, per-frame
    * baseline JPEG), keep every `everyN`-th frame, and reduce each
    * kept frame to the same integer raster statistics as
    * [[sampleMjpegFrameStats]]. The frame iterator is LAZY and the
    * fan-out a `flatMap`, so a whole video's frames are never
    * materialized. */
  def sampleMp4FrameStats(ds: Dataset[MediaRow],
                          everyN: Int): Dataset[MjpegFrameStats] = {
    import ds.sparkSession.implicits._
    require(everyN > 0, "sampleMp4FrameStats: everyN must be positive")
    ds.flatMap { row =>
      val (hdr, frames) = Mp4Codec.frameIterator(row.payload)
      frames.collect { case fr if fr.index % everyN == 0 =>
        val img = fr.image
        val ch = img.channels
        var c0 = 0L; var mom = 0L
        val npx = img.width * img.height
        var i = 0
        while (i < npx) {
          c0 += img.pixels(ch * i)
          mom += img.pixels(ch * i).toLong * i
          i += 1
        }
        MjpegFrameStats(row.media_id, fr.index.toLong,
          hdr.width.toLong, hdr.height.toLong, c0, mom)
      }
    }
  }

  /** PSEUDO frame sampling — the 1:N batch shape for container formats
    * without a pure-JVM decoder (ffmpeg-class inter-frame codecs; the
    * containers this library DOES decode — Y4M, MJPEG-AVI, MP4,
    * animated GIF — are refused here and go through their real lazy
    * frame iterators): each media row fans out to
    * ceil(payloadLen / frameBytes) frames, keep every `everyN`-th. A
    * real implementation seeks keyframes via the container index
    * instead of slicing bytes; the flatMap contract (streamed, never
    * materializing a whole video's frames) is the Spark-side point. */
  final case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])
  def pseudoSampleFrames(ds: Dataset[MediaRow], frameBytes: Int,
                         everyN: Int): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    require(frameBytes > 0 && everyN > 0, "pseudoSampleFrames: positive params")
    ds.flatMap { row =>
      requireNoRealCodec(row, "pseudoSampleFrames")
      row.payload.grouped(frameBytes).zipWithIndex
        .collect { case (bytes, i) if i % everyN == 0 =>
          Frame(row.media_id, i, bytes)
        }
    }
  }
}
