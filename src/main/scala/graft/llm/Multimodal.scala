package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: media (image/audio/video) as opaque `binary`
 * columns with a typed metadata struct, plus batch-shaped feature extraction.
 *
 * Images decode for REAL through the JDK's own codecs (`javax.imageio`:
 * PNG/JPEG/GIF/BMP — no external libraries needed): pixels → per-channel
 * means + a luminance grid, the classic cheap visual fingerprint. PCM WAV
 * audio decodes for REAL too (`javax.sound.sampled`): frames → energy /
 * zero-crossing / envelope features. Video frame sampling is REAL for
 * animated GIF (`gifFrames` — the one multi-frame container the JDK
 * decodes); only containers the JDK cannot demux (mp4/webm/…) fall back to
 * the STUBS `decodeStub`/`frameSampleStub` — swapping in a real demuxer
 * means replacing only the function body; the operator shape
 * (mapPartitions over (id, bytes) with bounded batches) stays.
 */
object Multimodal {

  /** Typed metadata for a media column. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("checksum", StringType)))

  /** Wrap a binary column with its metadata struct (computed natively). */
  def withMediaMeta(df: DataFrame, binCol: String, mime: String): DataFrame =
    df.withColumn(s"${binCol}_meta", struct(
      lit(mime).as("mime"),
      length(col(binCol)).cast("long").as("n_bytes"),
      md5(col(binCol)).as("checksum")))

  /** Feature row produced by the extractor. */
  final case class MediaFeatures(id: Long, n_bytes: Int, features: Array[Float])

  /** Container sniff by magic bytes: the formats the JDK's ImageIO decodes
    * without external libraries. */
  def looksLikeImage(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && (
      (bytes(0) == 0x89.toByte && bytes(1) == 'P' && bytes(2) == 'N' &&
        bytes(3) == 'G') ||                                   // PNG
      (bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) || // JPEG
      (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F') || // GIF
      (bytes(0) == 'B' && bytes(1) == 'M'))                   // BMP

  /**
   * REAL image decode + feature extraction via the JDK's `javax.imageio`
   * (PNG/JPEG/GIF/BMP): 8 features in [0,1] —
   *
   *   [ meanR, meanG, meanB, meanLum,
   *     lum(top-left), lum(top-right), lum(bottom-left), lum(bottom-right) ]
   *
   * where lum = (r+g+b)/3 and the four cells split the image at ceil(w/2) /
   * ceil(h/2) — odd dimensions give the LEFT/TOP cells the extra column/row
   * — a fixed-grid downsample, the cheap visual fingerprint that
   * feeds near-dup blocking and quality gates. Sums accumulate in double so
   * the float result is exact to ~1e-7 regardless of image size. Returns
   * None for payloads ImageIO cannot decode (truncated or not an image).
   */
  def decodeImage(bytes: Array[Byte]): Option[Array[Float]] =
    if (!looksLikeImage(bytes)) None
    else try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth == 0 || img.getHeight == 0) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val sum = new Array[Double](3)
        val cellLum = new Array[Double](4)
        val cellN = new Array[Long](4)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xFF
            val g = (rgb >> 8) & 0xFF
            val b = rgb & 0xFF
            sum(0) += r; sum(1) += g; sum(2) += b
            val cell = (if (y >= (h + 1) / 2) 2 else 0) + (if (x >= (w + 1) / 2) 1 else 0)
            cellLum(cell) += (r + g + b) / 3.0
            cellN(cell) += 1
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        val feats = new Array[Float](8)
        feats(0) = (sum(0) / n / 255.0).toFloat
        feats(1) = (sum(1) / n / 255.0).toFloat
        feats(2) = (sum(2) / n / 255.0).toFloat
        feats(3) = ((sum(0) + sum(1) + sum(2)) / 3.0 / n / 255.0).toFloat
        var c = 0
        while (c < 4) {
          feats(4 + c) =
            if (cellN(c) == 0) feats(3)
            else (cellLum(c) / cellN(c) / 255.0).toFloat
          c += 1
        }
        Some(feats)
      }
    } catch { case _: Exception => None }

  /** Container sniff for RIFF/WAVE — the format the JDK's own
    * `javax.sound.sampled` decodes without external libraries. */
  def looksLikeWav(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

  /**
   * REAL audio decode + feature extraction via the JDK's
   * `javax.sound.sampled` (PCM WAV, 8/16-bit, any channel count — mixed
   * down to mono): 8 features —
   *
   *   [ rms, zeroCrossings, peak, mean,
   *     rms(q1), rms(q2), rms(q3), rms(q4) ]
   *
   * where samples are normalized to [-1,1], `zeroCrossings` is the RAW
   * count of strict sign changes (integer-valued, so oracles can pin it
   * exactly), `mean` is the signed DC offset, and the four quarter-RMS
   * values fingerprint the energy envelope (attack/decay shape) the way
   * the image grid fingerprints layout. Sums accumulate in double, so for
   * synthetic inputs whose samples are exact binary fractions (e.g. square
   * waves with amplitude k·256/32768 = k/128) every feature is EXACT — the
   * property the mm3 correctness oracle leans on. Returns None for
   * payloads the JDK cannot parse (truncated, compressed, or not audio).
   */
  def decodeAudio(bytes: Array[Byte]): Option[Array[Float]] =
    pcmSamples(bytes).map(s => audioFeatures(s, 0, s.length))

  /** Decoded mono-mixdown PCM samples in [-1,1], or None for payloads the
    * JDK cannot parse (truncated, compressed, or not audio). One bounded
    * clip per row — never a corpus-scale array. */
  private def pcmSamples(bytes: Array[Byte]): Option[Array[Double]] =
    if (!looksLikeWav(bytes)) None
    else try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val bits = fmt.getSampleSizeInBits
        // 16-bit WAV is signed PCM; 8-bit WAV is UNSIGNED by spec (the JDK
        // reports PCM_UNSIGNED for it) — excess-128, midpoint 0x80
        val signed = fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val unsigned = fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
        val ok = (bits == 16 && signed) || (bits == 8 && (signed || unsigned))
        if (!ok) None
        else {
          val raw = in.readAllBytes()
          val ch = fmt.getChannels
          val bytesPerSample = bits / 8
          val n = raw.length / (bytesPerSample * ch)
          if (n == 0) None
          else {
            val samples = new Array[Double](n)
            var i = 0
            while (i < n) {
              var c = 0
              var acc = 0.0
              while (c < ch) { // mono mixdown of frame i
                val o = (i * ch + c) * bytesPerSample
                val v =
                  if (bits == 8)
                    (if (unsigned) ((raw(o) & 0xFF) - 128).toDouble
                     else raw(o).toDouble) / 128.0
                  else {
                    val lo = raw(if (fmt.isBigEndian) o + 1 else o) & 0xFF
                    val hi = raw(if (fmt.isBigEndian) o else o + 1).toInt
                    ((hi << 8) | lo).toShort.toDouble / 32768.0
                  }
                acc += v
                c += 1
              }
              samples(i) = acc / ch
              i += 1
            }
            Some(samples)
          }
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** The standard 8 audio features over `samples[from, until)` — shared by
    * the whole-clip decode and the windowed sampler, so a window's features
    * are exactly the clip features of that window. */
  private def audioFeatures(samples: Array[Double], from: Int,
                            until: Int): Array[Float] = {
    val n = until - from
    val qSum = new Array[Double](4)
    val qN = new Array[Long](4)
    var sum = 0.0
    var sumSq = 0.0
    var peak = 0.0
    var crossings = 0L
    var prev = 0.0
    var i = 0
    while (i < n) {
      val s = samples(from + i)
      sum += s
      sumSq += s * s
      if (math.abs(s) > peak) peak = math.abs(s)
      if (i > 0 && prev * s < 0) crossings += 1
      val q = math.min(3, i * 4L / n).toInt
      qSum(q) += s * s
      qN(q) += 1
      prev = s
      i += 1
    }
    val feats = new Array[Float](8)
    feats(0) = math.sqrt(sumSq / n).toFloat
    feats(1) = crossings.toFloat
    feats(2) = peak.toFloat
    feats(3) = (sum / n).toFloat
    var q = 0
    while (q < 4) {
      feats(4 + q) =
        if (qN(q) == 0) 0f else math.sqrt(qSum(q) / qN(q)).toFloat
      q += 1
    }
    feats
  }

  /** Unified per-object decode: real codecs for image and PCM-WAV
    * containers; for AVI video the REAL first-frame image features
    * (MJPEG/DIB frames via [[aviFrames]] — a keyframe thumbnail is the
    * standard video fingerprint); stub features for everything else
    * (mp4/webm/opaque payloads). */
  def decode(bytes: Array[Byte]): Array[Float] =
    decodeImage(bytes)
      .orElse(decodeAudio(bytes))
      .orElse(aviFrames(bytes).flatMap(_.headOption).flatMap(decodeImage))
      .getOrElse(decodeStub(bytes))

  /**
   * STUB decoder ???: stands in for video decode + feature extraction;
   * images and PCM WAV take the REAL `decodeImage`/`decodeAudio` paths
   * above. Deterministic fake: 8 features derived from a rolling byte
   * statistic so tests have stable expectations. Replace the body with a
   * real codec; the signature (one media object in, fixed-width float
   * vector out) is the contract.
   */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val feats = new Array[Float](8)
    var i = 0
    while (i < bytes.length) {
      feats(i % 8) += (bytes(i) & 0xFF) / 255.0f
      i += 1
    }
    if (bytes.length > 0) {
      var j = 0
      while (j < 8) { feats(j) /= math.max(1, bytes.length / 8).toFloat; j += 1 }
    }
    feats
  }

  /**
   * STUB resize ???: stands in for image resize (decode → scale → re-encode).
   * Deterministic fake: truncate/pad the byte stream proportionally to the
   * area ratio so output size tracks the requested dimensions. Replace the
   * body with a real codec; the per-row contract (bytes in, bytes out,
   * target dims) is what the pipeline plumbing depends on.
   */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val target = math.max(1, math.min(bytes.length.toLong, w.toLong * h / 64).toInt)
    java.util.Arrays.copyOf(bytes, target)
  }

  /**
   * STUB frame sampling ???: stands in for video frame extraction from
   * containers the JDK cannot demux (mp4/webm/…) — returns every
   * `everyN`-th 256-byte "frame" of the stream. Real impl: demux + decode
   * keyframes. The operator shape (one media object → array of frames) is
   * the contract used by downstream explode() pipelines. Animated GIF — a
   * real multi-frame container the JDK DOES decode — takes the REAL
   * `gifFrames` path through `frameSample`.
   */
  def frameSampleStub(bytes: Array[Byte], everyN: Int): Array[Array[Byte]] = {
    val frame = 256
    val n = math.max(0, bytes.length / frame)
    (0 until n by math.max(1, everyN)).map { i =>
      java.util.Arrays.copyOfRange(bytes, i * frame, (i + 1) * frame)
    }.toArray
  }

  /** REAL multi-frame decode of an animated GIF via `javax.imageio`
    * (the one video-ish container the JDK ships a codec for): every stored
    * frame as a BufferedImage, in presentation order. None for non-GIF or
    * unreadable payloads. Frames are read RAW (not composited over
    * predecessors) — full-frame GIFs round-trip exactly; delta-encoded
    * GIFs yield the delta regions, which is the right input for
    * change-detection features anyway. */
  def gifFrames(bytes: Array[Byte]): Option[Seq[java.awt.image.BufferedImage]] =
    if (bytes.length < 3 || bytes(0) != 'G' || bytes(1) != 'I' || bytes(2) != 'F')
      None
    else try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val n = r.getNumImages(true)
            if (n <= 0) None else Some((0 until n).map(r.read(_)))
          } finally r.dispose()
        }
      } finally iis.close() // also on the no-reader path: the stream may
                            // hold a file-backed cache, not just heap
    } catch { case _: Exception => None }

  // ------------------------------------------------- AVI (RIFF) demux

  /** Container sniff for RIFF/AVI. */
  def looksLikeAvi(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I' && bytes(11) == ' '

  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)

  /** (fourcc, payloadStart, payloadEnd) for each RIFF chunk in
    * `[start, end)` — little-endian sizes, odd sizes padded to even (the
    * RIFF rule); a LIST chunk's payload starts with its list-type fourcc.
    * Stops at the first malformed header rather than guessing. */
  private def riffChunks(b: Array[Byte], start: Int, end: Int)
      : Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var o = start
    var ok = true
    while (ok && o + 8 <= end) {
      val typ = fourcc(b, o)
      val sz = le32(b, o + 4)
      if (sz < 0 || o + 8 + sz > end) ok = false
      else {
        out += ((typ, o + 8, o + 8 + sz.toInt))
        o += 8 + sz.toInt + (sz.toInt & 1) // pad byte after odd-sized chunks
      }
    }
    out.result()
  }

  /** The LISTs of a given list-type among `chunks`, as payload ranges with
    * the 4-byte list-type fourcc already consumed. */
  private def riffLists(b: Array[Byte], chunks: Seq[(String, Int, Int)],
                        listType: String): Seq[(Int, Int)] =
    chunks.collect { case ("LIST", s, e)
      if s + 4 <= e && fourcc(b, s) == listType => (s + 4, e) }

  /**
   * REAL metadata parse of an AVI container (public RIFF/AVI spec — pure
   * JVM): (videoHandler, durationMs, width, height, totalFrames) from the
   * `hdrl` headers (`avih` main header + the first `vids` stream's
   * `strh`). None when the stream is not AVI or the chunk tree is
   * malformed. Reference scope note: the reference SDK has no video
   * support at all (SURVEY §2) — this exceeds it.
   */
  def aviMeta(bytes: Array[Byte]): Option[(String, Long, Int, Int, Int)] =
    if (!looksLikeAvi(bytes)) None
    else try {
      val top = riffChunks(bytes, 12, bytes.length)
      val hdrl = riffLists(bytes, top, "hdrl").headOption.getOrElse(return None)
      val inHdrl = riffChunks(bytes, hdrl._1, hdrl._2)
      val avih = inHdrl.collectFirst { case ("avih", s, e) if s + 40 <= e => s }
        .getOrElse(return None)
      val usPerFrame = le32(bytes, avih)
      val totalFrames = le32(bytes, avih + 16).toInt
      val width = le32(bytes, avih + 32).toInt
      val height = le32(bytes, avih + 36).toInt
      val handler = riffLists(bytes, inHdrl, "strl").iterator
        .map(r => riffChunks(bytes, r._1, r._2))
        .flatMap(_.collectFirst { case ("strh", s, e)
          if s + 8 <= e && fourcc(bytes, s) == "vids" => fourcc(bytes, s + 4) })
        .nextOption().getOrElse("")
      Some((handler, usPerFrame * totalFrames / 1000L, width, height, totalFrames))
    } catch { case _: Exception => None }

  /**
   * REAL frame extraction from an AVI container (RIFF demux, pure JVM):
   * every video-stream frame chunk (`##dc`/`##db`, including inside
   * `rec ` groups) as STANDALONE image bytes —
   *
   *  - MJPEG (`…dc` payload starting with the JPEG SOI marker): the chunk
   *    IS a complete JPEG, passed through; `javax.imageio` decodes it.
   *  - Uncompressed DIB (`…db`, BI_RGB): wrapped with a 14-byte
   *    BITMAPFILEHEADER in front of the stream's `strf`
   *    BITMAPINFOHEADER, which makes each frame a well-formed BMP that
   *    `javax.imageio` decodes LOSSLESSLY (the property the mm6 oracle
   *    pins exact pixel values on).
   *
   * Frames in codecs the JDK cannot decode (h264 in AVI, …) are skipped
   * rather than emitted as undecodable bytes. None when not AVI, the tree
   * is malformed, or no video frames survive.
   */
  def aviFrames(bytes: Array[Byte]): Option[Array[Array[Byte]]] =
    if (!looksLikeAvi(bytes)) None
    else try {
      val top = riffChunks(bytes, 12, bytes.length)
      // strf (BITMAPINFOHEADER) of the first 'vids' stream, for DIB wrap
      val strf: Option[Array[Byte]] =
        riffLists(bytes, top, "hdrl").headOption.flatMap { h =>
          riffLists(bytes, riffChunks(bytes, h._1, h._2), "strl").iterator
            .map(r => riffChunks(bytes, r._1, r._2))
            .find(_.exists { c =>
              c._1 == "strh" && c._2 + 4 <= c._3 && fourcc(bytes, c._2) == "vids"
            })
            .flatMap(_.collectFirst { case ("strf", s, e) =>
              java.util.Arrays.copyOfRange(bytes, s, e) })
        }
      def frames(chunks: Seq[(String, Int, Int)]): Seq[Array[Byte]] =
        chunks.flatMap {
          case ("LIST", s, e) if s + 4 <= e && fourcc(bytes, s) == "rec " =>
            frames(riffChunks(bytes, s + 4, e))
          case (t, s, e) if t.length == 4 && t(0).isDigit && t(1).isDigit &&
              (t.endsWith("dc") || t.endsWith("db")) =>
            val payload = java.util.Arrays.copyOfRange(bytes, s, e)
            if (payload.length >= 2 && (payload(0) & 0xFF) == 0xFF &&
                (payload(1) & 0xFF) == 0xD8) Some(payload) // standalone JPEG
            else strf match {
              case Some(bih) if payload.nonEmpty => // DIB → BMP wrap
                val out = new Array[Byte](14 + bih.length + payload.length)
                out(0) = 'B'; out(1) = 'M'
                val total = out.length.toLong
                var i = 0
                while (i < 4) { out(2 + i) = ((total >> (8 * i)) & 0xFF).toByte
                  i += 1 }
                val off = 14L + bih.length
                i = 0
                while (i < 4) { out(10 + i) = ((off >> (8 * i)) & 0xFF).toByte
                  i += 1 }
                System.arraycopy(bih, 0, out, 14, bih.length)
                System.arraycopy(payload, 0, out, 14 + bih.length, payload.length)
                Some(out)
              case _ => None // codec the JDK cannot decode — skip
            }
          case _ => Nil
        }
      val fs = riffLists(bytes, top, "movi")
        .flatMap { case (s, e) => frames(riffChunks(bytes, s, e)) }
      if (fs.isEmpty) None else Some(fs.toArray)
    } catch { case _: Exception => None }

  /** Frame sampling: REAL for animated GIF (every `everyN`-th decoded
    * frame, re-encoded as PNG so each sample is a standalone image any
    * downstream decode handles) and for AVI containers with MJPEG or
    * uncompressed-DIB frames (each sampled frame already standalone
    * JPEG/BMP bytes); stub slicing for containers the JDK cannot demux
    * (mp4/webm/…). */
  def frameSample(bytes: Array[Byte], everyN: Int): Array[Array[Byte]] =
    gifFrames(bytes) match {
      case Some(frames) =>
        (0 until frames.size by math.max(1, everyN)).map { i =>
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(frames(i), "png", out)
          out.toByteArray
        }.toArray
      case None => aviFrames(bytes) match {
        case Some(frames) =>
          (0 until frames.length by math.max(1, everyN)).map(frames(_)).toArray
        case None => frameSampleStub(bytes, everyN)
      }
    }

  /** Metadata row parsed from an ISO-BMFF (mp4/mov) container. */
  final case class Mp4Meta(id: Long, major_brand: String, timescale: Long,
                           duration_ms: Long, track_count: Int,
                           codecs: Seq[String])

  /** ISO-BMFF sniff: a `ftyp` box at the top of the stream. */
  def looksLikeMp4(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 && bytes(4) == 'f' && bytes(5) == 't' &&
      bytes(6) == 'y' && bytes(7) == 'p'

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** (type, payloadStart, payloadEnd) for each box in `[start, end)`,
    * honoring 64-bit `largesize` (size==1) and to-end boxes (size==0);
    * stops at the first malformed header rather than guessing. */
  private def boxes(b: Array[Byte], start: Int, end: Int)
      : Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var o = start
    var ok = true
    while (ok && o + 8 <= end) {
      val size = be32(b, o)
      val typ = fourcc(b, o + 4)
      val (hdr, sz) =
        if (size == 1 && o + 16 <= end) (16L, be64(b, o + 8))
        else if (size == 0) (8L, (end - o).toLong)
        else (8L, size)
      if (sz < hdr || o + sz > end) ok = false
      else {
        out += ((typ, o + hdr.toInt, o + sz.toInt))
        o += sz.toInt
      }
    }
    out.result()
  }

  /**
   * REAL metadata parse of an ISO-BMFF container (public spec, ISO/IEC
   * 14496-12 box structure — pure JVM, no demuxer): major brand from
   * `ftyp`; movie timescale + duration from `moov/mvhd` (v0 and v1
   * layouts); one codec fourcc per `trak` from its
   * `mdia/minf/stbl/stsd` first sample entry. FRAME decode stays behind
   * the documented stub (`frameSampleStub`) — the JDK has no mp4 codec —
   * but the operational metadata a pipeline filters and routes on
   * (duration, track count, codec) comes from the actual file structure.
   * None when the stream is not ISO-BMFF or the box tree is malformed.
   */
  def mp4Meta(bytes: Array[Byte]): Option[(String, Long, Long, Int, Seq[String])] =
    if (!looksLikeMp4(bytes)) None
    else try {
      val top = boxes(bytes, 0, bytes.length)
      val brand = top.collectFirst { case ("ftyp", s, e) if s + 4 <= e =>
        fourcc(bytes, s) }.getOrElse(return None)
      val moov = top.collectFirst { case ("moov", s, e) => (s, e) }
        .getOrElse(return None)
      val inMoov = boxes(bytes, moov._1, moov._2)
      val (timescale, duration) = inMoov.collectFirst {
        case ("mvhd", s, e) if s + 4 <= e =>
          val v = bytes(s) & 0xFF
          // full-box payload: version(1) flags(3), then v0 = ctime/mtime 4+4,
          // timescale 4, duration 4; v1 = ctime/mtime 8+8, timescale 4,
          // duration 8
          if (v == 1 && s + 32 <= e) (be32(bytes, s + 20), be64(bytes, s + 24))
          else if (v == 0 && s + 20 <= e) (be32(bytes, s + 12), be32(bytes, s + 16))
          else (0L, 0L)
      }.getOrElse((0L, 0L))
      def firstBox(range: (String, Int, Int), typ: String) =
        boxes(bytes, range._2, range._3).collectFirst {
          case b @ (`typ`, _, _) => b }
      val traks = inMoov.filter(_._1 == "trak")
      val codecs = traks.flatMap { trak =>
        for {
          mdia <- firstBox(trak, "mdia")
          minf <- firstBox(mdia, "minf")
          stbl <- firstBox(minf, "stbl")
          stsd <- firstBox(stbl, "stsd")
          // stsd payload: version+flags(4), entry_count(4), then the first
          // sample entry: size(4) + format fourcc(4)
          if stsd._2 + 16 <= stsd._3
        } yield fourcc(bytes, stsd._2 + 12)
      }
      val durMs = if (timescale <= 0) 0L else duration * 1000L / timescale
      Some((brand, timescale, durMs, traks.size, codecs))
    } catch { case _: Exception => None }

  /** Distributed ISO-BMFF metadata extraction — same mapPartitions batch
    * shape as `extractFeatures`, so a real demuxer slots in per-partition.
    * Non-mp4 payloads yield a row of neutral values rather than dropping
    * (the pipeline decides what to do with unparseable media). */
  def extractMp4Meta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    implicit val enc = Encoders.product[Mp4Meta]
    df.select(col(idCol).cast("long"), col(binCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          mp4Meta(r.getAs[Array[Byte]](1)) match {
            case Some((brand, ts, durMs, n, cs)) =>
              Mp4Meta(id, brand, ts, durMs, n, cs)
            case None => Mp4Meta(id, "", 0L, 0L, 0, Nil)
          }
        }
      }
      .toDF()
  }

  /** Metadata row parsed from an AVI (RIFF) container. */
  final case class AviMeta(id: Long, handler: String, duration_ms: Long,
                           width: Int, height: Int, n_frames: Int)

  /** Distributed AVI metadata extraction — same mapPartitions batch shape
    * as `extractMp4Meta`; non-AVI payloads yield a row of neutral values
    * rather than dropping. */
  def extractAviMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    implicit val enc = Encoders.product[AviMeta]
    df.select(col(idCol).cast("long"), col(binCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          aviMeta(r.getAs[Array[Byte]](1)) match {
            case Some((handler, durMs, w, h, n)) =>
              AviMeta(id, handler, durMs, w, h, n)
            case None => AviMeta(id, "", 0L, 0, 0, 0)
          }
        }
      }
      .toDF()
  }

  /** One row per sampled frame. */
  final case class FrameFeatures(id: Long, frame_idx: Int, n_bytes: Int,
                                 features: Array[Float])

  /** Distributed frame sampling + per-frame feature extraction: the
    * explode-shaped companion to `extractFeatures` — one media object in,
    * one row per sampled frame out, each with the standard 8-feature
    * vector (real decode for GIF frames via the PNG re-encode). Same
    * mapPartitions batch shape, so a real demuxer slots in per-partition. */
  def sampleFrameFeatures(df: DataFrame, idCol: String, binCol: String,
                          everyN: Int): DataFrame = {
    implicit val enc = Encoders.product[FrameFeatures]
    df.select(col(idCol).cast("long"), col(binCol))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          frameSample(bytes, everyN).iterator.zipWithIndex.map {
            case (fb, k) => FrameFeatures(id, k, fb.length, decode(fb))
          }
        }
      }
      .toDF()
  }

  /** One row per audio window. */
  final case class AudioWindow(id: Long, window_idx: Int, n_samples: Int,
                               features: Array[Float])

  /**
   * Distributed audio WINDOWING + per-window feature extraction: the audio
   * analog of [[sampleFrameFeatures]] — one PCM-WAV clip in, one row per
   * `windowSamples`-sample window (hop `hopSamples`, overlapping when hop <
   * window) out, each with the standard 8-feature vector computed by the
   * REAL `javax.sound.sampled` decode. This is the shape a speech pipeline
   * chunks on (VAD windows, per-segment energy gating) before any heavy
   * model sees the audio. The clip decodes ONCE per row; windows slice the
   * sample array — no re-decode per window. A trailing partial window is
   * emitted with its true `n_samples`, so downstream can gate on it.
   * Non-WAV payloads yield no rows (the pipeline's unparseable-media lane
   * is `withMediaMeta`, not fake windows).
   */
  def sampleAudioWindows(df: DataFrame, idCol: String, binCol: String,
                         windowSamples: Int,
                         hopSamples: Int = 0): DataFrame = {
    val hop = if (hopSamples <= 0) windowSamples else hopSamples
    implicit val enc = Encoders.product[AudioWindow]
    df.select(col(idCol).cast("long"), col(binCol))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          pcmSamples(r.getAs[Array[Byte]](1)) match {
            case None => Iterator.empty
            case Some(samples) =>
              Iterator.range(0, samples.length, hop).zipWithIndex.map {
                case (from, w) =>
                  val until = math.min(from + windowSamples, samples.length)
                  AudioWindow(id, w, until - from,
                    audioFeatures(samples, from, until))
              }
          }
        }
      }
      .toDF()
  }

  /** Column-level plumbing for resizeStub: the same proportional truncation
    * as a native expression, so the common path needs no round-trip through
    * Scala objects. */
  def resized(df: DataFrame, binCol: String, w: Int, h: Int): DataFrame =
    df.withColumn(s"${binCol}_resized",
      substring(col(binCol), 1, math.max(1, w * h / 64)))

  /**
   * Distributed feature extraction: mapPartitions over (id, binary) so each
   * task amortizes decoder init (a real codec loads models/dictionaries
   * once per partition, not per row) and rows stream through without
   * collecting. Batch shape = one partition; size partitions upstream with
   * `spark.sql.files.maxPartitionBytes` so media batches fit executor memory.
   */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    implicit val enc = Encoders.product[MediaFeatures]
    val ds: Dataset[MediaFeatures] = df
      .select(col(idCol).cast("long"), col(binCol))
      .mapPartitions { rows =>
        // per-partition decoder init would go here (ImageIO readers are
        // looked up per call; a real CNN embedder would load weights once)
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          MediaFeatures(id, bytes.length, decode(bytes))
        }
      }
    ds.toDF()
  }

  // --------------------------------------------------- perceptual hashing

  /**
   * 64-bit perceptual image hash (DCT pHash): decode → luminance
   * average-pool to 32×32 → 2-D DCT-II → top-left 8×8 low-frequency block
   * → bit c = coefficient > median of the 63 non-DC coefficients (the DC
   * bit is always the sign of coef−median too, making all 64 bits defined
   * and deterministic).
   *
   * Invariance contract: identical PIXELS hash identically regardless of
   * container (PNG vs BMP vs GIF — lossless decode), and mild noise /
   * brightness shifts flip few bits, so near-duplicate images surface via
   * Hamming distance. This is the image analog of simhash, and pairs
   * generation reuses simhash's 16-bit-chunk pigeonhole blocking — at
   * corpus scale the shuffle carries (chunk, id), never image bytes.
   */
  def pHash64(bytes: Array[Byte]): Option[Long] =
    if (!looksLikeImage(bytes)) None
    else try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth == 0 || img.getHeight == 0) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        // luminance average-pool into a 32×32 grid (block boundaries from
        // integer scaling; blocks guaranteed non-empty)
        val g = Array.ofDim[Double](32, 32)
        var gy = 0
        while (gy < 32) {
          val y0 = gy * h / 32
          val y1 = math.max((gy + 1) * h / 32, y0 + 1)
          var gx = 0
          while (gx < 32) {
            val x0 = gx * w / 32
            val x1 = math.max((gx + 1) * w / 32, x0 + 1)
            var acc = 0.0
            var n = 0L
            var y = y0
            while (y < math.min(y1, h)) {
              var x = x0
              while (x < math.min(x1, w)) {
                val rgb = img.getRGB(x, y)
                acc += (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) +
                  (rgb & 0xFF)) / 3.0
                n += 1
                x += 1
              }
              y += 1
            }
            g(gy)(gx) = if (n == 0) 0.0 else acc / n
            gx += 1
          }
          gy += 1
        }
        // separable DCT-II, only the 8×8 low-frequency corner
        val rowDct = Array.ofDim[Double](32, 8)
        var x = 0
        while (x < 32) {
          var v = 0
          while (v < 8) {
            var s = 0.0
            var y = 0
            while (y < 32) {
              s += g(x)(y) * math.cos((2 * y + 1) * v * math.Pi / 64.0)
              y += 1
            }
            rowDct(x)(v) = s
            v += 1
          }
          x += 1
        }
        val coef = new Array[Double](64)
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            var s = 0.0
            var xx = 0
            while (xx < 32) {
              s += rowDct(xx)(v) * math.cos((2 * xx + 1) * u * math.Pi / 64.0)
              xx += 1
            }
            coef(u * 8 + v) = s
            v += 1
          }
          u += 1
        }
        val nonDc = coef.drop(1).sorted
        val median = (nonDc(30) + nonDc(31)) / 2.0
        var hash = 0L
        var i = 0
        while (i < 64) {
          if (coef(i) > median) hash |= (1L << i)
          i += 1
        }
        Some(hash)
      }
    } catch { case _: Exception => None }

  /**
   * 64-bit audio fingerprint (Haitsma–Kalker / Philips robust-hash shape):
   * decode PCM → 33 equal segments → per-segment low/high-band energies
   * (first-difference high-pass vs raw) → bit(n, b) = E(n+1, b) > E(n, b):
   * 32 temporal-difference signs × 2 bands = 64 bits.
   *
   * Invariance contract: uniform gain scales every energy by g², leaving
   * every comparison unchanged (gain-invariant), and small additive noise
   * flips only bits whose energy difference was already near zero — so
   * near-duplicate clips surface via Hamming distance, with pairs reusing
   * simhash's chunk-blocked join exactly like image pHash.
   */
  def audioFingerprint64(bytes: Array[Byte]): Option[Long] =
    pcmSamples(bytes).flatMap { s =>
      if (s.length < 66) None // need >= 2 samples per segment
      else {
        val segs = 33
        val eLow = new Array[Double](segs)
        val eHigh = new Array[Double](segs)
        var n = 0
        while (n < segs) {
          val a = n * s.length / segs
          val b = math.max((n + 1) * s.length / segs, a + 2)
          var i = a
          var lo = 0.0
          var hi = 0.0
          while (i < math.min(b, s.length)) {
            lo += s(i) * s(i)
            if (i > a) { val d = s(i) - s(i - 1); hi += d * d }
            i += 1
          }
          eLow(n) = lo; eHigh(n) = hi
          n += 1
        }
        var hash = 0L
        var k = 0
        while (k < 32) {
          if (eLow(k + 1) > eLow(k)) hash |= (1L << k)
          if (eHigh(k + 1) > eHigh(k)) hash |= (1L << (32 + k))
          k += 1
        }
        Some(hash)
      }
    }

  /** Per-row audio fingerprints: (idCol, afp nullable). */
  def audioFingerprints(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    implicit val enc = Encoders.product[PhashRow]
    df.select(col(idCol).cast("long"), col(binCol))
      .mapPartitions { rows =>
        rows.map { r =>
          PhashRow(r.getLong(0), audioFingerprint64(r.getAs[Array[Byte]](1)))
        }
      }
      .toDF(idCol, "afp")
  }

  /** Near-duplicate audio pairs by fingerprint Hamming distance — same
    * chunk-blocked join as simhash / image pHash. */
  def audioFingerprintPairs(df: DataFrame, idCol: String, binCol: String,
                            maxHamming: Int = 3): DataFrame =
    Dedup.simhashPairsFromSigs(
      audioFingerprints(df, idCol, binCol)
        .where(col("afp").isNotNull)
        .select(col(idCol).as("id"), col("afp").as("sim")),
      maxHamming)

  /** Per-row perceptual hashes: (idCol, phash nullable). Same mapPartitions
    * batch shape as feature extraction. */
  def imagePhash(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    implicit val enc = Encoders.product[PhashRow]
    df.select(col(idCol).cast("long"), col(binCol))
      .mapPartitions { rows =>
        rows.map { r =>
          PhashRow(r.getLong(0), pHash64(r.getAs[Array[Byte]](1)))
        }
      }
      .toDF(idCol, "phash")
  }

  /** Near-duplicate image pairs by pHash Hamming distance — reuses
    * simhash's chunk-blocked candidate join (pigeonhole: ≤ maxHamming ≤ 3
    * flipped bits leave at least one 16-bit chunk intact). */
  def imagePhashPairs(df: DataFrame, idCol: String, binCol: String,
                      maxHamming: Int = 3): DataFrame =
    Dedup.simhashPairsFromSigs(
      imagePhash(df, idCol, binCol)
        .where(col("phash").isNotNull)
        .select(col(idCol).as("id"), col("phash").as("sim")),
      maxHamming)
}

case class PhashRow(id: Long, phash: Option[Long])
