package graft.functions

import org.apache.spark.sql.{Column, GraftColumnCompat}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Container-header audio decoding — the audio sibling of
  * [[ImageHeaders]]: stream parameters read straight from the first
  * bytes of a `binary` column, no codec dependency. Covers the two
  * fixed-layout lossless containers: WAV (RIFF chunk walk, little-
  * endian `fmt `/`data`) and FLAC (STREAMINFO bit fields, big-endian).
  * Frame counts come from the DECLARED sizes (a metadata pass trusts
  * the header, exactly like ffprobe's quick mode); FULL sample decode
  * over the same payload column lives in [[FlacCodec]] (Rice + LPC)
  * and feeds the perceptual envelope hash's FLAC leg.
  *
  * Truncated, corrupt, or unrecognized payloads yield NULL — never an
  * exception (the same 100 TB-scan contract as the image decoder).
  */
object AudioHeaders {

  val InfoType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  @inline private def u8(a: Array[Byte], i: Int): Int = a(i) & 0xff
  @inline private def le16(a: Array[Byte], i: Int): Int =
    u8(a, i) | (u8(a, i + 1) << 8)
  @inline private def le32(a: Array[Byte], i: Int): Long =
    u8(a, i).toLong | (u8(a, i + 1).toLong << 8) |
      (u8(a, i + 2).toLong << 16) | (u8(a, i + 3).toLong << 24)
  @inline private def be32(a: Array[Byte], i: Int): Long =
    (u8(a, i).toLong << 24) | (u8(a, i + 1) << 16) |
      (u8(a, i + 2) << 8) | u8(a, i + 3)
  @inline private def tag(a: Array[Byte], i: Int, s: String): Boolean =
    a.length >= i + 4 && a(i) == s.charAt(0).toByte &&
      a(i + 1) == s.charAt(1).toByte && a(i + 2) == s.charAt(2).toByte &&
      a(i + 3) == s.charAt(3).toByte

  // MPEG-1 Layer III bitrate (kbps, index 1-14) and sample-rate tables
  private val Mp3Bitrates = Array(
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
  private val Mp3Rates = Array(44100, 48000, 32000, 0)

  /** MP3 (MPEG-1 Layer III — the dominant crawl case), optionally
    * preceded by an ID3v2 tag (syncsafe 28-bit size). Frame counts are
    * the CBR estimate from the first frame header and the payload size —
    * the same trust-the-header quick-mode contract as the WAV path's
    * declared sizes. Other MPEG versions/layers, bad bitrate/rate
    * indices, or a truncated tag yield null. Decoded PCM depth is
    * codec-defined; reported as 16, the universal decode width.
    */
  private def mp3Info(a: Array[Byte]): InternalRow = {
    var o = 0
    if (a.length >= 10 && a(0) == 'I'.toByte && a(1) == 'D'.toByte &&
        a(2) == '3'.toByte) {
      val tagSize = ((a(6) & 0x7f) << 21) | ((a(7) & 0x7f) << 14) |
        ((a(8) & 0x7f) << 7) | (a(9) & 0x7f)
      o = 10 + tagSize // syncsafe 28-bit: cannot overflow Int
    }
    if (o < 0 || o + 4 > a.length || u8(a, o) != 0xff) return null
    val b1 = u8(a, o + 1)
    // sync (3 more set bits), MPEG-1 (version bits 11), Layer III (01)
    if ((b1 & 0xe0) != 0xe0 || ((b1 >> 3) & 3) != 3 ||
        ((b1 >> 1) & 3) != 1) return null
    val b2 = u8(a, o + 2)
    val brIdx = (b2 >> 4) & 0xf
    val rateIdx = (b2 >> 2) & 3
    if (brIdx == 0 || brIdx == 15 || rateIdx == 3) return null
    val br = Mp3Bitrates(brIdx) * 1000
    val rate = Mp3Rates(rateIdx)
    val mode = (u8(a, o + 3) >> 6) & 3
    val ch = if (mode == 3) 1 else 2
    val frameSize = 144L * br / rate
    if (frameSize <= 0) return null
    // Second-sync verification (r10, crawl-grade sniffing): a bare
    // 4-byte header with valid indices matches ~1 in 2000 random
    // binaries, so whenever the payload extends past the first frame
    // (its length = frameSize + padding bit) the next frame's sync word
    // must appear at that boundary — otherwise this is garbage that
    // happened to start 0xFF Ex, not MPEG audio. Payloads ending inside
    // the first frame (truncated tail) stay accepted, as before.
    val fl = o + (frameSize + ((b2 >> 1) & 1)).toInt
    if (fl + 1 < a.length) {
      if (u8(a, fl) != 0xff || (u8(a, fl + 1) & 0xe0) != 0xe0) return null
    } else if (fl < a.length && u8(a, fl) != 0xff) return null
    // 1152 samples per MPEG-1 Layer III frame
    val frames = ((a.length - o) / frameSize) * 1152L
    row("mp3", ch, rate, 16, frames, frames * 1000L / rate)
  }

  private def row(fmt: String, ch: Int, rate: Int, bits: Int,
      frames: Long, durMs: Long): InternalRow =
    if (ch <= 0 || rate <= 0 || bits <= 0 || frames < 0) null
    else new GenericInternalRow(Array[Any](
      UTF8String.fromString(fmt), ch, rate, bits, frames, durMs))

  /** Parse stream info from leading bytes; null if not a recognizable
    * intact WAV/FLAC header.
    */
  def info(a: Array[Byte]): InternalRow = {
    if (a == null || a.length < 12) return null
    if (tag(a, 0, "RIFF") && tag(a, 8, "WAVE")) {
      // RIFF chunk walk: need one `fmt ` and one `data` declaration.
      // The offset is a Long: le32 sizes are unsigned 32-bit, so a
      // declared size near 2^31 would wrap an Int offset negative and
      // turn the walk into an out-of-bounds read instead of a null.
      var off = 12L
      var haveFmt = false
      var ch = 0; var rate = 0; var bits = 0; var blockAlign = 0
      var dataSize = -1L
      while (off + 8 <= a.length && !(haveFmt && dataSize >= 0)) {
        val o = off.toInt
        val size = le32(a, o + 4)
        if (tag(a, o, "fmt ") && off + 8 + 16 <= a.length) {
          ch = le16(a, o + 10)
          rate = le32(a, o + 12).toInt
          blockAlign = le16(a, o + 20)
          bits = le16(a, o + 22)
          haveFmt = true
        } else if (tag(a, o, "data")) {
          dataSize = size
        }
        // RIFF pads odd-sized chunks to even offsets; size >= 0 always,
        // so the Long offset strictly grows and the walk terminates
        off += 8L + size + (size & 1L)
      }
      if (!haveFmt || dataSize < 0 || blockAlign <= 0) return null
      val frames = dataSize / blockAlign
      if (rate <= 0) return null
      return row("wav", ch, rate, bits, frames, frames * 1000L / rate)
    }
    val mp3 = mp3Info(a)
    if (mp3 != null) return mp3
    if (tag(a, 0, "fLaC") && a.length >= 4 + 4 + 34 &&
        (u8(a, 4) & 0x7f) == 0) { // first block must be STREAMINFO
      // STREAMINFO payload starts at 8; packed fields at +10:
      // sample rate (20 bits) | channels-1 (3) | bps-1 (5) | samples (36)
      val b = 8
      val rate = (u8(a, b + 10) << 12) | (u8(a, b + 11) << 4) |
        (u8(a, b + 12) >> 4)
      val ch = ((u8(a, b + 12) >> 1) & 0x7) + 1
      val bits = (((u8(a, b + 12) & 1) << 4) | (u8(a, b + 13) >> 4)) + 1
      val frames = ((u8(a, b + 13) & 0xf).toLong << 32) | be32(a, b + 14)
      if (rate <= 0) return null
      return row("flac", ch, rate, bits, frames, frames * 1000L / rate)
    }
    null
  }
}

/** `binary -> struct<format,channels,sample_rate,bits,n_frames,
  * duration_ms>` wrapper around [[AudioHeaders.info]].
  */
case class AudioInfoExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = AudioHeaders.InfoType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"audio_info needs binary, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    AudioHeaders.info(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(
      newChild: Expression): AudioInfoExpr = copy(child = newChild)
}

object AudioFunctions {
  /** struct(format, channels, sample_rate, bits, n_frames, duration_ms)
    * parsed from a WAV/FLAC payload's leading bytes; null when the
    * header is absent/corrupt/truncated.
    */
  def audioInfo(payload: Column): Column =
    GraftColumnCompat.toColumn(AudioInfoExpr(
      GraftColumnCompat.toExpression(payload)))

  /** 64-bit perceptual energy-envelope hash of a decodable PCM WAV
    * ([[WavEnvelope]]) or FLAC ([[FlacEnvelope]] — real Rice/LPC
    * sample decode) payload; null otherwise.
    */
  def audioEnvelopeHash(payload: Column): Column =
    GraftColumnCompat.toColumn(AudioEnvelopeHashExpr(
      GraftColumnCompat.toExpression(payload)))

  /** Encode interleaved 16-bit samples as a real FLAC stream in-plan
    * ([[FlacEncodeExpr]]) — fixture builder for the decode side.
    */
  def flacEncode(samples: Column, channels: Int, rate: Int = 8000,
      mode: Int = 1, stereoMode: Int = 0): Column =
    GraftColumnCompat.toColumn(FlacEncodeExpr(
      GraftColumnCompat.toExpression(samples), channels, rate, mode,
      stereoMode))

  /** Encode interleaved 16-bit samples as a real 320 kbps MPEG-1
    * Layer III stream in-plan ([[Mp3EncodeExpr]]) — fixture builder
    * for the lossy decode side of the envelope hash.
    */
  def mp3Encode(samples: Column, channels: Int,
      msStereo: Boolean = false, maxLevel: Int = 1,
      intensity: Boolean = false, mixedBlocks: Boolean = false): Column =
    GraftColumnCompat.toColumn(Mp3EncodeExpr(
      GraftColumnCompat.toExpression(samples), channels, msStereo,
      maxLevel, intensity, mixedBlocks))

  /** Wrap interleaved 16-bit samples as a PCM WAV file in-plan
    * ([[WavEncodeExpr]]) — the export/fixture writer twin of the WAV
    * decode legs.
    */
  def wavEncode(samples: Column, channels: Int, rate: Int = 8000): Column =
    GraftColumnCompat.toColumn(WavEncodeExpr(
      GraftColumnCompat.toExpression(samples), channels, rate))

  /** The MP3-gate fixture recording as a native generator (the
    * 65×1152 reflecting-walk triangle — see the gate scaladoc): a
    * 74880-element SQL `transform` is ~300 ms of interpreted
    * per-element evaluation per row, this is ~1 ms. The ORACLE
    * replays the same integer formula in SQL, so nothing about the
    * gate's replayability changes.
    */
  def triWalkPcm(key: Column, stereo: Boolean): Column =
    GraftColumnCompat.toColumn(TriWalkPcmExpr(
      GraftColumnCompat.toExpression(key), stereo))
}

/** MP4/ISO-BMFF movie-header decoding — the video sibling of
  * [[AudioHeaders]]: walk the top-level boxes to `moov`, then its
  * children to `mvhd`, and read timescale + duration (version 0's
  * 32-bit and version 1's 64-bit layouts). No codec dependency; track
  * dimensions live in per-track `tkhd` boxes and would slot into the
  * same walk. Corrupt/truncated/unrecognized payloads yield NULL.
  */
object VideoHeaders {

  val InfoType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("timescale", IntegerType, nullable = false),
    StructField("duration_units", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  @inline private def u8(a: Array[Byte], i: Int): Int = a(i) & 0xff
  @inline private def be32(a: Array[Byte], i: Int): Long =
    (u8(a, i).toLong << 24) | (u8(a, i + 1) << 16) |
      (u8(a, i + 2) << 8) | u8(a, i + 3)
  @inline private def be64(a: Array[Byte], i: Int): Long =
    (be32(a, i) << 32) | be32(a, i + 4)
  @inline private def tag(a: Array[Byte], i: Int, s: String): Boolean =
    a.length >= i + 4 && a(i) == s.charAt(0).toByte &&
      a(i + 1) == s.charAt(1).toByte && a(i + 2) == s.charAt(2).toByte &&
      a(i + 3) == s.charAt(3).toByte

  /** Scan sibling boxes in [from, until) for `name`; returns the box's
    * content offset (after size+type) and its end, or null.
    */
  private def findBox(a: Array[Byte], from: Int, until: Int,
      name: String): Array[Int] = {
    var off = from
    while (off + 8 <= until) {
      val size = be32(a, off)
      if (size < 8 || off + size > Int.MaxValue) return null
      if (tag(a, off + 4, name))
        return Array(off + 8, math.min(until, off + size.toInt))
      off += size.toInt
    }
    null
  }

  /** Parse (timescale, duration) from an MP4's moov/mvhd; null if not a
    * recognizable intact header. Requires a leading `ftyp` box (the
    * ISO-BMFF brand signature).
    */
  def info(a: Array[Byte]): InternalRow = {
    if (a == null || a.length < 16 || !tag(a, 4, "ftyp")) return null
    val moov = findBox(a, 0, a.length, "moov")
    if (moov == null) return null
    val mvhd = findBox(a, moov(0), moov(1), "mvhd")
    if (mvhd == null || mvhd(0) + 4 > a.length) return null
    val v = u8(a, mvhd(0))
    val (timescale, duration) =
      if (v == 0) {
        if (mvhd(0) + 20 > a.length) return null
        (be32(a, mvhd(0) + 12), be32(a, mvhd(0) + 16))
      } else if (v == 1) {
        if (mvhd(0) + 32 > a.length) return null
        (be32(a, mvhd(0) + 20), be64(a, mvhd(0) + 24))
      } else return null
    if (timescale <= 0 || duration < 0 || timescale > Int.MaxValue)
      return null
    // first video track's presentation size from its tkhd (16.16 fixed
    // point; audio tracks carry zero width — skipped)
    var tw = 0; var th = 0
    var toff = moov(0)
    while (toff + 8 <= moov(1) && tw == 0) {
      val size = be32(a, toff)
      // same guard as findBox: a box size with the top bit set would
      // make size.toInt negative and walk the offset out of bounds
      if (size < 8 || toff + size > Int.MaxValue) toff = moov(1)
      else {
        if (tag(a, toff + 4, "trak")) {
          val end = math.min(moov(1), (toff + size).toInt)
          val tk = findBox(a, toff + 8, end, "tkhd")
          if (tk != null) {
            val tv = u8(a, tk(0))
            val wOff = if (tv == 1) tk(0) + 88 else tk(0) + 76
            if (wOff + 8 <= tk(1) && wOff + 8 <= a.length) {
              val w = (be32(a, wOff) >> 16).toInt
              val h = (be32(a, wOff + 4) >> 16).toInt
              if (w > 0 && h > 0) { tw = w; th = h }
            }
          }
        }
        toff += size.toInt
      }
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString("mp4"), timescale.toInt, duration,
      duration * 1000L / timescale, tw, th))
  }
}

/** `binary -> struct<format,timescale,duration_units,duration_ms>`
  * wrapper around [[VideoHeaders.info]].
  */
case class VideoInfoExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = VideoHeaders.InfoType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"video_info needs binary, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    VideoHeaders.info(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(
      newChild: Expression): VideoInfoExpr = copy(child = newChild)
}

object VideoFunctions {
  /** struct(format, timescale, duration_units, duration_ms) parsed from
    * an MP4 payload's box structure; null when absent/corrupt/truncated.
    */
  def videoInfo(payload: Column): Column =
    GraftColumnCompat.toColumn(VideoInfoExpr(
      GraftColumnCompat.toExpression(payload)))

  /** struct(format, timescale_ns, duration_units, duration_ms, width,
    * height) parsed from a WebM/Matroska payload's EBML structure; null
    * when absent/corrupt/truncated.
    */
  def webmInfo(payload: Column): Column =
    GraftColumnCompat.toColumn(WebmInfoExpr(
      GraftColumnCompat.toExpression(payload)))

  /** First `maxFrames` sync-sample JPEG payloads of an MP4's first
    * JPEG video track, by the real sample-table walk
    * ([[Mp4Codec.keyframes]]); null for anything else.
    */
  def mp4Keyframes(payload: Column, maxFrames: Int = 1): Column =
    GraftColumnCompat.toColumn(Mp4KeyframesExpr(
      GraftColumnCompat.toExpression(payload), maxFrames))

  /** Encode JPEG frames as a real single-track MJPEG MP4 in-plan
    * ([[Mp4EncodeExpr]]) — fixture builder for the keyframe walk.
    */
  def mp4Encode(frames: Column, width: Int, height: Int,
      timescale: Int = 1000, frameDelta: Int = 40,
      syncSamples: Seq[Int] = Seq.empty): Column =
    GraftColumnCompat.toColumn(Mp4EncodeExpr(
      GraftColumnCompat.toExpression(frames), width, height, timescale,
      frameDelta, syncSamples))
}

/** WebM/Matroska (EBML) header decoding — the other half of crawl-grade
  * video coverage next to [[VideoHeaders]]' MP4 walk: a real EBML
  * element walk (variable-length ids and sizes) through EBML→DocType,
  * Segment→Info→TimecodeScale/Duration, and
  * Segment→Tracks→TrackEntry→Video→PixelWidth/PixelHeight. No codec
  * dependency; every id/size read is bounds-checked and any violation —
  * truncated vint, declared size past the buffer, unknown-size
  * non-matching element — yields NULL, the same null-on-garbage scan
  * contract as the MP4/WAV/FLAC/MP3 decoders.
  */
object EbmlHeaders {

  val InfoType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("timescale_ns", LongType, nullable = false),
    StructField("duration_units", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  @inline private def u8(a: Array[Byte], i: Int): Int = a(i) & 0xff

  /** Byte length of the vint whose first byte is `b`; 0 if invalid. */
  private def vintBytes(b: Int): Int = {
    var n = 1
    var mask = 0x80
    while (mask != 0) {
      if ((b & mask) != 0) return n
      n += 1; mask >>= 1
    }
    0
  }

  /** Size vint at `off` (marker stripped): (value, byteLen).
    * Long.MinValue on bounds/invalid; -1 for "unknown size" (all value
    * bits set).
    */
  private def readSize(a: Array[Byte], off: Int, end: Int): (Long, Int) = {
    if (off >= end) return (Long.MinValue, 0)
    val n = vintBytes(u8(a, off))
    if (n == 0 || off + n > end) return (Long.MinValue, 0)
    val first = u8(a, off) & (0xff >>> n)
    var v = first.toLong
    var allOnes = first == (0xff >>> n)
    var i = 1
    while (i < n) {
      val b = u8(a, off + i)
      v = (v << 8) | b
      if (b != 0xff) allOnes = false
      i += 1
    }
    (if (allOnes) -1L else v, n)
  }

  /** Scan sibling elements in [from, until) for the raw id bytes `id`;
    * returns (contentStart, contentEnd) or null. An unknown-size
    * element's content extends to `until` if it matches; if it does not
    * match it cannot be skipped — garbage, null.
    */
  private def findElement(a: Array[Byte], from: Int, until: Int,
      id: Array[Byte]): Array[Int] = {
    var off = from
    while (off < until) {
      val idLen = vintBytes(u8(a, off))
      if (idLen == 0 || idLen > 4 || off + idLen > until) return null
      val (sz, szLen) = readSize(a, off + idLen, until)
      if (szLen == 0) return null
      val contentStart = off + idLen + szLen
      if (sz >= 0 && sz > until - contentStart) return null
      val contentEnd = if (sz < 0) until else contentStart + sz.toInt
      var matches = idLen == id.length
      var k = 0
      while (matches && k < idLen) {
        if (a(off + k) != id(k)) matches = false
        k += 1
      }
      if (matches) return Array(contentStart, contentEnd)
      if (sz < 0) return null
      off = contentEnd
    }
    null
  }

  /** Big-endian unsigned int of 1-8 bytes; -1 if empty/oversized. */
  private def readUint(a: Array[Byte], s: Int, e: Int): Long = {
    val n = e - s
    if (n < 1 || n > 8) return -1L
    var v = 0L
    var i = s
    while (i < e) { v = (v << 8) | u8(a, i); i += 1 }
    v
  }

  /** IEEE-754 float of 4 or 8 bytes; NaN otherwise. */
  private def readFloat(a: Array[Byte], s: Int, e: Int): Double =
    (e - s) match {
      case 4 => java.lang.Float.intBitsToFloat(readUint(a, s, e).toInt).toDouble
      case 8 => java.lang.Double.longBitsToDouble(readUint(a, s, e))
      case _ => Double.NaN
    }

  private val IdEbml = Array[Byte](0x1A, 0x45, 0xDF.toByte, 0xA3.toByte)
  private val IdDocType = Array[Byte](0x42, 0x82.toByte)
  private val IdSegment = Array[Byte](0x18, 0x53, 0x80.toByte, 0x67)
  private val IdInfo = Array[Byte](0x15, 0x49, 0xA9.toByte, 0x66)
  private val IdTimecodeScale = Array[Byte](0x2A, 0xD7.toByte, 0xB1.toByte)
  private val IdDuration = Array[Byte](0x44, 0x89.toByte)
  private val IdTracks = Array[Byte](0x16, 0x54, 0xAE.toByte, 0x6B)
  private val IdTrackEntry = Array[Byte](0xAE.toByte)
  private val IdVideo = Array[Byte](0xE0.toByte)
  private val IdPixelWidth = Array[Byte](0xB0.toByte)
  private val IdPixelHeight = Array[Byte](0xBA.toByte)

  /** Parse stream info from a WebM/Matroska payload; null if not a
    * recognizable intact EBML header with a webm/matroska DocType and a
    * Segment Info. TimecodeScale defaults to 1,000,000 ns (the Matroska
    * default); a missing Duration reads as 0 ticks; dims come from the
    * first TrackEntry with a Video child (0 when absent — audio-only).
    */
  def info(a: Array[Byte]): InternalRow = {
    if (a == null || a.length < 8) return null
    val ebml = findElement(a, 0, a.length, IdEbml)
    if (ebml == null) return null
    val dt = findElement(a, ebml(0), ebml(1), IdDocType)
    if (dt == null) return null
    val doctype = new String(a, dt(0), dt(1) - dt(0), "ISO-8859-1")
    val fmt =
      if (doctype == "webm") "webm"
      else if (doctype == "matroska") "mkv"
      else return null
    val seg = findElement(a, ebml(1), a.length, IdSegment)
    if (seg == null) return null
    val info = findElement(a, seg(0), seg(1), IdInfo)
    if (info == null) return null
    val tsB = findElement(a, info(0), info(1), IdTimecodeScale)
    val ts = if (tsB == null) 1000000L else readUint(a, tsB(0), tsB(1))
    if (ts <= 0) return null
    val durB = findElement(a, info(0), info(1), IdDuration)
    val durTicks = if (durB == null) 0.0 else readFloat(a, durB(0), durB(1))
    if (durTicks.isNaN || durTicks < 0) return null
    val durUnits = math.floor(durTicks).toLong
    if (durUnits < 0 || durUnits > Long.MaxValue / ts) return null
    var w = 0; var h = 0
    val tracks = findElement(a, seg(0), seg(1), IdTracks)
    if (tracks != null) {
      var off = tracks(0)
      while (off < tracks(1) && w == 0) {
        val te = findElement(a, off, tracks(1), IdTrackEntry)
        if (te == null) off = tracks(1)
        else {
          val vid = findElement(a, te(0), te(1), IdVideo)
          if (vid != null) {
            val pw = findElement(a, vid(0), vid(1), IdPixelWidth)
            val ph = findElement(a, vid(0), vid(1), IdPixelHeight)
            if (pw != null && ph != null) {
              val wv = readUint(a, pw(0), pw(1))
              val hv = readUint(a, ph(0), ph(1))
              if (wv > 0 && hv > 0 && wv <= Int.MaxValue &&
                  hv <= Int.MaxValue) { w = wv.toInt; h = hv.toInt }
            }
          }
          off = te(1)
        }
      }
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(fmt), ts, durUnits,
      durUnits * ts / 1000000L, w, h))
  }
}

/** `binary -> struct<format,timescale_ns,duration_units,duration_ms,
  * width,height>` wrapper around [[EbmlHeaders.info]].
  */
case class WebmInfoExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = EbmlHeaders.InfoType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"webm_info needs binary, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    EbmlHeaders.info(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(
      newChild: Expression): WebmInfoExpr = copy(child = newChild)
}

/** Perceptual audio fingerprint over DECODABLE PCM — the audio sibling
  * of [[DHash]]: a 16-bit PCM WAV's samples (stereo downmixed
  * `(l + r) >> 1`) are split into 65 equal-position windows, each
  * window's absolute-amplitude energy summed, and bit `i` of the
  * 64-bit hash set iff window `i` is louder than window `i + 1` —
  * ENERGY-ENVELOPE SIGNS, which survive re-encoding, resampling
  * (window boundaries are relative positions), volume changes
  * (monotone scaling preserves comparisons), mono/stereo repackaging
  * and container rewraps, so the hash pairs copies of the same
  * RECORDING where byte shingles only pair copies of the same bytes.
  * Windows of unequal length (frame count not divisible by 65) compare
  * by exact integer cross-multiplication `e_i·n_{i+1} > e_{i+1}·n_i` —
  * no division, engine-replayable. Non-WAV / compressed / non-16-bit /
  * > 2-channel / < 65-frame / truncated payloads yield null.
  */
object WavEnvelope {

  @inline private def u8(a: Array[Byte], i: Int): Int = a(i) & 0xff
  @inline private def le16(a: Array[Byte], i: Int): Int =
    u8(a, i) | (u8(a, i + 1) << 8)
  @inline private def le32(a: Array[Byte], i: Int): Long =
    u8(a, i).toLong | (u8(a, i + 1).toLong << 8) |
      (u8(a, i + 2).toLong << 16) | (u8(a, i + 3).toLong << 24)
  @inline private def s16(a: Array[Byte], i: Int): Int =
    (le16(a, i) << 16) >> 16 // sign-extend

  def hash(a: Array[Byte]): java.lang.Long = {
    if (a == null || a.length < 44) return null
    if (a(0) != 'R' || a(1) != 'I' || a(2) != 'F' || a(3) != 'F' ||
        a(8) != 'W' || a(9) != 'A' || a(10) != 'V' || a(11) != 'E')
      return null
    // RIFF chunk walk for fmt + data
    var pos = 12
    var channels = 0
    var bits = 0
    var fmtOk = false
    var dataOff = -1
    var dataLen = 0L
    while (pos + 8 <= a.length && (!fmtOk || dataOff < 0)) {
      val id = new String(a, pos, 4, "US-ASCII")
      val len = le32(a, pos + 4)
      if (len < 0 || pos + 8 + len > a.length) return null
      if (id == "fmt ") {
        if (len < 16) return null
        val audioFormat = le16(a, pos + 8)
        channels = le16(a, pos + 10)
        bits = le16(a, pos + 22)
        fmtOk = audioFormat == 1 // PCM only
      } else if (id == "data") {
        dataOff = pos + 8
        dataLen = len
      }
      pos += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    if (!fmtOk || dataOff < 0 || bits != 16 ||
        channels < 1 || channels > 2) return null
    val frameBytes = 2 * channels
    val n = (dataLen / frameBytes).toInt
    if (n < 65) return null
    // per-window absolute-energy sums over the downmixed stream
    val e = new Array[Long](65)
    val wlen = new Array[Long](65)
    var w = 0
    while (w < 65) {
      val start = (w.toLong * n / 65).toInt
      val end = ((w + 1).toLong * n / 65).toInt
      wlen(w) = end - start
      var f = start
      var s = 0L
      while (f < end) {
        val o = dataOff + f * frameBytes
        val v =
          if (channels == 1) s16(a, o)
          else (s16(a, o) + s16(a, o + 2)) >> 1
        s += math.abs(v.toLong)
        f += 1
      }
      e(w) = s
      w += 1
    }
    var bitsOut = 0L
    var i = 0
    while (i < 64) {
      // exact mean comparison by cross-multiplication (e <= 2^15·n and
      // wlen <= n keep the products far under Long overflow)
      if (e(i) * wlen(i + 1) > e(i + 1) * wlen(i)) bitsOut |= 1L << i
      i += 1
    }
    java.lang.Long.valueOf(bitsOut)
  }
}

/** The FLAC leg of the envelope hash: REAL sample decode
  * ([[FlacCodec]] — Rice/LPC, all stereo decorrelations) streamed
  * through the SAME 65-window energy accumulation as [[WavEnvelope]].
  * Window boundaries come from STREAMINFO's declared total, so the
  * accumulator is O(1) per row — the recording is never materialized.
  * A FLAC encode of the same PCM lands on the same hash as its WAV
  * twin bit-for-bit (lossless codec + identical window arithmetic),
  * which is exactly what makes the cross-container audio near-dup
  * join work. Same contract gates as WAV: 16-bit, 1-2 channels,
  * ≥ 65 frames; anything else (or any decode corruption) → null.
  */
object FlacEnvelope {

  def hash(a: Array[Byte]): java.lang.Long = {
    val si = FlacCodec.streamInfo(a)
    if (si == null || si.bits != 16 || si.channels < 1 ||
      si.channels > 2 || si.totalSamples < 65 ||
      si.totalSamples > FlacCodec.MaxTotalSamples) return null
    val n = si.totalSamples
    val e = new Array[Long](65)
    val wlen = new Array[Long](65)
    var w = 0
    while (w < 65) {
      wlen(w) = (w + 1) * n / 65 - w * n / 65
      w += 1
    }
    val acc = new FlacCodec.Sink {
      var idx = 0L
      var cw = 0
      var bound: Long = n / 65
      def frame(sm: Array[Array[Int]], ch: Int, count: Int): Unit = {
        var i = 0
        while (i < count) {
          val v = if (ch == 1) sm(0)(i) else (sm(0)(i) + sm(1)(i)) >> 1
          while (idx >= bound && cw < 64) {
            cw += 1
            bound = (cw + 1).toLong * n / 65
          }
          e(cw) += math.abs(v.toLong)
          idx += 1
          i += 1
        }
      }
    }
    if (!FlacCodec.decode(a, acc)) return null
    var bitsOut = 0L
    var i = 0
    while (i < 64) {
      if (e(i) * wlen(i + 1) > e(i + 1) * wlen(i)) bitsOut |= 1L << i
      i += 1
    }
    java.lang.Long.valueOf(bitsOut)
  }
}

/** The MP3 leg of the envelope hash: REAL MPEG-1 Layer III sample
  * decode ([[Mp3Codec]] — Huffman regions, requantization, alias
  * butterflies, IMDCT, polyphase synthesis) streamed through the SAME
  * 65-window energy accumulation as [[WavEnvelope]]/[[FlacEnvelope]].
  * Window boundaries come from the DECLARED frame total (every frame
  * header walked — exact for CBR and VBR), so the accumulator is O(1)
  * per row. Unlike the lossless legs the decode is approximate, so a
  * planted MP3 member lands on its WAV/FLAC twins' hash only when the
  * recording's inter-window energy contrast exceeds the quantization
  * noise — which is exactly what makes this leg load-bearing in
  * gates: a broken Huffman walk, requantizer, or filterbank cannot
  * reproduce the envelope's sign pattern.
  */
object Mp3Envelope {

  def hash(a: Array[Byte]): java.lang.Long = {
    val si = Mp3Codec.streamInfo(a)
    if (si == null) return null
    val channels = si(1)
    if (channels < 1 || channels > 2) return null
    val n = si(2).toLong * Mp3Codec.FrameSamples
    if (n < 65) return null
    val e = new Array[Double](65)
    val wlen = new Array[Long](65)
    var w = 0
    while (w < 65) {
      wlen(w) = (w + 1) * n / 65 - w * n / 65
      w += 1
    }
    val acc = new Mp3Codec.Sink {
      var idx = 0L
      var cw = 0
      var bound: Long = n / 65
      def frame(sm: Array[Array[Double]], ch: Int, count: Int): Unit = {
        var i = 0
        while (i < count) {
          val v = if (ch == 1) sm(0)(i) else (sm(0)(i) + sm(1)(i)) / 2.0
          while (idx >= bound && cw < 64) {
            cw += 1
            bound = (cw + 1).toLong * n / 65
          }
          e(cw) += math.abs(v)
          idx += 1
          i += 1
        }
      }
    }
    if (!Mp3Codec.decode(a, acc)) return null
    var bitsOut = 0L
    var i = 0
    while (i < 64) {
      if (e(i) * wlen(i + 1) > e(i + 1) * wlen(i)) bitsOut |= 1L << i
      i += 1
    }
    java.lang.Long.valueOf(bitsOut)
  }
}

/** `binary -> bigint` envelope hash with container dispatch: PCM WAV
  * via [[WavEnvelope]], FLAC via [[FlacEnvelope]] (real Rice/LPC
  * sample decode), MP3 via [[Mp3Envelope]] (real Layer III sample
  * decode); anything else null.
  */
case class AudioEnvelopeHashExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"audio_envelope_hash needs binary, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[Array[Byte]]
    if (a == null) null
    else if (a.length >= 4 && a(0) == 'f' && a(1) == 'L' &&
      a(2) == 'a' && a(3) == 'C') FlacEnvelope.hash(a)
    else if (a.length >= 4 && a(0) == 'R' && a(1) == 'I' &&
      a(2) == 'F' && a(3) == 'F') WavEnvelope.hash(a)
    else Mp3Envelope.hash(a) // strict sync/header walk; null on garbage
  }

  override protected def withNewChildInternal(
      newChild: Expression): AudioEnvelopeHashExpr = copy(child = newChild)
}

/** `array<int> -> binary` MP3 fixture encoder ([[Mp3Codec.encode]]):
  * interleaved 16-bit samples in, a real 320 kbps MPEG-1 Layer III
  * stream out — the lossy sibling of [[FlacEncodeExpr]], built inside
  * a scan so the Layer III decode chain is load-bearing in gates.
  * Null on null/mis-shaped/out-of-range input.
  */
case class Mp3EncodeExpr(child: Expression, channels: Int,
    msStereo: Boolean = false, maxLevel: Int = 1,
    intensity: Boolean = false, mixedBlocks: Boolean = false)
    extends UnaryExpression with CodegenFallback {
  require(channels == 1 || channels == 2, s"channels $channels")
  require(!msStereo || channels == 2, "MS needs 2 channels")
  require(maxLevel >= 1 && maxLevel <= 7, s"maxLevel $maxLevel")
  require(!intensity || channels == 2, "intensity needs 2 channels")
  require(!(intensity && msStereo) && !(intensity && mixedBlocks),
    "fixture scope: intensity is emitted alone")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType | LongType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"mp3_encode needs array<int|bigint>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[
      org.apache.spark.sql.catalyst.util.ArrayData]
    val m = arr.numElements()
    if (m == 0 || m % channels != 0 ||
      m / channels > Mp3Codec.MaxFrames * Mp3Codec.FrameSamples)
      return null
    val longs = child.dataType.asInstanceOf[ArrayType].elementType ==
      LongType
    val samples = new Array[Int](m)
    var i = 0
    while (i < m) {
      if (arr.isNullAt(i)) return null
      val v = if (longs) arr.getLong(i) else arr.getInt(i).toLong
      if (v < Short.MinValue || v > Short.MaxValue) return null
      samples(i) = v.toInt
      i += 1
    }
    Mp3Codec.encode(samples, channels, msStereo, maxLevel,
      intensity, mixedBlocks)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Mp3EncodeExpr = copy(child = newChild)
}

/** `array<int> -> binary` FLAC fixture encoder
  * ([[FlacCodec.encode]]): interleaved 16-bit samples in, a real
  * multi-frame FLAC stream out — the audio twin of
  * [[PngEncodeExpr]]/[[JpegEncodeExpr]], built inside a scan so the
  * decode side of the envelope hash is load-bearing in gates. Null on
  * null/mis-shaped/out-of-range input (never-throw discipline).
  */
case class FlacEncodeExpr(child: Expression, channels: Int,
    rate: Int = 8000, mode: Int = 1, stereoMode: Int = 0)
    extends UnaryExpression with CodegenFallback {
  require(channels == 1 || channels == 2, s"channels $channels")
  require(mode >= 0 && mode <= 3, s"mode $mode")
  require(stereoMode >= 0 && stereoMode <= 3 &&
    (channels == 2 || stereoMode == 0), s"stereoMode $stereoMode")
  require(rate > 0 && rate < (1 << 20), s"rate $rate")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType | LongType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"flac_encode needs array<int|bigint>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[
      org.apache.spark.sql.catalyst.util.ArrayData]
    val m = arr.numElements()
    // < 16 frames cannot carry a spec-consistent STREAMINFO min block
    // size (the 16-sample floor would declare a minimum larger than
    // the only frame) — null, same as any other un-encodable shape
    if (m < 16 * channels || m % channels != 0 ||
      m / channels > FlacCodec.MaxTotalSamples) return null
    val longs = child.dataType.asInstanceOf[ArrayType].elementType ==
      LongType
    val samples = new Array[Int](m)
    var i = 0
    while (i < m) {
      if (arr.isNullAt(i)) return null
      val v = if (longs) arr.getLong(i) else arr.getInt(i).toLong
      if (v < Short.MinValue || v > Short.MaxValue) return null
      samples(i) = v.toInt
      i += 1
    }
    FlacCodec.encode(samples, channels, rate, 16, mode, stereoMode)
  }

  override protected def withNewChildInternal(
      newChild: Expression): FlacEncodeExpr = copy(child = newChild)
}

/** `array<int> -> binary` PCM WAV writer (16-bit little-endian,
  * RIFF/fmt/data): interleaved samples in, a complete WAV file out —
  * the inverse of the [[AudioHeaders]]/[[WavEnvelope]] parse legs and
  * the fixture/export writer the audio gates build WAV members with.
  * Null on null/mis-shaped/out-of-range input (never-throw).
  */
case class WavEncodeExpr(child: Expression, channels: Int, rate: Int)
    extends UnaryExpression with CodegenFallback {
  require(channels == 1 || channels == 2, s"channels $channels")
  require(rate > 0, s"rate $rate")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType | LongType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"wav_encode needs array<int|bigint>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[
      org.apache.spark.sql.catalyst.util.ArrayData]
    val m = arr.numElements()
    if (m == 0 || m % channels != 0 || m > (1 << 28)) return null
    val longs = child.dataType.asInstanceOf[ArrayType].elementType ==
      LongType
    val dataLen = m * 2
    val out = new Array[Byte](44 + dataLen)
    @inline def le16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    @inline def le32(o: Int, v: Int): Unit = {
      le16(o, v & 0xffff); le16(o + 2, (v >>> 16) & 0xffff)
    }
    @inline def tag(o: Int, s: String): Unit = {
      var i = 0
      while (i < 4) { out(o + i) = s.charAt(i).toByte; i += 1 }
    }
    tag(0, "RIFF"); le32(4, 36 + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16); le16(20, 1); le16(22, channels)
    le32(24, rate); le32(28, rate * 2 * channels)
    le16(32, 2 * channels); le16(34, 16)
    tag(36, "data"); le32(40, dataLen)
    var i = 0
    while (i < m) {
      if (arr.isNullAt(i)) return null
      val v = if (longs) arr.getLong(i) else arr.getInt(i).toLong
      if (v < Short.MinValue || v > Short.MaxValue) return null
      le16(44 + 2 * i, (v & 0xffff).toInt)
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(
      newChild: Expression): WavEncodeExpr = copy(child = newChild)
}

/** `bigint key -> array<int>` MP3-gate fixture generator: 65 windows
  * × 1152 samples of a period-42 integer triangle, window amplitude
  * from the key-seeded reflecting level walk on {32, 192, 1152}
  * (forced turns at the edges, `((key+1)(37w+11)) mod 97 mod 2`
  * direction in the middle). Pure integer arithmetic — the oracle
  * replays it as a recursive CTE; this expression exists only
  * because a 74880-element interpreted SQL transform is ~300× slower
  * than this loop.
  */
case class TriWalkPcmExpr(child: Expression, stereo: Boolean)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"tri_walk_pcm needs int|bigint key, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val key = input match {
      case l: java.lang.Long => l.longValue
      case i: java.lang.Integer => i.longValue
      case other => other.asInstanceOf[Long]
    }
    val levels = Array(32, 192, 1152)
    val p = new Array[Int](65)
    p(0) = 1
    var w = 0
    while (w < 64) {
      val dir =
        if (p(w) == 0) 1
        else if (p(w) == 2) -1
        else if (((key + 1) * (w * 37 + 11)) % 97 % 2 == 0) 1 else -1
      p(w + 1) = p(w) + dir
      w += 1
    }
    val n = 65 * 1152
    val out = new Array[Int](if (stereo) 2 * n else n)
    var t = 0
    while (t < n) {
      val v = levels(p(t / 1152)) * (math.abs(2 * (t % 42) - 42) - 21)
      if (stereo) { out(2 * t) = v; out(2 * t + 1) = v }
      else out(t) = v
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): TriWalkPcmExpr = copy(child = newChild)
}
