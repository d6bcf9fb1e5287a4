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
  * the header, exactly like ffprobe's quick mode); full sample decode
  * would slot in as a later stage over the same payload column.
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
}
