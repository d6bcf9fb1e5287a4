package graft.functions

import org.apache.spark.sql.{Column, GraftColumnCompat}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Container-header image decoding — format + pixel dimensions read
  * straight from the first bytes of a `binary` column, no codec
  * dependency. Covers the four containers whose headers are fixed-layout
  * or marker-walkable: PNG (IHDR, big-endian), JPEG (SOF0/1/2/...
  * segment walk, big-endian), GIF87a/89a (logical screen, little-endian)
  * and BMP (BITMAPINFOHEADER / BITMAPCOREHEADER, little-endian).
  *
  * Truncated, corrupt, or unrecognized payloads yield NULL — never an
  * exception: at corpus scale a crawl always contains garbage bytes and
  * one bad cell must not fail a 100 TB scan.
  */
object ImageHeaders {

  val DimsType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  @inline private def u8(a: Array[Byte], i: Int): Int = a(i) & 0xff
  @inline private def be16(a: Array[Byte], i: Int): Int =
    (u8(a, i) << 8) | u8(a, i + 1)
  @inline private def be32(a: Array[Byte], i: Int): Long =
    (u8(a, i).toLong << 24) | (u8(a, i + 1) << 16) |
      (u8(a, i + 2) << 8) | u8(a, i + 3)
  @inline private def le16(a: Array[Byte], i: Int): Int =
    u8(a, i) | (u8(a, i + 1) << 8)
  @inline private def le32(a: Array[Byte], i: Int): Long =
    u8(a, i).toLong | (u8(a, i + 1).toLong << 8) |
      (u8(a, i + 2).toLong << 16) | (u8(a, i + 3).toLong << 24)

  private def row(fmt: String, w: Long, h: Long): InternalRow =
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) null
    else new GenericInternalRow(
      Array[Any](UTF8String.fromString(fmt), w.toInt, h.toInt))

  /** Parse (format, width, height) from leading bytes; null if not a
    * recognizable intact header.
    */
  def dims(a: Array[Byte]): InternalRow = {
    if (a == null || a.length < 2) return null
    // PNG: 8-byte signature, 4-byte chunk length, "IHDR", w/h as BE32
    if (a.length >= 24 && u8(a, 0) == 0x89 && a(1) == 'P' && a(2) == 'N' &&
        a(3) == 'G' && u8(a, 4) == 0x0d && u8(a, 5) == 0x0a &&
        u8(a, 6) == 0x1a && u8(a, 7) == 0x0a) {
      if (a(12) != 'I' || a(13) != 'H' || a(14) != 'D' || a(15) != 'R')
        return null
      return row("png", be32(a, 16), be32(a, 20))
    }
    // JPEG: SOI then a marker walk to the first frame header (SOFn).
    if (u8(a, 0) == 0xff && u8(a, 1) == 0xd8) {
      var i = 2
      while (i + 1 < a.length) {
        if (u8(a, i) != 0xff) return null
        var m = u8(a, i + 1)
        // fill bytes: consecutive 0xFF before a marker are padding
        while (m == 0xff && i + 2 < a.length) { i += 1; m = u8(a, i + 1) }
        if (m == 0xd9) return null // EOI before any SOF
        // markers that cannot appear in the pre-SOF header stream: a
        // second SOI (0xD8) or a stuffed-byte pseudo-marker (0x00) mean
        // the walk has wandered into corrupt/entropy-coded bytes —
        // reject rather than trust a bogus segment length from here on
        else if (m == 0xd8 || m == 0x00) return null
        else if ((m >= 0xd0 && m <= 0xd7) || m == 0x01) i += 2 // standalone
        else {
          if (i + 3 >= a.length) return null
          val segLen = be16(a, i + 2)
          if (segLen < 2) return null
          val isSof = m >= 0xc0 && m <= 0xcf &&
            m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof) {
            // FF Cx LL LL precision H H W W
            if (i + 8 >= a.length) return null
            return row("jpeg", be16(a, 7 + i).toLong, be16(a, 5 + i).toLong)
          }
          i += 2 + segLen
        }
      }
      return null
    }
    // GIF87a / GIF89a: logical screen descriptor, LE16
    if (a.length >= 10 && a(0) == 'G' && a(1) == 'I' && a(2) == 'F' &&
        a(3) == '8' && (a(4) == '7' || a(4) == '9') && a(5) == 'a')
      return row("gif", le16(a, 6).toLong, le16(a, 8).toLong)
    // BMP: "BM", DIB header size at 14 picks the layout
    if (a.length >= 26 && a(0) == 'B' && a(1) == 'M') {
      val dib = le32(a, 14)
      if (dib == 12) // BITMAPCOREHEADER: LE16 dims
        return row("bmp", le16(a, 18).toLong, le16(a, 20).toLong)
      if (dib >= 40 && a.length >= 30) // BITMAPINFOHEADER+: LE32, h signed
        return row("bmp", le32(a, 18), math.abs(le32(a, 22).toInt).toLong)
      return null
    }
    null
  }
}

/** `binary -> struct<format,width,height>` wrapper around
  * [[ImageHeaders.dims]]; one static call per row (the parse is a short
  * branchy byte walk — nothing to gain from inlined codegen).
  */
case class ImageDimsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ImageHeaders.DimsType

  // null for any unrecognized payload, even when the child can't be null
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"image_dims needs binary, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    ImageHeaders.dims(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(
      newChild: Expression): ImageDimsExpr = copy(child = newChild)
}

object ImageFunctions {
  /** struct(format, width, height) parsed from an image payload's
    * leading bytes; null when the header is absent/corrupt/truncated.
    */
  def imageDims(payload: Column): Column =
    GraftColumnCompat.toColumn(ImageDimsExpr(
      GraftColumnCompat.toExpression(payload)))

  /** 64-bit perceptual dHash of a decodable payload ([[DHash]]:
    * uncompressed BMP, PNG, baseline JPEG); null otherwise.
    */
  def dhash(payload: Column): Column =
    GraftColumnCompat.toColumn(DHashExpr(
      GraftColumnCompat.toExpression(payload)))

  /** 64-bit DCT perceptual hash of a decodable payload ([[PHash]]:
    * exact-integer pHash over the 32×32 resample); null otherwise.
    */
  def phash(payload: Column): Column =
    GraftColumnCompat.toColumn(PHashExpr(
      GraftColumnCompat.toExpression(payload)))

  /** Grayscale PNG thumbnail of any decodable payload
    * ([[GrayThumbnailExpr]]): decode → nearest resize → re-encode.
    */
  def grayThumbnail(payload: Column, w: Int, h: Int): Column =
    GraftColumnCompat.toColumn(GrayThumbnailExpr(
      GraftColumnCompat.toExpression(payload), w, h))

  /** Exact integer luma statistics of any decodable payload
    * ([[GrayStatsExpr]]).
    */
  def grayStats(payload: Column): Column =
    GraftColumnCompat.toColumn(GrayStatsExpr(
      GraftColumnCompat.toExpression(payload)))

  /** Encode a row-major `array<int>` gray plane (w·h values, 0-255) as
    * a grayscale PNG ([[PngCodec.encodeGray]]). `deflateMode`: 0
    * stored, 1 fixed-Huffman, 2 dynamic-Huffman.
    */
  def pngEncode(gray: Column, w: Int, h: Int, deflateMode: Int = 1,
      interlaced: Boolean = false): Column =
    GraftColumnCompat.toColumn(PngEncodeExpr(
      GraftColumnCompat.toExpression(gray), w, h, deflateMode, interlaced))

  /** Encode a row-major `array<int>` gray plane as a grayscale GIF
    * ([[GifCodec.encodeGray]]).
    */
  def gifEncode(gray: Column, w: Int, h: Int): Column =
    GraftColumnCompat.toColumn(GifEncodeExpr(
      GraftColumnCompat.toExpression(gray), w, h))

  /** Encode a row-major `array<int>` gray plane as a baseline JPEG
    * ([[JpegCodec.encodeGray]]): all-8s quant table, optional constant-
    * chroma color / 4:2:0 / restart-interval variants.
    */
  def jpegEncode(gray: Column, w: Int, h: Int, color: Boolean = false,
      subsample: Boolean = false, restartInterval: Int = 0,
      progressive: Boolean = false): Column =
    GraftColumnCompat.toColumn(JpegEncodeExpr(
      GraftColumnCompat.toExpression(gray), w, h, color, subsample,
      restartInterval, progressive))
}

/** Shared shape of the gray-plane image encoders: `array<int>` (row
  * major, w·h entries, values masked to 0-255) → `binary` payload.
  * Null on a null/mis-sized/null-element input — the encoders exist to
  * emit derived images (thumbnails, fixtures) inside a scan, so they
  * follow the same never-throw discipline as the decoders.
  */
abstract class GrayEncodeExpr extends UnaryExpression with CodegenFallback {
  def w: Int
  def h: Int

  /** The codec's REAL per-side limit (format header field width):
    * 65535 for JPEG SOF / GIF logical-screen 16-bit fields, 2^16 for
    * PNG's IHDR u32 capped by [[PngCodec.MaxSide]]. Checked at
    * ANALYSIS time so dims the codec's `require` would reject can
    * never throw per row inside a scan (the never-throw contract).
    */
  protected def maxSide: Int = 0xffff

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType | LongType, _) =>
        if (w > 0 && h > 0 && w <= maxSide && h <= maxSide &&
            w.toLong * h <= PngCodec.MaxPixels)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"unsupported dimensions ${w}x$h")
      case other => TypeCheckResult.TypeCheckFailure(
        s"gray-plane encode needs array<int|bigint>, got ${other.simpleString}")
    }

  protected def encode(pix: Array[Byte]): Array[Byte]

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[
      org.apache.spark.sql.catalyst.util.ArrayData]
    if (arr.numElements() != w * h) return null
    val longs = child.dataType.asInstanceOf[ArrayType].elementType == LongType
    val pix = new Array[Byte](w * h)
    var i = 0
    while (i < pix.length) {
      if (arr.isNullAt(i)) return null
      val v = if (longs) arr.getLong(i) else arr.getInt(i).toLong
      pix(i) = (v & 0xff).toByte
      i += 1
    }
    encode(pix)
  }
}

case class PngEncodeExpr(child: Expression, w: Int, h: Int,
    deflateMode: Int, interlaced: Boolean = false) extends GrayEncodeExpr {
  require(deflateMode >= 0 && deflateMode <= 2,
    s"deflateMode must be 0|1|2, got $deflateMode")
  override protected def maxSide: Int = PngCodec.MaxSide
  override protected def encode(pix: Array[Byte]): Array[Byte] =
    PngCodec.encodeGray(w, h, pix, deflateMode, interlaced)
  override protected def withNewChildInternal(
      newChild: Expression): PngEncodeExpr = copy(child = newChild)
}

case class GifEncodeExpr(child: Expression, w: Int, h: Int)
    extends GrayEncodeExpr {
  override protected def encode(pix: Array[Byte]): Array[Byte] =
    GifCodec.encodeGray(w, h, pix)
  override protected def withNewChildInternal(
      newChild: Expression): GifEncodeExpr = copy(child = newChild)
}

case class JpegEncodeExpr(child: Expression, w: Int, h: Int,
    color: Boolean, subsample: Boolean, restartInterval: Int,
    progressive: Boolean = false)
    extends GrayEncodeExpr {
  require(restartInterval >= 0 && restartInterval <= 0xffff,
    s"restartInterval out of range: $restartInterval")
  require(!progressive || (!subsample && restartInterval == 0),
    "the progressive fixture encoder emits 1x1 sampling, no restarts")
  override protected def encode(pix: Array[Byte]): Array[Byte] =
    if (progressive) JpegCodec.encodeGrayProgressive(w, h, pix, color)
    else JpegCodec.encodeGray(w, h, pix, color, subsample, restartInterval)
  override protected def withNewChildInternal(
      newChild: Expression): JpegEncodeExpr = copy(child = newChild)
}

/** Perceptual difference-hash (dHash) over DECODABLE pixels — 24bpp
  * uncompressed BMP (no codec needed), PNG ([[PngCodec]]: real RFC
  * 1951 inflate + row filters), baseline JPEG ([[JpegCodec]]:
  * Huffman + dequant + IDCT, luma only) and GIF ([[GifCodec]]: full
  * LZW + palette + interlace): the grayscale image is
  * sampled on a 9×8 grid (nearest-neighbor — exact integer arithmetic a
  * SQL engine reproduces verbatim, no resample kernel) and bit `y*8+x`
  * of the result is set iff gray(x,y) > gray(x+1,y). Horizontal
  * gradient SIGNS survive brightness shifts, re-encodes, and mild
  * scaling, so dHash pairs copies of the same PICTURE where byte-level
  * shingling ([[ByteShinglesExpr]]) only pairs copies of the same
  * BYTES — including the SAME picture shipped once as PNG and once as
  * JPEG, which no byte-level method can pair. All three containers
  * share one luma formula (`(r+g+b)/3` integer division) and one grid,
  * so the hash is container-invariant by construction. Unsupported /
  * compressed-BMP / truncated / decode-bomb payloads yield null.
  */
object DHash {

  @inline private def u8(a: Array[Byte], i: Int): Int = a(i) & 0xff
  @inline private def le16(a: Array[Byte], i: Int): Int =
    u8(a, i) | (u8(a, i + 1) << 8)
  @inline private def le32(a: Array[Byte], i: Int): Long =
    u8(a, i).toLong | (u8(a, i + 1).toLong << 8) |
      (u8(a, i + 2).toLong << 16) | (u8(a, i + 3).toLong << 24)

  /** 9×8 nearest-neighbor grid sample + gradient-sign pack — the one
    * hash step every container's decoded luma feeds.
    */
  private def gridHash(w: Int, h: Int, gray: (Int, Int) => Int): Long = {
    val g = Array.ofDim[Int](8, 9)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 9) {
        g(y)(x) = gray((x.toLong * w / 9).toInt, (y.toLong * h / 8).toInt)
        x += 1
      }
      y += 1
    }
    var bits = 0L
    y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y)(x) > g(y)(x + 1)) bits |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** 64-bit dHash, or null when the payload cannot be pixel-decoded.
    * Every offset computation is Long-guarded — declared sizes cannot
    * walk the read out of bounds.
    */
  def dhash(a: Array[Byte]): java.lang.Long = {
    if (a == null || a.length < 2) return null
    if (a(0) == 'B' && a(1) == 'M') return bmpDhash(a)
    if (u8(a, 0) == 0x89 && a(1) == 'P') {
      val g = PngCodec.decodeGray(a)
      if (g == null) return null
      return java.lang.Long.valueOf(gridHash(g.w, g.h,
        (x, y) => g.pix(y * g.w + x) & 0xff))
    }
    if (u8(a, 0) == 0xff && u8(a, 1) == 0xd8) {
      val g = JpegCodec.decodeLuma(a)
      if (g == null) return null
      return java.lang.Long.valueOf(gridHash(g.w, g.h,
        (x, y) => g.pix(y * g.w + x) & 0xff))
    }
    if (a.length >= 6 && a(0) == 'G' && a(1) == 'I' && a(2) == 'F') {
      val g = GifCodec.decodeGray(a)
      if (g == null) return null
      return java.lang.Long.valueOf(gridHash(g.w, g.h,
        (x, y) => g.pix(y * g.w + x) & 0xff))
    }
    null
  }

  private def bmpDhash(a: Array[Byte]): java.lang.Long = {
    if (a.length < 54) return null
    if (le32(a, 14) != 40) return null // BITMAPINFOHEADER only
    val pixOff = le32(a, 10)
    val w = le32(a, 18).toInt
    val hRaw = le32(a, 22).toInt
    val bottomUp = hRaw > 0
    val h = math.abs(hRaw)
    val bpp = le16(a, 28)
    val comp = le32(a, 30)
    if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20) ||
        bpp != 24 || comp != 0L) return null
    val stride = ((w * 3 + 3) / 4) * 4
    if (pixOff < 54 || pixOff + stride.toLong * h > a.length) return null
    def gray(x: Int, y: Int): Int = {
      val r = if (bottomUp) h - 1 - y else y
      val o = (pixOff + r.toLong * stride + x * 3L).toInt
      (u8(a, o) + u8(a, o + 1) + u8(a, o + 2)) / 3
    }
    java.lang.Long.valueOf(gridHash(w, h, gray))
  }
}

/** Shared gray-plane decode dispatch: BMP (uncompressed 24bpp), PNG
  * ([[PngCodec]]), baseline JPEG ([[JpegCodec]]) → row-major luma;
  * null outside every envelope. The materialized sibling of the
  * closure-based walk inside [[DHash]] for consumers that need the
  * whole plane (resize, feature extraction).
  */
object PixelDecode {

  @inline private def u8(a: Array[Byte], i: Int): Int = a(i) & 0xff
  @inline private def le16(a: Array[Byte], i: Int): Int =
    u8(a, i) | (u8(a, i + 1) << 8)
  @inline private def le32(a: Array[Byte], i: Int): Long =
    u8(a, i).toLong | (u8(a, i + 1).toLong << 8) |
      (u8(a, i + 2).toLong << 16) | (u8(a, i + 3).toLong << 24)

  final case class Gray(w: Int, h: Int, pix: Array[Byte])

  def grayPlane(a: Array[Byte]): Gray = {
    if (a == null || a.length < 2) return null
    if (a(0) == 'B' && a(1) == 'M') return bmpGray(a)
    if (u8(a, 0) == 0x89 && a(1) == 'P') {
      val g = PngCodec.decodeGray(a)
      if (g == null) return null
      return Gray(g.w, g.h, g.pix)
    }
    if (u8(a, 0) == 0xff && u8(a, 1) == 0xd8) {
      val g = JpegCodec.decodeLuma(a)
      if (g == null) return null
      return Gray(g.w, g.h, g.pix)
    }
    if (a.length >= 6 && a(0) == 'G' && a(1) == 'I' && a(2) == 'F') {
      val g = GifCodec.decodeGray(a)
      if (g == null) return null
      return Gray(g.w, g.h, g.pix)
    }
    null
  }

  private def bmpGray(a: Array[Byte]): Gray = {
    if (a.length < 54 || le32(a, 14) != 40) return null
    val pixOff = le32(a, 10)
    val w = le32(a, 18).toInt
    val hRaw = le32(a, 22).toInt
    val bottomUp = hRaw > 0
    val h = math.abs(hRaw)
    if (w <= 0 || h <= 0 || w > (1 << 16) || h > (1 << 16) ||
        w.toLong * h > PngCodec.MaxPixels ||
        le16(a, 28) != 24 || le32(a, 30) != 0L) return null
    val stride = ((w * 3 + 3) / 4) * 4
    if (pixOff < 54 || pixOff + stride.toLong * h > a.length) return null
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      val r = if (bottomUp) h - 1 - y else y
      var x = 0
      while (x < w) {
        val o = (pixOff + r.toLong * stride + x * 3L).toInt
        out(y * w + x) =
          ((u8(a, o) + u8(a, o + 1) + u8(a, o + 2)) / 3).toByte
        x += 1
      }
      y += 1
    }
    Gray(w, h, out)
  }

  /** Nearest-neighbor resample to (w, h) — the SAME integer sample
    * formula as the dHash grid (`x·srcW/dstW`), so a thumbnail at the
    * grid's own dimensions reproduces the grid exactly.
    */
  def resizeGray(g: Gray, w: Int, h: Int): Gray = {
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      val sy = (y.toLong * g.h / h).toInt
      var x = 0
      while (x < w) {
        val sx = (x.toLong * g.w / w).toInt
        out(y * w + x) = g.pix(sy * g.w + sx)
        x += 1
      }
      y += 1
    }
    Gray(w, h, out)
  }
}

/** `binary -> binary`: decode any supported container to luma,
  * nearest-neighbor resize to (w, h), re-encode as a grayscale PNG —
  * the derived-asset step of a media pipeline (preview grids,
  * fixed-size model inputs) running entirely inside a scan: real
  * decode, real deflate, null in → null out, never an exception.
  */
case class GrayThumbnailExpr(child: Expression, w: Int, h: Int)
    extends UnaryExpression with CodegenFallback {

  require(w > 0 && h > 0 && w.toLong * h <= PngCodec.MaxPixels,
    s"unsupported thumbnail dims ${w}x$h")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"gray_thumbnail needs binary, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val g = PixelDecode.grayPlane(input.asInstanceOf[Array[Byte]])
    if (g == null) null
    else {
      val r = PixelDecode.resizeGray(g, w, h)
      PngCodec.encodeGray(w, h, r.pix)
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): GrayThumbnailExpr = copy(child = newChild)
}

/** `binary -> struct<width,height,n_pixels,lum_sum,lum_sum_sq,lum_min,
  * lum_max>`: exact integer luma statistics of any decodable payload —
  * the brightness/contrast gate of an image-curation pipeline (drop
  * black frames, blown-out scans, flat synthetic fills) expressed in
  * pure integers so a SQL oracle replays it exactly; mean/variance are
  * one division away for the caller. Null outside the decode envelope.
  */
case class GrayStatsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = GrayStatsExpr.StatsType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"gray_stats needs binary, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val g = PixelDecode.grayPlane(input.asInstanceOf[Array[Byte]])
    if (g == null) return null
    var sum = 0L
    var sumSq = 0L
    var mn = 255
    var mx = 0
    var i = 0
    while (i < g.pix.length) {
      val v = g.pix(i) & 0xff
      sum += v
      sumSq += v.toLong * v
      if (v < mn) mn = v
      if (v > mx) mx = v
      i += 1
    }
    new GenericInternalRow(Array[Any](g.w, g.h, g.pix.length.toLong,
      sum, sumSq, mn, mx))
  }

  override protected def withNewChildInternal(
      newChild: Expression): GrayStatsExpr = copy(child = newChild)
}

object GrayStatsExpr {
  val StatsType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_pixels", LongType, nullable = false),
    StructField("lum_sum", LongType, nullable = false),
    StructField("lum_sum_sq", LongType, nullable = false),
    StructField("lum_min", IntegerType, nullable = false),
    StructField("lum_max", IntegerType, nullable = false)))
}

/** Integer pHash core — the DCT perceptual hash (the classic
  * pHash/ImageHash recipe: gray → 32×32 → 2-D DCT-II → top-left 8×8
  * low-frequency block → median-threshold bits), re-derived in EXACT
  * long arithmetic so a SQL oracle can replay every bit: the cosine
  * basis is the 128-entry integer table `T[k] = round(cos(kπ/64)·2^15)`
  * (all 128 values sit ≥ 0.004 from a rounding boundary — verified —
  * so any two correctly-rounded `cos` implementations produce the
  * IDENTICAL table, which is what makes cross-engine replay sound
  * where naive double DCTs would drift at the threshold), and the
  * separable transform is two integer sum-of-products passes (max
  * magnitude ~2.8e14, far inside Long).
  *
  * Properties the spec pins: container/resolution invariance (the
  * resample goes through [[PixelDecode.resizeGray]]'s grid formula —
  * the SAME picture at different sizes lands on the same 32×32 plane
  * whenever the sampling grids align), and invariance of the 63
  * non-DC bits under positive affine luma changes (DCT linearity:
  * gain scales every AC coefficient and the median with it, offset
  * moves only DC). Complements [[DHash]]: dHash sees local gradients
  * (robust to global level, fooled by low-frequency rearrangement),
  * pHash sees the global frequency envelope.
  *
  * Bit layout: bit `u·8+v` (u = horizontal frequency) is set iff
  * `F(u,v) >` the LOWER MEDIAN (sorted index 31) of the 63 non-DC
  * coefficients. The DC bit rides along (almost always set; masked
  * out by affine-invariance consumers).
  */
object PHash {

  // round(cos(k·π/64)·2^15), k ∈ [0, 128): one full period, so
  // T[(2x+1)·u mod 128] is cos((2x+1)uπ/64) for any x, u
  private val T: Array[Long] =
    Array.tabulate(128)(k => Math.round(Math.cos(k * Math.PI / 64) * 32768.0))

  /** The 64-bit hash of a row-major 32×32 luma plane. */
  def hash32(p32: Array[Byte]): Long = {
    // G(u, y) = Σ_x p(x,y) · T[(2x+1)u mod 128]  (8 × 32)
    val g = new Array[Long](8 * 32)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 32) {
        var s = 0L
        var x = 0
        while (x < 32) {
          s += (p32(y * 32 + x) & 0xff).toLong * T(((2 * x + 1) * u) % 128)
          x += 1
        }
        g(u * 32 + y) = s
        y += 1
      }
      u += 1
    }
    // F(u, v) = Σ_y G(u, y) · T[(2y+1)v mod 128]  (8 × 8)
    val f = new Array[Long](64)
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0L
        var y = 0
        while (y < 32) {
          s += g(u * 32 + y) * T(((2 * y + 1) * v) % 128)
          y += 1
        }
        f(u * 8 + v) = s
        v += 1
      }
      u += 1
    }
    val rest = new Array[Long](63)
    System.arraycopy(f, 1, rest, 0, 63)
    java.util.Arrays.sort(rest)
    val med = rest(31)
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (f(i) > med) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** Decode any supported container, resample to 32×32, hash; null
    * outside the decode envelope.
    */
  def phash(a: Array[Byte]): java.lang.Long = {
    val g = PixelDecode.grayPlane(a)
    if (g == null) return null
    java.lang.Long.valueOf(hash32(PixelDecode.resizeGray(g, 32, 32).pix))
  }
}

/** `binary -> bigint` wrapper around [[PHash.phash]]. */
case class PHashExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"image_phash needs binary, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    PHash.phash(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(
      newChild: Expression): PHashExpr = copy(child = newChild)
}

/** `binary -> bigint` wrapper around [[DHash.dhash]]. */
case class DHashExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"image_dhash needs binary, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    DHash.dhash(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(
      newChild: Expression): DHashExpr = copy(child = newChild)
}
