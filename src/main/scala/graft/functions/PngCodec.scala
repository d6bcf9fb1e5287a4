package graft.functions

/** PNG (RFC 2083) pixel decode to a LUMA plane, plus the deterministic
  * grayscale encoder that feeds fixture payloads — the real-codec leg
  * of the perceptual near-dup pipeline ([[DHash]] /
  * [[graft.operators.Multimodal]]): a crawl's image payloads are
  * overwhelmingly PNG/JPEG, so a dHash that only reads BMP pixels sees
  * ~none of a real corpus.
  *
  * Decode contract (crawl-grade): null — never an exception, never an
  * unbounded allocation — on anything outside the supported envelope:
  * corrupt signature/CRC/zlib, truncated stream, bit depth ≠ 8, or
  * dimensions beyond the decode-bomb guard
  * ([[PngCodec.MaxSide]]/[[PngCodec.MaxPixels]], checked BEFORE any
  * buffer is sized: a 20-byte IHDR can declare a 2^31-pixel image).
  * Supported: bit-depth-8 gray / RGB / palette / gray+alpha / RGBA,
  * all five row filters, stored + fixed + dynamic deflate blocks
  * ([[Inflate]]), and BOTH interlace methods — sequential and Adam7
  * (RFC 2083 §2.6/§8.2: seven sub-images, each filtered against its
  * own previous scanline, deinterlaced by pure index arithmetic over
  * the already-working inflate+unfilter path; the pixel budget is
  * unchanged, so the bomb guard covers both layouts).
  *
  * Luma = `(r + g + b) / 3` integer division — the SAME formula as the
  * BMP walk in [[DHash]], so one picture re-encoded across containers
  * lands on the same dHash and the cross-container near-dup join works.
  */
object PngCodec {

  /** Hard per-image decode bounds (decode-bomb guard). */
  val MaxSide: Int = 1 << 16
  val MaxPixels: Int = 1 << 22

  final case class Gray(w: Int, h: Int, pix: Array[Byte])

  private val Sig = Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private val crcTable: Array[Int] = {
    val t = new Array[Int](256)
    var n = 0
    while (n < 256) {
      var c = n
      var k = 0
      while (k < 8) {
        c = if ((c & 1) != 0) 0xedb88320 ^ (c >>> 1) else c >>> 1
        k += 1
      }
      t(n) = c
      n += 1
    }
    t
  }

  def crc32(a: Array[Byte], off: Int, len: Int): Long = {
    var c = 0xffffffff
    var i = off
    while (i < off + len) {
      c = crcTable((c ^ a(i)) & 0xff) ^ (c >>> 8)
      i += 1
    }
    (c ^ 0xffffffff).toLong & 0xffffffffL
  }

  @inline private def u8(a: Array[Byte], i: Int): Int = a(i) & 0xff
  @inline private def be32(a: Array[Byte], i: Int): Long =
    (u8(a, i).toLong << 24) | (u8(a, i + 1) << 16) |
      (u8(a, i + 2) << 8) | u8(a, i + 3)

  private def channels(colorType: Int): Int = colorType match {
    case 0 => 1 // gray
    case 2 => 3 // rgb
    case 3 => 1 // palette index
    case 4 => 2 // gray + alpha
    case 6 => 4 // rgba
    case _ => -1
  }

  /** Decode to a row-major luma plane; null outside the envelope. */
  def decodeGray(a: Array[Byte]): Gray = {
    if (a == null || a.length < 8 + 25) return null
    var i = 0
    while (i < 8) { if (u8(a, i) != Sig(i)) return null; i += 1 }
    var pos = 8
    var w = 0; var h = 0; var bitDepth = 0; var colorType = 0
    var interlaced = false
    var sawIhdr = false; var sawIend = false
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    while (pos + 8 <= a.length && !sawIend) {
      val len = be32(a, pos)
      if (len < 0 || len > Int.MaxValue - 12 ||
        pos + 12 + len > a.length) return null
      val l = len.toInt
      val typ = new String(a, pos + 4, 4, "US-ASCII")
      if (crc32(a, pos + 4, 4 + l) != be32(a, pos + 8 + l)) return null
      typ match {
        case "IHDR" =>
          if (sawIhdr || l != 13) return null
          sawIhdr = true
          val wL = be32(a, pos + 8); val hL = be32(a, pos + 12)
          bitDepth = u8(a, pos + 16); colorType = u8(a, pos + 17)
          val compression = u8(a, pos + 18)
          val filterMethod = u8(a, pos + 19)
          val interlace = u8(a, pos + 20)
          // bomb guard BEFORE sizing anything off these fields
          if (wL <= 0 || hL <= 0 || wL > MaxSide || hL > MaxSide ||
            wL * hL > MaxPixels) return null
          w = wL.toInt; h = hL.toInt
          if (bitDepth != 8 || channels(colorType) < 0 ||
            compression != 0 || filterMethod != 0 ||
            (interlace != 0 && interlace != 1))
            return null
          interlaced = interlace == 1
        case "PLTE" =>
          if (!sawIhdr || l % 3 != 0 || l > 768) return null
          palette = java.util.Arrays.copyOfRange(a, pos + 8, pos + 8 + l)
        case "IDAT" =>
          if (!sawIhdr) return null
          idat.write(a, pos + 8, l)
        case "IEND" => sawIend = true
        case _ => () // ancillary chunks skipped
      }
      pos += 12 + l
    }
    if (!sawIhdr || !sawIend) return null
    if (colorType == 3 && palette == null) return null
    val bpp = channels(colorType)
    val z = idat.toByteArray
    // the channel plane the luma pass reads: w*bpp-stride rows with NO
    // filter bytes. Sequential images unfilter in place and alias the
    // inflated buffer region-by-region; Adam7 scatters each pass there.
    var plane: Array[Byte] = null
    var planeRow = 0 // byte offset of row y = y * planeStride + planeOff
    var planeOff = 0
    if (!interlaced) {
      val stride = 1 + w * bpp
      val expect = stride.toLong * h
      if (expect > Int.MaxValue) return null
      val raw = Inflate.zlibInflate(z, 0, z.length, expect.toInt)
      if (raw == null || raw.length != expect.toInt) return null
      if (!unfilter(raw, 0, h, w * bpp, bpp)) return null
      plane = raw; planeRow = stride; planeOff = 1
    } else {
      // Adam7: seven independently-filtered sub-images, concatenated
      val expect = adam7Bytes(w, h, bpp)
      if (expect > Int.MaxValue) return null
      val raw = Inflate.zlibInflate(z, 0, z.length, expect.toInt)
      if (raw == null || raw.length != expect.toInt) return null
      val full = new Array[Byte](w * bpp * h)
      var off = 0
      var p = 0
      while (p < 7) {
        val x0 = Adam7(p)(0); val y0 = Adam7(p)(1)
        val dx = Adam7(p)(2); val dy = Adam7(p)(3)
        val wp = if (w > x0) (w - x0 + dx - 1) / dx else 0
        val hp = if (h > y0) (h - y0 + dy - 1) / dy else 0
        if (wp > 0 && hp > 0) {
          if (!unfilter(raw, off, hp, wp * bpp, bpp)) return null
          val passStride = 1 + wp * bpp
          var j = 0
          while (j < hp) {
            var i = 0
            while (i < wp) {
              val src = off + j * passStride + 1 + i * bpp
              val dst = (y0 + j * dy) * w * bpp + (x0 + i * dx) * bpp
              var c = 0
              while (c < bpp) { full(dst + c) = raw(src + c); c += 1 }
              i += 1
            }
            j += 1
          }
          off += hp * passStride
        }
        p += 1
      }
      plane = full; planeRow = w * bpp; planeOff = 0
    }
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = y * planeRow + planeOff + x * bpp
        val g = colorType match {
          case 0 | 4 => u8(plane, p)
          case 2 | 6 =>
            (u8(plane, p) + u8(plane, p + 1) + u8(plane, p + 2)) / 3
          case 3 =>
            val idx = u8(plane, p) * 3
            if (idx + 2 >= palette.length) return null
            (u8(palette, idx) + u8(palette, idx + 1) +
              u8(palette, idx + 2)) / 3
        }
        out(y * w + x) = g.toByte
        x += 1
      }
      y += 1
    }
    Gray(w, h, out)
  }

  /** Adam7 pass grid: (xStart, yStart, xStep, yStep) per pass
    * (RFC 2083 §2.6).
    */
  private val Adam7: Array[Array[Int]] = Array(
    Array(0, 0, 8, 8), Array(4, 0, 8, 8), Array(0, 4, 4, 8),
    Array(2, 0, 4, 4), Array(0, 2, 2, 4), Array(1, 0, 2, 2),
    Array(0, 1, 1, 2))

  /** Total filtered byte count of the seven Adam7 sub-images — empty
    * passes (zero columns or rows at this size) contribute nothing,
    * per spec.
    */
  private def adam7Bytes(w: Int, h: Int, bpp: Int): Long = {
    var total = 0L
    var p = 0
    while (p < 7) {
      val x0 = Adam7(p)(0); val y0 = Adam7(p)(1)
      val dx = Adam7(p)(2); val dy = Adam7(p)(3)
      val wp = if (w > x0) (w - x0 + dx - 1) / dx else 0
      val hp = if (h > y0) (h - y0 + dy - 1) / dy else 0
      if (wp > 0 && hp > 0) total += hp.toLong * (1L + wp.toLong * bpp)
      p += 1
    }
    total
  }

  /** In-place unfilter of one contiguous filtered sub-image: `rows`
    * scanlines of `1 + rowBytes` bytes starting at `off`. Filters
    * reference the PRIOR unfiltered row of the SAME sub-image (for
    * Adam7 each pass starts from a clean slate), so order matters.
    * False on an invalid filter type.
    */
  private def unfilter(raw: Array[Byte], off: Int, rows: Int,
      rowBytes: Int, bpp: Int): Boolean = {
    val stride = 1 + rowBytes
    var y = 0
    while (y < rows) {
      val rowOff = off + y * stride
      val ft = u8(raw, rowOff)
      if (ft > 4) return false
      var x = 0
      while (x < rowBytes) {
        val p = rowOff + 1 + x
        val left = if (x >= bpp) u8(raw, p - bpp) else 0
        val up = if (y > 0) u8(raw, p - stride) else 0
        val ul = if (y > 0 && x >= bpp) u8(raw, p - stride - bpp) else 0
        val recon = ft match {
          case 0 => u8(raw, p)
          case 1 => u8(raw, p) + left
          case 2 => u8(raw, p) + up
          case 3 => u8(raw, p) + ((left + up) >> 1)
          case 4 =>
            val pp = left + up - ul
            val pa = math.abs(pp - left)
            val pb = math.abs(pp - up)
            val pc = math.abs(pp - ul)
            val pred = if (pa <= pb && pa <= pc) left
              else if (pb <= pc) up else ul
            u8(raw, p) + pred
        }
        raw(p) = recon.toByte
        x += 1
      }
      y += 1
    }
    true
  }

  /** Filter one grayscale sub-image (`wp` × `hp`, bpp 1) into `raw`
    * at `off` as `hp` scanlines of `1 + wp` bytes; row `j` uses filter
    * `j % 5`, referencing the sub-image's OWN prior row — exactly what
    * [[unfilter]] inverts, for both the sequential whole-image case
    * and each Adam7 pass.
    */
  private def filterInto(sub: Array[Byte], wp: Int, hp: Int,
      raw: Array[Byte], off: Int): Unit = {
    val stride = 1 + wp
    var y = 0
    while (y < hp) {
      val ft = y % 5
      raw(off + y * stride) = ft.toByte
      var x = 0
      while (x < wp) {
        val cur = sub(y * wp + x) & 0xff
        val left = if (x > 0) sub(y * wp + x - 1) & 0xff else 0
        val up = if (y > 0) sub((y - 1) * wp + x) & 0xff else 0
        val ul = if (y > 0 && x > 0) sub((y - 1) * wp + x - 1) & 0xff else 0
        val enc = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - ((left + up) >> 1)
          case 4 =>
            val pp = left + up - ul
            val pa = math.abs(pp - left)
            val pb = math.abs(pp - up)
            val pc = math.abs(pp - ul)
            val pred = if (pa <= pb && pa <= pc) left
              else if (pb <= pc) up else ul
            cur - pred
        }
        raw(off + y * stride + 1 + x) = enc.toByte
        x += 1
      }
      y += 1
    }
  }

  /** Deterministic grayscale (color type 0, bit depth 8) encoder.
    * Row `y` uses filter `y % 5` — every filter kind round-trips
    * through [[decodeGray]] on every image taller than 4 rows.
    * `deflateMode`: 0 stored, 1 fixed-Huffman, 2 dynamic-Huffman
    * (all literal-only, so the byte stream is a pure function of the
    * pixels and any engine can replay it). `interlaced = true` emits
    * the Adam7 layout (seven pass sub-images, each filtered
    * independently) — same pixels, different wire order, so fixture
    * formulas stay container-blind.
    */
  def encodeGray(w: Int, h: Int, pix: Array[Byte],
      deflateMode: Int = 1, interlaced: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && w <= MaxSide && h <= MaxSide &&
      w.toLong * h <= MaxPixels, s"unsupported dims ${w}x$h")
    require(pix.length == w * h, "pixel buffer size mismatch")
    val raw =
      if (!interlaced) {
        val r = new Array[Byte]((1 + w) * h)
        filterInto(pix, w, h, r, 0)
        r
      } else {
        val r = new Array[Byte](adam7Bytes(w, h, 1).toInt)
        var off = 0
        var p = 0
        while (p < 7) {
          val x0 = Adam7(p)(0); val y0 = Adam7(p)(1)
          val dx = Adam7(p)(2); val dy = Adam7(p)(3)
          val wp = if (w > x0) (w - x0 + dx - 1) / dx else 0
          val hp = if (h > y0) (h - y0 + dy - 1) / dy else 0
          if (wp > 0 && hp > 0) {
            val sub = new Array[Byte](wp * hp)
            var j = 0
            while (j < hp) {
              var i = 0
              while (i < wp) {
                sub(j * wp + i) = pix((y0 + j * dy) * w + (x0 + i * dx))
                i += 1
              }
              j += 1
            }
            filterInto(sub, wp, hp, r, off)
            off += hp * (1 + wp)
          }
          p += 1
        }
        r
      }
    val deflated = deflateMode match {
      case 0 => Inflate.deflateStored(raw)
      case 1 => Inflate.deflateFixed(raw)
      case 2 => Inflate.deflateDynamic(raw)
      case _ => throw new IllegalArgumentException(
        s"deflateMode must be 0|1|2, got $deflateMode")
    }
    val idat = Inflate.zlibWrap(deflated, raw)
    val out = new java.io.ByteArrayOutputStream()
    Sig.foreach(out.write)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val l = data.length
      out.write(l >>> 24); out.write((l >>> 16) & 0xff)
      out.write((l >>> 8) & 0xff); out.write(l & 0xff)
      val body = typ.getBytes("US-ASCII") ++ data
      out.write(body, 0, body.length)
      val c = crc32(body, 0, body.length)
      out.write((c >>> 24).toInt); out.write(((c >>> 16) & 0xff).toInt)
      out.write(((c >>> 8) & 0xff).toInt); out.write((c & 0xff).toInt)
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = (w >>> 24).toByte; ihdr(1) = (w >>> 16).toByte
    ihdr(2) = (w >>> 8).toByte; ihdr(3) = w.toByte
    ihdr(4) = (h >>> 24).toByte; ihdr(5) = (h >>> 16).toByte
    ihdr(6) = (h >>> 8).toByte; ihdr(7) = h.toByte
    ihdr(8) = 8 // bit depth
    ihdr(9) = 0 // gray
    // compression 0, filter 0 already zeroed
    ihdr(12) = if (interlaced) 1 else 0
    chunk("IHDR", ihdr)
    chunk("IDAT", idat)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
