package graft.functions

/** GIF87a/89a pixel decode to a LUMA plane — the fourth and last
  * container of the [[ImageHeaders]] family to get REAL pixels
  * (BMP needs no codec, PNG/JPEG live in [[PngCodec]]/[[JpegCodec]]):
  * logical-screen + image-descriptor walk, global/local color tables,
  * full 12-bit LZW decompression (GIF's LSB-first variable-width
  * variant with CLEAR/END codes and deferred-clear tolerance), Adam7's
  * GIF cousin — 4-pass row interlacing — supported, extensions
  * skipped. Only the FIRST image frame decodes (animated GIFs
  * fingerprint by their first frame). Same crawl-grade contract as the
  * siblings: null on anything corrupt/truncated/oversized
  * (decode-bomb guard before any allocation), never an exception.
  *
  * Luma = `(r + g + b) / 3` integer division over the palette entry —
  * the shared formula, so one picture re-encoded across all four
  * containers lands on one dHash.
  *
  * The fixture ENCODER emits a 256-entry grayscale palette and
  * "uncompressed" LZW (a CLEAR before every dictionary-growth point,
  * the classic trick) — a pure function of the pixels any engine can
  * replay, while the decoder still exercises the real variable-width
  * code path.
  */
object GifCodec {

  final case class Gray(w: Int, h: Int, pix: Array[Byte])

  @inline private def u8(a: Array[Byte], i: Int): Int = a(i) & 0xff
  @inline private def le16(a: Array[Byte], i: Int): Int =
    u8(a, i) | (u8(a, i + 1) << 8)

  def decodeGray(a: Array[Byte]): Gray = {
    if (a == null || a.length < 13) return null
    if (a(0) != 'G' || a(1) != 'I' || a(2) != 'F' || a(3) != '8' ||
        (a(4) != '7' && a(4) != '9') || a(5) != 'a') return null
    var pos = 6
    pos += 4 // logical screen w/h (per-image descriptor governs)
    val gFlags = u8(a, pos); pos += 3 // flags, bg index, aspect
    var globalPalette: Array[Byte] = null
    if ((gFlags & 0x80) != 0) {
      val sz = 3 * (1 << ((gFlags & 7) + 1))
      if (pos + sz > a.length) return null
      globalPalette = java.util.Arrays.copyOfRange(a, pos, pos + sz)
      pos += sz
    }
    // block walk to the first image descriptor
    while (pos < a.length) {
      u8(a, pos) match {
        case 0x21 => // extension: label + sub-blocks
          pos += 2
          var sb = if (pos < a.length) u8(a, pos) else -1
          while (sb > 0) {
            pos += 1 + sb
            sb = if (pos < a.length) u8(a, pos) else -1
          }
          if (sb < 0) return null
          pos += 1 // terminator
        case 0x2c => // image descriptor
          if (pos + 10 > a.length) return null
          val w = le16(a, pos + 5)
          val h = le16(a, pos + 7)
          val iFlags = u8(a, pos + 9)
          pos += 10
          // decode-bomb guard BEFORE any allocation
          if (w <= 0 || h <= 0 || w > PngCodec.MaxSide ||
            h > PngCodec.MaxSide ||
            w.toLong * h > PngCodec.MaxPixels) return null
          var palette = globalPalette
          if ((iFlags & 0x80) != 0) {
            val sz = 3 * (1 << ((iFlags & 7) + 1))
            if (pos + sz > a.length) return null
            palette = java.util.Arrays.copyOfRange(a, pos, pos + sz)
            pos += sz
          }
          if (palette == null) return null
          val interlaced = (iFlags & 0x40) != 0
          if (pos >= a.length) return null
          val minCode = u8(a, pos); pos += 1
          if (minCode < 2 || minCode > 8) return null
          val idx = lzwDecode(a, pos, minCode, w * h)
          if (idx == null) return null
          val out = new Array[Byte](w * h)
          var i = 0
          while (i < w * h) {
            val p = idx(i) * 3
            if (p + 2 >= palette.length) return null
            val row = i / w
            val outRow = if (!interlaced) row else deinterlace(row, h)
            out(outRow * w + i % w) =
              ((u8(palette, p) + u8(palette, p + 1) +
                u8(palette, p + 2)) / 3).toByte
            i += 1
          }
          return Gray(w, h, out)
        case 0x3b => return null // trailer before any image
        case _ => return null
      }
    }
    null
  }

  /** GIF interlace pass order: rows 0,8,16.. then 4,12.. then 2,6,10..
    * then 1,3,5.. — map the i-th DECODED row to its screen row.
    */
  private def deinterlace(decodedRow: Int, h: Int): Int = {
    val p1 = (h + 7) / 8
    val p2 = (h + 3) / 8
    val p3 = (h + 1) / 4
    if (decodedRow < p1) decodedRow * 8
    else if (decodedRow < p1 + p2) 4 + (decodedRow - p1) * 8
    else if (decodedRow < p1 + p2 + p3) 2 + (decodedRow - p1 - p2) * 4
    else 1 + (decodedRow - p1 - p2 - p3) * 2
  }

  /** GIF LZW: LSB-first variable-width codes inside length-prefixed
    * sub-blocks; returns exactly `expect` palette indices or null.
    */
  private def lzwDecode(a: Array[Byte], start: Int, minCode: Int,
      expect: Int): Array[Int] = {
    // concatenate sub-blocks
    val data = new java.io.ByteArrayOutputStream()
    var pos = start
    var sb = if (pos < a.length) u8(a, pos) else -1
    while (sb > 0) {
      if (pos + 1 + sb > a.length) return null
      data.write(a, pos + 1, sb)
      pos += 1 + sb
      sb = if (pos < a.length) u8(a, pos) else -1
    }
    if (sb < 0) return null
    val d = data.toByteArray
    val clear = 1 << minCode
    val end = clear + 1
    // dictionary: prefix pointer + appended byte per code
    val maxCodes = 4096
    val prefix = new Array[Int](maxCodes)
    val append = new Array[Byte](maxCodes)
    val out = new Array[Int](expect)
    var outLen = 0
    var nextCode = end + 1
    var codeSize = minCode + 1
    var prev = -1
    var bitPos = 0L
    val endBits = d.length.toLong << 3
    def read(): Int = {
      if (bitPos + codeSize > endBits) return -1
      var v = 0
      var i = 0
      while (i < codeSize) {
        val bi = ((bitPos + i) >>> 3).toInt
        v |= ((d(bi) >> ((bitPos + i) & 7)) & 1) << i
        i += 1
      }
      bitPos += codeSize
      v
    }
    def emit(code: Int): Boolean = {
      // walk the chain into a stack, then emit in order
      var c = code
      var depth = 0
      while (c >= clear) { c = prefix(c); depth += 1 }
      if (outLen + depth + 1 > expect) return false
      var w = outLen + depth
      c = code
      while (c >= clear) { out(w) = append(c) & 0xff; w -= 1; c = prefix(c) }
      out(w) = c
      outLen += depth + 1
      true
    }
    def firstByte(code: Int): Int = {
      var c = code
      while (c >= clear) c = prefix(c)
      c
    }
    var done = false
    while (!done) {
      val code = read()
      if (code < 0) return null
      if (code == clear) {
        nextCode = end + 1
        codeSize = minCode + 1
        prev = -1
      } else if (code == end) {
        done = true
      } else if (prev == -1) {
        if (code >= clear) return null // first code must be a literal
        if (!emit(code)) return null
        prev = code
      } else {
        if (code > nextCode || (code >= nextCode && code >= maxCodes))
          return null
        val emitted =
          if (code == nextCode) {
            // KwKwK case: new entry = prev + firstByte(prev)
            if (nextCode >= maxCodes) return null
            prefix(nextCode) = prev
            append(nextCode) = firstByte(prev).toByte
            nextCode += 1
            emit(code)
          } else {
            if (nextCode < maxCodes) {
              prefix(nextCode) = prev
              append(nextCode) = firstByte(code).toByte
              nextCode += 1
            }
            emit(code)
          }
        if (!emitted) return null
        prev = code
        if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
      }
      if (outLen == expect && !done) {
        // tolerate a missing END code only if the stream is exhausted
        val nxt = read()
        if (nxt != end && nxt != -1) return null
        done = true
      }
    }
    if (outLen != expect) null else out
  }

  /** Deterministic grayscale encoder: 256-entry gray palette,
    * non-interlaced, "uncompressed" LZW (minCode 8, 9-bit codes, a
    * CLEAR every 254 literals so the dictionary never grows) — byte
    * stream is a pure function of the pixels.
    */
  def encodeGray(w: Int, h: Int, pix: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff &&
      w.toLong * h <= PngCodec.MaxPixels, s"unsupported dims ${w}x$h")
    require(pix.length == w * h, "pixel buffer size mismatch")
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int) = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(w); le16(h)
    out.write(0xf7) // global palette, 256 entries, 8-bit color res
    out.write(0); out.write(0)
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    out.write(0x2c) // image descriptor
    le16(0); le16(0); le16(w); le16(h)
    out.write(0) // no local palette, not interlaced
    out.write(8) // LZW min code size
    // 9-bit codes, LSB-first bit packing, buffered into <=255 sub-blocks
    val body = new java.io.ByteArrayOutputStream()
    var cur = 0L
    var nbits = 0
    def put(code: Int): Unit = {
      cur |= code.toLong << nbits
      nbits += 9
      while (nbits >= 8) {
        body.write((cur & 0xff).toInt)
        cur >>= 8
        nbits -= 8
      }
    }
    put(256) // initial CLEAR
    var run = 0
    i = 0
    while (i < pix.length) {
      put(pix(i) & 0xff)
      run += 1
      if (run == 254) { put(256); run = 0 } // keep codes at 9 bits
      i += 1
    }
    put(257) // END
    if (nbits > 0) body.write((cur & 0xff).toInt)
    val bytes = body.toByteArray
    var off = 0
    while (off < bytes.length) {
      val n = math.min(255, bytes.length - off)
      out.write(n)
      out.write(bytes, off, n)
      off += n
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }
}
