package graft.functions

/** RFC 1951 DEFLATE decompression (stored, fixed-Huffman and
  * dynamic-Huffman blocks) plus the RFC 1950 zlib framing — the
  * codec-free inflate a PNG pixel decode needs
  * ([[PngCodec]]; reference semantics: the perceptual-dedup stage of a
  * crawl curation pipeline, cf. `/root/reference` which has no media
  * surface at all). Hand-rolled rather than `java.util.zip` so the
  * byte-walk is bounded and null-on-garbage: a 100 TB crawl scan must
  * treat a corrupt cell as data, never as an exception or an
  * unbounded allocation.
  *
  * Every decode takes `maxOut`, the hard output cap checked BEFORE and
  * DURING buffer growth (decode-bomb guard: a tiny stream may declare
  * gigabytes); overflow returns null like any other corruption.
  *
  * The tiny ENCODE helpers (stored / fixed-Huffman / one canonical
  * dynamic-Huffman layout, all literal-only) exist for the
  * deterministic-fixture path ([[PngCodec.encodeGray]]): a
  * literal-only stream is byte-exact replayable by any engine, which
  * is what lets a DuckDB oracle re-derive a gate's pixels
  * arithmetically while the Spark side really inflates.
  */
object Inflate {

  /** zlib (RFC 1950) wrapper: 2-byte header check, raw inflate, adler32
    * verify. Null on any malformation.
    */
  def zlibInflate(a: Array[Byte], off: Int, len: Int,
      maxOut: Int): Array[Byte] = {
    if (a == null || len < 6 || off < 0 || off + len > a.length) return null
    val cmf = a(off) & 0xff
    val flg = a(off + 1) & 0xff
    if ((cmf & 0x0f) != 8) return null // CM must be deflate
    if ((flg & 0x20) != 0) return null // preset dictionary unsupported
    if ((cmf * 256 + flg) % 31 != 0) return null // header checksum
    val out = rawInflate(a, off + 2, len - 6, maxOut)
    if (out == null) return null
    // trailer: adler32 of the decompressed bytes, big-endian
    val t = off + len - 4
    val stored = ((a(t) & 0xffL) << 24) | ((a(t + 1) & 0xffL) << 16) |
      ((a(t + 2) & 0xffL) << 8) | (a(t + 3) & 0xffL)
    if (adler32(out) != stored) null else out
  }

  def adler32(data: Array[Byte]): Long = {
    var s1 = 1L; var s2 = 0L
    var i = 0
    while (i < data.length) {
      s1 += data(i) & 0xff
      s2 += s1
      // 5552 is the largest n with no 32-bit overflow between mods
      if ((i & 0xfff) == 0xfff) { s1 %= 65521; s2 %= 65521 }
      i += 1
    }
    (((s2 % 65521) << 16) | (s1 % 65521)) & 0xffffffffL
  }

  // length codes 257..285: (base, extra bits)
  private val LenBase = Array(3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17,
    19, 23, 27, 31, 35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227,
    258)
  private val LenExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2,
    2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0)
  // distance codes 0..29
  private val DistBase = Array(1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49,
    65, 97, 129, 193, 257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097,
    6145, 8193, 12289, 16385, 24577)
  private val DistExtra = Array(0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5,
    6, 6, 7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13)
  // dynamic-header code-length symbol order
  private val ClOrder = Array(16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4,
    12, 3, 13, 2, 14, 1, 15)

  private val FixedLitLens: Array[Int] = {
    val l = new Array[Int](288)
    var i = 0
    while (i < 288) {
      l(i) = if (i < 144) 8 else if (i < 256) 9 else if (i < 280) 7 else 8
      i += 1
    }
    l
  }
  private val FixedDistLens: Array[Int] = Array.fill(30)(5)

  /** Canonical Huffman decode table: `(count(len), symbolsByCode)`.
    * Null when the lengths are not a valid (sub-)Kraft code.
    */
  private final class Huff(lens: Array[Int]) {
    val counts = new Array[Int](16)
    var ok = true
    locally {
      var i = 0
      while (i < lens.length) {
        if (lens(i) < 0 || lens(i) > 15) ok = false
        else if (lens(i) > 0) counts(lens(i)) += 1
        i += 1
      }
      // over-subscribed codes are invalid; incomplete allowed only for
      // the degenerate distance case, checked by the caller via `full`
      var left = 1
      var l = 1
      while (l <= 15 && ok) {
        left = (left << 1) - counts(l)
        if (left < 0) ok = false
        l += 1
      }
    }
    val full: Boolean = ok && {
      var left = 1; var l = 1
      while (l <= 15) { left = (left << 1) - counts(l); l += 1 }
      left == 0
    }
    val symbols: Array[Int] = {
      val offs = new Array[Int](16)
      var l = 1
      while (l < 15) { offs(l + 1) = offs(l) + counts(l); l += 1 }
      val s = new Array[Int](lens.count(_ > 0))
      var i = 0
      while (i < lens.length) {
        if (lens(i) > 0) { s(offs(lens(i))) = i; offs(lens(i)) += 1 }
        i += 1
      }
      s
    }
  }

  /** Raw RFC 1951 inflate of `len` bytes at `off`; trailing garbage
    * after the final block is tolerated (the zlib caller owns the
    * trailer). Null on corruption or output > `maxOut`.
    */
  def rawInflate(a: Array[Byte], off: Int, len: Int,
      maxOut: Int): Array[Byte] = {
    if (a == null || off < 0 || len < 0 || off + len > a.length ||
      maxOut < 0) return null
    val end = off + len
    var bitPos = off.toLong << 3 // absolute bit cursor, LSB-first
    val endBits = end.toLong << 3
    var out = new Array[Byte](math.min(maxOut, math.max(64, len * 4)))
    var outLen = 0

    def bits(n: Int): Int = {
      if (bitPos + n > endBits) return -1
      var v = 0
      var i = 0
      while (i < n) {
        val byteI = (bitPos >>> 3).toInt
        v |= (((a(byteI) >> (bitPos & 7)) & 1) << i)
        bitPos += 1
        i += 1
      }
      v
    }
    def decode(h: Huff): Int = {
      // canonical walk: one bit at a time, MSB-first code assembly
      var code = 0; var first = 0; var index = 0
      var l = 1
      while (l <= 15) {
        if (bitPos >= endBits) return -1
        val byteI = (bitPos >>> 3).toInt
        code |= (a(byteI) >> (bitPos & 7)) & 1
        bitPos += 1
        val count = h.counts(l)
        if (code - first < count) return h.symbols(index + code - first)
        index += count
        first = (first + count) << 1
        code <<= 1
        l += 1
      }
      -1
    }
    def ensure(n: Int): Boolean = {
      if (outLen + n > maxOut) return false
      if (outLen + n > out.length) {
        val grown = math.min(maxOut.toLong,
          math.max(out.length.toLong * 2, outLen.toLong + n)).toInt
        out = java.util.Arrays.copyOf(out, grown)
      }
      true
    }
    def inflateBlock(lit: Huff, dist: Huff): Boolean = {
      while (true) {
        val sym = decode(lit)
        if (sym < 0) return false
        if (sym == 256) return true
        if (sym < 256) {
          if (!ensure(1)) return false
          out(outLen) = sym.toByte
          outLen += 1
        } else {
          if (sym > 285) return false
          val lenSym = sym - 257
          val eb = LenExtra(lenSym)
          val ev = if (eb == 0) 0 else bits(eb)
          if (ev < 0) return false
          val runLen = LenBase(lenSym) + ev
          if (dist == null) return false
          val dSym = decode(dist)
          if (dSym < 0 || dSym > 29) return false
          val db = DistExtra(dSym)
          val dv = if (db == 0) 0 else bits(db)
          if (dv < 0) return false
          val d = DistBase(dSym) + dv
          if (d > outLen) return false
          if (!ensure(runLen)) return false
          var i = 0
          while (i < runLen) { // byte-wise: distances may overlap
            out(outLen) = out(outLen - d)
            outLen += 1
            i += 1
          }
        }
      }
      true
    }

    var fin = false
    while (!fin) {
      val bf = bits(1)
      if (bf < 0) return null
      fin = bf == 1
      bits(2) match {
        case 0 => // stored: byte-align, LEN/NLEN, raw copy
          bitPos = (bitPos + 7) & ~7L
          val p = (bitPos >>> 3).toInt
          if (p + 4 > end) return null
          val blen = (a(p) & 0xff) | ((a(p + 1) & 0xff) << 8)
          val nlen = (a(p + 2) & 0xff) | ((a(p + 3) & 0xff) << 8)
          if ((blen ^ 0xffff) != nlen) return null
          if (p + 4 + blen > end) return null
          if (!ensure(blen)) return null
          System.arraycopy(a, p + 4, out, outLen, blen)
          outLen += blen
          bitPos = (p + 4 + blen).toLong << 3
        case 1 =>
          val lit = new Huff(FixedLitLens)
          val dst = new Huff(FixedDistLens)
          if (!inflateBlock(lit, dst)) return null
        case 2 =>
          val hlit = bits(5); val hdist = bits(5); val hclen = bits(4)
          if (hclen < 0) return null
          val nLit = hlit + 257; val nDist = hdist + 1
          if (nLit > 286 || nDist > 30) return null
          val clLens = new Array[Int](19)
          var i = 0
          while (i < hclen + 4) {
            val v = bits(3)
            if (v < 0) return null
            clLens(ClOrder(i)) = v
            i += 1
          }
          val cl = new Huff(clLens)
          if (!cl.ok || !cl.full) return null
          val lens = new Array[Int](nLit + nDist)
          var n = 0
          while (n < nLit + nDist) {
            val sym = decode(cl)
            if (sym < 0) return null
            if (sym < 16) { lens(n) = sym; n += 1 }
            else if (sym == 16) {
              if (n == 0) return null
              val r = bits(2); if (r < 0) return null
              val prev = lens(n - 1)
              var j = 0
              while (j < r + 3) {
                if (n >= lens.length) return null
                lens(n) = prev; n += 1; j += 1
              }
            } else {
              val (eb, base) = if (sym == 17) (3, 3) else (7, 11)
              val r = bits(eb); if (r < 0) return null
              var j = 0
              while (j < r + base) {
                if (n >= lens.length) return null
                lens(n) = 0; n += 1; j += 1
              }
            }
          }
          val litLens = java.util.Arrays.copyOfRange(lens, 0, nLit)
          val distLens = java.util.Arrays.copyOfRange(lens, nLit,
            nLit + nDist)
          if (litLens(256) == 0) return null // EOB must be codable
          val lit = new Huff(litLens)
          if (!lit.ok || !lit.full) return null
          val dCount = distLens.count(_ > 0)
          // all-zero / single-code distance tables are the legal
          // literal-only degenerate forms
          val dst = if (dCount == 0) null else new Huff(distLens)
          if (dst != null && !dst.ok) return null
          if (dst != null && dCount > 1 && !dst.full) return null
          if (!inflateBlock(lit, dst)) return null
        case _ => return null // BTYPE 3 reserved
      }
    }
    java.util.Arrays.copyOf(out, outLen)
  }

  // ---- encode side (fixture-grade, literal-only) -------------------

  private final class BitWriter {
    private var buf = new Array[Byte](256)
    private var bitLen = 0L
    private def put(bit: Int): Unit = {
      val byteI = (bitLen >>> 3).toInt
      if (byteI >= buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)
      if (bit != 0) buf(byteI) = (buf(byteI) | (1 << (bitLen & 7))).toByte
      bitLen += 1
    }
    /** extra-bits / header fields: LSB first */
    def writeBits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) { put((v >> i) & 1); i += 1 }
    }
    /** Huffman codes: MSB of the code first (RFC 1951 §3.1.1) */
    def writeCode(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { put((code >> i) & 1); i -= 1 }
    }
    def alignByte(): Unit = bitLen = (bitLen + 7) & ~7L
    def writeByte(b: Int): Unit = writeBits(b & 0xff, 8)
    def toBytes: Array[Byte] =
      java.util.Arrays.copyOf(buf, ((bitLen + 7) >>> 3).toInt)
  }

  private def canonicalCodes(lens: Array[Int]): Array[Int] = {
    val counts = new Array[Int](16)
    lens.foreach(l => if (l > 0) counts(l) += 1)
    val next = new Array[Int](16)
    var code = 0
    var l = 1
    while (l <= 15) {
      code = (code + counts(l - 1)) << 1
      next(l) = code
      l += 1
    }
    lens.map { ln =>
      if (ln == 0) 0
      else { val c = next(ln); next(ln) += 1; c }
    }
  }

  /** deflate as stored (BTYPE 00) blocks. */
  def deflateStored(data: Array[Byte]): Array[Byte] = {
    val w = new BitWriter
    var i = 0
    do {
      val n = math.min(65535, data.length - i)
      w.writeBits(if (i + n >= data.length) 1 else 0, 1)
      w.writeBits(0, 2)
      w.alignByte()
      w.writeByte(n); w.writeByte(n >> 8)
      w.writeByte(n ^ 0xff); w.writeByte((n >> 8) ^ 0xff)
      var j = 0
      while (j < n) { w.writeByte(data(i + j)); j += 1 }
      i += n
    } while (i < data.length)
    w.toBytes
  }

  /** deflate as ONE fixed-Huffman block, literals only. */
  def deflateFixed(data: Array[Byte]): Array[Byte] = {
    val codes = canonicalCodes(FixedLitLens)
    val w = new BitWriter
    w.writeBits(1, 1) // BFINAL
    w.writeBits(1, 2) // fixed
    var i = 0
    while (i < data.length) {
      val s = data(i) & 0xff
      w.writeCode(codes(s), FixedLitLens(s))
      i += 1
    }
    w.writeCode(codes(256), FixedLitLens(256))
    w.toBytes
  }

  /** deflate as ONE dynamic-Huffman block, literals only, with the
    * fixed canonical layout 255×len-8 + {255,256}×len-9 (Kraft-exact)
    * — exists to exercise the dynamic-header decode path with a
    * deterministic, engine-replayable stream.
    */
  def deflateDynamic(data: Array[Byte]): Array[Byte] = {
    val litLens = Array.tabulate(257)(i => if (i >= 255) 9 else 8)
    val litCodes = canonicalCodes(litLens)
    // code-length alphabet: symbols {0, 8, 9, 16}, all length 2
    // (Kraft-exact: 4 * 2^-2 = 1)
    val clLens = new Array[Int](19)
    clLens(0) = 2; clLens(8) = 2; clLens(9) = 2; clLens(16) = 2
    val clCodes = canonicalCodes(clLens)
    val w = new BitWriter
    w.writeBits(1, 1) // BFINAL
    w.writeBits(2, 2) // dynamic
    w.writeBits(0, 5) // HLIT: 257 codes
    w.writeBits(0, 5) // HDIST: 1 (its length is 0 -> literal-only)
    w.writeBits(15, 4) // HCLEN: all 19 CL entries present
    ClOrder.foreach(s => w.writeBits(clLens(s), 3))
    // literal lengths: "8" once, then 16-repeats covering 254 more,
    // then "9" twice
    w.writeCode(clCodes(8), clLens(8))
    var remaining = 254
    while (remaining > 0) {
      val take = math.min(6, remaining)
      if (take < 3) { // too small for a repeat: emit plain "8"s
        var j = 0
        while (j < take) { w.writeCode(clCodes(8), clLens(8)); j += 1 }
        remaining -= take
      } else {
        w.writeCode(clCodes(16), clLens(16))
        w.writeBits(take - 3, 2)
        remaining -= take
      }
    }
    w.writeCode(clCodes(9), clLens(9))
    w.writeCode(clCodes(9), clLens(9))
    // the single distance entry: length 0, never used
    w.writeCode(clCodes(0), clLens(0))
    var i = 0
    while (i < data.length) {
      val s = data(i) & 0xff
      w.writeCode(litCodes(s), litLens(s))
      i += 1
    }
    w.writeCode(litCodes(256), litLens(256))
    w.toBytes
  }

  /** zlib-frame a raw deflate stream (header 0x78 0x01 + adler32). */
  def zlibWrap(deflated: Array[Byte], raw: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](deflated.length + 6)
    out(0) = 0x78; out(1) = 0x01
    System.arraycopy(deflated, 0, out, 2, deflated.length)
    val ad = adler32(raw)
    val t = deflated.length + 2
    out(t) = (ad >>> 24).toByte; out(t + 1) = (ad >>> 16).toByte
    out(t + 2) = (ad >>> 8).toByte; out(t + 3) = ad.toByte
    out
  }
}
