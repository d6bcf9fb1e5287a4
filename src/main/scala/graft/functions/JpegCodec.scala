package graft.functions

/** Baseline JPEG (ITU T.81) LUMA decode — Huffman entropy decode,
  * dequantization and 8×8 IDCT of the first (luma) component — plus a
  * deterministic encoder for fixture payloads. The real-codec leg of
  * the perceptual near-dup pipeline next to [[PngCodec]]: JPEG is the
  * dominant container of any crawl, and dHash only needs the luma
  * plane, so chroma blocks are entropy-decoded (the bitstream must
  * advance) but never IDCT'd — at corpus scale that skips ~2/3 of the
  * inverse-transform work on 4:4:4 and all chroma upsampling.
  *
  * Decode envelope (null outside it, never an exception): baseline and
  * extended-sequential Huffman (SOF0/SOF1), 8-bit precision, 1-4
  * components, any legal sampling factors, restart intervals,
  * single-scan interleaved or single-component scans. Progressive
  * (SOF2), arithmetic coding, hierarchical and 12-bit streams return
  * null, as does anything failing the decode-bomb guard
  * ([[JpegCodec.MaxPixels]], checked at SOF BEFORE any plane is
  * allocated).
  *
  * Exactness contract for oracle replay: with an all-8s quantization
  * table a constant 8×8 block holds a single DC coefficient
  * `8·(c−128)`, quantizes losslessly to `c−128`, and the IDCT
  * reproduces `c` on every pixel bit-exactly (the error terms are
  * ~1e-13, far under the final round) — so a block-constant fixture's
  * decoded pixels are a pure arithmetic function any SQL engine
  * re-derives without a codec.
  */
object JpegCodec {

  /** Decode-bomb guard, shared shape with [[PngCodec]]. */
  val MaxSide: Int = 1 << 16
  val MaxPixels: Int = 1 << 22

  final case class Gray(w: Int, h: Int, pix: Array[Byte])

  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // cos((2x+1) u pi / 16) table for the separable IDCT/FDCT
  private val Cos: Array[Double] = {
    val t = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) {
        t(x * 8 + u) = StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16)
        u += 1
      }
      x += 1
    }
    t
  }
  private val InvSqrt2 = 1.0 / StrictMath.sqrt(2.0)

  /** Canonical JPEG Huffman table from DHT BITS/HUFFVAL. */
  private final class JHuff(bits: Array[Int], vals: Array[Int]) {
    val counts: Array[Int] = bits // counts(l-1) codes of length l
    val symbols: Array[Int] = vals
    require(bits.length == 16 && bits.sum == vals.length)
  }

  private final class BitReader(a: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0
    var broken = false
    /** byte-align and drop buffered bits (restart boundaries). */
    def align(): Unit = { cur = 0; nbits = 0 }
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= a.length) { broken = true; return 0 }
        var b = a(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= a.length) { broken = true; return 0 }
          val n = a(pos) & 0xff
          if (n == 0) pos += 1 // stuffed byte
          else { // a real marker inside entropy data: stream over
            pos -= 1
            broken = true
            b = 0
            return 0
          }
        }
        cur = b
        nbits = 8
      }
      nbits -= 1
      (cur >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def decode(h: JHuff): Int = {
      var code = 0; var first = 0; var index = 0
      var l = 0
      while (l < 16) {
        code = (code << 1) | bit()
        if (broken) return -1
        val cnt = h.counts(l)
        if (code - first < cnt) return h.symbols(index + code - first)
        index += cnt
        first = (first + cnt) << 1
        l += 1
      }
      -1
    }
  }

  @inline private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private final class Component {
    var id = 0
    var h = 1; var v = 1
    var tq = 0
    var dcTab = 0; var acTab = 0
    var pred = 0
    var plane: Array[Int] = null // luma only
    var planeW = 0; var planeH = 0
  }

  /** Decode to a row-major luma plane; null outside the envelope. */
  def decodeLuma(a: Array[Byte]): Gray = {
    if (a == null || a.length < 4) return null
    if ((a(0) & 0xff) != 0xff || (a(1) & 0xff) != 0xd8) return null
    val quant = Array.ofDim[Int](4, 64)
    val quantSeen = new Array[Boolean](4)
    val dcTabs = new Array[JHuff](4)
    val acTabs = new Array[JHuff](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var pos = 2
    var sofSeen = false

    def u8(i: Int) = a(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)

    while (pos + 4 <= a.length) {
      if (u8(pos) != 0xff) return null
      var m = u8(pos + 1)
      while (m == 0xff && pos + 2 < a.length) { pos += 1; m = u8(pos + 1) }
      if (m == 0xd9) return null // EOI before any scan completed
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { pos += 2 }
      else {
        if (pos + 3 >= a.length) return null
        val segLen = be16(pos + 2)
        if (segLen < 2 || pos + 2 + segLen > a.length) return null
        val p = pos + 4
        m match {
          case 0xdb => // DQT: one or more tables
            var q = p
            while (q < pos + 2 + segLen) {
              val pq = u8(q) >> 4
              val tq = u8(q) & 0x0f
              if (tq > 3 || pq > 1) return null
              val step = if (pq == 0) 1 else 2
              if (q + 1 + 64 * step > pos + 2 + segLen) return null
              var i = 0
              while (i < 64) {
                quant(tq)(Zigzag(i)) =
                  if (pq == 0) u8(q + 1 + i)
                  else be16(q + 1 + 2 * i)
                i += 1
              }
              quantSeen(tq) = true
              q += 1 + 64 * step
            }
          case 0xc4 => // DHT: one or more tables
            var q = p
            while (q < pos + 2 + segLen) {
              val tc = u8(q) >> 4
              val th = u8(q) & 0x0f
              if (tc > 1 || th > 3) return null
              if (q + 17 > pos + 2 + segLen) return null
              val bits = Array.tabulate(16)(i => u8(q + 1 + i))
              val n = bits.sum
              if (n > 256 || q + 17 + n > pos + 2 + segLen) return null
              val vals = Array.tabulate(n)(i => u8(q + 17 + i))
              val tab = new JHuff(bits, vals)
              if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
              q += 17 + n
            }
          case 0xc0 | 0xc1 => // SOF0 baseline / SOF1 extended sequential
            if (sofSeen) return null
            sofSeen = true
            if (u8(p) != 8) return null // 8-bit precision only
            h = be16(p + 1); w = be16(p + 3)
            // decode-bomb guard BEFORE any plane allocation
            if (w <= 0 || h <= 0 || w > MaxSide || h > MaxSide ||
              w.toLong * h > MaxPixels) return null
            val nc = u8(p + 5)
            if (nc < 1 || nc > 4 || segLen != 8 + 3 * nc) return null
            comps = Array.fill(nc)(new Component)
            var i = 0
            while (i < nc) {
              val c = comps(i)
              c.id = u8(p + 6 + 3 * i)
              c.h = u8(p + 7 + 3 * i) >> 4
              c.v = u8(p + 7 + 3 * i) & 0x0f
              c.tq = u8(p + 8 + 3 * i)
              if (c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 || c.tq > 3)
                return null
              i += 1
            }
          case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
              0xcd | 0xce | 0xcf =>
            return null // progressive / arithmetic / hierarchical
          case 0xdd => // DRI
            if (segLen != 4) return null
            restartInterval = be16(p)
          case 0xda => // SOS: decode the scan, then we are done
            if (!sofSeen || comps == null) return null
            val ns = u8(p)
            if (ns < 1 || ns > comps.length ||
              segLen != 6 + 2 * ns) return null
            val scanComps = new Array[Component](ns)
            var i = 0
            while (i < ns) {
              val cid = u8(p + 1 + 2 * i)
              val ci = comps.indexWhere(_.id == cid)
              if (ci < 0) return null
              scanComps(i) = comps(ci)
              scanComps(i).dcTab = u8(p + 2 + 2 * i) >> 4
              scanComps(i).acTab = u8(p + 2 + 2 * i) & 0x0f
              i += 1
            }
            // this decoder is single-scan: the scan must cover every
            // frame component (or be the one-component special case)
            if (ns != comps.length && ns != 1) return null
            return decodeScan(a, pos + 2 + segLen, w, h, comps,
              scanComps, quant, quantSeen, dcTabs, acTabs,
              restartInterval)
          case _ => () // APPn / COM / others: skip by length
        }
        pos += 2 + segLen
      }
    }
    null
  }

  private def decodeScan(
      a: Array[Byte], scanStart: Int, w: Int, h: Int,
      comps: Array[Component], scanComps: Array[Component],
      quant: Array[Array[Int]], quantSeen: Array[Boolean],
      dcTabs: Array[JHuff], acTabs: Array[JHuff],
      restartInterval: Int): Gray = {
    val luma = comps(0)
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val interleaved = scanComps.length > 1
    // per-component sample dims
    val lumaW = (w * luma.h + hmax - 1) / hmax
    val lumaH = (h * luma.v + vmax - 1) / vmax
    luma.planeW = lumaW
    luma.planeH = lumaH
    luma.plane = new Array[Int](lumaW * lumaH)
    for (c <- scanComps) {
      if (!quantSeen(c.tq)) return null
      if (dcTabs(c.dcTab) == null || acTabs(c.acTab) == null) return null
      c.pred = 0
    }
    val br = new BitReader(a, scanStart)
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)

    def decodeBlock(c: Component): Boolean = {
      java.util.Arrays.fill(coef, 0)
      val dcSym = br.decode(dcTabs(c.dcTab))
      if (dcSym < 0 || dcSym > 15) return false
      val diff = extend(br.bits(dcSym), dcSym)
      if (br.broken) return false
      c.pred += diff
      coef(0) = c.pred
      var k = 1
      while (k < 64) {
        val rs = br.decode(acTabs(c.acTab))
        if (rs < 0) return false
        val r = rs >> 4
        val s = rs & 0x0f
        if (s == 0) {
          if (r == 15) k += 16 // ZRL
          else k = 64 // EOB
        } else {
          k += r
          if (k > 63) return false
          coef(Zigzag(k)) = extend(br.bits(s), s)
          if (br.broken) return false
          k += 1
        }
      }
      true
    }

    def idctToPlane(c: Component, bx: Int, by: Int): Unit = {
      val q = quant(c.tq)
      // rows then columns, double precision
      var i = 0
      while (i < 64) { tmp(i) = coef(i).toDouble * q(i); i += 1 }
      val rowOut = new Array[Double](64)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var s = 0.0
          var u = 0
          while (u < 8) {
            val cu = if (u == 0) InvSqrt2 else 1.0
            s += cu * tmp(y * 8 + u) * Cos(x * 8 + u)
            u += 1
          }
          rowOut(y * 8 + x) = s / 2.0
          x += 1
        }
        y += 1
      }
      var x = 0
      while (x < 8) {
        var yy = 0
        while (yy < 8) {
          var s = 0.0
          var v = 0
          while (v < 8) {
            val cv = if (v == 0) InvSqrt2 else 1.0
            s += cv * rowOut(v * 8 + x) * Cos(yy * 8 + v)
            v += 1
          }
          val px = bx * 8 + x
          val py = by * 8 + yy
          if (px < c.planeW && py < c.planeH) {
            val smp = StrictMath.round(s / 2.0).toInt + 128
            c.plane(py * c.planeW + px) =
              if (smp < 0) 0 else if (smp > 255) 255 else smp
          }
          yy += 1
        }
        x += 1
      }
    }

    var mcusDone = 0
    def restartCheck(): Boolean = {
      if (restartInterval > 0 && mcusDone % restartInterval == 0) {
        br.align()
        // expect an RST marker (tolerate the stream simply continuing
        // only if it really is an RSTn; anything else is corruption)
        if (br.pos + 1 >= a.length) return false
        if ((a(br.pos) & 0xff) != 0xff) return false
        val mk = a(br.pos + 1) & 0xff
        if (mk < 0xd0 || mk > 0xd7) return false
        br.pos += 2
        br.broken = false
        scanComps.foreach(_.pred = 0)
      }
      true
    }

    if (interleaved) {
      val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
      val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          if (mcusDone > 0 && !restartCheck()) return null
          var ci = 0
          while (ci < scanComps.length) {
            val c = scanComps(ci)
            var by = 0
            while (by < c.v) {
              var bx = 0
              while (bx < c.h) {
                if (!decodeBlock(c)) return null
                if (c eq luma)
                  idctToPlane(c, mx * c.h + bx, my * c.v + by)
                bx += 1
              }
              by += 1
            }
            ci += 1
          }
          mcusDone += 1
          mx += 1
        }
        my += 1
      }
    } else {
      val c = scanComps(0)
      val cw = (w * c.h + hmax - 1) / hmax
      val ch = (h * c.v + vmax - 1) / vmax
      val bxN = (cw + 7) / 8
      val byN = (ch + 7) / 8
      var by = 0
      while (by < byN) {
        var bx = 0
        while (bx < bxN) {
          if (mcusDone > 0 && !restartCheck()) return null
          if (!decodeBlock(c)) return null
          if (c eq luma) idctToPlane(c, bx, by)
          mcusDone += 1
          bx += 1
        }
        by += 1
      }
      if (c ne luma) return null // luma-less scan cannot produce pixels
    }

    // nearest-neighbor upsample the luma plane to full resolution when
    // luma itself is subsampled (rare but legal)
    val out = new Array[Byte](w * h)
    if (lumaW == w && lumaH == h) {
      var i = 0
      while (i < w * h) { out(i) = luma.plane(i).toByte; i += 1 }
    } else {
      var y = 0
      while (y < h) {
        val sy = math.min(lumaH - 1, y * luma.v / vmax)
        var x = 0
        while (x < w) {
          val sx = math.min(lumaW - 1, x * luma.h / hmax)
          out(y * w + x) = luma.plane(sy * lumaW + sx).toByte
          x += 1
        }
        y += 1
      }
    }
    Gray(w, h, out)
  }

  // ---- encode side (deterministic fixture payloads) ----------------

  // compact valid Huffman specs (encoder and decoder both read them
  // from the DHT segment, so only validity matters, not Annex-K parity)
  private val EncDcBits: Array[Int] =
    Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val EncDcVals: Array[Int] = Array.tabulate(12)(identity)
  private val EncAcBits: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0)
  private val EncAcVals: Array[Int] =
    0x00 +: 0xf0 +: (for (r <- 0 until 16; s <- 1 to 10)
      yield (r << 4) | s).toArray

  private def canonicalCodes(
      bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var vi = 0
    val m = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    var l = 1
    while (l <= 16) {
      var c = 0
      while (c < bits(l - 1)) {
        m(vals(vi)) = (code, l)
        code += 1
        vi += 1
        c += 1
      }
      code <<= 1
      l += 1
    }
    m.toMap
  }

  private final class JBitWriter(out: java.io.ByteArrayOutputStream) {
    private var cur = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        cur = (cur << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(cur)
          if (cur == 0xff) out.write(0x00) // byte stuffing
          cur = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** pad with 1-bits to a byte boundary (T.81 F.1.2.3). */
    def flush(): Unit =
      if (nbits > 0) put(0xff, 8 - nbits) // low bits all ones
  }

  @inline private def category(v: Int): Int =
    32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Encode a gray plane as baseline JPEG with an all-8s quant table
    * (the lossless-DC configuration the Scaladoc contract describes).
    * `color = true` emits 3 components with CONSTANT chroma (Cb = Cr =
    * 128 → all-zero blocks), pixel-identical luma; `subsample = true`
    * (implies color) uses 2×2 luma sampling (4:2:0 MCU layout);
    * `restartInterval > 0` emits DRI + RSTn markers. All variants
    * decode to the same luma plane, so one fixture formula exercises
    * every decoder path.
    */
  def encodeGray(w: Int, h: Int, pix: Array[Byte], color: Boolean = false,
      subsample: Boolean = false, restartInterval: Int = 0): Array[Byte] = {
    // side limits matter independently of the pixel budget: SOF stores
    // width/height as 16-bit fields, so w or h above 65535 would emit
    // a silently corrupt header (the bytes are masked to 8 bits each)
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff &&
      w.toLong * h <= MaxPixels, s"unsupported dims ${w}x$h")
    require(pix.length == w * h, "pixel buffer size mismatch")
    val useColor = color || subsample
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def segment(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val l = body.length + 2
      out.write(l >> 8); out.write(l & 0xff)
      body.foreach(b => out.write(b & 0xff))
    }
    marker(0xd8) // SOI
    segment(0xdb, 0 +: Array.fill(64)(8)) // DQT: table 0, all 8s
    val (yh, yv) = if (subsample) (2, 2) else (1, 1)
    val ncomp = if (useColor) 3 else 1
    val sofBody = Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, ncomp) ++
      (1 to ncomp).flatMap { cid =>
        val (ch, cv) = if (cid == 1) (yh, yv) else (1, 1)
        Seq(cid, (ch << 4) | cv, 0)
      }
    segment(0xc0, sofBody)
    segment(0xc4, (0x00 +: EncDcBits) ++ EncDcVals) // DHT DC 0
    segment(0xc4, (0x10 +: EncAcBits) ++ EncAcVals) // DHT AC 0
    if (restartInterval > 0)
      segment(0xdd, Array(restartInterval >> 8, restartInterval & 0xff))
    segment(0xda,
      ncomp +: ((1 to ncomp).flatMap(cid => Seq(cid, 0x00)) ++
        Seq(0, 63, 0)).toArray)

    val dcCodes = canonicalCodes(EncDcBits, EncDcVals)
    val acCodes = canonicalCodes(EncAcBits, EncAcVals)
    val bw = new JBitWriter(out)
    val preds = new Array[Int](3)

    // FDCT + quantize (q = 8) one 8x8 block whose top-left pixel sits
    // at (px, py); out-of-image samples replicate the nearest edge
    val coef = new Array[Int](64)
    def fdctBlock(px: Int, py: Int): Unit = {
      val f = new Array[Double](64)
      var y = 0
      while (y < 8) {
        val sy = math.min(h - 1, py + y)
        var x = 0
        while (x < 8) {
          val sx = math.min(w - 1, px + x)
          f(y * 8 + x) = (pix(sy * w + sx) & 0xff) - 128.0
          x += 1
        }
        y += 1
      }
      // separable FDCT: rows then columns (1024 multiplies per block
      // instead of the direct form's 4096 — this encoder is the hot
      // loop of every codec fixture gate). Constant blocks still
      // quantize exactly: the DC chain is exact sums, and the AC
      // residues stay ~1e-13 under any summation order.
      val rowPass = new Array[Double](64)
      var y3 = 0
      while (y3 < 8) {
        var u = 0
        while (u < 8) {
          var s = 0.0
          var x = 0
          while (x < 8) { s += f(y3 * 8 + x) * Cos(x * 8 + u); x += 1 }
          rowPass(y3 * 8 + u) = s
          u += 1
        }
        y3 += 1
      }
      var u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          var s = 0.0
          var y2 = 0
          while (y2 < 8) { s += rowPass(y2 * 8 + u) * Cos(y2 * 8 + v); y2 += 1 }
          val cu = if (u == 0) InvSqrt2 else 1.0
          val cv = if (v == 0) InvSqrt2 else 1.0
          coef(v * 8 + u) = StrictMath.round(0.25 * cu * cv * s / 8.0).toInt
          v += 1
        }
        u += 1
      }
    }

    def emitBlock(ci: Int, constantZero: Boolean): Unit = {
      if (constantZero) java.util.Arrays.fill(coef, 0)
      val diff = coef(0) - preds(ci)
      preds(ci) = coef(0)
      val s = category(diff)
      val (dc, dl) = dcCodes(s)
      bw.put(dc, dl)
      if (s > 0)
        bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      var k = 1
      var run = 0
      while (k < 64) {
        val v = coef(Zigzag(k))
        if (v == 0) run += 1
        else {
          while (run > 15) {
            val (z, zl) = acCodes(0xf0); bw.put(z, zl); run -= 16
          }
          val sz = category(v)
          val (c, cl) = acCodes((run << 4) | sz)
          bw.put(c, cl)
          bw.put(if (v < 0) v + (1 << sz) - 1 else v, sz)
          run = 0
        }
        k += 1
      }
      if (run > 0) { val (e, el) = acCodes(0x00); bw.put(e, el) }
    }

    val mcusX = (w + 8 * yh - 1) / (8 * yh)
    val mcusY = (h + 8 * yv - 1) / (8 * yv)
    var mcusDone = 0
    var rstIdx = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcusDone > 0 &&
          mcusDone % restartInterval == 0) {
          bw.flush()
          marker(0xd0 + (rstIdx % 8))
          rstIdx += 1
          java.util.Arrays.fill(preds, 0)
        }
        var by = 0
        while (by < yv) {
          var bx = 0
          while (bx < yh) {
            fdctBlock((mx * yh + bx) * 8, (my * yv + by) * 8)
            emitBlock(0, constantZero = false)
            bx += 1
          }
          by += 1
        }
        if (useColor) { // constant-128 chroma: all-zero blocks
          emitBlock(1, constantZero = true)
          emitBlock(2, constantZero = true)
        }
        mcusDone += 1
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }
}
