package graft.functions

/** FLAC (RFC 9639) sample decode plus a deterministic encoder for
  * fixture payloads — the audio sibling of [[PngCodec]]/[[JpegCodec]]:
  * real crawl audio is mostly FLAC/MP3, so a perceptual hash that only
  * reads PCM WAV is blind exactly where the image family was before
  * real pixel codecs landed. Decoding covers the full lossless layer:
  * CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32) subframes, Rice and
  * Rice2 residuals with partitions and escape codes, wasted bits, all
  * three stereo decorrelations (left/side, right/side, mid/side),
  * fixed and variable blocking, and both frame CRCs (CRC-8 header,
  * CRC-16 frame) verified.
  *
  * Decode contract (crawl-grade): null — never an exception, never an
  * unbounded allocation — on anything outside the envelope: corrupt
  * magic/CRC, truncated stream, reserved codes, declared-vs-decoded
  * sample count mismatch, or totals beyond the decode-bomb guard
  * ([[FlacCodec.MaxTotalSamples]], checked from STREAMINFO BEFORE any
  * decode work). Per-frame buffers are bounded by the 65535-sample
  * frame cap; whole-stream consumers (the envelope hash) accumulate in
  * O(1) via a sample sink, never materializing the recording.
  */
object FlacCodec {

  /** Decode-bomb guard: declared total inter-channel samples. */
  val MaxTotalSamples: Long = 1L << 28 // ~100 min of 44.1 kHz stereo
  val MaxBlockSamples: Int = 65535

  /** Per-frame sample sink: `frame(samples, channels, count)` receives
    * the decorrelated PCM of one frame, channel-interleaved is NOT
    * used — `samples(ch)(i)`.
    */
  trait Sink {
    def frame(samples: Array[Array[Int]], channels: Int, count: Int): Unit
  }

  final case class StreamInfo(minBlock: Int, maxBlock: Int, rate: Int,
      channels: Int, bits: Int, totalSamples: Long)

  // ---- bit reader (MSB first, bounds-checked) -----------------------

  private final class FBitReader(a: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0
    var broken = false
    def align(): Unit = { cur = 0; nbits = 0 }
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= a.length) { broken = true; return 0 }
        cur = a(pos) & 0xff
        pos += 1
        nbits = 8
      }
      nbits -= 1
      (cur >> nbits) & 1
    }
    /** n ≤ 32 unsigned bits. */
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** n ≤ 32 signed (two's complement) bits. */
    def sbits(n: Int): Int = {
      val v = bits(n)
      if (n == 0 || n == 32) v else (v << (32 - n)) >> (32 - n)
    }
    /** unary: count of 0 bits before the terminating 1. */
    def unary(max: Int): Int = {
      var q = 0
      while (q <= max) {
        if (bit() == 1) return q
        if (broken) return -1
        q += 1
      }
      -1 // quotient flood: corrupt
    }
  }

  // ---- CRCs (FLAC polynomials) --------------------------------------

  private val Crc8Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i
      var k = 0
      while (k < 8) {
        c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff
        k += 1
      }
      t(i) = c
      i += 1
    }
    t
  }
  private val Crc16Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 8
      var k = 0
      while (k < 8) {
        c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff
        else (c << 1) & 0xffff
        k += 1
      }
      t(i) = c
      i += 1
    }
    t
  }
  def crc8(a: Array[Byte], off: Int, len: Int): Int = {
    var c = 0
    var i = off
    while (i < off + len) { c = Crc8Table(c ^ (a(i) & 0xff)); i += 1 }
    c
  }
  def crc16(a: Array[Byte], off: Int, len: Int): Int = {
    var c = 0
    var i = off
    while (i < off + len) {
      c = ((c << 8) & 0xffff) ^ Crc16Table(((c >> 8) ^ (a(i) & 0xff)) & 0xff)
      i += 1
    }
    c
  }

  @inline private def u8(a: Array[Byte], i: Int): Int = a(i) & 0xff

  /** STREAMINFO from the leading bytes; null outside the envelope. */
  def streamInfo(a: Array[Byte]): StreamInfo = {
    if (a == null || a.length < 4 + 4 + 34) return null
    if (a(0) != 'f' || a(1) != 'L' || a(2) != 'a' || a(3) != 'C') return null
    if ((u8(a, 4) & 0x7f) != 0) return null // first block = STREAMINFO
    val b = 8
    val minBlock = (u8(a, b) << 8) | u8(a, b + 1)
    val maxBlock = (u8(a, b + 2) << 8) | u8(a, b + 3)
    val rate = (u8(a, b + 10) << 12) | (u8(a, b + 11) << 4) |
      (u8(a, b + 12) >> 4)
    val ch = ((u8(a, b + 12) >> 1) & 0x7) + 1
    val bits = (((u8(a, b + 12) & 1) << 4) | (u8(a, b + 13) >> 4)) + 1
    val total = ((u8(a, b + 13) & 0xf).toLong << 32) |
      ((u8(a, b + 14).toLong << 24) | (u8(a, b + 15) << 16) |
        (u8(a, b + 16) << 8) | u8(a, b + 17))
    if (rate <= 0 || minBlock < 16 || maxBlock < minBlock ||
      maxBlock > MaxBlockSamples) return null
    StreamInfo(minBlock, maxBlock, rate, ch, bits, total)
  }

  /** Decode every frame into `sink`; true on a complete, consistent
    * stream (exactly the declared sample count, CRCs green), false
    * otherwise. Never throws, never allocates beyond one frame.
    */
  def decode(a: Array[Byte], sink: Sink): Boolean = {
    val si = streamInfo(a)
    if (si == null) return false
    if (si.totalSamples <= 0 || si.totalSamples > MaxTotalSamples)
      return false
    if (si.channels < 1 || si.channels > 8) return false
    // metadata block walk to the first frame
    var pos = 4
    var last = false
    while (!last) {
      if (pos + 4 > a.length) return false
      last = (u8(a, pos) & 0x80) != 0
      val len = (u8(a, pos + 1) << 16) | (u8(a, pos + 2) << 8) |
        u8(a, pos + 3)
      pos += 4 + len
      if (pos > a.length) return false
    }
    val chBufs = Array.ofDim[Int](si.channels, si.maxBlock)
    var done = 0L
    while (done < si.totalSamples) {
      val n = decodeFrame(a, pos, si, chBufs)
      if (n <= 0) return false
      val count = n >> 32
      pos = (n & 0xffffffffL).toInt
      if (done + count > si.totalSamples) return false
      sink.frame(chBufs, si.channels, count.toInt)
      done += count
    }
    true
  }

  /** One frame at `pos` into `chBufs`; packs (count << 32 | nextPos) or
    * -1 on corruption.
    */
  private def decodeFrame(a: Array[Byte], pos: Int, si: StreamInfo,
      chBufs: Array[Array[Int]]): Long = {
    if (pos + 5 > a.length) return -1
    if (u8(a, pos) != 0xff || (u8(a, pos + 1) & 0xfc) != 0xf8) return -1
    // blocking strategy (bit 0 of byte 1) only changes the meaning of
    // the UTF-8 number below, which this decoder skips either way
    val bsCode = u8(a, pos + 2) >> 4
    val srCode = u8(a, pos + 2) & 0xf
    val chAsg = u8(a, pos + 3) >> 4
    val szCode = (u8(a, pos + 3) >> 1) & 0x7
    if ((u8(a, pos + 3) & 1) != 0) return -1 // reserved bit
    if (srCode == 15) return -1
    // channel count/assignment must agree with STREAMINFO
    val nCh = if (chAsg < 8) chAsg + 1 else 2
    if (chAsg > 10 || nCh != si.channels) return -1
    val bps = szCode match {
      case 0 => si.bits
      case 1 => 8
      case 2 => 12
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case 7 => 32
      case _ => return -1
    }
    if (bps != si.bits) return -1
    var p = pos + 4
    // UTF-8 coded frame/sample number: 1-7 bytes, value discarded
    if (p >= a.length) return -1
    val fb = u8(a, p)
    var extra = 0
    if ((fb & 0x80) != 0) {
      var mask = 0x40
      extra = 1
      while ((fb & mask) != 0 && extra < 7) { mask >>= 1; extra += 1 }
      if (extra == 1 || extra > 7) return -1 // 10xxxxxx lead is invalid
      extra -= 1
    }
    p += 1
    var i = 0
    while (i < extra) {
      if (p >= a.length || (u8(a, p) & 0xc0) != 0x80) return -1
      p += 1
      i += 1
    }
    val blockSize = bsCode match {
      case 0 => return -1
      case 1 => 192
      case c if c >= 2 && c <= 5 => 576 << (c - 2)
      case 6 =>
        if (p >= a.length) return -1
        val v = u8(a, p) + 1; p += 1; v
      case 7 =>
        if (p + 1 >= a.length) return -1
        val v = ((u8(a, p) << 8) | u8(a, p + 1)) + 1; p += 2; v
      case c => 256 << (c - 8)
    }
    if (blockSize > si.maxBlock || blockSize > MaxBlockSamples) return -1
    srCode match {
      case 12 => if (p >= a.length) return -1 else p += 1
      case 13 | 14 => if (p + 1 >= a.length) return -1 else p += 2
      case _ => ()
    }
    if (p >= a.length) return -1
    if (crc8(a, pos, p - pos) != u8(a, p)) return -1
    p += 1
    val br = new FBitReader(a, p)
    var ch = 0
    while (ch < si.channels) {
      // side channels carry one extra bit
      val extraBit = chAsg match {
        case 8 => if (ch == 1) 1 else 0 // left/side
        case 9 => if (ch == 0) 1 else 0 // right/side
        case 10 => if (ch == 1) 1 else 0 // mid/side
        case _ => 0
      }
      if (!decodeSubframe(br, chBufs(ch), blockSize, bps + extraBit))
        return -1
      ch += 1
    }
    if (br.broken) return -1
    // stereo decorrelation
    chAsg match {
      case 8 => // left/side: right = left - side
        var i2 = 0
        while (i2 < blockSize) {
          chBufs(1)(i2) = chBufs(0)(i2) - chBufs(1)(i2); i2 += 1
        }
      case 9 => // right/side: left = side + right
        var i2 = 0
        while (i2 < blockSize) {
          val s = chBufs(0)(i2)
          chBufs(0)(i2) = s + chBufs(1)(i2)
          i2 += 1
        }
      case 10 => // mid/side
        var i2 = 0
        while (i2 < blockSize) {
          val side = chBufs(1)(i2)
          val mid = (chBufs(0)(i2) << 1) | (side & 1)
          chBufs(0)(i2) = (mid + side) >> 1
          chBufs(1)(i2) = (mid - side) >> 1
          i2 += 1
        }
      case _ => ()
    }
    br.align()
    // frame CRC-16 over everything from the sync word
    if (br.pos + 2 > a.length) return -1
    val want = (u8(a, br.pos) << 8) | u8(a, br.pos + 1)
    if (crc16(a, pos, br.pos - pos) != want) return -1
    (blockSize.toLong << 32) | (br.pos + 2)
  }

  private def decodeSubframe(br: FBitReader, out: Array[Int],
      n: Int, bps: Int): Boolean = {
    if (br.bit() != 0) return false // zero padding bit
    val tpe = br.bits(6)
    var wasted = 0
    if (br.bit() == 1) {
      // unary count: wasted = zeros + 1
      val q = br.unary(32)
      if (q < 0) return false
      wasted = q + 1
    }
    if (br.broken) return false
    val width = bps - wasted
    if (width <= 0 || width > 32) return false
    val ok =
      if (tpe == 0) { // CONSTANT
        val v = br.sbits(width)
        if (br.broken) return false
        java.util.Arrays.fill(out, 0, n, v)
        true
      } else if (tpe == 1) { // VERBATIM
        var i = 0
        while (i < n) {
          out(i) = br.sbits(width)
          i += 1
        }
        !br.broken
      } else if (tpe >= 8 && tpe <= 12) { // FIXED, order 0-4
        val order = tpe & 7
        if (order > n) return false
        var i = 0
        while (i < order) { out(i) = br.sbits(width); i += 1 }
        if (br.broken) return false
        if (!decodeResidual(br, out, n, order)) return false
        // fixed polynomial predictors (RFC 9639 §9.2.3)
        i = order
        while (i < n) {
          val pred = order match {
            case 0 => 0L
            case 1 => out(i - 1).toLong
            case 2 => 2L * out(i - 1) - out(i - 2)
            case 3 => 3L * out(i - 1) - 3L * out(i - 2) + out(i - 3)
            case _ => 4L * out(i - 1) - 6L * out(i - 2) +
              4L * out(i - 3) - out(i - 4)
          }
          out(i) = (out(i) + pred).toInt
          i += 1
        }
        true
      } else if (tpe >= 32) { // LPC, order 1-32
        val order = (tpe & 31) + 1
        if (order > n) return false
        var i = 0
        while (i < order) { out(i) = br.sbits(width); i += 1 }
        val precM1 = br.bits(4)
        if (precM1 == 15 || br.broken) return false
        val prec = precM1 + 1
        val shift = br.sbits(5)
        if (shift < 0) return false
        val coefs = new Array[Int](order)
        i = 0
        while (i < order) { coefs(i) = br.sbits(prec); i += 1 }
        if (br.broken) return false
        if (!decodeResidual(br, out, n, order)) return false
        i = order
        while (i < n) {
          var s = 0L
          var j = 0
          while (j < order) { s += coefs(j).toLong * out(i - 1 - j); j += 1 }
          out(i) = (out(i) + (s >> shift)).toInt
          i += 1
        }
        true
      } else false // reserved types
    if (!ok) return false
    if (wasted > 0) {
      var i = 0
      while (i < n) { out(i) = out(i) << wasted; i += 1 }
    }
    true
  }

  /** Rice/Rice2 residual into out(order until n) as RAW residual values
    * (prediction applied by the caller).
    */
  private def decodeResidual(br: FBitReader, out: Array[Int],
      n: Int, order: Int): Boolean = {
    val method = br.bits(2)
    if (method > 1 || br.broken) return false
    val paramBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 15 else 31
    val po = br.bits(4)
    if (br.broken) return false
    val parts = 1 << po
    if (n % parts != 0) return false
    val perPart = n / parts
    var p = 0
    var idx = order
    while (p < parts) {
      val count = if (p == 0) perPart - order else perPart
      if (count < 0) return false
      val param = br.bits(paramBits)
      if (br.broken) return false
      if (param == escape) { // raw fallback partition
        val rawBits = br.bits(5)
        if (br.broken) return false
        var i = 0
        while (i < count) {
          out(idx) = if (rawBits == 0) 0 else br.sbits(rawBits)
          idx += 1
          i += 1
        }
        if (br.broken) return false
      } else {
        var i = 0
        while (i < count) {
          val q = br.unary(1 << 24) // quotient flood guard
          if (q < 0) return false
          val rem = if (param == 0) 0 else br.bits(param)
          if (br.broken) return false
          val u = (q.toLong << param) | rem
          out(idx) = ((u >>> 1) ^ -(u & 1L)).toInt
          idx += 1
          i += 1
        }
      }
      p += 1
    }
    true
  }

  // ---- encode side (deterministic fixture payloads) -----------------

  private final class FBitWriter(out: java.io.ByteArrayOutputStream) {
    private var cur = 0
    private var nbits = 0
    def put(v: Long, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1L).toInt
        nbits += 1
        if (nbits == 8) { out.write(cur); cur = 0; nbits = 0 }
        i -= 1
      }
    }
    def alignZero(): Unit = if (nbits > 0) put(0, 8 - nbits)
  }

  /** Encode interleaved PCM as FLAC. `mode` picks the subframe coding
    * (0 VERBATIM, 1 FIXED order-2 + Rice, 2 LPC order-2 `[2, -1]`
    * shift 0 + Rice — numerically identical to FIXED-2 but through the
    * LPC decode path, 3 CONSTANT where a block is constant, FIXED-2
    * otherwise); `stereoMode` the decorrelation (0 independent,
    * 1 left/side, 2 mid/side, 3 right/side; `channels == 2` only).
    * Deterministic: the byte stream is a pure function of the inputs.
    */
  def encode(samples: Array[Int], channels: Int, rate: Int,
      bits: Int = 16, mode: Int = 1, stereoMode: Int = 0): Array[Byte] = {
    require(channels == 1 || channels == 2, s"channels $channels")
    require(bits == 16, "fixture encoder is 16-bit")
    require(samples.length % channels == 0, "interleave mismatch")
    require(mode >= 0 && mode <= 3, s"mode $mode")
    require(stereoMode >= 0 && stereoMode <= 3 &&
      (channels == 2 || stereoMode == 0), s"stereoMode $stereoMode")
    val total = samples.length / channels
    // >= 16 so the declared STREAMINFO min block size (clamped to the
    // spec's 16-sample floor) never exceeds an emitted frame — a
    // shorter single-frame stream would be self-consistent for THIS
    // decoder but carry out-of-spec metadata a strict external decoder
    // may reject. FlacEncodeExpr null-guards before calling.
    require(total >= 16 && total <= MaxTotalSamples, "sample count")
    require(rate > 0 && rate < (1 << 20), s"rate $rate")
    val blockMax = 4096
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO (last metadata block), md5 zeroed (readers tolerate)
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    val lastBlock = total % blockMax
    val minB = if (total <= blockMax) total
      else if (lastBlock == 0) blockMax else math.min(blockMax, lastBlock)
    val maxB = math.min(total, blockMax)
    def be16(v: Int): Unit = { out.write(v >> 8); out.write(v & 0xff) }
    be16(math.max(16, minB)); be16(math.max(16, maxB))
    out.write(0); out.write(0); out.write(0) // min frame size: unknown
    out.write(0); out.write(0); out.write(0) // max frame size: unknown
    // rate(20) | ch-1(3) | bps-1(5) | total(36)
    val packed = (rate.toLong << 44) | ((channels - 1).toLong << 41) |
      ((bits - 1).toLong << 36) | total.toLong
    var s = 56
    while (s >= 0) { out.write(((packed >> s) & 0xff).toInt); s -= 8 }
    var i = 0
    while (i < 16) { out.write(0); i += 1 } // md5: unset
    // frames
    var frameIdx = 0L
    var off = 0
    while (off < total) {
      val n = math.min(blockMax, total - off)
      encodeFrame(out, samples, channels, off, n, frameIdx, mode,
        stereoMode)
      off += n
      frameIdx += 1
    }
    out.toByteArray
  }

  private def encodeFrame(out: java.io.ByteArrayOutputStream,
      samples: Array[Int], channels: Int, off: Int, n: Int,
      frameIdx: Long, mode: Int, stereoMode: Int): Unit = {
    val buf = new java.io.ByteArrayOutputStream()
    // header: sync+fixed blocking, blocksize code 7 (16 bit at end),
    // rate from STREAMINFO, bps 16 (code 4)
    buf.write(0xff); buf.write(0xf8)
    val chAsg = if (channels == 1) 0
      else stereoMode match {
        case 0 => 1; case 1 => 8; case 2 => 10; case _ => 9
      }
    buf.write((7 << 4) | 0) // blocksize: 16-bit at end; rate: streaminfo
    buf.write((chAsg << 4) | (4 << 1)) // bps code 4 = 16
    // UTF-8 frame number
    if (frameIdx < 0x80) buf.write(frameIdx.toInt)
    else if (frameIdx < 0x800) {
      buf.write(0xc0 | (frameIdx >> 6).toInt)
      buf.write(0x80 | (frameIdx & 0x3f).toInt)
    } else {
      buf.write(0xe0 | (frameIdx >> 12).toInt)
      buf.write(0x80 | ((frameIdx >> 6) & 0x3f).toInt)
      buf.write(0x80 | (frameIdx & 0x3f).toInt)
    }
    buf.write((n - 1) >> 8); buf.write((n - 1) & 0xff)
    val head = buf.toByteArray
    buf.write(crc8(head, 0, head.length))
    // channel planes after decorrelation
    val planes = new Array[Array[Int]](channels)
    if (channels == 1) {
      planes(0) = java.util.Arrays.copyOfRange(samples, off, off + n)
    } else {
      val l = new Array[Int](n); val r = new Array[Int](n)
      var i = 0
      while (i < n) {
        l(i) = samples((off + i) * 2)
        r(i) = samples((off + i) * 2 + 1)
        i += 1
      }
      stereoMode match {
        case 0 => planes(0) = l; planes(1) = r
        case 1 => // left/side
          planes(0) = l
          planes(1) = Array.tabulate(n)(i2 => l(i2) - r(i2))
        case 2 => // mid/side
          planes(0) = Array.tabulate(n)(i2 => (l(i2) + r(i2)) >> 1)
          planes(1) = Array.tabulate(n)(i2 => l(i2) - r(i2))
        case _ => // right/side
          planes(0) = Array.tabulate(n)(i2 => l(i2) - r(i2))
          planes(1) = r
      }
    }
    val bw = new FBitWriter(buf)
    var ch = 0
    while (ch < channels) {
      val extraBit = chAsg match {
        case 8 | 10 => if (ch == 1) 1 else 0
        case 9 => if (ch == 0) 1 else 0
        case _ => 0
      }
      encodeSubframe(bw, planes(ch), n, 16 + extraBit, mode)
      ch += 1
    }
    bw.alignZero()
    val body = buf.toByteArray
    buf.write(crc16(body, 0, body.length) >> 8)
    buf.write(crc16(body, 0, body.length) & 0xff)
    buf.writeTo(out)
  }

  private def encodeSubframe(bw: FBitWriter, v: Array[Int], n: Int,
      width: Int, mode: Int): Unit = {
    @inline def rawW(x: Int, wd: Int): Unit =
      bw.put(x.toLong & ((1L << wd) - 1), wd)
    def residualRice(arr: Array[Int], order: Int): Unit = {
      // method 0 (4-bit params), partition order 0, one fitted param
      @inline def predAt(i: Int): Long = order match {
        case 0 => 0L
        case 1 => arr(i - 1).toLong
        case _ => 2L * arr(i - 1) - arr(i - 2)
      }
      var maxU = 0L
      var i = order
      while (i < n) {
        val r = arr(i) - predAt(i)
        val u = (r << 1) ^ (r >> 63)
        if (u > maxU) maxU = u
        i += 1
      }
      val k = math.min(14,
        math.max(0, 64 - java.lang.Long.numberOfLeadingZeros(maxU) - 4))
      bw.put(0, 2) // method 0
      bw.put(0, 4) // partition order 0
      bw.put(k, 4)
      i = order
      while (i < n) {
        val r = arr(i) - predAt(i)
        val u = (r << 1) ^ (r >> 63)
        val q = (u >>> k).toInt
        bw.put(0, q); bw.put(1, 1) // unary quotient
        if (k > 0) bw.put(u & ((1L << k) - 1), k)
        i += 1
      }
    }
    val constant = n > 0 && v.forall(_ == v(0))
    val m = if (mode == 3 && constant) -1 else if (mode == 3) 1 else mode
    bw.put(0, 1) // zero pad
    m match {
      case -1 => // CONSTANT
        bw.put(0, 6); bw.put(0, 1) // type 0, no wasted bits
        rawW(v(0), width)
      case 0 => // VERBATIM
        bw.put(1, 6); bw.put(0, 1)
        var i = 0
        while (i < n) { rawW(v(i), width); i += 1 }
      case 1 => // FIXED order 2 (order ≤ n falls back to order 0)
        // wasted-bits detection (the real-encoder behavior on shifted
        // PCM): common trailing zero bits leave the subframe, coded as
        // flag + unary(k-1), samples carried k bits narrower
        var kw = 0
        if (v.exists(_ != 0)) {
          kw = 32
          var i = 0
          while (i < n && kw > 0) {
            if (v(i) != 0)
              kw = math.min(kw, Integer.numberOfTrailingZeros(v(i)))
            i += 1
          }
          kw = math.min(kw, width - 1)
        }
        val sv = if (kw == 0) v else v.map(_ >> kw)
        val wd = width - kw
        val order = math.min(2, n)
        bw.put(8 | order, 6)
        if (kw == 0) bw.put(0, 1)
        else { // flag, then k-1 zeros and the terminating 1 (unary)
          bw.put(1, 1)
          if (kw > 1) bw.put(0, kw - 1)
          bw.put(1, 1)
        }
        var i = 0
        while (i < order) { rawW(sv(i), wd); i += 1 }
        residualRice(sv, order)
      case _ => // LPC order 2, coefs [2, -1], shift 0 ≡ FIXED-2 math
        val order = math.min(2, n)
        if (order < 2) { // tiny block: fixed fallback
          bw.put(8 | order, 6); bw.put(0, 1)
          var i = 0
          while (i < order) { rawW(v(i), width); i += 1 }
          residualRice(v, order)
        } else {
          bw.put(32 | (order - 1), 6); bw.put(0, 1)
          rawW(v(0), width); rawW(v(1), width)
          bw.put(14, 4) // precision 15
          bw.put(0, 5) // shift 0
          bw.put(2L & 0x7fff, 15) // coef 2
          bw.put((-1L) & 0x7fff, 15) // coef -1
          residualRice(v, 2)
        }
    }
  }
}
