package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MP4/ISO-BMFF keyframe extraction — the content-level half of video
  * near-dup next to [[VideoHeaders]]' metadata walk: the REAL sample
  * tables (ISO 14496-12 §8.5-8.6: `stsd` codec entry, `stsz` sample
  * sizes, `stsc` sample-to-chunk runs, `stco`/`co64` chunk offsets,
  * `stss` sync-sample list) locate the first k SYNC samples of the
  * first JPEG-coded video track, and their byte ranges slice straight
  * out of the payload. Those frames are ordinary JPEG streams, so they
  * feed the EXISTING [[JpegCodec]] → dHash → band-join machinery —
  * video near-dup stops being byte-shingle-only: two MP4s of the same
  * footage (different timescale, dimensions metadata, chunking) pair
  * through their decoded keyframe pictures, and pair with bare JPEG
  * stills of the same picture.
  *
  * Absent `stss` means every sample is sync (§8.6.2 — the MJPEG
  * shape: all-intra). The walk never inspects sample CONTENT, only
  * the tables; all reads are bounds-checked and any violation —
  * truncated box, offset past the payload, non-JPEG codec, version-1
  * boxes where only version 0 is modeled — yields NULL, the same
  * never-throw 100 TB-scan contract as every decoder in this package.
  *
  * The encoder builds the same structure deterministically (ftyp +
  * mdat + moov with a single `jpeg` VisualSampleEntry track, one
  * sample per chunk, optional explicit sync list) — the fixture
  * builder that makes the decode side load-bearing in gates, exactly
  * like [[FlacCodec.encode]]/[[JpegCodec.encodeGray]].
  */
object Mp4Codec {

  /** Encoder-side bound only (a fixture never needs more frames).
    * The DECODE walk has no sample-count cap: the tables are lazy
    * random-access views, so locating sync sample #k costs work
    * proportional to that sample's table position — and every
    * variable-length table is bounded by its box's byte length, i.e.
    * by the payload itself (a 65k-sample ≈ 43-minute recording, or a
    * 10^6-sample one, resolves keyframe 1 in a handful of reads).
    */
  val MaxSamples: Int = 1 << 16

  @inline private def u8(a: Array[Byte], i: Int): Int = a(i) & 0xff
  @inline private def be16(a: Array[Byte], i: Int): Int =
    (u8(a, i) << 8) | u8(a, i + 1)
  @inline private def be32(a: Array[Byte], i: Int): Long =
    (u8(a, i).toLong << 24) | (u8(a, i + 1) << 16) |
      (u8(a, i + 2) << 8) | u8(a, i + 3)
  @inline private def be64(a: Array[Byte], i: Int): Long =
    (be32(a, i) << 32) | be32(a, i + 4)
  @inline private def tag(a: Array[Byte], i: Int, s: String): Boolean =
    a.length >= i + 4 && a(i) == s.charAt(0).toByte &&
      a(i + 1) == s.charAt(1).toByte && a(i + 2) == s.charAt(2).toByte &&
      a(i + 3) == s.charAt(3).toByte

  /** Scan sibling boxes in [from, until) for `name`; returns (content
    * offset, content end) or null. Same guards as
    * [[VideoHeaders.findBox]]: size < 8 or overflow → null.
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

  /** LAZY view over the first JPEG-coded video track's sample tables.
    * stsz/stco/co64/stsc/stss are flat fixed-width arrays inside
    * their boxes, so every entry is one bounds-pre-checked O(1) read
    * into the payload — nothing materializes, and the cost of
    * locating a sample is proportional to its table position, never
    * to the declared sample count. Per-entry VALUE validation
    * (positive sizes, in-range offsets, ascending runs/sync ids)
    * happens at access time on exactly the entries the walk touches;
    * any violation surfaces as null from [[keyframes]].
    */
  private final class Tables(
    val a: Array[Byte],
    val uniform: Int,   // != 0: every sample this size (no size array)
    val stszData: Int,  // offset of the per-sample 32-bit size array
    val n: Long,        // declared sample count
    val coData: Int, val wide: Boolean, val nChunks: Int,
    val stscData: Int, val nRuns: Int,
    val stssData: Int, val nSync: Int) { // nSync -1 = absent: all sync
    def size(i: Int): Long =
      if (uniform != 0) uniform.toLong else be32(a, stszData + 4 * i)
    def chunkOffset(c: Int): Long =
      if (wide) be64(a, coData + 8 * c) else be32(a, coData + 4 * c)
    def runFirst(r: Int): Long = be32(a, stscData + 12 * r)
    def runPer(r: Int): Long = be32(a, stscData + 4 + 12 * r)
    def sync(i: Int): Long = be32(a, stssData + 4 * i)
  }

  /** Parse the first `jpeg`/`mjpa` track's tables; null if none or
    * malformed.
    */
  private def tables(a: Array[Byte]): Tables = {
    if (a == null || a.length < 16 || !tag(a, 4, "ftyp")) return null
    val moov = findBox(a, 0, a.length, "moov")
    if (moov == null) return null
    var toff = moov(0)
    while (toff + 8 <= moov(1)) {
      val size = be32(a, toff)
      if (size < 8 || toff + size > Int.MaxValue) return null
      if (tag(a, toff + 4, "trak")) {
        val end = math.min(moov(1), (toff + size).toInt)
        val t = trackTables(a, toff + 8, end)
        if (t != null) return t
      }
      toff += size.toInt
    }
    null
  }

  private def trackTables(a: Array[Byte], from: Int, until: Int): Tables = {
    val mdia = findBox(a, from, until, "mdia")
    if (mdia == null) return null
    val minf = findBox(a, mdia(0), mdia(1), "minf")
    if (minf == null) return null
    val stbl = findBox(a, minf(0), minf(1), "stbl")
    if (stbl == null) return null
    // stsd: version/flags, entry_count, first entry (size + format)
    val stsd = findBox(a, stbl(0), stbl(1), "stsd")
    if (stsd == null || stsd(0) + 16 > stsd(1)) return null
    if (be32(a, stsd(0)) != 0 || be32(a, stsd(0) + 4) < 1) return null
    val fmtOff = stsd(0) + 12
    if (!tag(a, fmtOff, "jpeg") && !tag(a, fmtOff, "mjpa")) return null
    // stsz: header checks only — the size array stays in place
    val stsz = findBox(a, stbl(0), stbl(1), "stsz")
    if (stsz == null || stsz(0) + 12 > stsz(1) ||
      be32(a, stsz(0)) != 0) return null
    val uniform = be32(a, stsz(0) + 4)
    val n = be32(a, stsz(0) + 8)
    if (n <= 0) return null
    if (uniform != 0) {
      if (uniform > a.length) return null
    } else {
      // the size array must physically fit its box — this bounds n by
      // the payload's own byte length, no artificial cap needed
      if (stsz(0) + 12 + 4L * n > stsz(1)) return null
    }
    // stco / co64: header checks; offsets read lazily
    val stco = findBox(a, stbl(0), stbl(1), "stco")
    val co64 = if (stco == null) findBox(a, stbl(0), stbl(1), "co64")
      else null
    val wide = stco == null
    val co = if (wide) co64 else stco
    if (co == null || co(0) + 8 > co(1) || be32(a, co(0)) != 0) return null
    val nc = be32(a, co(0) + 4)
    val step = if (wide) 8 else 4
    if (nc <= 0 || co(0) + 8 + step.toLong * nc > co(1) ||
      nc > Int.MaxValue) return null
    // stsc: header checks; runs read lazily during the walk
    val stsc = findBox(a, stbl(0), stbl(1), "stsc")
    if (stsc == null || stsc(0) + 8 > stsc(1) ||
      be32(a, stsc(0)) != 0) return null
    val nr = be32(a, stsc(0) + 4)
    if (nr <= 0 || stsc(0) + 8 + 12L * nr > stsc(1)) return null
    // stss (optional: absent = every sample is sync, §8.6.2)
    val stss = findBox(a, stbl(0), stbl(1), "stss")
    var stssData = -1
    var ns = -1L
    if (stss != null) {
      if (stss(0) + 8 > stss(1) || be32(a, stss(0)) != 0) return null
      ns = be32(a, stss(0) + 4)
      if (ns < 0 || stss(0) + 8 + 4L * ns > stss(1)) return null
      stssData = stss(0) + 8
    }
    new Tables(a, if (uniform != 0) uniform.toInt else 0,
      stsz(0) + 12, n, co(0) + 8, wide, nc.toInt,
      stsc(0) + 8, nr.toInt, stssData, ns.toInt)
  }

  /** Absolute byte range of 0-based sample `s`: walk the stsc runs to
    * the covering chunk (validating exactly the runs touched), then
    * the within-chunk size prefix — CLOSED FORM for uniform sizes, a
    * loop bounded by the size array's byte length otherwise. -1 on
    * any inconsistency.
    */
  private def sampleOffset(t: Tables, s: Long): Long = {
    var r = 0
    var firstSampleOfRun = 0L
    var prevFirst = 0L
    while (r < t.nRuns) {
      val f = t.runFirst(r)
      val p = t.runPer(r)
      if (f <= prevFirst || f > t.nChunks || p <= 0 || p > t.n)
        return -1L
      val nextFirst =
        if (r + 1 < t.nRuns) t.runFirst(r + 1) else t.nChunks + 1L
      if (nextFirst <= f) return -1L
      val runSamples = (nextFirst - f) * p
      if (s < firstSampleOfRun + runSamples) {
        val rel = s - firstSampleOfRun
        val chunk = f - 1 + rel / p
        if (chunk >= t.nChunks) return -1L
        var off = t.chunkOffset(chunk.toInt)
        if (off < 0 || off > t.a.length) return -1L
        if (t.uniform != 0) {
          off += (rel % p) * t.uniform
        } else {
          // s fits an Int here: non-uniform n is bounded by the size
          // array's box bytes (n <= payload/4)
          var i = (s - rel % p).toInt
          while (i < s) {
            val sz = t.size(i)
            if (sz <= 0 || sz > t.a.length) return -1L
            off += sz
            i += 1
          }
        }
        return off
      }
      firstSampleOfRun += runSamples
      prevFirst = f
      r += 1
    }
    -1L
  }

  /** First `maxFrames` sync-sample payloads of the first JPEG video
    * track; null if the payload is not such an MP4 (or any table is
    * malformed / out of bounds). Each element is a complete JPEG
    * stream sliced from `mdat` by the tables — content untouched.
    * Work is proportional to the LAST requested sync sample's table
    * position, never the declared sample count.
    */
  def keyframes(a: Array[Byte], maxFrames: Int): Array[Array[Byte]] = {
    val t = tables(a)
    if (t == null) return null
    val syncCount: Long = if (t.nSync < 0) t.n else t.nSync.toLong
    val k = math.min(maxFrames.toLong, syncCount).toInt
    if (k <= 0) return null
    val out = new Array[Array[Byte]](k)
    var prevSync = 0L
    var i = 0
    while (i < k) {
      val s1 = if (t.nSync < 0) i + 1L else t.sync(i) // 1-based
      if (s1 <= prevSync || s1 > t.n) return null // ascending, in range
      prevSync = s1
      val s = s1 - 1
      val off = sampleOffset(t, s)
      if (off < 0) return null
      val sz =
        if (t.uniform != 0) t.uniform.toLong
        else t.size(s.toInt) // non-uniform n bounded by payload/4
      if (sz <= 0 || off + sz > a.length) return null
      out(i) = java.util.Arrays.copyOfRange(
        a, off.toInt, (off + sz).toInt)
      i += 1
    }
    out
  }

  @inline private def w16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >> 8) & 0xff); o.write(v & 0xff)
  }
  @inline private def w32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    o.write(((v >> 24) & 0xff).toInt); o.write(((v >> 16) & 0xff).toInt)
    o.write(((v >> 8) & 0xff).toInt); o.write((v & 0xff).toInt)
  }
  private def box(name: String)(
      body: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    body(b)
    val payload = b.toByteArray
    val out = new java.io.ByteArrayOutputStream(payload.length + 8)
    w32(out, payload.length + 8L)
    out.write(name.getBytes("US-ASCII"))
    out.write(payload)
    out.toByteArray
  }

  /** Deterministic single-track MJPEG fixture encoder: `ftyp` + `mdat`
    * (frames back-to-back) + `moov` with one `jpeg` VisualSampleEntry
    * track, `samplesPerChunk` samples per chunk (`stsc` one run plus
    * a tail run when the last chunk is short; `stco` absolute chunk
    * offsets — hence mdat-before-moov layout), uniform
    * `stts` delta, and an explicit `stss` when `syncSamples` is
    * non-empty (1-based, ascending) — empty means no `stss` box, i.e.
    * all-sync per §8.6.2. Frames must be non-empty; dims fit the
    * 16.16 `tkhd` fields.
    */
  def encode(frames: Array[Array[Byte]], width: Int, height: Int,
      timescale: Int, frameDelta: Int,
      syncSamples: Array[Int] = Array.empty,
      samplesPerChunk: Int = 1): Array[Byte] = {
    require(frames.nonEmpty && frames.forall(f => f != null && f.nonEmpty),
      "frames must be non-empty")
    require(frames.length <= MaxSamples, "too many frames")
    require(width > 0 && width < (1 << 16) && height > 0 &&
      height < (1 << 16), s"dims ${width}x$height")
    require(timescale > 0 && frameDelta > 0, "timescale/delta")
    require(samplesPerChunk > 0, "samplesPerChunk")
    require(syncSamples.forall(s => s >= 1 && s <= frames.length) &&
      syncSamples.sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
      "syncSamples must be 1-based ascending within range")
    val n = frames.length
    val spc = math.min(samplesPerChunk, n)
    val nChunks = (n + spc - 1) / spc
    val lastChunkSamples = n - (nChunks - 1) * spc
    val duration = n.toLong * frameDelta
    val ftyp = box("ftyp") { o =>
      o.write("isom".getBytes("US-ASCII")); w32(o, 0x200)
      o.write("isom".getBytes("US-ASCII"))
    }
    val mdat = box("mdat")(o => frames.foreach(o.write))
    // absolute chunk offsets: ftyp, then mdat header, then each
    // chunk's first sample (samples within a chunk are contiguous)
    val offs = new Array[Long](nChunks)
    var acc = ftyp.length + 8L
    var i = 0
    while (i < n) {
      if (i % spc == 0) offs(i / spc) = acc
      acc += frames(i).length
      i += 1
    }
    val stbl = box("stbl") { o =>
      o.write(box("stsd") { b =>
        w32(b, 0); w32(b, 1)
        w32(b, 86); b.write("jpeg".getBytes("US-ASCII"))
        var j = 0
        while (j < 6) { b.write(0); j += 1 } // reserved
        w16(b, 1) // data_reference_index
        j = 0
        while (j < 16) { b.write(0); j += 1 } // pre_defined/reserved
        w16(b, width); w16(b, height)
        w32(b, 0x00480000L); w32(b, 0x00480000L) // 72 dpi
        w32(b, 0); w16(b, 1) // reserved, frame_count
        j = 0
        while (j < 32) { b.write(0); j += 1 } // compressorname
        w16(b, 24); w16(b, 0xffff) // depth, pre_defined = -1
      })
      o.write(box("stts") { b =>
        w32(b, 0); w32(b, 1); w32(b, n); w32(b, frameDelta)
      })
      o.write(box("stsc") { b =>
        // one run when every chunk is full (or there is one chunk);
        // otherwise a second run declares the short tail chunk
        val tail = nChunks > 1 && lastChunkSamples != spc
        w32(b, 0); w32(b, if (tail) 2 else 1)
        w32(b, 1); w32(b, spc); w32(b, 1)
        if (tail) { w32(b, nChunks); w32(b, lastChunkSamples); w32(b, 1) }
      })
      o.write(box("stsz") { b =>
        w32(b, 0); w32(b, 0); w32(b, n)
        frames.foreach(f => w32(b, f.length))
      })
      o.write(box("stco") { b =>
        w32(b, 0); w32(b, nChunks); offs.foreach(v => w32(b, v))
      })
      if (syncSamples.nonEmpty) o.write(box("stss") { b =>
        w32(b, 0); w32(b, syncSamples.length)
        syncSamples.foreach(v => w32(b, v))
      })
    }
    val minf = box("minf") { o =>
      o.write(box("vmhd") { b => w32(b, 1); w16(b, 0); w16(b, 0)
        w16(b, 0); w16(b, 0) })
      o.write(box("dinf") { b =>
        b.write(box("dref") { d =>
          w32(d, 0); w32(d, 1)
          d.write(box("url ")(u => w32(u, 1))) // self-contained
        })
      })
      o.write(stbl)
    }
    val mdia = box("mdia") { o =>
      o.write(box("mdhd") { b =>
        w32(b, 0); w32(b, 0); w32(b, 0)
        w32(b, timescale); w32(b, duration)
        w16(b, 0x55c4); w16(b, 0) // language 'und'
      })
      o.write(box("hdlr") { b =>
        w32(b, 0); w32(b, 0)
        b.write("vide".getBytes("US-ASCII"))
        var j = 0
        while (j < 12) { b.write(0); j += 1 }
        b.write(0) // empty name
      })
      o.write(minf)
    }
    val trak = box("trak") { o =>
      o.write(box("tkhd") { b =>
        w32(b, 7) // version 0, flags enabled|in-movie|in-preview
        w32(b, 0); w32(b, 0); w32(b, 1); w32(b, 0) // times, id, reserved
        w32(b, duration)
        w32(b, 0); w32(b, 0) // reserved
        w16(b, 0); w16(b, 0); w16(b, 0); w16(b, 0) // layer, alt, volume
        // identity matrix
        w32(b, 0x10000); w32(b, 0); w32(b, 0)
        w32(b, 0); w32(b, 0x10000); w32(b, 0)
        w32(b, 0); w32(b, 0); w32(b, 0x40000000L)
        w32(b, width.toLong << 16); w32(b, height.toLong << 16)
      })
      o.write(mdia)
    }
    val moov = box("moov") { o =>
      o.write(box("mvhd") { b =>
        w32(b, 0); w32(b, 0); w32(b, 0)
        w32(b, timescale); w32(b, duration)
        w32(b, 0x10000); w16(b, 0x100); w16(b, 0) // rate, volume
        w32(b, 0); w32(b, 0) // reserved
        w32(b, 0x10000); w32(b, 0); w32(b, 0)
        w32(b, 0); w32(b, 0x10000); w32(b, 0)
        w32(b, 0); w32(b, 0); w32(b, 0x40000000L)
        var j = 0
        while (j < 6) { w32(b, 0); j += 1 } // pre_defined
        w32(b, 2) // next_track_id
      })
      o.write(trak)
    }
    val out = new java.io.ByteArrayOutputStream(
      ftyp.length + mdat.length + moov.length)
    out.write(ftyp); out.write(mdat); out.write(moov)
    out.toByteArray
  }
}

/** `binary -> array<binary>`: first `maxFrames` sync-sample JPEG
  * payloads of an MP4's first JPEG video track
  * ([[Mp4Codec.keyframes]]); null for anything else.
  */
case class Mp4KeyframesExpr(child: Expression, maxFrames: Int)
    extends UnaryExpression with CodegenFallback {
  require(maxFrames >= 1 && maxFrames <= 64,
    s"maxFrames must be in [1, 64], got $maxFrames")

  override def dataType: DataType =
    ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"mp4_keyframes needs binary, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val fs = Mp4Codec.keyframes(input.asInstanceOf[Array[Byte]], maxFrames)
    if (fs == null) null else new GenericArrayData(fs.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(
      newChild: Expression): Mp4KeyframesExpr = copy(child = newChild)
}

/** `array<binary> -> binary` MJPEG-track MP4 fixture encoder
  * ([[Mp4Codec.encode]]) — the video twin of [[FlacEncodeExpr]]:
  * JPEG frames in, a real ISO-BMFF file out, built inside a scan so
  * the table walk on the decode side is load-bearing in gates. Null
  * on null/empty/mis-shaped input.
  */
case class Mp4EncodeExpr(child: Expression, w: Int, h: Int,
    timescale: Int, frameDelta: Int, syncSamples: Seq[Int] = Seq.empty)
    extends UnaryExpression with CodegenFallback {
  require(w > 0 && w < (1 << 16) && h > 0 &&
    h < (1 << 16), s"dims ${w}x$h")
  require(timescale > 0 && frameDelta > 0, "timescale/delta")
  require(syncSamples.forall(_ >= 1) &&
    syncSamples.sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
    "syncSamples must be 1-based ascending")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(BinaryType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"mp4_encode needs array<binary>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0 || n > Mp4Codec.MaxSamples ||
      syncSamples.exists(_ > n)) return null
    val frames = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      frames(i) = arr.getBinary(i)
      if (frames(i).isEmpty) return null
      i += 1
    }
    Mp4Codec.encode(frames, w, h, timescale, frameDelta,
      syncSamples.toArray)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Mp4EncodeExpr = copy(child = newChild)
}
