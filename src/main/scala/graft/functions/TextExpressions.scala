package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text expressions for the shingle pipeline.
  *
  * The composable form (`transform(sequence(...), i => concat_ws(slice))`
  * + `md5`/`conv` per element) evaluates every lambda through the
  * interpreted Catalyst eval path — dozens of µs per document. These
  * expressions do the same work in one tight JVM loop per row.
  * Semantics are unchanged (the DuckDB oracles still reproduce them);
  * output order of the distinct set differs from `array_distinct`'s
  * first-occurrence order, which is fine because every consumer (min,
  * sort, set-intersect) is order-insensitive.
  */

/** Shared lowercase-hex md5 encode — the cross-engine fingerprint format
  * (must match DuckDB's `md5()` output); factored so the three
  * fingerprint/bucket expressions cannot drift apart.
  */
private[functions] object PortableHash {
  def hexDigest(d: Array[Byte]): UTF8String = {
    val sb = new java.lang.StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    UTF8String.fromString(sb.toString)
  }
}

/** Distinct word n-gram shingles of a lowercased, whitespace-split text.
  * Matches `TextFunctions.shingles`: texts shorter than `n` words yield
  * the single whole-text shingle.
  */
case class ShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextNative.shingles(input.asInstanceOf[UTF8String], n)

  // real codegen (not CodegenFallback): one static call keeps the
  // expression inside whole-stage codegen on the LSH hot path
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextNative.shingles($c, $n);")

  override protected def withNewChildInternal(c: Expression): ShinglesExpr =
    copy(child = c)
}

/** Distinct byte n-gram shingles of a BINARY payload, emitted as
  * lowercase-hex strings — the byte-level analog of [[ShinglesExpr]],
  * for multimodal payload near-dup detection: re-encoded/re-hosted
  * copies of the same image/audio bytes (appended metadata, trimmed
  * trailers, container prefixes) share most n-byte windows, and taking
  * a window at EVERY byte offset makes the fingerprint alignment-free
  * (a 2-byte prefix shifts positions but not window contents). Payloads
  * shorter than `n` bytes collapse to a single whole-payload shingle so
  * every payload has >= 1 shingle and set ops stay total; all empty
  * payloads share the empty-string shingle, which is correct — they are
  * byte-identical, i.e. exact duplicates. Hex (not raw-byte) shingle
  * strings keep the downstream md5 hashing oracle-reproducible: a SQL
  * engine re-derives the identical shingle as a substring of the
  * payload's hex encoding.
  */
case class ByteShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n > 0, "byte shingle size must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val HexDigits = "0123456789abcdef".toCharArray

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[Array[Byte]]
    val hex = new Array[Char](a.length * 2)
    var i = 0
    while (i < a.length) {
      hex(2 * i) = HexDigits((a(i) >> 4) & 0xf)
      hex(2 * i + 1) = HexDigits(a(i) & 0xf)
      i += 1
    }
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (a.length >= n) {
      var s = 0
      while (s <= a.length - n) {
        out.add(UTF8String.fromString(new String(hex, 2 * s, 2 * n)))
        s += 1
      }
    } else {
      out.add(UTF8String.fromString(new String(hex)))
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(c: Expression): ByteShinglesExpr =
    copy(child = c)
}

/** Fused [[ByteShinglesExpr]] → [[Hash60ArrayExpr]]: the distinct 60-bit
  * hashes of a payload's byte n-gram shingles WITHOUT materializing the
  * hex-string shingle set. The string form costs ~20-30× the payload in
  * heap (one 2n-hex-char string + set entry per byte offset), which for
  * the multi-MB media payloads this feature targets risks executor
  * OOM/GC stalls; here the payload is hex-encoded ONCE (2× payload,
  * ASCII bytes) and each window is md5'd as a slice of that buffer.
  * Total heap is still window-proportional — the open-addressed long
  * set (2-4 slots × 8 bytes per distinct window at its load factor)
  * plus the output array, ~16-40× payload bytes for small n — but that
  * is ~2-3× less than the string path's footprint and, more
  * importantly, zero short-lived objects (no per-shingle String/char[]
  * churn), which is what kills executors on multi-MB payloads.
  *
  * Hash-compatible with the unfused pipeline by construction: md5 over
  * the UTF8 bytes of the hex shingle IS md5 over the hex-buffer slice
  * (hex digits are ASCII), and first-occurrence order + distinctness
  * are preserved by the insertion-ordered set. The only divergence is a
  * 60-bit collision between two DISTINCT shingles (p ≈ 2^-60 per pair),
  * where the unfused form emits both equal values and this form emits
  * one — indistinguishable to the min/band machinery that consumes it.
  */
case class ByteShingleHashesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n > 0, "byte shingle size must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val HexDigitBytes = "0123456789abcdef".getBytes

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[Array[Byte]]
    val hex = new Array[Byte](a.length * 2)
    var i = 0
    while (i < a.length) {
      hex(2 * i) = HexDigitBytes((a(i) >> 4) & 0xf)
      hex(2 * i + 1) = HexDigitBytes(a(i) & 0xf)
      i += 1
    }
    val md = MessageDigest.getInstance("MD5")
    def h60(off: Int, len: Int): Long = {
      md.reset()
      md.update(hex, off, len)
      val d = md.digest()
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      v >>> 4
    }
    if (a.length < n) {
      new GenericArrayData(Array[Any](h60(0, hex.length)))
    } else {
      val windows = a.length - n + 1
      // fail loud rather than degrade: past this the table math would
      // overflow Int — and a payload that size has no business in a
      // single binary cell anyway
      require(windows < (1 << 29),
        s"payload too large for byte-shingle hashing ($windows windows)")
      // open-addressed set: power-of-two table at load factor <= 1/2,
      // EMPTY sentinel outside the 60-bit hash range
      val cap = java.lang.Integer.highestOneBit(
        math.max(4, windows * 2 - 1)) * 2
      val EMPTY = -1L
      val table = new Array[Long](cap)
      java.util.Arrays.fill(table, EMPTY)
      val mask = cap - 1
      val out = new Array[Long](windows)
      var nOut = 0
      var s = 0
      while (s < windows) {
        val v = h60(2 * s, 2 * n)
        var slot = (v ^ (v >>> 29)).toInt & mask
        var seen = false
        var probing = true
        while (probing) {
          val cur = table(slot)
          if (cur == EMPTY) probing = false
          else if (cur == v) { seen = true; probing = false }
          else slot = (slot + 1) & mask
        }
        if (!seen) { table(slot) = v; out(nOut) = v; nOut += 1 }
        s += 1
      }
      val res = new Array[Any](nOut)
      i = 0
      while (i < nOut) { res(i) = out(i); i += 1 }
      new GenericArrayData(res)
    }
  }

  override protected def withNewChildInternal(c: Expression): ByteShingleHashesExpr =
    copy(child = c)
}

/** ALL positional word n-grams (repeats kept, document order) of a
  * lowercased, whitespace-split text — the term-frequency counterpart
  * of [[ShinglesExpr]]'s distinct shingle set. Tokenization matches
  * `TextFunctions.words` exactly (space-only trim, `\s+` split with
  * trailing empties kept) so SQL oracles re-derive it verbatim. Texts
  * shorter than `n` words yield an empty array. One native pass, no
  * per-element lambda re-evaluation.
  */
case class NgramsExpr(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextNative.ngrams(input.asInstanceOf[UTF8String], n)

  // real codegen: the n-gram fan-out sits under explode() on the
  // langid/heavy-hitter scans - one static call, no row fallback
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextNative.ngrams($c, $n);")

  override protected def withNewChildInternal(c: Expression): NgramsExpr =
    copy(child = c)
}

/** Content fingerprint of a string array in one pass: md5 over the
  * elements sorted ascending and joined with a single space — equal to
  * `md5(array_join(sort_array(arr), " "))` (and the DuckDB oracle's
  * `md5(array_to_string(list_sort(sh), ' '))`) without the interpreted
  * sort/join/copy chain.
  */
case class FingerprintExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val elems = new Array[UTF8String](n)
    var i = 0
    while (i < n) { elems(i) = arr.getUTF8String(i); i += 1 }
    // UTF8String's natural order is binary — identical to sort_array and
    // to DuckDB's byte-order list_sort, also for non-ASCII
    java.util.Arrays.sort(elems,
      java.util.Comparator.naturalOrder[UTF8String]())
    val md = MessageDigest.getInstance("MD5")
    PortableHash.hexDigest(md.digest(
      UTF8String.concatWs(UTF8String.fromString(" "), elems: _*).getBytes))
  }

  override protected def withNewChildInternal(c: Expression): FingerprintExpr =
    copy(child = c)
}

/** All `numHashes` MinHash signature components in one pass over the
  * shingle-hash array: sig_j = min over h of ((h mod p)*a_j + b_j) mod p
  * with `(a_j, b_j) = TextFunctions.hashParams(j)` and p = 2^31-1 —
  * bit-identical to mapping `TextFunctions.minhash(hs, j)` per j, which
  * evaluates `numHashes` interpreted `transform` lambdas per row.
  */
case class MinHashSigsExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val P = 2147483647L

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val sigs = new Array[Long](numHashes)
    java.util.Arrays.fill(sigs, Long.MaxValue)
    var i = 0
    while (i < n) {
      val hm = hs.getLong(i) % P
      var j = 0
      while (j < numHashes) {
        val v = (hm * (2L * j + 3L) + (101L * j + 17L)) % P
        if (v < sigs(j)) sigs(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sigs)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSigsExpr =
    copy(child = c)
}

/** LSH band buckets in one pass: the MinHash signature (as computed by
  * [[MinHashSigsExpr]]) cut into `bands` bands of `numHashes/bands` rows;
  * element b is the lowercase-hex md5 of the band's signature components
  * joined with "_" — bit-identical to
  * `md5(concat_ws("_", sig_{b*r}, ..., sig_{b*r+r-1}))` over the
  * composable signature columns (and the DuckDB oracle's
  * `md5(concat_ws('_', ...))`).
  */
case class MinHashBucketsExpr(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression with CodegenFallback {

  require(numHashes % bands == 0, "bands must divide numHashes")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val P = 2147483647L
  private val rows = numHashes / bands

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    // empty shingle set → NO buckets (empty array): a downstream
    // posexplode then emits no band rows for the doc. The alternative —
    // bands over the Long.MaxValue empty-signature constants — would
    // put every empty-set doc into ONE shared bucket: a corpus-scale
    // false block of mutual "near-duplicates".
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val sigs = new Array[Long](numHashes)
    java.util.Arrays.fill(sigs, Long.MaxValue)
    var i = 0
    while (i < n) {
      val hm = hs.getLong(i) % P
      var j = 0
      while (j < numHashes) {
        val v = (hm * (2L * j + 3L) + (101L * j + 17L)) % P
        if (v < sigs(j)) sigs(j) = v
        j += 1
      }
      i += 1
    }
    val md = MessageDigest.getInstance("MD5")
    val out = new Array[Any](bands)
    val sb = new java.lang.StringBuilder(rows * 11)
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      var r = 0
      while (r < rows) {
        if (r > 0) sb.append('_')
        sb.append(sigs(b * rows + r))
        r += 1
      }
      md.reset()
      out(b) = PortableHash.hexDigest(md.digest(sb.toString.getBytes("UTF-8")))
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): MinHashBucketsExpr =
    copy(child = c)
}

/** SimHash over the low `bits` bits of the shingle hashes in one pass:
  * bit j of the result is set when more shingles have bit j set than
  * clear — bit-identical to the composable form (`bits` interpreted
  * `aggregate` lambdas per row).
  */
case class SimHashExpr(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val votes = new Array[Long](bits)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < bits) {
        votes(j) += ((h >> j) & 1L) * 2L - 1L
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): SimHashExpr =
    copy(child = c)
}

/** Token counts in one character scan — no regex engine, no token-array
  * materialization. Output struct:
  *  - `n_ws`: fields of `split(trim(text), "\s+")` with Java semantics
  *    (trim strips ASCII spaces only; split keeps leading/trailing empty
  *    fields, so the count is #maximal-whitespace-runs + 1);
  *  - `n_re`: matches of `[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]` — maximal
  *    ASCII letter runs, maximal digit runs, and one token per other
  *    non-whitespace *codepoint* (surrogate pairs counted once, as the
  *    regex would).
  * Bit-identical to the composable `size(split(...))` /
  * `size(regexp_extract_all(...))` forms and the DuckDB oracle.
  */
case class TokenStatsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_ws", IntegerType, nullable = false),
    StructField("n_re", IntegerType, nullable = false)))

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
  @inline private def isLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // n_ws over the ASCII-space-trimmed string
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    var nWs = 1
    var i = lo
    while (i < hi) {
      if (isWs(s.charAt(i))) {
        nWs += 1
        while (i < hi && isWs(s.charAt(i))) i += 1
      } else i += 1
    }
    // n_re over the raw string
    var nRe = 0
    i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (isLetter(c)) {
        nRe += 1
        while (i < n && isLetter(s.charAt(i))) i += 1
      } else if (isDigit(c)) {
        nRe += 1
        while (i < n && isDigit(s.charAt(i))) i += 1
      } else if (isWs(c)) {
        i += 1
      } else {
        nRe += 1
        i += (if (Character.isHighSurrogate(c) && i + 1 < n &&
                  Character.isLowSurrogate(s.charAt(i + 1))) 2 else 1)
      }
    }
    org.apache.spark.sql.catalyst.InternalRow(nWs, nRe)
  }

  override protected def withNewChildInternal(c: Expression): TokenStatsExpr =
    copy(child = c)
}

/** Stopword-hit counts for several languages in one pass over a word
  * array: element l = how many words are in language l's stopword set —
  * equal to `size(filter(ws, w => w.isin(stopwords(l))))` per language,
  * which evaluates an interpreted lambda per word per language.
  */
case class StopwordScoresExpr(child: Expression, langs: Seq[Seq[String]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
    langs.map { ws =>
      val s = new java.util.HashSet[UTF8String](ws.size * 2)
      ws.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](langs.size)
    var i = 0
    while (i < n) {
      val w = arr.getUTF8String(i)
      var l = 0
      while (l < counts.length) {
        if (sets(l).contains(w)) counts(l) += 1
        l += 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def withNewChildInternal(c: Expression): StopwordScoresExpr =
    copy(child = c)
}

/** SimHash band fan-out in one pass: one struct per bit-band —
  * (band, band_bits, simhash) with band_bits = the band's
  * `bits/bands`-bit slice of the fingerprint. Designed to sit under an
  * `inline()` generate: the fingerprint is computed exactly once per row,
  * and because every output is a *generated* attribute, inferred
  * `isnotnull` join constraints cannot be pushed below the Generate and
  * re-evaluate the pipeline (the trap the composable form falls into).
  */
case class SimHashBandsExpr(child: Expression, bits: Int, bands: Int)
    extends UnaryExpression with CodegenFallback {

  require(bits % bands == 0, "bands must divide bits")
  private val width = bits / bands
  private val mask = (1L << width) - 1

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("band", IntegerType, nullable = false),
    StructField("band_bits", LongType, nullable = false),
    StructField("simhash", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val votes = new Array[Long](bits)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < bits) {
        votes(j) += ((h >> j) & 1L) * 2L - 1L
        j += 1
      }
      i += 1
    }
    var sh = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) sh |= (1L << j)
      j += 1
    }
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      out(b) = org.apache.spark.sql.catalyst.InternalRow(
        b, (sh >> (b * width)) & mask, sh)
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): SimHashBandsExpr =
    copy(child = c)
}

/** Portable 60-bit hash of every element of a string array: the first 15
  * hex digits of md5 as a long — bit-identical to
  * `conv(substr(md5(s),1,15),16,10)` and to the DuckDB oracle's
  * `CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT)`. Optional `mod`
  * (> 0) reduces each hash modulo that constant inside the same loop —
  * callers that need `hash % p` (anchor blocking) stay in one native
  * pass instead of wrapping this in an interpreted `transform` HOF.
  */
case class Hash60ArrayExpr(child: Expression, mod: Long = 0L)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextNative.hash60Array(input.asInstanceOf[ArrayData], mod)

  // real codegen: this md5 loop is the single heaviest per-row cost of
  // every minhash pipeline - keep it inside the generated stage
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextNative.hash60Array($c, ${mod}L);")

  override protected def withNewChildInternal(c: Expression): Hash60ArrayExpr =
    copy(child = c)
}

/** Shannon entropy (bits) of a string's code-point distribution — the
  * information-density quality signal (near-zero for repeated filler,
  * anomalously high for random/binary-in-text junk; a standard cheap
  * gate alongside the Gopher ratios). One JVM pass per row with a
  * bounded TreeMap (alphabet-sized); real `doGenCode` so the corpus
  * quality scan stays inside whole-stage codegen like the other hot
  * text kernels.
  */
case class CharEntropyExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_entropy needs string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    TextNative.charEntropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextNative.charEntropy($c);")

  override protected def withNewChildInternal(c: Expression): CharEntropyExpr =
    copy(child = c)
}

/** Unicode canonicalization for dedup keys: NFD-decompose, drop every
  * combining mark, NFC-recompose, lowercase (root locale). Matches
  * DuckDB's `lower(strip_accents(nfc_normalize(s)))` for Latin
  * accent/diacritic text — the characters injected by the oracle gate —
  * so normalized exact-dedup hashes agree across engines. One JVM pass
  * per row; no regex.
  */
case class NormalizeTextExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"normalize_text needs string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    import java.text.Normalizer
    // Lowercase BEFORE the NFD/strip pass: some case mappings introduce
    // combining marks (U+0130 LATIN CAPITAL I WITH DOT ABOVE lowers to
    // "i" + U+0307) which must also be stripped; lowercasing after the
    // strip would let them survive and diverge from utf8proc's
    // strip-then-casefold result. On Latin text the two orders agree,
    // so the existing oracle gate is unaffected. A final lowercase
    // after recomposition keeps the output casefolded even if NFC were
    // ever to compose a titlecase form (idempotent on the common path).
    val s = input.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT)
    val nfd = Normalizer.normalize(s, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val c = nfd.charAt(i)
      // strip ALL combining-mark categories (Mn, Mc, Me) — utf8proc's
      // STRIPMARK (DuckDB strip_accents) removes spacing and enclosing
      // marks too, e.g. the Devanagari vowel sign (Mc); Mn-only would
      // diverge from the oracle on the first Indic/enclosed-mark text.
      // Hangul is safe: NFD yields Jamo (Lo), NFC recomposes.
      val t = Character.getType(c)
      if (t != Character.NON_SPACING_MARK &&
          t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK) sb.append(c)
      i += 1
    }
    val recomposed = Normalizer.normalize(sb, Normalizer.Form.NFC)
    UTF8String.fromString(recomposed.toLowerCase(java.util.Locale.ROOT))
  }

  override protected def withNewChildInternal(c: Expression): NormalizeTextExpr =
    copy(child = c)
}

/** Distinct CHARACTER n-gram shingles — the language-agnostic analog of
  * [[ShinglesExpr]] for scripts without whitespace word boundaries
  * (CJK, Thai, ...). Indexing is by Unicode code point (UTF8String
  * substring semantics), matching DuckDB's character-based
  * `substr`/`length`, so the cross-engine oracle agrees on non-ASCII
  * text; texts shorter than `n` chars yield the single whole-text
  * shingle (mirroring the word form). Compose with `normalizeText`
  * upstream for case/accent folding.
  */
case class CharShinglesExpr(child: Expression, n: Int, keepLastCpMod: Int = 0)
    extends UnaryExpression {

  require(n > 0, "shingle size must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_shingles needs string, got ${other.simpleString}")
    }

  // keepLastCpMod > 0 = universe sampling INSIDE the shingle loop: keep a
  // shingle iff its last code point % mod == 0. The selection rule is a
  // pure function of shingle content, so every document samples the same
  // sub-universe (what Jaccard estimation needs), and dropped shingles
  // cost nothing downstream — no md5, no minhash, no array slot. This is
  // where char-grade shingling (~|text| shingles/doc) buys back its
  // ~10x-the-word-form hashing bill; an after-the-fact hash-mod filter
  // measured SLOWER than no sampling (the md5s were already paid).
  override def nullSafeEval(input: Any): Any =
    TextNative.charShingles(input.asInstanceOf[UTF8String], n,
      keepLastCpMod)

  // real codegen: char-grade shingling emits ~|text| shingles per doc -
  // the fallback row-materialization tax was paid on every one
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextNative.charShingles(" +
        s"$c, $n, $keepLastCpMod);")

  override protected def withNewChildInternal(c: Expression): CharShinglesExpr =
    copy(child = c)
}

/** Content fingerprint of a LONG array in one pass: md5 over the
  * elements sorted ascending and joined with a single space — the
  * primitive-array analog of [[FingerprintExpr]] for hashed shingle
  * sets, where sorting longs (one `Arrays.sort` of a primitive array)
  * replaces sorting thousands of short strings per row.
  */
case class LongArrayFingerprintExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"long_fingerprint needs array<bigint>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData].toLongArray()
    java.util.Arrays.sort(a)
    val sb = new java.lang.StringBuilder(a.length * 20)
    var i = 0
    while (i < a.length) {
      if (i > 0) sb.append(' ')
      sb.append(a(i))
      i += 1
    }
    val md = MessageDigest.getInstance("MD5")
    PortableHash.hexDigest(md.digest(sb.toString.getBytes("UTF-8")))
  }

  override protected def withNewChildInternal(c: Expression): LongArrayFingerprintExpr =
    copy(child = c)
}

/** Per-document repetition statistics (the Gopher repetition-quality
  * family, Rae et al. 2021 "Scaling Language Models", Table A1) in ONE
  * pass over the text — a training-data quality filter drops documents
  * whose content is dominated by repeated lines or n-grams.
  *
  * Returns `struct(dup_line_frac, dup_line_char_frac,
  * top_2gram_char_frac, top_3gram_char_frac)` of RAW doubles — callers
  * round to 6 decimals at the column level (same contract as
  * [[CosineSimExpr]]/`cosineFast`) so the DuckDB oracle reproduces the
  * values exactly. Definitions (all lengths in Unicode code points, the
  * unit both Spark's `length` and DuckDB's `length` count):
  *
  *  - lines = text split on `\n`, blank-after-trim lines ignored;
  *    `dup_line_frac` = (occurrences beyond first) / lines;
  *    `dup_line_char_frac` = chars in occurrences beyond first / chars
  *    in all lines. Zero when the document has no non-blank lines.
  *  - words = lowercased trimmed text split on whitespace runs (same
  *    tokenization as [[ShinglesExpr]]); the top word n-gram is the
  *    most frequent one, ties broken by longer gram then lexicographic
  *    max; `top_{n}gram_char_frac` = count(top) * len(top) / len(text).
  *    Zero when the document has fewer than n words.
  */
case class RepetitionStatsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("dup_line_frac", DoubleType, nullable = false),
    StructField("dup_line_char_frac", DoubleType, nullable = false),
    StructField("top_2gram_char_frac", DoubleType, nullable = false),
    StructField("top_3gram_char_frac", DoubleType, nullable = false)))

  private def cpLen(s: String): Long = s.codePointCount(0, s.length).toLong

  /** count(top) * cpLen(top) with the pinned tie-break: max count, then
    * max code-point length, then lexicographic max (String compareTo =
    * UTF-16 code-unit order = code-point order for BMP text; the SQL
    * oracle's `ORDER BY c DESC, length(g) DESC, g DESC` agrees).
    */
  private def topGramChars(words: Array[String], n: Int): Long = {
    if (words.length < n) return 0L
    val counts = new java.util.HashMap[String, Int]()
    val sb = new java.lang.StringBuilder(n * 12)
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      counts.merge(sb.toString, 1, Integer.sum _)
      i += 1
    }
    var bestCount = 0
    var bestLen = 0L
    var bestGram: String = null
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.intValue()
      val len = cpLen(e.getKey)
      if (c > bestCount ||
          (c == bestCount && (len > bestLen ||
            (len == bestLen && e.getKey.compareTo(bestGram) > 0)))) {
        bestCount = c; bestLen = len; bestGram = e.getKey
      }
    }
    bestCount.toLong * bestLen
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    // line family
    val lineCounts = new java.util.HashMap[String, Int]()
    var nLines = 0L
    var lineChars = 0L
    text.split("\n", -1).foreach { raw =>
      if (!raw.trim.isEmpty) {
        nLines += 1
        lineChars += cpLen(raw)
        lineCounts.merge(raw, 1, Integer.sum _)
      }
    }
    var dupLines = 0L
    var dupChars = 0L
    val it = lineCounts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val beyond = e.getValue.intValue() - 1
      if (beyond > 0) {
        dupLines += beyond
        dupChars += beyond * cpLen(e.getKey)
      }
    }
    // n-gram family (Locale.ROOT: match DuckDB's locale-independent
    // lower() regardless of the JVM default locale)
    val words = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    val totalChars = cpLen(text)
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(4)
    row.update(0, if (nLines > 0) dupLines.toDouble / nLines else 0.0)
    row.update(1, if (lineChars > 0) dupChars.toDouble / lineChars else 0.0)
    row.update(2, if (totalChars > 0)
      topGramChars(words, 2).toDouble / totalChars else 0.0)
    row.update(3, if (totalChars > 0)
      topGramChars(words, 3).toDouble / totalChars else 0.0)
    row
  }

  override protected def withNewChildInternal(c: Expression): RepetitionStatsExpr =
    copy(child = c)
}

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aho 2003,
  * "Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
  * algorithm): hash every character `k`-gram, slide a window of `w`
  * consecutive hashes, select each window's minimum. The selected-value
  * SET is position-independent (which occurrence of the minimum is
  * chosen does not change the set), so the output — the sorted distinct
  * selected hashes — is deterministic and engine-portable. Guarantee:
  * any shared substring of length >= k + w - 1 between two documents
  * yields at least one shared fingerprint.
  *
  * Hash = [[Hash60ArrayExpr]]'s portable 60-bit md5 prefix, so the
  * DuckDB oracle reproduces it (`CAST(concat('0x', substr(md5(g),1,15))
  * AS BIGINT)`). Texts shorter than `k` code points collapse to the
  * single whole-text hash (total, like [[CharShinglesExpr]]); fewer
  * hashes than `w` collapse to one whole-range window. One JVM pass per
  * row: O(len) hashing + O(len) windowed-min via a monotonic deque.
  */
case class WinnowExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1 && w >= 1, "winnow needs k >= 1 and w >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // one digest per row, reset between grams: getInstance per k-gram cost
  // ~10k allocations on a 10 kB document (measured as the slow tail of
  // winnow_fingerprint); digest() leaves the instance reset for reuse
  private def hash60(md: MessageDigest, s: String): Long = {
    val d = md.digest(s.getBytes("UTF-8"))
    var v = 0L
    var b = 0
    while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
    v >>> 4
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val md = MessageDigest.getInstance("MD5")
    // code-point boundaries (substr semantics match DuckDB's substr)
    val cps = text.codePoints().toArray
    val nGrams = cps.length - k + 1
    val hashes =
      if (nGrams < 1) Array(hash60(md, text))
      else {
        val out = new Array[Long](nGrams)
        var i = 0
        while (i < nGrams) {
          out(i) = hash60(md, new String(cps, i, k))
          i += 1
        }
        out
      }
    // primitive-array selection (no TreeSet/ArrayDeque boxing): collect
    // window minima skipping consecutive repeats, then sort + unique —
    // the output contract (sorted distinct set) is unchanged
    var sel: Array[Long] = null
    var m = 0
    if (hashes.length <= w) {
      var mn = hashes(0)
      var i = 1
      while (i < hashes.length) { if (hashes(i) < mn) mn = hashes(i); i += 1 }
      sel = Array(mn); m = 1
    } else {
      sel = new Array[Long](hashes.length - w + 1)
      // monotonic deque of indices over an int ring: head = window min
      val dq = new Array[Int](hashes.length)
      var head = 0
      var tail = 0 // exclusive
      var i = 0
      while (i < hashes.length) {
        while (tail > head && hashes(dq(tail - 1)) >= hashes(i)) tail -= 1
        dq(tail) = i; tail += 1
        if (dq(head) <= i - w) head += 1
        if (i >= w - 1) {
          val v = hashes(dq(head))
          if (m == 0 || sel(m - 1) != v) { sel(m) = v; m += 1 }
        }
        i += 1
      }
    }
    java.util.Arrays.sort(sel, 0, m)
    var uniq = 0
    var j = 0
    while (j < m) {
      if (j == 0 || sel(j) != sel(j - 1)) { sel(uniq) = sel(j); uniq += 1 }
      j += 1
    }
    val out = new Array[Any](uniq)
    j = 0
    while (j < uniq) { out(j) = sel(j); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): WinnowExpr =
    copy(child = c)
}

/** One-pass substring-dedup text rewrite ([[graft.operators.Dedup
  * .dedupSubstrings]]): given a document's word array and the SORTED
  * start positions of its removed `k`-gram occurrences, merges the
  * covered intervals ([start, start+k) each) and reassembles the
  * surviving words with single spaces — `struct(text_kept,
  * n_words_kept, n_words_dropped)` in O(words + starts) with zero
  * per-word row materialization. The composable alternative (explode
  * covered positions → distinct → per-word anti-join → collect/sort per
  * doc) costs two extra corpus-sized shuffles and a per-doc sort; this
  * walk replaces all of it with a 1:1 join and one expression eval.
  *
  * Null contract (hand-rolled `eval`, NOT nullSafeEval): a null starts
  * array means "no removed grams in this document" (the left-join miss
  * case) — all words kept; a null words array (null text) yields the
  * empty-document row `('', 0, 0)`, keeping every input document
  * present in the output.
  */
case class SubstringRemoveExpr(words: Expression, starts: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  require(k >= 2, "spanWords must be >= 2")

  override def left: Expression = words
  override def right: Expression = starts
  override def nullable: Boolean = false

  override def dataType: DataType = StructType(Seq(
    StructField("text_kept", StringType, nullable = false),
    StructField("n_words_kept", LongType, nullable = false),
    StructField("n_words_dropped", LongType, nullable = false)))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val wsRaw = words.eval(input)
    if (wsRaw == null) {
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.EMPTY_UTF8, 0L, 0L))
    }
    val ws = wsRaw.asInstanceOf[ArrayData]
    val n = ws.numElements()
    val stRaw = starts.eval(input)
    val st = if (stRaw == null) null else stRaw.asInstanceOf[ArrayData]
    val m = if (st == null) 0 else st.numElements()
    val sb = new java.lang.StringBuilder
    var kept = 0L
    var p = 0
    var coveredUntil = -1  // last covered word index so far
    var i = 0
    while (i < n) {
      while (p < m && st.getInt(p) <= i) {
        val end = st.getInt(p) + k - 1
        if (end > coveredUntil) coveredUntil = end
        p += 1
      }
      if (i > coveredUntil) {
        if (kept > 0L) sb.append(' ')
        sb.append(ws.getUTF8String(i).toString)
        kept += 1L
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(sb.toString), kept, n.toLong - kept))
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SubstringRemoveExpr =
    copy(words = l, starts = r)
}

/** Positional word k-gram 60-bit hashes: element i is the hash of words
  * [i, i+k) joined by single spaces — `hash60(md5)` like [[WinnowExpr]]
  * (a SQL engine re-derives it as
  * `CAST('0x' || substr(md5(gram), 1, 15) AS BIGINT)`), but at EVERY
  * position, unwinnowed, because removal semantics need each
  * occurrence. Empty output for documents shorter than k words. One
  * tight loop per row: the composable
  * `transform(sequence, i -> md5(concat_ws(slice)))` walks the
  * interpreted HOF eval path and re-materializes every gram string —
  * measured 1.6× slower end-to-end on the sf0.1 gate — and the long
  * output shuffles 8 bytes per gram instead of a 32-char hex string.
  *
  * STATUS: no longer the engine's substring-dedup index —
  * [[graft.operators.Dedup.dedupSubstrings]] moved to the 128-bit
  * [[WordGramHash128Expr]] in r12 (removal deletes on key equality;
  * 60-bit birthday collisions at corpus scale would silently cut
  * non-duplicate text). Kept DELIBERATELY as published API: the
  * `word_gram_hash60_12` SQL registration remains the documented
  * cheap RANKING-grade positional gram hash (overlap scoring,
  * fingerprint joins — uses where a rare collision only perturbs a
  * score), where the 8-byte key halves shuffle width vs the 128-bit
  * form.
  */
case class WordGramHash60Expr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 2, "gram size must be >= 2")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val Space = Array(' '.toByte)

  override def nullSafeEval(input: Any): Any = {
    val ws = input.asInstanceOf[ArrayData]
    val n = ws.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { bytes(i) = ws.getUTF8String(i).getBytes; i += 1 }
    val md = MessageDigest.getInstance("MD5")
    val out = new Array[Any](n - k + 1)
    var s = 0
    while (s <= n - k) {
      md.reset()
      var j = 0
      while (j < k) {
        if (j > 0) md.update(Space)
        md.update(bytes(s + j))
        j += 1
      }
      val d = md.digest()
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      out(s) = v >>> 4
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): WordGramHash60Expr =
    copy(child = c)
}

/** Positional word k-gram FULL-md5 hashes — the collision-safe form of
  * [[WordGramHash60Expr]] for removal semantics: element i is the 16-byte
  * md5 digest of words [i, i+k) joined by single spaces. Substring dedup
  * DELETES text on gram-key equality, and at the corpus scales it targets
  * (10¹¹-10¹² grams) 60-bit birthday collisions are expected — each one
  * silently removes non-duplicate text, diverging from Lee et al.'s
  * exact-match semantics. 128 bits puts the corpus-wide collision odds
  * below ~2⁻⁴⁰ at 10¹² grams; the shuffle key doubles to 16 bytes, a
  * linear cost paid for exactness (a SQL engine re-derives the key as
  * `md5(gram)` — lowercase hex of the same digest).
  */
case class WordGramHash128Expr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 2, "gram size must be >= 2")

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)

  private val Space = Array(' '.toByte)

  override def nullSafeEval(input: Any): Any = {
    val ws = input.asInstanceOf[ArrayData]
    val n = ws.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { bytes(i) = ws.getUTF8String(i).getBytes; i += 1 }
    val md = MessageDigest.getInstance("MD5")
    val out = new Array[Any](n - k + 1)
    var s = 0
    while (s <= n - k) {
      md.reset()
      var j = 0
      while (j < k) {
        if (j > 0) md.update(Space)
        md.update(bytes(s + j))
        j += 1
      }
      out(s) = md.digest()
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): WordGramHash128Expr =
    copy(child = c)
}

/** Positional k-gram full-md5 hashes over an INT array — the token-id
  * form of [[WordGramHash128Expr]] for BPE-token-level substring dedup
  * ([[graft.operators.Dedup.dedupSubstringsBpe]]): element i is the
  * 16-byte md5 of token ids [i, i+k), each digested as its decimal string
  * with a single `,` separator (a SQL engine re-derives the key from
  * the decimal-joined gram — DuckDB
  * `md5(array_to_string(ids[i:i+k-1], ','))`, Spark SQL
  * `md5(concat_ws(',', transform(slice(ids, i, k), x -> cast(x as
  * string))))` — byte-packed ints would be unportable across engines).
  * Empty output for sequences shorter than k tokens. Same tight-loop /
  * 16-bytes-per-gram cost profile as the word form.
  */
case class IntGramHash128Expr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 2, "gram size must be >= 2")

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)

  private val Comma = Array(','.toByte)

  override def nullSafeEval(input: Any): Any = {
    val ids = input.asInstanceOf[ArrayData]
    val n = ids.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val dec = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      dec(i) = java.lang.Integer.toString(ids.getInt(i))
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      i += 1
    }
    val md = MessageDigest.getInstance("MD5")
    val out = new Array[Any](n - k + 1)
    var s = 0
    while (s <= n - k) {
      md.reset()
      var j = 0
      while (j < k) {
        if (j > 0) md.update(Comma)
        md.update(dec(s + j))
        j += 1
      }
      out(s) = md.digest()
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): IntGramHash128Expr =
    copy(child = c)
}

/** Hashed-bag logistic score — the native scoring half of the
  * fastText-style quality classifier ([[graft.operators.Classifier]];
  * Joulin et al. 2016's linear text classifier with hashed features,
  * the DCLM/fastText quality-filter recipe): for a document's word
  * array, `sigmoid(weights(buckets) + Σ_token
  * weights(hash60(token) mod buckets) / n_tokens)` — i.e. the dot
  * product of the L1-normalized hashed bag with the weight vector,
  * bias at index `buckets`. The token hash is the portable 60-bit md5
  * prefix (a SQL engine re-derives every feature id as
  * `CAST(concat('0x', substr(md5(word), 1, 15)) AS BIGINT) %
  * buckets`), so training in the engine and replaying in SQL agree
  * feature-for-feature. One digest pass per token, no feature-table
  * materialization — scoring a 100 TB corpus is a pure map over the
  * scan with a (buckets+1)-double closure, trivially codegen-adjacent
  * and shuffle-free.
  *
  * `ngrams = 2` adds every adjacent word pair (joined with a single
  * space — the SQL-replayable `w[i] || ' ' || w[i+1]`) to the bag in
  * the SAME bucket space, and the normalization denominator counts
  * unigrams + bigrams — the fastText bag-of-n-grams layout
  * ([[graft.operators.Classifier.hashedFeatures]] mirrors it on the
  * training side). A pair is skipped when either neighbor is a null
  * element (nulls carry no feature and do not bridge).
  */
case class HashedBagScoreExpr(
    child: Expression,
    weights: Seq[Double],
    buckets: Int,
    ngrams: Int = 1)
    extends UnaryExpression with CodegenFallback {

  require(buckets > 0, "buckets must be positive")
  require(ngrams == 1 || ngrams == 2, "ngrams must be 1 or 2")
  require(weights.length == buckets + 1,
    s"weights must have buckets+1 entries (bias last), " +
      s"got ${weights.length} for $buckets buckets")

  override def dataType: DataType = DoubleType

  private lazy val w = weights.toArray
  private lazy val Space =
    org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val ws = input.asInstanceOf[ArrayData]
    val n = ws.numElements()
    val md = MessageDigest.getInstance("MD5")
    var s = 0.0
    var cnt = 0
    def add(bytes: Array[Byte]): Unit = {
      val d = md.digest(bytes)
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      s += w(((v >>> 4) % buckets).toInt)
      cnt += 1
    }
    var i = 0
    while (i < n) {
      // null elements carry no feature: skip them (and keep them out
      // of the averaging denominator). Internal callers (split+filter
      // chains) never produce them, but the case class is public API
      // and an array with containsNull=true must not NPE the task.
      if (!ws.isNullAt(i)) add(ws.getUTF8String(i).getBytes)
      i += 1
    }
    if (ngrams >= 2) {
      i = 0
      while (i < n - 1) {
        if (!ws.isNullAt(i) && !ws.isNullAt(i + 1))
          add(org.apache.spark.unsafe.types.UTF8String.concat(
            ws.getUTF8String(i), Space, ws.getUTF8String(i + 1))
            .getBytes)
        i += 1
      }
    }
    val margin = (if (cnt > 0) s / cnt else 0.0) + w(buckets)
    1.0 / (1.0 + math.exp(-margin))
  }

  override protected def withNewChildInternal(c: Expression): HashedBagScoreExpr =
    copy(child = c)
}

/** Per-document hashed-bag feature VECTOR — the training-side twin of
  * [[HashedBagScoreExpr]] with the identical tokenizer-to-bucket map
  * (md5-prefix hash, `(v >>> 4) % buckets`, bigrams joined by one
  * space): `array<string>` words → `array<struct<b:int, x:double>>`
  * with one entry per occupied bucket, `x = count / n_features`, plus
  * the constant bias entry `(buckets, 1.0)` — exactly the rows
  * `Classifier.hashedFeatures` produces for the doc, computed in ONE
  * local pass. This is what lets a training round be join-free: the
  * exploded (id, bucket, x) table needed a corpus-wide shuffle just to
  * count WITHIN documents (r17 measured that shuffle as ~all of the
  * bigram trainer's cost), while this map-side form needs none.
  * Output length ≤ buckets + 1: the bucket space bounds a document's
  * occupied buckets no matter how long the text.
  */
case class HashedBagCountsExpr(
    child: Expression,
    buckets: Int,
    ngrams: Int = 1)
    extends UnaryExpression with CodegenFallback {

  require(buckets > 0 && buckets <= (1 << 16),
    s"buckets must be in [1, 65536], got $buckets (larger feature " +
      "spaces train through the exploded-table path)")
  require(ngrams == 1 || ngrams == 2, "ngrams must be 1 or 2")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hashed_bag_counts needs array<string>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("b", IntegerType, nullable = false),
      StructField("x", DoubleType, nullable = false))),
    containsNull = false)

  private lazy val Space =
    org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val ws = input.asInstanceOf[ArrayData]
    val n = ws.numElements()
    val md = MessageDigest.getInstance("MD5")
    val counts = new Array[Int](buckets)
    var cnt = 0
    def add(bytes: Array[Byte]): Unit = {
      val d = md.digest(bytes)
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      counts(((v >>> 4) % buckets).toInt) += 1
      cnt += 1
    }
    var i = 0
    while (i < n) {
      if (!ws.isNullAt(i)) add(ws.getUTF8String(i).getBytes)
      i += 1
    }
    if (ngrams >= 2) {
      i = 0
      while (i < n - 1) {
        if (!ws.isNullAt(i) && !ws.isNullAt(i + 1))
          add(org.apache.spark.unsafe.types.UTF8String.concat(
            ws.getUTF8String(i), Space, ws.getUTF8String(i + 1))
            .getBytes)
        i += 1
      }
    }
    var occupied = 0
    i = 0
    while (i < buckets) { if (counts(i) > 0) occupied += 1; i += 1 }
    val out = new Array[Any](occupied + 1)
    var o = 0
    i = 0
    while (i < buckets) {
      if (counts(i) > 0) {
        out(o) = org.apache.spark.sql.catalyst.InternalRow(
          i, counts(i).toDouble / cnt)
        o += 1
      }
      i += 1
    }
    out(o) = org.apache.spark.sql.catalyst.InternalRow(buckets, 1.0)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      c: Expression): HashedBagCountsExpr = copy(child = c)
}

object HashedBagScoreExpr {
  /** Deterministic fixture weights for the SQL registration
    * (`hashed_bag_score_fixture`): 8 buckets with `w(b) = b/8`, bias
    * −0.5 — i.e. `score = sigmoid(mean_token(hash60(token) mod 8 / 8)
    * − 0.5)`, fully replayable in SQL from the documented md5-prefix
    * hash. Fixture-parameterized like `bpe_*_fixture40`: the SQL
    * surface pins the ARITHMETIC; real deployments construct the
    * expression with trained weights via [[graft.operators.Classifier
    * .scoreColumn]].
    */
  val FixtureBuckets: Int = 8
  val fixtureWeights: Seq[Double] =
    (0 until FixtureBuckets).map(_.toDouble / FixtureBuckets) :+ -0.5
}

/** Per-language smoothed NB log-likelihood of a document's distinct
  * trigram set under a FIXED profile — the scoring arithmetic of
  * [[graft.operators.TextAnalysis.langIdScore]] (`Σ_{g∈doc∩profile}
  * ln(cnt+1) − |doc grams| · ln(tot_lang + V)`) as one scalar
  * expression over a gram array, so the trained-langid recipe is
  * reachable from pure SQL (`langid_nb_score_fixture(
  * char_shingles3(lower(text)))`). Output: `map<lang, score>`, langs
  * sorted. The profile is embedded at construction (broadcast-in-plan,
  * the right shape for the ≤ topK·|langs| model size); the engine's
  * distributed scorer remains [[graft.operators.TextAnalysis
  * .langIdScore]] — this form exists for SQL parity and fixture
  * verification, exactly like `bpe_*_fixture40`.
  */
case class LangIdNbScoreExpr(
    child: Expression,
    profile: Seq[(String, String, Long)])
    extends UnaryExpression with CodegenFallback {

  require(profile.nonEmpty, "empty language profile")

  override def dataType: DataType =
    MapType(StringType, DoubleType, valueContainsNull = false)

  private lazy val langs: Array[String] =
    profile.map(_._1).distinct.sorted.toArray
  private lazy val langKeys: Array[Any] =
    langs.map(UTF8String.fromString(_): Any)
  // add-one smoothing over the profile vocabulary V, as in langIdScore
  private lazy val dens: Array[Double] = {
    val v = profile.map(_._2).distinct.size.toDouble
    langs.map(l =>
      math.log(profile.filter(_._1 == l).map(_._3).sum.toDouble + v))
  }
  private lazy val hitTable: Map[String, Array[Double]] =
    profile.groupBy(_._2).map { case (gram, rows) =>
      val arr = new Array[Double](langs.length)
      rows.foreach { case (l, _, cnt) =>
        arr(langs.indexOf(l)) += math.log(cnt.toDouble + 1.0) }
      gram -> arr
    }

  override def nullSafeEval(input: Any): Any = {
    val gs = input.asInstanceOf[ArrayData]
    val n = gs.numElements()
    val hits = new Array[Double](langs.length)
    var nd = 0
    var i = 0
    while (i < n) {
      if (!gs.isNullAt(i)) {
        nd += 1
        hitTable.get(gs.getUTF8String(i).toString).foreach { arr =>
          var j = 0
          while (j < arr.length) { hits(j) += arr(j); j += 1 }
        }
      }
      i += 1
    }
    val values = new Array[Any](langs.length)
    var j = 0
    while (j < langs.length) {
      values(j) = hits(j) - nd.toDouble * dens(j)
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new GenericArrayData(langKeys), new GenericArrayData(values))
  }

  override protected def withNewChildInternal(c: Expression): LangIdNbScoreExpr =
    copy(child = c)
}

object LangIdNbScoreExpr {
  /** Tiny deterministic profile for the SQL fixture registration:
    * 4 characteristic trigrams per language, all distinct (V = 8,
    * tot_en = 23, tot_es = 21) — small enough to verify a score by
    * hand from the documented formula.
    */
  val fixtureProfile: Seq[(String, String, Long)] = Seq(
    ("en", "the", 8L), ("en", "he ", 6L), ("en", " th", 5L),
    ("en", "ing", 4L),
    ("es", "de ", 7L), ("es", " de", 6L), ("es", "el ", 5L),
    ("es", "os ", 3L))
}
