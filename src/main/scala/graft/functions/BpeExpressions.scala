package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level BPE (the GPT-2 tokenizer family, Radford et al. 2019 —
  * the released reference implementation is public) for trainer-accurate
  * token counting. Every token-denominated decision in a pipeline —
  * mixture budgets, chunk sizes, per-doc token stats — misestimates by
  * 1.3-2× when it runs on whitespace tokens; this walks the actual
  * merge table.
  *
  * Vocabulary handling: merges are passed as raw-byte-string pairs in
  * rank order. [[Bpe.loadMerges]] parses the standard `merges.txt`
  * format (tokens written in the GPT-2 byte→unicode printable alphabet,
  * inverted back to raw bytes here), so any published BPE vocabulary
  * drops in; [[Bpe.fixtureMerges]] is the deterministic two-merge
  * vocabulary the oracle gates use (its merge walk reduces to counting
  * literal `ab`/`abc` occurrences, which a SQL engine can do
  * arithmetically).
  */
object Bpe {

  /** GPT-2's byte→printable-unicode map: visible latin-1 bytes map to
    * themselves, the remaining 68 bytes to U+0100 + n in byte order.
    * Public algorithm (bytes_to_unicode in the released encoder).
    */
  lazy val byteToUnicode: Map[Int, Char] = {
    val keep = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    var n = 0
    (0 until 256).map { b =>
      if (keep(b)) b -> b.toChar
      else { val c = (256 + n).toChar; n += 1; b -> c }
    }.toMap
  }

  private lazy val unicodeToByte: Map[Char, Byte] =
    byteToUnicode.map { case (b, c) => c -> b.toByte }

  /** Decode one merges.txt token (byte-unicode alphabet) to a raw byte
    * string (ISO-8859-1 chars, 1 char = 1 byte — the internal symbol
    * form the merge walk runs on).
    */
  def decodeToken(tok: String): String = {
    val bytes = tok.map(c => unicodeToByte.getOrElse(c,
      throw new IllegalArgumentException(
        s"not a byte-unicode character in BPE token: '$c'"))).toArray
    new String(bytes, StandardCharsets.ISO_8859_1)
  }

  /** Parse GPT-2-style merges lines: optional `#version` header (the
    * FIRST line only — published tables contain real merge lines that
    * start with a literal `#`, e.g. the pair building `##`, so a blanket
    * comment filter would silently drop them), then one `left right`
    * pair per line in rank order. Blank lines skipped.
    */
  def parseMerges(lines: Iterator[String]): Seq[(String, String)] = {
    val it = lines.buffered
    if (it.hasNext && it.head.startsWith("#version")) it.next()
    it.filterNot(_.isEmpty).map { l =>
      val sp = l.split(" ")
      require(sp.length == 2, s"malformed merges line: '$l'")
      (decodeToken(sp(0)), decodeToken(sp(1)))
    }.toSeq
  }

  /** The session's Hadoop configuration when a SparkSession is active
    * (so `fs.defaultFS`, `spark.hadoop.*` credentials etc. apply —
    * a raw `new Configuration()` would resolve scheme-less paths
    * against bare `file:///` and miss cluster credentials), else a
    * fresh default for session-less (test) use.
    */
  private def hadoopConf(): org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  /** Load a published merges.txt through Hadoop's FileSystem, so the
    * path may be local (`/x/merges.txt`, `file:///…`) or on distributed
    * storage — a driver-local-only read is a deployment footgun on a
    * real cluster. Driver-side read either way; the table rides to
    * executors inside the serialized expression.
    */
  def loadMerges(path: String): Seq[(String, String)] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hadoopConf())
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(
      fs.open(p), StandardCharsets.UTF_8))
    try parseMerges(Iterator.continually(in.readLine()).takeWhile(_ != null))
    finally in.close()
  }

  /** Write a merge table as a standard merges.txt (byte-unicode
    * alphabet, `#version` header) through Hadoop's FileSystem — the
    * write-side counterpart of [[loadMerges]], so a table learned with
    * [[graft.operators.TextAnalysis.bpeTrainMerges]] round-trips to
    * local or distributed storage in the format every BPE consumer
    * reads.
    */
  def saveMerges(path: String, merges: Seq[(String, String)]): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hadoopConf())
    // BufferedWriter, NOT PrintWriter: PrintWriter swallows IOExceptions,
    // so a disk-full/datanode failure would silently persist a TRUNCATED
    // merge table that a later load happily tokenizes with
    val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      fs.create(p, true), StandardCharsets.UTF_8))
    try {
      out.write("#version: 0.2"); out.newLine()
      merges.foreach { case (l, r) =>
        out.write(s"${encodeToken(l)} ${encodeToken(r)}"); out.newLine()
      }
    } finally out.close()
  }

  /** Deterministic fixture vocabulary: rank 1 merges `a b`, rank 2
    * `ab c`. Chosen so the walk is SQL-checkable: both symbols of each
    * pair are letters, so no merge can cross a pre-tokenizer piece
    * boundary, `ab` occurrences are self-overlap-free, and the token
    * count is exactly `bytes - occ("ab") - occ("abc")`.
    */
  val fixtureMerges: Seq[(String, String)] = Seq("a" -> "b", "ab" -> "c")

  /** Stable identity of a merge table — md5 over the rank-ordered
    * `"left right\n"` lines (RAW byte-string symbols, newline after
    * every line). Persisted pack sets carry it
    * ([[graft.sources.Packs]]) so token ids can never be silently
    * paired with the wrong vocabulary. A SQL engine re-derives the
    * fixture value as `md5('a b' || chr(10) || 'ab c' || chr(10))`.
    */
  def mergesFingerprint(merges: Seq[(String, String)]): String = {
    val text = merges.map { case (l, r) => s"$l $r\n" }.mkString
    java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      .map("%02x".format(_)).mkString
  }

  /** Encode a raw byte string (ISO-8859-1 chars) into the GPT-2
    * byte→printable-unicode alphabet — the inverse of [[decodeToken]],
    * i.e. the form merges.txt files are written in.
    */
  def encodeToken(raw: String): String =
    raw.map(c => byteToUnicode(c.toInt & 0xff)).mkString

  /** Learn a BPE merge table from aggregated piece counts — the
    * published training procedure (Sennrich et al. 2016; the GPT-2
    * variant runs it over pre-tokenizer piece TYPES with counts, which
    * is what makes it tractable: the corpus-sized work is the counting,
    * not the merging). Each round: the adjacent symbol pair with the
    * highest count (every position counts, overlapping included; ties
    * break to the lexicographically smallest (left, right) — the full
    * order is deterministic and SQL-replayable) is recorded and merged
    * in ALL pieces, left to right non-overlapping — exactly the walk
    * [[BpeWalk]] applies, so trained tables are monotone by
    * construction. Stops early when no pair reaches `minPairCount`
    * (merging a singleton pair cannot compress anything unseen).
    *
    * Incremental: pair counts and a pair→pieces index update only for
    * the pieces a merge touches — O(touched symbols) per round — and
    * the argmax is a max-heap with LAZY INVALIDATION (the same trick as
    * the walk's candidate heap: every count change pushes a fresh
    * entry; a popped entry whose count no longer matches the live table
    * is stale and skipped), so a round costs O(log P) amortized instead
    * of an O(P) scan over all distinct pairs — the difference between
    * an 8-rank gate and a realistic 50k-rank vocabulary train.
    */
  def train(
      pieceCounts: Seq[(String, Long)],
      numMerges: Int,
      minPairCount: Long = 2L): Seq[(String, String)] = {
    import scala.collection.mutable
    val pieces = pieceCounts.map { case (p, c) =>
      val bytes = p.getBytes(StandardCharsets.UTF_8)
      (mutable.ArrayBuffer.from(bytes.map(b =>
        new String(Array(b), StandardCharsets.ISO_8859_1))), c)
    }.toArray
    val counts = mutable.HashMap.empty[(String, String), Long]
    val index = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    // max-heap by (count DESC, left ASC, right ASC) — the deterministic
    // argmax order; entries carry the count they were pushed with, so a
    // mismatch against `counts` marks them stale
    val heap = new java.util.PriorityQueue[(Long, String, String)](64,
      (a: (Long, String, String), b: (Long, String, String)) => {
        val c = java.lang.Long.compare(b._1, a._1)
        if (c != 0) c
        else {
          val l = a._2.compareTo(b._2)
          if (l != 0) l else a._3.compareTo(b._3)
        }
      })
    def tally(idx: Int, sign: Long): Unit = {
      val (syms, c) = pieces(idx)
      var j = 0
      while (j < syms.length - 1) {
        val p = (syms(j), syms(j + 1))
        val n = counts.getOrElse(p, 0L) + sign * c
        if (n == 0L) counts.remove(p)
        else {
          counts(p) = n
          if (n >= minPairCount) heap.add((n, p._1, p._2))
        }
        if (sign > 0) index.getOrElseUpdate(p, mutable.Set.empty) += idx
        j += 1
      }
    }
    pieces.indices.foreach(tally(_, 1L))
    val out = mutable.ArrayBuffer.empty[(String, String)]
    var rounds = 0
    var exhausted = false
    while (rounds < numMerges && !exhausted) {
      var best: (String, String) = null
      var continue = true
      while (continue) {
        val top = heap.poll()
        if (top == null) continue = false
        else {
          val p = (top._2, top._3)
          if (counts.getOrElse(p, 0L) == top._1 && top._1 >= minPairCount) {
            best = p; continue = false
          } // else stale — skip
        }
      }
      if (best == null) exhausted = true
      else {
        out += best
        val merged = best._1 + best._2
        val touched = index.getOrElse(best, mutable.Set.empty).toArray
        touched.foreach { idx =>
          tally(idx, -1L)
          val (syms, _) = pieces(idx)
          var w = 0
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == best._1 &&
                syms(j + 1) == best._2) { syms(w) = merged; j += 2 }
            else { syms(w) = syms(j); j += 1 }
            w += 1
          }
          syms.dropRightInPlace(syms.length - w)
          tally(idx, 1L)
        }
        index.remove(best)
        counts.remove(best)
        rounds += 1
      }
    }
    out.toSeq
  }
}

/** Count of byte-level BPE tokens of a string under a merge table —
  * native, one pass per row, no UDF boxing. Pre-tokenizes with the
  * GPT-2 split regex (contractions | space?-letters | space?-digits |
  * space?-punct | trailing-space runs), then runs the standard merge
  * walk per piece: repeatedly take the lowest-rank adjacent symbol pair
  * and merge ALL its occurrences. Only the COUNT of final symbols is
  * returned, so no token strings are materialized beyond the working
  * piece (the walk is the indexed O(len log len) form in [[BpeWalk]], so
  * even a document-sized unsegmented piece is bounded).
  *
  * The merge table serializes with the expression (50k merges ≈ 1 MB —
  * shipped once per task like any literal); the rank map is rebuilt
  * lazily per JVM, not per row.
  */
/** Shared merge-walk machinery for the BPE expressions.
  *
  * The walk is INDEXED — interned symbol ids, a doubly-linked symbol
  * list, and a min-heap of (rank, position) candidates with lazy
  * invalidation — O(n log n) per piece, the structure production
  * tokenizers use. This matters because the GPT-2 pre-tokenizer emits
  * ` ?\p{L}+`: an entire CJK/Thai/unsegmented document is ONE piece, so
  * a scan-per-round walk (O(n²)) would turn a 100 KB CJK row into ~10¹⁰
  * symbol comparisons — a straggler-to-hang class problem at corpus
  * scale. The indexed walk processes the same document in n log n heap
  * operations with O(1) pair lookups (symbols are ints; pair→rank is one
  * hash probe on a packed long).
  *
  * Merge order: candidates pop in (rank, position) order, and a popped
  * candidate is applied only if that exact pair still sits at that
  * position (stale entries are skipped — pair ranks are injective, so an
  * equal-rank revalidation probe is sufficient). For any LEARNED merge
  * table — where a pair involving a merged symbol always ranks after the
  * merge that created the symbol — this is exactly the published
  * round-based algorithm ("merge all occurrences of the lowest-rank
  * pair, left to right, repeat"): while occurrences of the current best
  * pair remain, every newly created pair ranks higher and therefore pops
  * later. NON-monotone tables (a pair referencing a symbol no earlier
  * merge creates — nothing any BPE trainer can emit) are REJECTED at
  * table build ([[BpeWalk.buildTable]]) rather than silently tokenized
  * differently from the round-based reference. [[pieceTokenLensNaive]]
  * keeps the literal round-based walk for the equivalence property
  * test.
  */
trait BpeWalk {
  def merges: Seq[(String, String)]

  @transient protected lazy val table: BpeWalk.Table = BpeWalk.buildTable(merges)

  // GPT-2's pre-tokenizer pattern; UNICODE_CHARACTER_CLASS makes \s
  // match unicode whitespace as Python's re does
  @transient protected lazy val piecePattern: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(
      "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+",
      java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  /** Byte lengths of this piece's tokens after the merge walk, appended
    * to `out` in order (their sum is the piece's UTF-8 byte length).
    */
  protected def pieceTokenLens(piece: String,
      out: scala.collection.mutable.ArrayBuffer[Int]): Unit = {
    val bytes = piece.getBytes(StandardCharsets.UTF_8)
    val n = bytes.length
    if (n == 0) return
    if (n == 1) { out += 1; return }
    val (ids, nxt) = walkPieceSymbols(bytes)
    var i = 0
    while (i >= 0) { out += table.symLen(ids(i)); i = nxt(i) }
  }

  /** CANONICAL token ids of this piece after the merge walk, appended to
    * `out` in order: ids 0-255 are the raw bytes, merge results number
    * 256 + intern order (= 256 + rank for a duplicate-free table) — the
    * numbering a vocabulary derived from merges alone defines (published
    * vocab.json numberings additionally reorder by frequency, which a
    * merge table does not encode).
    */
  private[graft] def pieceTokenIds(piece: String,
      out: scala.collection.mutable.ArrayBuffer[Int]): Unit = {
    val bytes = piece.getBytes(StandardCharsets.UTF_8)
    val n = bytes.length
    if (n == 0) return
    if (n == 1) { out += (bytes(0) & 0xff); return }
    val (ids, nxt) = walkPieceSymbols(bytes)
    var i = 0
    while (i >= 0) { out += ids(i); i = nxt(i) }
  }

  /** The shared indexed merge walk: returns (ids, nxt) — the surviving
    * symbol list starts at node 0 and follows `nxt` (-1 terminates);
    * `ids(i)` is the interned symbol at node i.
    */
  private def walkPieceSymbols(bytes: Array[Byte]): (Array[Int], Array[Int]) = {
    val n = bytes.length
    val t = table
    // ids(i): interned symbol at list node i (-1 = consumed); nodes only
    // ever merge RIGHT symbols away, so node 0 stays the list head and
    // nxt(i) > i throughout
    val ids = new Array[Int](n)
    val nxt = new Array[Int](n)
    val prv = new Array[Int](n)
    var i = 0
    while (i < n) { ids(i) = bytes(i) & 0xff; nxt(i) = i + 1; prv(i) = i - 1; i += 1 }
    nxt(n - 1) = -1
    val heap = new BpeWalk.LongMinHeap(n)
    // push (rank<<32 | pos) if the pair starting at pos is ranked
    def pushPair(pos: Int): Unit = {
      val np = nxt(pos)
      if (np >= 0) {
        val info = t.pairInfo.get(ids(pos).toLong << 32 | ids(np))
        if (info != null)
          heap.push((info.longValue >>> 32) << 32 | pos)
      }
    }
    i = 0
    while (i < n - 1) { pushPair(i); i += 1 }
    while (heap.nonEmpty) {
      val e = heap.pop()
      val rank = (e >>> 32).toInt
      val pos = (e & 0xffffffffL).toInt
      if (ids(pos) >= 0) {
        val np = nxt(pos)
        if (np >= 0) {
          val info = t.pairInfo.get(ids(pos).toLong << 32 | ids(np))
          // stale unless the pair at pos still carries the popped rank
          // (ranks are injective over stored pairs, so equality implies
          // the same pair)
          if (info != null && (info.longValue >>> 32).toInt == rank) {
            ids(pos) = (info.longValue & 0xffffffffL).toInt
            ids(np) = -1
            val nn = nxt(np)
            nxt(pos) = nn
            if (nn >= 0) prv(nn) = pos
            val pp = prv(pos)
            if (pp >= 0) pushPair(pp)
            pushPair(pos)
          }
        }
      }
    }
    (ids, nxt)
  }

  /** The literal published round-based walk (scan all symbols for the
    * lowest-rank adjacent pair, merge ALL its occurrences left to right,
    * repeat) — O(n²), kept ONLY as the equivalence oracle for the
    * indexed-walk property test. Not used in any query path.
    */
  private[graft] def pieceTokenLensNaive(piece: String,
      out: scala.collection.mutable.ArrayBuffer[Int]): Unit = {
    val ranks: Map[(String, String), Int] =
      merges.iterator.zipWithIndex.map { case (p, i) => p -> i }.toMap
    val bytes = piece.getBytes(StandardCharsets.UTF_8)
    if (bytes.length == 0) return
    if (bytes.length == 1) { out += 1; return }
    val syms = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      syms(i) = new String(bytes, i, 1, StandardCharsets.ISO_8859_1)
      i += 1
    }
    var n = syms.length
    var merging = true
    while (merging && n > 1) {
      var bestRank = Int.MaxValue
      var bestL: String = null
      var bestR: String = null
      i = 0
      while (i < n - 1) {
        ranks.get((syms(i), syms(i + 1))) match {
          case Some(r) if r < bestRank =>
            bestRank = r; bestL = syms(i); bestR = syms(i + 1)
          case _ =>
        }
        i += 1
      }
      if (bestL == null) merging = false
      else {
        val merged = bestL + bestR
        var w = 0
        i = 0
        while (i < n) {
          if (i < n - 1 && syms(i) == bestL && syms(i + 1) == bestR) {
            syms(w) = merged; i += 2
          } else {
            syms(w) = syms(i); i += 1
          }
          w += 1
        }
        n = w
      }
    }
    i = 0
    while (i < n) { out += syms(i).length; i += 1 }
  }
}

object BpeWalk {

  /** Interned merge table: symbols are ints (ids 0-255 are the raw
    * bytes; merge-produced symbols intern above), `pairInfo` maps a
    * packed (leftId<<32|rightId) to a packed (rank<<32|mergedId),
    * `symLen` gives each symbol's byte length, and `symBytes` its raw
    * byte string (the decode side — byte-level tokens concatenate back
    * to the original bytes, so decoding is pure array concatenation).
    * Duplicate pair rows keep the LAST rank (matching a `toMap` over
    * zipWithIndex). Built once per JVM per expression instance
    * (@transient lazy), ~O(table size).
    */
  final class Table(
      val pairInfo: java.util.HashMap[java.lang.Long, java.lang.Long],
      val symLen: Array[Int],
      val symBytes: Array[Array[Byte]])

  /** Builds the interned table, REJECTING non-monotone input: a pair
    * may only reference symbols that exist at its rank (the 256 bytes,
    * or an earlier merge's result). Every learned/published table is
    * monotone by construction — BPE creates symbols in rank order — and
    * monotonicity is exactly the condition under which the indexed
    * (rank, position)-ordered walk equals the published round-based
    * algorithm; accepting a non-monotone table would SILENTLY tokenize
    * differently from the reference walk, so fail loud at build time
    * instead.
    */
  def buildTable(merges: Seq[(String, String)]): Table = {
    val symbolId = new java.util.HashMap[String, Integer](merges.size * 2 + 512)
    val lens = new scala.collection.mutable.ArrayBuffer[Int](merges.size + 256)
    val raw = new scala.collection.mutable.ArrayBuffer[Array[Byte]](merges.size + 256)
    var b = 0
    while (b < 256) {
      symbolId.put(new String(Array(b.toByte), StandardCharsets.ISO_8859_1), b)
      lens += 1
      raw += Array(b.toByte)
      b += 1
    }
    def lookup(s: String, side: String, rank: Int): Int = {
      val got = symbolId.get(s)
      require(got != null,
        s"non-monotone merge table: rank $rank $side symbol " +
          s"'${Bpe.encodeToken(s)}' is neither a byte nor the result of an " +
          "earlier merge (learned BPE tables are always monotone)")
      got.intValue
    }
    def intern(s: String): Int = {
      val got = symbolId.get(s)
      if (got != null) got.intValue
      else {
        val id = lens.length
        symbolId.put(s, id)
        lens += s.length
        raw += s.getBytes(StandardCharsets.ISO_8859_1)
        id
      }
    }
    val pairInfo = new java.util.HashMap[java.lang.Long, java.lang.Long](merges.size * 2)
    merges.iterator.zipWithIndex.foreach { case ((l, r), rank) =>
      val key = lookup(l, "left", rank).toLong << 32 | lookup(r, "right", rank)
      pairInfo.put(key, rank.toLong << 32 | intern(l + r))
    }
    new Table(pairInfo, lens.toArray, raw.toArray)
  }

  /** Array-backed binary min-heap of packed longs — no boxing, grows by
    * doubling. Ordering is numeric, so (rank<<32|pos) pops in
    * (rank, position) order.
    */
  final class LongMinHeap(initialCapacity: Int) {
    private var a = new Array[Long](math.max(initialCapacity, 8))
    private var n = 0

    def nonEmpty: Boolean = n > 0

    def push(v: Long): Unit = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, n * 2)
      var i = n
      a(i) = v
      n += 1
      while (i > 0 && a((i - 1) / 2) > a(i)) {
        val p = (i - 1) / 2
        val tmp = a(p); a(p) = a(i); a(i) = tmp
        i = p
      }
    }

    def pop(): Long = {
      val top = a(0)
      n -= 1
      a(0) = a(n)
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = l + 1
        var m = i
        if (l < n && a(l) < a(m)) m = l
        if (r < n && a(r) < a(m)) m = r
        if (m == i) done = true
        else { val tmp = a(m); a(m) = a(i); a(i) = tmp; i = m }
      }
      top
    }
  }
}

/** GPT-2 pre-tokenizer pieces of a string — the corpus-facing half of
  * BPE training: piece counting is distributed (`explode` → `groupBy`),
  * the merge learning runs on the bounded piece-TYPE table
  * ([[Bpe.train]]). Reuses [[BpeWalk]]'s piecePattern so training and
  * counting tokenize identically.
  */
case class BpePiecesExpr(child: Expression)
    extends UnaryExpression with CodegenFallback with BpeWalk {

  override def merges: Seq[(String, String)] = Nil

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val out = new scala.collection.mutable.ArrayBuffer[Any](16)
    val m = piecePattern.matcher(s)
    while (m.find()) out += UTF8String.fromString(m.group())
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): BpePiecesExpr =
    copy(child = c)
}

case class BpeTokenCountExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback with BpeWalk {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val lens = new scala.collection.mutable.ArrayBuffer[Int](64)
    val m = piecePattern.matcher(s)
    while (m.find()) pieceTokenLens(m.group(), lens)
    lens.length.toLong
  }

  override protected def withNewChildInternal(c: Expression): BpeTokenCountExpr =
    copy(child = c)
}

/** The full token-id sequence of a string under a merge table — what a
  * trainer actually consumes (counts budget it, chunks window it, THIS
  * feeds it). Ids are the canonical merges-derived numbering
  * ([[BpeWalk.pieceTokenIds]]): bytes 0-255, merge r → 256 + r. Same
  * indexed walk, same cost profile as counting; the only extra is the
  * output array (one int per token).
  */
case class BpeTokenIdsExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback with BpeWalk {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val ids = new scala.collection.mutable.ArrayBuffer[Int](64)
    val m = piecePattern.matcher(s)
    while (m.find()) pieceTokenIds(m.group(), ids)
    val out = new Array[Any](ids.length)
    var i = 0
    while (i < ids.length) { out(i) = ids(i); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): BpeTokenIdsExpr =
    copy(child = c)
}

/** Fixed-token-budget chunking at TRUE BPE token boundaries — the
  * trainer-accurate form of `TextAnalysis.chunkByTokens` (whose windows
  * are whitespace words). Emits `array<struct<n_tokens, chunk_text>>`:
  * window i covers tokens [i·step, i·step + chunkTokens) with
  * step = chunkTokens − overlap, mirroring `chunkByTokens`'s window
  * arithmetic exactly (empty text yields ONE empty chunk, same as the
  * word form's `greatest(1, …)`).
  *
  * Byte-level BPE tokens concatenate back to the original bytes, so
  * every token range is a CONTIGUOUS byte slice of the text — chunk
  * texts are substrings cut at token boundaries, reassembled from the
  * UTF-8 bytes in one pass (no token-string materialization; the only
  * per-row state is the token byte-length array).
  *
  * Byte-level tokens can split a multibyte character (each byte is its
  * own token until a merge covers it), and a chunk string cut there
  * would hold an invalid UTF-8 fragment. The TEXT boundaries therefore
  * snap FORWARD over continuation bytes to the next character start —
  * consistently on both sides, so consecutive overlap-0 chunks still
  * tile the document exactly; `n_tokens` keeps the exact token count
  * (the trainer-facing number), and a snapped text boundary shifts by
  * at most 3 bytes from the token cut.
  */
case class BpeChunksExpr(
    child: Expression,
    merges: Seq[(String, String)],
    chunkTokens: Int,
    overlap: Int)
    extends UnaryExpression with CodegenFallback with BpeWalk {

  require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
    "need 0 <= overlap < chunkTokens")

  private val step = chunkTokens - overlap

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("chunk_text", StringType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val lens = new scala.collection.mutable.ArrayBuffer[Int](64)
    val m = piecePattern.matcher(s)
    while (m.find()) pieceTokenLens(m.group(), lens)
    val total = lens.length
    // byte offset of each token boundary: starts(t) = first byte of
    // token t; starts(total) = total byte length
    val starts = new Array[Int](total + 1)
    var t = 0
    while (t < total) { starts(t + 1) = starts(t) + lens(t); t += 1 }
    val bytes = s.getBytes(StandardCharsets.UTF_8)
    // snap a byte position forward past UTF-8 continuation bytes
    def snap(p: Int): Int = {
      var q = p
      while (q < bytes.length && (bytes(q) & 0xc0) == 0x80) q += 1
      q
    }
    val nChunks = math.max(1,
      math.ceil((total - overlap).toDouble / step).toInt)
    val out = new Array[Any](nChunks)
    var i = 0
    while (i < nChunks) {
      val t0 = i * step
      val t1 = math.min(t0 + chunkTokens, total)
      val b0 = snap(starts(math.min(t0, total)))
      val b1 = math.max(snap(starts(math.max(t1, math.min(t0, total)))), b0)
      out(i) = new GenericInternalRow(Array[Any](
        math.max(t1 - t0, 0),
        UTF8String.fromString(
          new String(bytes, b0, b1 - b0, StandardCharsets.UTF_8))))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): BpeChunksExpr =
    copy(child = c)
}

/** Token-space substring-dedup rewrite — the BPE counterpart of
  * [[graft.functions.SubstringRemoveExpr]] and the detokenize step of
  * Lee et al. 2022's ExactSubstr run the way the paper runs it (on BPE
  * token streams, not whitespace words): given a document's token-id
  * sequence and the sorted starts of its removed k-token grams, merges
  * the covered intervals positionally and rebuilds the text from the
  * SURVIVING tokens' byte strings (`struct(text_kept, n_tokens_kept,
  * n_tokens_dropped)`), O(tokens + starts) per row. Byte-level BPE
  * tokens concatenate back to the original UTF-8 bytes
  * (property-pinned in PropertySpec), so the rebuilt text is exactly
  * the original with the removed token spans' bytes cut out — no
  * separator is inserted, because tokens carry their own spacing.
  *
  * Removal cuts are made in TOKEN space, as published; when a removal
  * boundary falls inside a multibyte character (possible only when the
  * character's bytes were never merged into one token), the kept bytes
  * around the cut can form an invalid UTF-8 seam — the same behavior as
  * detokenizing the paper's surviving token stream. Spark carries such
  * bytes through unchanged ([[UTF8String]] is not validating), so the
  * rewrite stays lossless for the tokens that survive.
  *
  * Null contract (hand-rolled `eval`, as in [[SubstringRemoveExpr]]): a
  * null starts array means "no removed grams" — all tokens kept; a null
  * ids array (null text upstream) yields `('', 0, 0)`.
  *
  * `scrubSeams = true` re-validates the rebuilt bytes as UTF-8 and
  * drops any byte that cannot start or complete a well-formed sequence
  * — for sinks that VALIDATE. Only seam regions can be invalid (every
  * surviving token's bytes are a contiguous slice of the original
  * valid text, so breakage happens exclusively where a cut split a
  * multibyte character), so the scrub touches exactly the broken seam
  * bytes and is the identity on cut-free documents. Token counts are
  * unaffected — the scrub drops BYTES of partially-removed characters,
  * not tokens. Default off: paper semantics, byte-faithful output.
  */
case class BpeTokenRemoveExpr(
    ids: Expression,
    starts: Expression,
    k: Int,
    merges: Seq[(String, String)],
    scrubSeams: Boolean = false)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback with BpeWalk {

  require(k >= 2, "spanTokens must be >= 2")

  override def left: Expression = ids
  override def right: Expression = starts
  override def nullable: Boolean = false

  override def dataType: DataType = StructType(Seq(
    StructField("text_kept", StringType, nullable = false),
    StructField("n_tokens_kept", LongType, nullable = false),
    StructField("n_tokens_dropped", LongType, nullable = false)))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val idsRaw = ids.eval(input)
    if (idsRaw == null) {
      return new GenericInternalRow(
        Array[Any](UTF8String.EMPTY_UTF8, 0L, 0L))
    }
    val ts = idsRaw.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = ts.numElements()
    val stRaw = starts.eval(input)
    val st =
      if (stRaw == null) null
      else stRaw.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val m = if (st == null) 0 else st.numElements()
    val t = table
    val bytes = new java.io.ByteArrayOutputStream(64)
    var kept = 0L
    var p = 0
    var coveredUntil = -1  // last covered token index so far
    var i = 0
    while (i < n) {
      while (p < m && st.getInt(p) <= i) {
        val end = st.getInt(p) + k - 1
        if (end > coveredUntil) coveredUntil = end
        p += 1
      }
      if (i > coveredUntil) {
        val sym = t.symBytes(ts.getInt(i))
        bytes.write(sym, 0, sym.length)
        kept += 1L
      }
      i += 1
    }
    val out = bytes.toByteArray
    new GenericInternalRow(Array[Any](
      UTF8String.fromBytes(
        if (scrubSeams) BpeTokenRemoveExpr.scrubInvalidUtf8(out) else out),
      kept, n.toLong - kept))
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BpeTokenRemoveExpr =
    copy(ids = l, starts = r)
}

object BpeTokenRemoveExpr {
  /** Drop every byte that is not part of a well-formed UTF-8 sequence:
    * stray continuation bytes, invalid leads, and leads whose
    * continuation run is short or wrong. One linear pass; the identity
    * on valid input.
    */
  private[functions] def scrubInvalidUtf8(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length)
    var i = 0
    while (i < b.length) {
      val x = b(i) & 0xff
      val len =
        if (x < 0x80) 1
        else if (x >= 0xc2 && x <= 0xdf) 2
        else if (x >= 0xe0 && x <= 0xef) 3
        else if (x >= 0xf0 && x <= 0xf4) 4
        else 0 // continuation byte in lead position, or invalid lead
      var ok = len > 0 && i + len <= b.length
      var j = 1
      while (ok && j < len) {
        ok = (b(i + j) & 0xc0) == 0x80
        j += 1
      }
      if (ok) { out.write(b, i, len); i += len }
      else i += 1 // drop this byte, resync on the next
    }
    out.toByteArray
  }
}
