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

  /** Parse GPT-2-style merges lines: optional `#version` header, then
    * one `left right` pair per line in rank order. Blank lines skipped.
    */
  def parseMerges(lines: Iterator[String]): Seq[(String, String)] =
    lines.filterNot(l => l.isEmpty || l.startsWith("#")).map { l =>
      val sp = l.split(" ")
      require(sp.length == 2, s"malformed merges line: '$l'")
      (decodeToken(sp(0)), decodeToken(sp(1)))
    }.toSeq

  /** Load a published merges.txt from a local path (driver-side read;
    * the table rides to executors inside the serialized expression).
    */
  def loadMerges(path: String): Seq[(String, String)] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parseMerges(src.getLines()) finally src.close()
  }

  /** Deterministic fixture vocabulary: rank 1 merges `a b`, rank 2
    * `ab c`. Chosen so the walk is SQL-checkable: both symbols of each
    * pair are letters, so no merge can cross a pre-tokenizer piece
    * boundary, `ab` occurrences are self-overlap-free, and the token
    * count is exactly `bytes - occ("ab") - occ("abc")`.
    */
  val fixtureMerges: Seq[(String, String)] = Seq("a" -> "b", "ab" -> "c")
}

/** Count of byte-level BPE tokens of a string under a merge table —
  * native, one pass per row, no UDF boxing. Pre-tokenizes with the
  * GPT-2 split regex (contractions | space?-letters | space?-digits |
  * space?-punct | trailing-space runs), then runs the standard merge
  * walk per piece: repeatedly take the lowest-rank adjacent symbol pair
  * and merge ALL its occurrences. Only the COUNT of final symbols is
  * returned, so no token strings are materialized beyond the working
  * piece (pieces are word-sized; the per-piece walk is O(len²) worst
  * case on a few dozen symbols).
  *
  * The merge table serializes with the expression (50k merges ≈ 1 MB —
  * shipped once per task like any literal); the rank map is rebuilt
  * lazily per JVM, not per row.
  */
/** Shared merge-walk machinery for the BPE expressions. */
trait BpeWalk {
  def merges: Seq[(String, String)]

  @transient protected lazy val ranks: Map[(String, String), Int] =
    merges.iterator.zipWithIndex.map { case (p, i) => p -> i }.toMap

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
