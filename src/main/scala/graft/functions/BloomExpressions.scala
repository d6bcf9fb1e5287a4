package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Shared Bloom-filter probe arithmetic: k bit positions derived from a
  * 16-byte md5 gram key by the Kirsch-Mitzenmacher double-hashing
  * scheme (Kirsch & Mitzenmacher 2006, "Less hashing, same performance"
  * — `g_i = h1 + i·h2` preserves the asymptotic false-positive rate of
  * k independent hashes). `h1`/`h2` are the digest's two 8-byte halves
  * big-endian; Long overflow wraps identically wherever the JVM runs,
  * and no SQL engine ever needs to replay this — the filter is a
  * TRANSPARENT prefilter whose output is always confirmed by an exact
  * join, so oracles see only exact-semantics results.
  */
private[graft] object BloomHash {

  private def longAt(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }

  /** The i-th probe position for digest halves (h1, h2) in [0, mBits). */
  def position(h1: Long, h2: Long, i: Int, mBits: Int): Int = {
    val g = (h1 + i.toLong * h2) % mBits
    (if (g < 0) g + mBits else g).toInt
  }

  def halves(digest: Array[Byte]): (Long, Long) =
    (longAt(digest, 0), longAt(digest, 8))
}

/** `true` iff all `k` probe bits of the 16-byte input hash are set in
  * `words` (a bitset of `words.length * 64` bits). The filter rides the
  * expression into every task ONCE (~`mBits/8` bytes in the task
  * binary: 128 KB at the 2^20-bit default — far under the 1 MB task
  * warning; keep `mBits` ≤ ~2^23 or ship the words through a broadcast
  * variable instead). Per row: two 8-byte reads + k multiply-mod-test
  * probes, no allocation.
  */
case class BloomContainsExpr(child: Expression, words: Array[Long], k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1 && k <= 16, "k must be in [1,16]")
  require(words.nonEmpty, "bloom bitset must be non-empty")

  override def dataType: DataType = BooleanType

  private val mBits = words.length * 64

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val (h1, h2) = BloomHash.halves(b)
    var i = 0
    while (i < k) {
      val pos = BloomHash.position(h1, h2, i, mBits)
      if ((words(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  override protected def withNewChildInternal(c: Expression): BloomContainsExpr =
    copy(child = c)
}

/** [[BloomContainsExpr]] with the bitset shipped as a BROADCAST
  * variable instead of a plan-embedded array — the deployment form for
  * LOADED filter artifacts ([[graft.sources.DeconIndex]]), whose
  * `mBits` is sized to the probe corpus rather than this plan: the
  * expression serializes as a ~hundred-byte handle at any filter size
  * (a 2^27-bit held-out-corpus filter is 16 MB — plan-embedding it
  * would bloat every task closure and re-ship per stage; the torrent
  * broadcast ships it once per executor and `.value` is a local-memory
  * dereference — the [[CmsPrefilterExpr]] pattern). Same
  * [[BloomHash]] arithmetic, so build and probe can never disagree.
  * The broadcast handle compares by reference: two filters over
  * different artifacts never compare equal (conservative — a re-used
  * identical filter misses subexpression elimination, never
  * correctness).
  */
case class BloomContainsBcastExpr(
    child: Expression,
    words: org.apache.spark.broadcast.Broadcast[Array[Long]],
    k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1 && k <= 16, "k must be in [1,16]")

  override def dataType: DataType = BooleanType

  override def nullSafeEval(input: Any): Any = {
    val w = words.value
    val mBits = w.length * 64
    val b = input.asInstanceOf[Array[Byte]]
    val (h1, h2) = BloomHash.halves(b)
    var i = 0
    while (i < k) {
      val pos = BloomHash.position(h1, h2, i, mBits)
      if ((w(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  override protected def withNewChildInternal(c: Expression): BloomContainsBcastExpr =
    copy(child = c)
}

/** The `k` probe positions (as longs) of a 16-byte hash — the BUILD
  * side of the filter: explode → word/bit split → `bit_or` aggregate
  * builds the bitset distributed, with at most `mBits/64` combined rows
  * reaching the driver. Shares [[BloomHash]] with [[BloomContainsExpr]]
  * so build and probe can never disagree on the arithmetic.
  */
case class BloomPositionsExpr(child: Expression, mBits: Int, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1 && k <= 16, "k must be in [1,16]")
  require(mBits > 0 && mBits % 64 == 0, "mBits must be a positive multiple of 64")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val (h1, h2) = BloomHash.halves(b)
    val out = new Array[Any](k)
    var i = 0
    while (i < k) {
      out(i) = BloomHash.position(h1, h2, i, mBits).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): BloomPositionsExpr =
    copy(child = c)
}
