package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** `true` iff the Count-Min point estimate of the input string is at
  * least `minCount` — the scan-time prefilter of the CMS-prefiltered
  * heavy-hitter pass ([[graft.operators.TextAnalysis
  * .frequentNgramsSketched]]): because a CMS NEVER underestimates, a
  * row this filter drops provably has true frequency < `minCount`, so
  * the exact confirmation aggregate downstream sees every real heavy
  * hitter (false POSITIVES ride through and are removed by the exact
  * count — the same transparent-prefilter contract as
  * [[BloomContainsExpr]], which is why no SQL oracle ever replays this
  * arithmetic).
  *
  * The bucket hash replicates [[graft.operators.Sketches.cmsCounters]]
  * exactly — `hash60("<row>:" + value) mod width`, hash60 = the first
  * 60 bits of md5 (first-8-bytes-big-endian >>> 4) — so the counter
  * table and the probe can never disagree. `counters` is the flattened
  * `row * width + bucket` table shipped as a BROADCAST variable: the
  * expression serializes as a ~hundred-byte handle, so the task binary
  * stays small at any sketch size (a 2^20-width × depth-4 table is
  * 32 MB — plan-embedding that would bloat every task closure and
  * re-ship per stage; the torrent broadcast ships it once per executor
  * and `.value` here is a local-memory dereference). Per row: ≤ `depth`
  * md5s with an early exit as soon as the running min falls below
  * `minCount`.
  */
case class CmsPrefilterExpr(
    child: Expression,
    counters: org.apache.spark.broadcast.Broadcast[Array[Long]],
    depth: Int,
    width: Int,
    minCount: Long)
    extends UnaryExpression with CodegenFallback {

  require(depth >= 1 && depth <= 8, s"depth must be in [1,8], got $depth")
  require(width >= 16, s"width must be >= 16, got $width")
  require(minCount >= 1, s"minCount must be >= 1, got $minCount")

  override def dataType: DataType = BooleanType

  // the broadcast handle compares by reference, so two prefilters over
  // different tables can never compare equal (conservative: a re-used
  // identical table misses subexpression elimination, never correctness)
  override def nullSafeEval(input: Any): Any = {
    val table = counters.value
    val s = input.asInstanceOf[UTF8String].toString
    val md = MessageDigest.getInstance("MD5")
    var m = Long.MaxValue
    var j = 0
    while (j < depth && m >= minCount) {
      val d = md.digest((j.toString + ":" + s).getBytes("UTF-8"))
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      val bucket = ((v >>> 4) % width).toInt
      val c = table(j * width + bucket)
      if (c < m) m = c
      j += 1
    }
    m >= minCount
  }

  override protected def withNewChildInternal(c: Expression): CmsPrefilterExpr =
    copy(child = c)
}
