package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One retained (order-value, id) entry of a bounded top-k buffer. */
case class TopKItem(ord: Double, id: Long)

/** Bounded top-k buffer: `items` is sorted by (ord desc, id asc) and
  * never exceeds k entries.
  */
case class TopKBuf(items: Seq[TopKItem])

/** Top-k rows per key WITHOUT a window sort: a typed `Aggregator` whose
  * buffer is a bounded sorted list (≤ k entries), so it partial-
  * aggregates map-side like any algebraic aggregate. The standard
  * `row_number().over(partitionBy(key))` + `filter(rank <= k)` plan
  * shuffles EVERY row of a hot key into one task's sort (Spark's
  * `WindowGroupLimit` inserts a partial limit but still sorts and still
  * lands the hot key in one post-exchange task — the same single-task
  * skew class the r7 verdict flagged in `dedupLines`). Here each map
  * task reduces its share of a hot key to ≤ k entries before the
  * exchange, so the shuffle carries ≤ k·tasks rows per key and no task
  * ever sorts more than k·partitions entries: group top-k over a 100 TB
  * corpus with a single skewed key degrades gracefully instead of
  * OOMing one executor.
  *
  * Contract: the order column is numeric (cast to double; DESC, exact
  * top-k) and the id column is numeric (cast to long; ASC tie-break —
  * deterministic output). Insertion is O(k) per row — intended for the
  * small-k regime (top-3 … top-100) where group top-k is actually used;
  * for k beyond that a window + `WindowGroupLimit` plan becomes
  * competitive and skew is better handled by salting.
  */
class TopKAggregator(k: Int)
    extends Aggregator[TopKItem, TopKBuf, TopKBuf] {

  // total order matching Spark's sort semantics (ord DESC, id ASC):
  // java.lang.Double.compare so NaN is a real value (greatest, equal to
  // itself) — raw </== predicates would pin every NaN row at the head
  // with arrival-order ties, diverging from the row_number reference
  private def precedes(a: TopKItem, b: TopKItem): Boolean = {
    val c = java.lang.Double.compare(b.ord, a.ord)
    c < 0 || (c == 0 && a.id < b.id)
  }

  private def insert(items: Seq[TopKItem], x: TopKItem): Seq[TopKItem] = {
    // no-op fast path: buffer full and x sorts after the current floor
    if (items.lengthCompare(k) >= 0 && !precedes(x, items.last)) return items
    val (before, after) = items.span(precedes(_, x))
    ((before :+ x) ++ after).take(k)
  }

  override def zero: TopKBuf = TopKBuf(Vector.empty)
  override def reduce(b: TopKBuf, x: TopKItem): TopKBuf =
    TopKBuf(insert(b.items, x))
  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
    TopKBuf(b.items.foldLeft(a.items)(insert))
  override def finish(b: TopKBuf): TopKBuf = b
  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}

object TopK {

  /** Top `k` rows per key group, ordered by `ordCol` DESC with `idCol`
    * ASC tie-break, as `(keyCols..., idCol, ordCol, rk)` — the exact
    * rows `row_number() <= k` over that window would keep, produced by
    * one partial-aggregable shuffle (see [[TopKAggregator]] for why
    * that matters at scale).
    */
  def topKPerKey(
      df: DataFrame,
      keyCols: Seq[String],
      ordCol: String,
      idCol: String,
      k: Int): DataFrame = {
    val topk = udaf(new TopKAggregator(k), Encoders.product[TopKItem])
    val keyRefs = keyCols.map(col)
    df.groupBy(keyRefs: _*)
      .agg(topk(col(ordCol).cast("double"), col(idCol).cast("long"))
        .as("__topk"))
      .select(keyRefs :+
        posexplode(col("__topk.items")).as(Seq("__pos", "__it")): _*)
      .select(keyRefs ++ Seq(
        col("__it.id").as(idCol),
        col("__it.ord").as(ordCol),
        (col("__pos") + 1).cast("int").as("rk")): _*)
  }
}
