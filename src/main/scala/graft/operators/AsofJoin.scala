package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.PuffbirdException

/** As-of (temporal) join — for every left row, the single most recent
  * right row at-or-before (`inclusive = true`) or strictly before
  * (`inclusive = false`) the left row's time, per key. Spark has no
  * native ASOF join; the classic equi-join + rank formulation
  * materializes every (left, candidate-right) pair before ranking —
  * quadratic per key at 100 TB.
  *
  * This is the scale-correct union form instead: tag both inputs, union
  * them (no shuffle), and resolve the match with ONE window pass — a
  * running `last(right_payload, ignoreNulls)` over
  * (key, time, side-tag). Total cost: one hash exchange on the key plus
  * one per-partition sort, linear in |left| + |right|, the same shape a
  * purpose-built ASOF physical operator would plan. Tie semantics are
  * encoded in the side-tag sort: for `inclusive`, a right row at the
  * same instant sorts BEFORE the left row (visible); for strict, after
  * (invisible).
  *
  * Output: every left row (left join semantics — unmatched rows carry
  * nulls) plus the right side's payload columns (right columns minus
  * keys minus its time column). The right side must be unique per
  * (key, time) — pre-aggregate duplicates, or the pick among equal
  * timestamps is nondeterministic; payload names colliding with left
  * columns are rejected. Null timestamps and null keys never match
  * (DuckDB ASOF comparison semantics): such right rows are dropped,
  * such left rows pass through null-extended.
  */
object AsofJoin {

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      inclusive: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    val lCols = left.columns.toSeq
    val rPayload = right.columns.toSeq
      .filterNot(keys.contains).filterNot(_ == rightTs)
    if (rPayload.isEmpty)
      throw new PuffbirdException(
        "asofJoin: right side has no payload columns beyond key + time")
    val collisions = rPayload.filter(lCols.contains)
    if (collisions.nonEmpty)
      throw new PuffbirdException(
        s"asofJoin: right payload collides with left columns: " +
          collisions.mkString(",") + " — rename before joining")

    // ASOF semantics never match a null time OR a null key (DuckDB:
    // `l.t > r.t` and the key equality are NULL for null operands): a
    // null-ts/key right row must not become the running match, and a
    // null-ts/key left row matches nothing. Under `ts.asc` nulls sort
    // FIRST (a null-ts right row would be last() for every later left
    // row until superseded), and `partitionBy` GROUPS null keys — both
    // the opposite of join semantics — so such rows are filtered here
    // and, for the left side, re-enter null-extended at the end.
    val matchable = (col(rightTs).isNotNull +: keys.map(col(_).isNotNull))
      .reduce(_ && _)
    val leftMatchable = (col(leftTs).isNotNull +: keys.map(col(_).isNotNull))
      .reduce(_ && _)
    val right1 = right.filter(matchable)
    val (leftIn, leftNullTs) =
      (left.filter(leftMatchable), left.filter(!leftMatchable))

    val ts = "__asof_ts"
    val lStruct = struct(lCols.map(col): _*)
    val rStruct = struct(rPayload.map(col): _*)
    val lType = left.select(lStruct.as("s")).schema("s").dataType
    val rType = right.select(rStruct.as("s")).schema("s").dataType
    // side tag = sort order at equal timestamps (see scaladoc)
    val (rightTag, leftTag) = if (inclusive) (0, 1) else (1, 0)
    val lPart = leftIn.select(keys.map(col) ++ Seq(
      col(leftTs).as(ts), lit(leftTag).as("__src"),
      lStruct.as("__l"), lit(null).cast(rType).as("__r")): _*)
    val rPart = right1.select(keys.map(col) ++ Seq(
      col(rightTs).as(ts), lit(rightTag).as("__src"),
      lit(null).cast(lType).as("__l"), rStruct.as("__r")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col("__src").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lPart.unionByName(rPart)
      .withColumn("__rm", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__l").isNotNull)
      .select(lCols.map(c => col("__l").getField(c).as(c)) ++
        rPayload.map(c => col("__rm").getField(c).as(c)): _*)
    // null-ts left rows re-enter null-extended (left-join semantics),
    // pipelined around the exchange
    matched.unionByName(leftNullTs.select(lCols.map(col) ++
      rPayload.map(c => lit(null).cast(rType)
        .getField(c).as(c)): _*))
  }
}
