package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for equi-joins: salt the skewed (large) side
  * into `saltFactor` sub-keys and explode the build (small-per-key) side
  * across all salts. AQE's skew-join handles most cases automatically at
  * runtime; this is the explicit form for when a handful of hot keys are
  * known to dwarf everything else (the classic power-law key problem at
  * 100 TB — e.g. a null-ish foreign key or a viral document bucket).
  */
object SkewJoin {

  /** Inner equi-join `large ⋈ small` on `key`, with `large`'s rows salted
    * uniformly into `saltFactor` partitions per key and `small`
    * replicated across the salts. Shuffle keys become
    * (key, salt) — hot keys split `saltFactor` ways.
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int): DataFrame = {
    // the salt is a HASH OF THE ROW, not monotonically_increasing_id:
    // mid values depend on which task computed the row, so a speculative
    // or retried task could re-salt rows differently mid-shuffle; a row
    // hash is bit-stable under any retry. The seed decorrelates the salt
    // from the join key's own hash partitioning (same-key rows spread
    // across salts as long as payload columns differ; fully identical
    // rows share a salt, which only matters if ONE row value dominates
    // the hot key — at that point use AQE skew handling instead).
    val salted = large.withColumn("__salt",
      pmod(hash(large.columns.map(col) :+ lit(0x5417) : _*), lit(saltFactor)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
