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
    // deterministic pseudo-salt from a second column-independent hash of
    // the whole row would be ideal; monotonically_increasing_id gives a
    // uniform, cheap spread without requiring any extra column
    val salted = large.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltFactor)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
