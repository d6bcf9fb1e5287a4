package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming ingest-time deduplication for a training-data pipeline: the
  * incremental form of `Dedup.dropDuplicatesExact` — a document stream in,
  * first occurrence of each content out. Not part of the reference
  * surface (it has no streaming); designed on Structured Streaming's
  * keyed-state dedup operators.
  *
  * Scale design: state is one entry per distinct content *hash* (16
  * bytes of md5 + key overhead), never the text itself, and the
  * watermarked form bounds state to the horizon — the two knobs that
  * make ingest dedup feasible on an unbounded 100 TB-scale stream.
  */
object StreamingDedup {

  private val DocSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** First-seen exact dedup over a document stream: keep a row only if
    * its content hash was never seen before. State grows with the number
    * of distinct contents (no horizon) — use [[exactStreamWindowed]] when
    * the stream is unbounded and near-in-time duplicates are the target.
    */
  def exactStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(DocSchema).parquet(dir)
      .withColumn("text_hash", md5(col("text")))
      .dropDuplicates("text_hash")

  /** Watermark-bounded exact dedup: duplicates are dropped only within
    * the `horizon` of processing time — state for hashes older than the
    * watermark is evicted, so the operator runs indefinitely with bounded
    * memory. The standard trade: an exact-duplicate document arriving
    * later than the horizon is re-emitted (and caught by the batch dedup
    * downstream).
    */
  def exactStreamWindowed(
      spark: SparkSession,
      dir: String,
      horizon: String = "1 hour"): DataFrame =
    spark.readStream.schema(DocSchema).parquet(dir)
      .withColumn("text_hash", md5(col("text")))
      .withColumn("ingest_time", current_timestamp())
      .withWatermark("ingest_time", horizon)
      .dropDuplicatesWithinWatermark("text_hash")
}
