package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming publication into a standing [[graft.sources.Release]]
  * snapshot — the last stage of a continuously-running curation
  * pipeline: ingest → curation survivors (filter/compose upstream of
  * this writer, e.g. the stateless quality/domain gates of
  * [[graft.operators.Pipeline]]) → `appendRelease` per micro-batch.
  *
  * Exactly-once: each micro-batch appends under
  * [[graft.sources.Release.appendRelease]]'s intent/done protocol keyed
  * on the STREAM's batch id, so foreachBatch's at-least-once replay
  * (checkpoint recovery, a crashed executor re-running the sink) lands
  * every batch exactly once — a replayed batch whose `done` marker
  * exists is a no-op, and a batch that crashed mid-append is repaired
  * file-for-file before re-appending. The manifest commit inside each
  * append is the batch's publication point: a reader between batches
  * always sees a manifest that audits clean against the shards on
  * disk ([[graft.sources.Release.validateRelease]]).
  *
  * Requires a durable `checkpointLocation` (batch ids key the
  * protocol) and an existing release at `releasePath`
  * ([[graft.sources.Release.writeRelease]] publishes the initial
  * snapshot — possibly of an empty frame).
  *
  * Scale shape: per micro-batch cost is `appendRelease`'s — linear in
  * the batch plus its touched shards, never the standing release.
  */
object StreamingRelease {

  def releaseStream(
      stream: DataFrame,
      releasePath: String,
      idCol: String,
      textCol: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        // an empty micro-batch publishes nothing and must not burn a
        // protocol round (intent listing + manifest rewrite)
        if (!batch.isEmpty)
          graft.sources.Release.appendRelease(batch.toDF(), idCol,
            textCol, releasePath, batchId = s"stream_$batchId")
    }
}
