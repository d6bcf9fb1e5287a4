package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming ingest into the persisted BM25 retrieval index — the
  * [[StreamingDedup.indexedDedupStream]] shape for the retrieval
  * family: each micro-batch's postings and stats delta land exactly
  * once via [[graft.sources.RetrievalIndex.ingestBatch]]'s
  * marker-guarded idempotent overwrite. Durable `checkpointLocation`
  * required in production (markers key on the micro-batch id);
  * at-least-once replays converge because a replayed batch overwrites
  * its OWN delta directories instead of appending.
  */
object StreamingRetrieval {

  def indexIngestStream(
      stream: DataFrame,
      indexPath: String,
      idCol: String,
      textCol: String,
      numFiles: Int = 8): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch {
      (batch: Dataset[Row], batchId: Long) =>
        graft.sources.RetrievalIndex.ingestBatch(batch.sparkSession,
          indexPath, batch.toDF(), batchId, idCol, textCol, numFiles)
    }
}
