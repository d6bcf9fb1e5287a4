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

  /** The probe direction: a stream of QUERIES (benchmark questions,
    * takedown claims, audit probes as they arrive) scored against the
    * frozen index, each micro-batch's scores landing under its own
    * `batch_id=` directory (overwrite — a replayed batch converges).
    * The query batch is collected to the driver — queries are small by
    * the retrieval contract, and the bound is ENFORCED like
    * [[graft.operators.Similarity.knnBruteForce]]'s, not advisory.
    * Because the index is frozen, scores are independent of
    * micro-batching — a probe stream's union telescopes exactly to one
    * batch [[graft.sources.RetrievalIndex.score]] call over the same
    * queries.
    */
  def probeStream(
      queryStream: DataFrame,
      indexPath: String,
      outPath: String,
      qidCol: String,
      textCol: String,
      maxQueriesPerBatch: Int = 10000): DataStreamWriter[Row] =
    queryStream.writeStream.foreachBatch {
      (batch: Dataset[Row], batchId: Long) =>
        val rows = batch.limit(maxQueriesPerBatch + 1).collect()
        require(rows.length <= maxQueriesPerBatch,
          s"query micro-batch exceeds maxQueriesPerBatch=" +
            s"$maxQueriesPerBatch — the query side is driver-collected " +
            "and broadcast; split the probe stream or raise the bound " +
            "explicitly")
        val queries = rows.toSeq.map(r =>
          (r.getAs[Long](qidCol), r.getAs[String](textCol)))
        if (queries.nonEmpty)
          graft.sources.RetrievalIndex
            .score(batch.sparkSession, indexPath, queries)
            .write.mode("overwrite")
            .parquet(s"$outPath/batch_id=$batchId")
    }
}
