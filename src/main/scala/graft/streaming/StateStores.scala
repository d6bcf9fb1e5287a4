package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-store backend selection for the stateful streaming operators
  * ([[Events.streamingSessionize]] / `streamingFunnel` /
  * `streamingRetention` — all `flatMapGroupsWithState`, plus the
  * built-in `session_window` aggregation).
  *
  * The default HDFS-backed provider keeps EVERY active key's state as
  * JVM objects on-heap: fine for the gate corpus, but at 100 TB of
  * events the active-key working set (one entry per user inside the
  * watermark horizon — easily 10^8-10^9 keys on a crawl-scale event
  * stream) must not live on the executor heap. The RocksDB provider
  * spills state to native memory + local SSD with bounded block-cache
  * usage, which turns the per-executor bound from O(active keys) heap
  * into O(block cache) — the standard production setting for exactly
  * these operators.
  *
  * State size per operator (what RocksDB actually has to hold):
  *  - sessionize: one (start, end, n, sum) record per OPEN session —
  *    dropped at emit, TTL'd by the event-time timeout;
  *  - funnel: one stage-index byte per user still mid-funnel;
  *  - retention: one (cohort, last-period) record per user;
  *  - session_window: Spark-managed per-window aggregates, merged and
  *    evicted at the watermark.
  * All four are watermark-bounded: state cannot outlive
  * `delay + gap/horizon`, so the RocksDB store is also TTL-complete —
  * no unbounded growth on either backend, the provider only moves
  * WHERE the bounded set lives.
  */
object StateStores {

  val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Run `body` (typically: build + execute one streaming query) with
    * the RocksDB state store provider active, restoring the previous
    * provider afterwards — the provider is read at query START, so the
    * scope only needs to cover `start()`.
    */
  def withRocksDb[T](spark: SparkSession)(body: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDbProvider)
    try body finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }
}
