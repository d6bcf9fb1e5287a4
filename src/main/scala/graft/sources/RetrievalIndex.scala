package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted index for BM25 lexical retrieval — the retrieval
  * leg of the frozen-artifact family ([[DedupIndex]] for dedup,
  * [[AnnIndex]] for vectors). A 100 TB corpus is tokenized ONCE into a
  * postings artifact; every later probe (contamination hunt, benchmark
  * overlap audit, corpus QA) is a broadcast join against it instead of
  * a corpus re-scan, and every ingest batch appends only its own
  * postings.
  *
  * Layout under `path/`:
  *   - `postings/`       — `(term, doc_id, dl, tf)` distinct by
  *     (term, doc_id), RANGE-partitioned by `(term, doc_id)` into
  *     `numFiles` files and sorted within files. Range, not hash:
  *     each file then covers a DISJOINT lexical term range, so a
  *     probe's In-filter prunes at file-footer min/max even when a
  *     file is a single row group (hash bucketing spreads every
  *     file across the whole alphabet and defeats exactly that
  *     pruning — measured in the `bm25_index_10x` stress). The
  *     layout survives compaction.
  *   - `stats/`          — ONE `(n_docs, sum_dl)` row. BIGINT sums, so
  *     the corpus statistics are exact and MERGEABLE: each append adds
  *     a row, [[load]] folds them ( ≤ 1 + #appends rows).
  *   - `batch_postings/<id>/`, `batch_stats/<id>/` — per-append
  *     deltas, each written with `mode(overwrite)` to its OWN
  *     directory keyed by the caller's append id, so a crashed append
  *     REPLAYS IDEMPOTENTLY: the replay overwrites both deltas in
  *     place and can never double-append rows (the [[Release]] lesson
  *     — `mode(append)` plus retry is silent duplication).
  *   - `ingested/`       — batch markers for the exactly-once
  *     streaming cursor (same protocol as [[DedupIndex.ingestBatch]]).
  *   - `meta/`           — written LAST (tombstone-first discipline):
  *     a crash mid-build/mid-compact leaves no meta, so [[load]] fails
  *     loudly instead of pairing stale stats with half-built postings.
  *
  * Scoring is Okapi/Lucene BM25, bit-compatible with the direct
  * one-pass form ([[graft.operators.TextAnalysis.bm25Scores]]): same
  * tokenizer, same always-positive idf, and exact integer stats (dl
  * sums are BIGINT; the double `avgdl` division happens once), so an
  * index probe hash-matches the direct form's oracle. The probe plan
  * never shuffles the postings: query terms BROADCAST into the join,
  * df/idf are term-count-sized, and only query-term hits reach the
  * per-(qid, doc) aggregate.
  *
  * Crash window worth knowing: a reader that loads between a crashed
  * append's two delta writes sees the batch's postings with the OLD
  * stats row (scores drift low until the replay lands). Both writes
  * are idempotent overwrites, so the replay converges; [[compact]]
  * folds the delta directories back to the build layout.
  */
object RetrievalIndex {

  /** A loaded index: the unioned postings frame plus exact corpus
    * statistics (document count and summed document length).
    */
  final case class Loaded(postings: DataFrame, nDocs: Long, sumDl: Long)

  /** The exact-decon family tokenizer (lowercase, whitespace split) —
    * MUST stay in lockstep with [[graft.operators.TextAnalysis.bm25Scores]]
    * for the probe-parity contract.
    */
  private def tokens(text: org.apache.spark.sql.Column) =
    filter(split(trim(lower(text)), "\\s+"), w => length(w) > 0)

  /** Postings rows for one corpus slice: `(term, doc_id, dl, tf)`,
    * distinct by (term, doc_id). One explode + one partial-aggregable
    * groupBy; `dl` rides the grouping key (constant per doc, so it
    * adds no groups). `doc_id` keeps the caller's NATIVE id type — a
    * cast (e.g. to long) would silently null out non-numeric ids and
    * collapse all such docs into one corrupt postings group, breaking
    * the bit-parity contract with
    * [[graft.operators.TextAnalysis.bm25Scores]], which accepts any id
    * type. Any orderable type range-partitions and sorts fine; a
    * non-orderable id fails loudly at the exchange instead.
    */
  private def postingsOf(
      docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), size(col("__toks")).as("dl"),
        explode(col("__toks")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).cast("int").as("tf"))

  /** One exact stats row — BIGINT so appends merge losslessly. Empty
    * docs count toward `n_docs` with `dl = 0`, matching the direct
    * form's `avg(size(toks))`.
    */
  private def statsOf(
      docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(tokens(col(textCol)).as("__toks"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(size(col("__toks")).cast("long")), lit(0L))
          .as("sum_dl"))

  /** Build (or atomically rebuild) the index from a corpus. Stale
    * append deltas and ingest markers die with the meta tombstone —
    * surviving a rebuild they would replay against the wrong corpus
    * state.
    */
  def build(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      numFiles: Int = 32): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val hconf = spark.sparkContext.hadoopConfiguration
    Seq("meta", "ingested", "batch_postings", "batch_stats").foreach { d =>
      val hp = new org.apache.hadoop.fs.Path(s"$path/$d")
      hp.getFileSystem(hconf).delete(hp, true)
    }
    postingsOf(docs, idCol, textCol)
      .repartitionByRange(numFiles, col("term"), col("doc_id"))
      .sortWithinPartitions("term", "doc_id")
      .write.mode("overwrite").parquet(s"$path/postings")
    statsOf(docs, idCol, textCol)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
    Seq(Tuple1(1)).toDF("format_version")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  private def nonEmptyDir(spark: SparkSession, d: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(d)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(hp) && fs.listStatus(hp).nonEmpty
  }

  def load(spark: SparkSession, path: String): Loaded = {
    val meta = spark.read.parquet(s"$path/meta").collect()
    require(meta.length == 1, s"malformed retrieval-index meta at $path")
    def nonEmptyDir(d: String): Boolean =
      RetrievalIndex.nonEmptyDir(spark, d)
    def withDeltas(base: String, deltas: String): DataFrame = {
      val b = spark.read.parquet(base)
      if (nonEmptyDir(deltas))
        b.unionByName(spark.read
          .option("recursiveFileLookup", "true").parquet(deltas))
      else b
    }
    val stats = withDeltas(s"$path/stats", s"$path/batch_stats")
      .agg(sum(col("n_docs")).as("n"), sum(col("sum_dl")).as("s"))
      .collect()(0) // bounded: folds 1 + #appends rows
    Loaded(
      postings = withDeltas(s"$path/postings", s"$path/batch_postings"),
      nDocs = stats.getLong(0),
      sumDl = stats.getLong(1))
  }

  /** BM25 scores of a query set against the frozen index — the probe
    * half, no writes, hash-identical to
    * [[graft.operators.TextAnalysis.bm25Scores]] over the indexed
    * corpus. Output `(qid, doc_id, score)`, one row per (query, doc
    * with ≥ 1 matching term); `score` is a RAW double (callers round).
    */
  def score(
      spark: SparkSession,
      path: String,
      queries: Seq[(Long, String)],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "need at least one query")
    import spark.implicits._
    val idx = load(spark, path)
    require(idx.nDocs > 0, s"retrieval index at $path is empty")
    val qpairs = queries.flatMap { case (qid, q) =>
      q.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct
        .map(t => (qid, t))
    }
    val qterms = qpairs.toDF("qid", "term")
    // the query-term set is known driver-side, so push it INTO the
    // parquet scan as an In filter: with the term-RANGE layout the
    // file/row-group min-max stats prune everything but the matching
    // term ranges — the probe reads a sliver of the artifact
    // (and the df aggregate's second pass over `hits` prunes the same
    // way instead of re-reading the whole postings directory)
    val termSet = qpairs.map(_._2).distinct
    val hits = idx.postings
      .filter(col("term").isin(termSet: _*))
      .join(broadcast(qterms), Seq("term"))
    // postings are distinct per (term, doc), so df is a plain count;
    // the result is ≤ |query terms| rows — broadcast back
    val dfreq = hits.groupBy(col("qid"), col("term"))
      .agg(count(lit(1)).cast("double").as("__df"))
    // exact integer stats → ONE double division, bit-equal to the
    // direct form's avg() (whose double sum over integer dl is exact)
    val n = idx.nDocs.toDouble
    val avgdl = idx.sumDl.toDouble / idx.nDocs
    hits.join(broadcast(dfreq), Seq("qid", "term"))
      .withColumn("__idf",
        log(lit(1.0) + (lit(n) - col("__df") + 0.5) / (col("__df") + 0.5)))
      .withColumn("__s",
        col("__idf") * (col("tf") * (k1 + 1)) /
          (col("tf") + (col("dl") / lit(avgdl) * b + (1 - b)) * k1))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("__s")).as("score"))
  }

  /** Append a batch of NEW documents under a caller-chosen id. Replay
    * with the same id is a no-op (marker) or an idempotent overwrite
    * of both delta directories (crashed mid-append) — it can never
    * duplicate postings. Appending the same DOC twice under different
    * ids is caller error (its tf would double), same as every family's
    * append contract.
    */
  def append(
      spark: SparkSession,
      path: String,
      newDocs: DataFrame,
      idCol: String,
      textCol: String,
      appendId: String,
      numFiles: Int = 8): Unit = {
    require(appendId.nonEmpty && !appendId.contains("/"),
      s"appendId must be a single path segment, got '$appendId'")
    val hconf = spark.sparkContext.hadoopConfiguration
    val marker = new org.apache.hadoop.fs.Path(
      s"$path/ingested/append_$appendId")
    val fs = marker.getFileSystem(hconf)
    if (fs.exists(marker)) return
    // the two delta writes are independent idempotent overwrites to
    // their own directories, so they run OVERLAPPED (guide §2.6); the
    // marker still lands strictly after both. The mid-append crash
    // window (reader sees one delta without the other until the replay
    // converges) existed under the sequential order too — only which
    // delta can be observed alone changes
    DedupIndex.runOverlapped(Seq(
      () => postingsOf(newDocs, idCol, textCol)
        .repartitionByRange(numFiles, col("term"), col("doc_id"))
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite").parquet(s"$path/batch_postings/$appendId"),
      () => statsOf(newDocs, idCol, textCol)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$path/batch_stats/$appendId")))
    fs.mkdirs(marker)
  }

  /** The streaming ingest cursor: foreachBatch → one [[append]] keyed
    * by the micro-batch id. With a durable checkpoint the stream's
    * at-least-once replays hit the marker/idempotent-overwrite path,
    * so each micro-batch's postings land exactly once.
    */
  def ingestBatch(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      batchId: Long,
      idCol: String,
      textCol: String,
      numFiles: Int = 8): Unit =
    append(spark, path, batch, idCol, textCol, s"b$batchId", numFiles)

  /** Fold the append deltas back into the build layout. Postings rows
    * are already distinct by (term, doc) across deltas (append
    * contract), so this is a pure re-bucket — probe results are
    * bit-identical before and after; stats fold to one exact row.
    * Ingest markers SURVIVE compaction (unlike a rebuild): the folded
    * state still contains those batches, and a replay after compaction
    * must keep no-oping.
    */
  def compact(spark: SparkSession, path: String, numFiles: Int = 32): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    // generation fast path: the delta directories ARE the fold input —
    // with no appends since the last build/compact there is nothing to
    // fold, and the base artifacts are exactly as that build/compact
    // left them (guide §6: don't rewrite unchanged data)
    if (!nonEmptyDir(spark, s"$path/batch_postings") &&
        !nonEmptyDir(spark, s"$path/batch_stats")) return
    import spark.implicits._
    val idx = load(spark, path)
    val (n, s) = (idx.nDocs, idx.sumDl)
    DedupIndex.swapCompacted(spark, path, Seq(
      "postings" -> { () =>
        idx.postings
          .repartitionByRange(numFiles, col("term"), col("doc_id"))
          .sortWithinPartitions("term", "doc_id")
          .write.mode("overwrite").parquet(s"$path/postings.compact")
      },
      "stats" -> { () =>
        Seq((n, s)).toDF("n_docs", "sum_dl")
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$path/stats.compact")
      }), s"$path/meta", () => {
      val hconf = spark.sparkContext.hadoopConfiguration
      Seq("batch_postings", "batch_stats").foreach { d =>
        val hp = new org.apache.hadoop.fs.Path(s"$path/$d")
        hp.getFileSystem(hconf).delete(hp, true)
      }
      Seq(Tuple1(1)).toDF("format_version")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    })
  }
}
