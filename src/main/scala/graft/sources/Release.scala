package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.hash60

/** Dataset release sink — the "publish a corpus snapshot" step at the
  * end of a curation pipeline (the HuggingFace/RedPajama distribution
  * shape): content-addressed gzip JSONL shards plus a MANIFEST the
  * consumer can audit without trusting the transport. The reference has
  * no I/O surface at all; this is the publication twin of the trainer
  * sinks ([[Packs]] feeds a trainer, this feeds the world).
  *
  * Layout under `path`:
  *
  *  - `data/shard=S/`: gzip JSONL of the rows whose
  *    `hash60(id) mod nShards` is `S` — membership is a pure function
  *    of the id, so a re-published snapshot shards identically and
  *    consumers can fetch/verify shards independently;
  *  - `manifest/`: one row per shard `(shard, n_docs, n_chars,
  *    checksum)` — the checksum is `bit_xor` over per-doc
  *    `hash60(id ":" text)`, ORDER-INDEPENDENT (XOR is commutative and
  *    cannot overflow) so any engine recomputes it from the shard in
  *    any row order; written LAST after a tombstone delete (the
  *    [[Packs]] discipline: a crash mid-publish leaves an unloadable
  *    release, never a manifest describing half-written shards).
  *
  * Scale shape: one hash-keyed exchange to co-locate shards (writer
  * files per shard stay bounded by the repartition), one
  * partial-aggregable stats pass; nothing driver-sided beyond the
  * `nShards`-row manifest.
  */
object Release {

  private def shardCol(idCol: String, nShards: Int) =
    pmod(hash60(col(idCol).cast("string")), lit(nShards.toLong))

  private def docHash(idCol: String, textCol: String) =
    hash60(concat(col(idCol).cast("string"), lit(":"), col(textCol)))

  /** Publish `docs` as a release at `path`. Only `(idCol, textCol)`
    * plus any other columns of `docs` are written; stats/checksum cover
    * the id and text (the payload a consumer trains on).
    */
  def writeRelease(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      nShards: Int = 16): Unit = {
    require(nShards > 0, "nShards must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val hconf = spark.sparkContext.hadoopConfiguration
    Seq(s"$path/manifest", s"$path/release_meta").foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(hconf).delete(hp, true)
    }
    val sharded = docs.withColumn("shard", shardCol(idCol, nShards))
    sharded.repartition(nShards, col("shard"))
      .write.mode("overwrite").partitionBy("shard")
      .option("compression", "gzip")
      .json(s"$path/data")
    // stats from the WRITTEN files, not the input lineage: the manifest
    // must describe what a consumer will actually read, so a silent
    // serialization difference (encoding, json escaping) surfaces here
    // as a checksum mismatch instead of shipping
    manifestOf(spark.read.schema(sharded.schema).json(s"$path/data"),
        idCol, textCol)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/manifest")
    Seq(Tuple1(nShards)).toDF("n_shards")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/release_meta")
  }

  /** Fold a new batch into a published release — the incremental
    * publication step (daily curated batches landing in a standing
    * snapshot): the batch's rows append as new JSONL files inside
    * their content-addressed shard directories (sharding is a pure
    * function of the id, so a doc's shard never moves), and ONLY the
    * TOUCHED shards are re-read for manifest recomputation — untouched
    * shards keep their committed manifest rows unread. Cost scales
    * with the batch plus its shards' data, never the release.
    *
    * Crash discipline: the old manifest rows are captured (≤ nShards
    * rows), the manifest is tombstoned BEFORE data files land, and the
    * merged manifest commits last — a crash mid-append leaves a
    * release that [[loadRelease]] refuses loudly, never a manifest
    * describing half-appended shards. The sink does NOT dedup: feed it
    * from the curation pipeline's survivors (an id republished in a
    * later batch ships twice and the checksum honestly says so).
    *
    * Retry safety (`batchId` nonEmpty): the append runs under a
    * per-batch intent/done protocol at `path/batches/<batchId>/` —
    *
    *  1. `done` present → the batch committed; the call is a NO-OP
    *     (a replayed batch cannot ship duplicate docs);
    *  2. otherwise an INTENT snapshot is captured BEFORE any mutation:
    *     the old manifest rows plus the per-touched-shard data-file
    *     listing, sealed by an `intent_ok` marker (no `intent_ok` →
    *     any half-written snapshot is wiped and recaptured — the live
    *     manifest is still intact at that point because mutation only
    *     starts after the seal);
    *  3. any data file in a touched shard NOT in the sealed listing is
    *     a leftover of a crashed prior attempt of THIS batch and is
    *     deleted before re-appending — a crash at ANY point is repaired
    *     by simply re-running the same (batch, batchId) call.
    *
    * With `batchId` empty the protocol is skipped (one-shot callers
    * that never retry); a replayed empty-id batch double-appends and
    * the recomputed checksum honestly counts the duplicates.
    */
  def appendRelease(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      batchId: String = ""): Unit = {
    val spark = batch.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    def fs(p: String) =
      new org.apache.hadoop.fs.Path(p).getFileSystem(hconf)
    def exists(p: String) =
      fs(p).exists(new org.apache.hadoop.fs.Path(p))
    val batchDir = s"$path/batches/$batchId"
    if (batchId.nonEmpty && exists(s"$batchDir/done")) return
    val nShards = spark.read.parquet(s"$path/release_meta")
      .head().getAs[Int]("n_shards")
    val sharded = batch.withColumn("shard", shardCol(idCol, nShards))
      .localCheckpoint() // touched-set + write share one computation
    val touched = sharded.select(col("shard")).distinct()
      .collect().map(_.getLong(0)).toSet
    def listShardFiles(): Seq[(Long, String)] = touched.toSeq.flatMap {
      s =>
        val dir = new org.apache.hadoop.fs.Path(s"$path/data/shard=$s")
        val f = dir.getFileSystem(hconf)
        if (!f.exists(dir)) Seq.empty
        else f.listStatus(dir).toSeq.filter(_.isFile)
          .map(st => (s, st.getPath.getName))
    }
    import spark.implicits._
    // capture old rows BEFORE the tombstone (bounded: one per shard)
    val oldManifest: Array[org.apache.spark.sql.Row] =
      if (batchId.isEmpty) spark.read.parquet(s"$path/manifest").collect()
      else if (exists(s"$batchDir/intent_ok")) {
        // crashed prior attempt: restore its pre-mutation view, then
        // delete the files that attempt added to the touched shards
        val sealedFiles = spark.read.parquet(s"$batchDir/files")
          .as[(Long, String)].collect().toSet
        listShardFiles().filterNot(sealedFiles).foreach { case (s, n) =>
          fs(path).delete(new org.apache.hadoop.fs.Path(
            s"$path/data/shard=$s/$n"), false)
        }
        spark.read.parquet(s"$batchDir/old_manifest").collect()
      } else {
        // fresh attempt: seal the intent snapshot before any mutation
        fs(path).delete(new org.apache.hadoop.fs.Path(batchDir), true)
        val live = spark.read.parquet(s"$path/manifest")
        live.coalesce(1).write.parquet(s"$batchDir/old_manifest")
        listShardFiles().toDF("shard", "file")
          .coalesce(1).write.parquet(s"$batchDir/files")
        fs(path).mkdirs(new org.apache.hadoop.fs.Path(
          s"$batchDir/intent_ok"))
        live.collect()
      }
    val manifestDir = new org.apache.hadoop.fs.Path(s"$path/manifest")
    manifestDir.getFileSystem(hconf).delete(manifestDir, true)
    sharded.repartition(
        math.max(1, touched.size), col("shard"))
      .write.mode("append").partitionBy("shard")
      .option("compression", "gzip")
      .json(s"$path/data")
    val schema = org.apache.spark.sql.types.StructType(
      batch.schema.fields :+ org.apache.spark.sql.types.StructField(
        "shard", org.apache.spark.sql.types.LongType))
    val recomputed = manifestOf(
      spark.read.schema(schema).json(s"$path/data")
        .filter(col("shard").isInCollection(touched)), idCol, textCol)
    val keptRows = oldManifest.filterNot(r =>
      touched(r.getAs[Long]("shard")))
    val kept = spark.createDataFrame(
      spark.sparkContext.parallelize(keptRows.toSeq), recomputed.schema)
    recomputed.unionByName(kept)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/manifest")
    if (batchId.nonEmpty)
      fs(path).mkdirs(new org.apache.hadoop.fs.Path(s"$batchDir/done"))
  }

  /** The per-shard stats frame `(shard, n_docs, n_chars, checksum)` of
    * a sharded docs frame.
    */
  def manifestOf(
      sharded: DataFrame, idCol: String, textCol: String): DataFrame =
    sharded
      .select(col("shard").cast("long").as("shard"),
        length(col(textCol)).cast("long").as("__len"),
        docHash(idCol, textCol).as("__h"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__len")).as("n_chars"),
        expr("bit_xor(__h)").as("checksum"))

  /** A loaded release: the data rows (with their `shard`) plus the
    * published manifest. Fails when no manifest was committed.
    */
  final case class LoadedRelease(rows: DataFrame, manifest: DataFrame)

  def loadRelease(
      spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): LoadedRelease = {
    val manifest = spark.read.parquet(s"$path/manifest")
    LoadedRelease(spark.read.schema(schema).json(s"$path/data"), manifest)
  }

  /** Consumer-side audit: recompute every shard's stats from the data
    * actually on disk and return the rows that DISAGREE with the
    * published manifest (empty = the release verifies). Detects
    * truncated, corrupted, re-encoded, or silently-dropped shards —
    * including a manifest shard with no data at all (full outer join).
    */
  def validateRelease(
      loaded: LoadedRelease, idCol: String, textCol: String): DataFrame = {
    val actual = manifestOf(loaded.rows, idCol, textCol)
      .select(col("shard"), col("n_docs").as("__and"),
        col("n_chars").as("__anc"), col("checksum").as("__ack"))
    loaded.manifest.join(actual, Seq("shard"), "full_outer")
      .filter(!(col("n_docs") <=> col("__and")) ||
        !(col("n_chars") <=> col("__anc")) ||
        !(col("checksum") <=> col("__ack")))
  }
}
