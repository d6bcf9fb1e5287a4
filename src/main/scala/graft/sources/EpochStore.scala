package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned-epoch artifact commit — the shared layout under
  * [[graft.operators.Sketches]]' sketch stores and
  * [[graft.operators.Sampling]]'s sample index:
  *
  *   registers_v{N}/   payload parquet for epoch N
  *   meta/             sketch parameters + `version` — the commit
  *                     pointer, written LAST
  *
  * The new epoch directory is written FIRST (old epoch untouched), meta
  * flips to it atomically last, and stale epochs are best-effort cleaned
  * afterwards — every crash window leaves a LOADABLE artifact (either
  * the old epoch or the new one), which matters for incremental
  * artifacts whose value is the history they have already absorbed.
  * Contrast the Packs/DedupIndex tombstone order (fail-loud-but-lossy):
  * corpus-sized artifacts cannot afford the full rewrite an epoch
  * commit implies, and append files instead; everything committed here
  * is BOUNDED (≤ 2^p registers, depth·width counters, k sample rows),
  * so rewriting per epoch costs nothing.
  */
private[graft] object EpochStore {

  def fs(spark: SparkSession, path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The committed meta row; AnalysisException when nothing committed. */
  def readMeta(spark: SparkSession, path: String): org.apache.spark.sql.Row =
    spark.read.parquet(s"$path/meta").head()

  def hasMeta(spark: SparkSession, path: String): Boolean =
    try { readMeta(spark, path); true }
    catch { case _: org.apache.spark.sql.AnalysisException => false }

  def epochPath(path: String, version: Long): String =
    s"$path/registers_v$version"

  /** Commit one epoch: payload first, meta (carrying `version` plus
    * store-specific parameters) last, stale epochs cleaned after (a
    * leftover directory is inert — meta names the live epoch — and the
    * next commit retries the delete).
    */
  def writeEpoch(
      spark: SparkSession,
      path: String,
      payload: DataFrame,
      meta: DataFrame,
      version: Long): Unit = {
    // bounded payload: one file
    payload.coalesce(1).write.mode("overwrite")
      .parquet(epochPath(path, version))
    meta.coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    val f = fs(spark, path)
    val base = new org.apache.hadoop.fs.Path(path)
    if (f.exists(base)) f.listStatus(base).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("registers_v") &&
          n.stripPrefix("registers_v") != version.toString)
        f.delete(st.getPath, true)
    }
  }
}
