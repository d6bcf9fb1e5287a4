package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, max, min, shiftleft, shiftright}

/** Source/sink helpers. The reference has no I/O layer at all (tables
  * arrive as in-memory pandas objects — SURVEY §2.1); on Spark the engine
  * reads the columnar lake directly. Parquet is the harness format; the
  * same calls take orc/csv/json via `spark.read`.
  */
object Tables {

  val StarSchema: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  private val NanosFlag = "spark.sql.legacy.parquet.nanosAsLong"

  /** Read one table of the test lake. `events.ts` is normalized to
    * BIGINT nanoseconds whatever the lake's physical encoding
    * ([[normalizeEventTs]]).
    *
    * The TIMESTAMP(NANOS) encoding is only readable with the session's
    * `nanosAsLong` flag on; a read must not permanently mutate session
    * config, so the flag is set around schema resolution and RESTORED
    * whenever the lake turns out not to need it (µs/NTZ encodings —
    * the current lake). If the schema really is NANOS the flag stays
    * on for the session — scan execution re-reads it from the captured
    * conf, and flipping it back mid-plan would fail the scan; harness
    * entry points pin it in their builders anyway.
    */
  def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      val prev = spark.conf.getOption(NanosFlag)
      spark.conf.set(NanosFlag, "true")
      val df =
        try spark.read.parquet(s"$dir/$name.parquet")
        catch {
          case e: Throwable =>
            prev.fold(spark.conf.unset(NanosFlag))(
              spark.conf.set(NanosFlag, _))
            throw e
        }
      val nanosEncoded = df.schema.find(_.name == "ts")
        .exists(_.dataType == org.apache.spark.sql.types.LongType)
      if (!nanosEncoded)
        prev.fold(spark.conf.unset(NanosFlag))(spark.conf.set(NanosFlag, _))
      normalizeEventTs(df)
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Normalize an events frame's `ts` column to BIGINT nanoseconds —
    * the engine-wide convention every Events/streaming operator
    * assumes — regardless of the physical parquet type the lake
    * stores: TIMESTAMP(NANOS) arrives as BIGINT already (via the
    * `nanosAsLong` session flag, the only way Spark reads it),
    * TIMESTAMP/TIMESTAMP_NTZ (µs precision) convert via `unix_micros`.
    * The NTZ branch casts through session-local TIMESTAMP — every
    * harness entry point pins the session timezone to UTC, matching
    * how DuckDB's `epoch_*` functions treat the same naive values.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampType) =>
        df.withColumn("ts", unix_micros(col("ts")) * 1000L)
      case Some(TimestampNTZType) =>
        df.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case _ => df
    }
  }

  /** Read the whole star schema as a name → DataFrame map and register
    * temp views so `spark.sql` works over it.
    */
  def readAll(spark: SparkSession, dir: String): Map[String, DataFrame] =
    StarSchema.map { n =>
      val df = read(spark, dir, n)
      df.createOrReplaceTempView(n)
      n -> df
    }.toMap

  /** Read any lake format (parquet/csv/json/orc) — same engine surface,
    * different codec. CSV/JSON get an explicit schema (inference is a
    * full extra pass at scale).
    */
  def readAs(
      spark: SparkSession,
      path: String,
      format: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      options: Map[String, String] = Map.empty): DataFrame = {
    var r = spark.read.format(format).options(options)
    schema.foreach(s => r = r.schema(s))
    r.load(path)
  }

  /** Write partitioned by a column (e.g. a date) — the standard lake
    * layout so per-partition predicates prune whole directories.
    */
  def writePartitioned(
      df: DataFrame,
      path: String,
      format: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").format(format)
      .partitionBy(partitionCols: _*).save(path)

  /** Write a table bucketed+sorted by its join key: repeated joins and
    * groupBys on `keys` then skip the shuffle entirely (bucket pruning +
    * sorted merge). The standard prep step for fact tables that are
    * joined many times at scale.
    */
  def writeBucketed(
      df: DataFrame,
      path: String,
      table: String,
      keys: Seq[String],
      buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Morton (Z-order) interleave of pre-scaled integer lanes — the
    * multi-dimensional clustering key behind lake-layout OPTIMIZE
    * ZORDER (Morton 1966; the Delta/Iceberg data-skipping practice):
    * rows close in EVERY lane land close in z-value, so range-sorting
    * by it co-locates multi-column neighborhoods and parquet min/max
    * footer stats prune file scans for predicates on ANY prefix-free
    * subset of the lanes (a single-column sort skips only its leading
    * column). Each lane must already be in `[0, 2^bits)` — see
    * [[zorderScale]]; bit `b` of lane `i` lands at z-bit
    * `b * lanes + i`, a pure shift/or expression tree (codegen'd,
    * `bits * lanes` static terms, no UDF).
    */
  def zorderValue(lanes: Seq[Column], bits: Int = 16): Column = {
    require(lanes.size >= 2 && lanes.size <= 4,
      s"z-order wants 2-4 lanes, got ${lanes.size}")
    require(bits >= 1 && bits * lanes.size <= 62,
      s"bits * lanes must fit a positive long, got $bits * ${lanes.size}")
    val terms = for {
      (lane, i) <- lanes.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(
      shiftright(lane.cast("long"), b).bitwiseAND(lit(1L)),
      b * lanes.size + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Scale a numeric column into the `[0, 2^bits)` lane domain given
    * its global `(min, max)` — pure LONG arithmetic
    * (`(v - min) * (2^bits - 1) / (max - min)`, order-preserving,
    * engine-replayable). Constant columns collapse to lane 0.
    */
  def zorderScale(v: Column, mn: Long, mx: Long, bits: Int = 16): Column = {
    require(mx >= mn, s"max $mx < min $mn")
    // Spark's long / long is a DOUBLE divide; the cast back to long
    // still equals exact integer division here because both operands
    // are exact doubles (the require bounds the numerator under 2^53)
    // and the quotient's rounding error (~n·2^-52) is far smaller than
    // the closest a non-integer quotient can sit to an integer (1/den)
    require(mx - mn <= (1L << (53 - bits)),
      s"value range ${mx - mn} too wide for exact $bits-bit scaling")
    ((v.cast("long") - lit(mn)) * lit((1L << bits) - 1) /
      lit(math.max(1L, mx - mn))).cast("long")
  }

  /** Rewrite `df` Z-ordered on `zcols` (2-4 numeric columns): scale
    * each column by its global min/max (ONE tiny all-agg — 2 scalars
    * per column collected), range-partition by the interleaved z-value
    * into `numFiles` output files and sort within each — after which
    * every file's parquet footer carries tight min/max on ALL `zcols`,
    * so a reader's predicate on any of them prunes whole files. Cost:
    * the stats pass plus one range exchange with a global-sort's
    * sampling overhead SKIPPED (range partitioner sampling only — no
    * per-partition full sort beyond the z key).
    *
    * 100 TB shape: this is the background-compaction layout job — the
    * exchange is corpus-sized but runs once per rewrite window, and
    * every later multi-dimensional scan pays file-pruned I/O. The
    * z-value is a transient `__z` column dropped before the write: the
    * layout is carried by file boundaries + footer stats, not by a
    * payload column.
    */
  def writeZOrdered(
      df: DataFrame,
      zcols: Seq[String],
      path: String,
      numFiles: Int = 32,
      bits: Int = 16): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    val aggs = zcols.flatMap(c =>
      Seq(min(col(c).cast("long")), max(col(c).cast("long"))))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    // empty input (or an all-null z column): min/max aggregate to null
    // — short-circuit to a plain empty write instead of an opaque NPE;
    // there is nothing to cluster and the schema still lands on disk
    if ((0 until 2 * zcols.size).exists(stats.isNullAt)) {
      require(df.isEmpty,
        s"z-order columns ${zcols.mkString(",")} are entirely null " +
          "on a non-empty input - cannot derive a lane scale")
      df.write.mode("overwrite").parquet(path)
      return
    }
    val lanes = zcols.zipWithIndex.map { case (c, i) =>
      zorderScale(col(c), stats.getLong(2 * i), stats.getLong(2 * i + 1),
        bits)
    }
    df.withColumn("__z", zorderValue(lanes, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Daily-ingest append to a Z-ordered table: the batch lands as
    * `numFiles` NEW files with NO re-clustering — cheap (no stats
    * pass, no corpus exchange), but each appended file's footer spans
    * the batch's whole value range, so multi-dimensional pruning
    * degrades as appends accumulate. [[compactZOrdered]] is the
    * OPTIMIZE twin that restores it — the standard lake trade
    * (Delta/Iceberg `OPTIMIZE ZORDER`): appends stay on the ingest
    * path's latency budget, clustering is a background job.
    */
  def appendZOrdered(df: DataFrame, path: String, numFiles: Int = 8): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    df.repartition(numFiles).write.mode("append").parquet(path)
  }

  /** The OPTIMIZE ZORDER maintenance job: re-run the stats pass + z
    * range exchange over the WHOLE table and swap the re-clustered
    * files in. The rewrite stages to a side directory first (a scan
    * must never overlap the directory it rewrites), then swaps via two
    * renames. A crash can land between the renames (table absent at
    * `path`, data only in the side dirs) — re-running detects that
    * half-swap on entry and rolls it forward (complete staged copy)
    * or back (old table) BEFORE any delete, so every crash point
    * converges without data loss. Repeated compaction of an unchanged
    * table is idempotent on content (same stats → same lanes → same
    * layout).
    */
  def compactZOrdered(
      spark: SparkSession,
      path: String,
      zcols: Seq[String],
      numFiles: Int = 32,
      bits: Int = 16): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val fs = p(path).getFileSystem(hconf)
    // Crash recovery FIRST, before any delete: a failure between the
    // two swap renames leaves the table absent at `path` with the data
    // living only at `path.old` (and possibly `path.compact`). Deleting
    // the side directories at that point would be permanent data loss —
    // roll the half-swap forward (staged copy is complete by
    // construction: it is written before rename #1) or back (old table)
    // so `path` exists again before the normal pre-clean runs.
    if (!fs.exists(p(path))) {
      if (fs.exists(p(s"$path.compact"))) {
        if (!fs.rename(p(s"$path.compact"), p(path)))
          throw new IllegalStateException(
            s"z-order compaction recovery (roll-forward) failed at $path")
      } else if (fs.exists(p(s"$path.old"))) {
        if (!fs.rename(p(s"$path.old"), p(path)))
          throw new IllegalStateException(
            s"z-order compaction recovery (roll-back) failed at $path")
      }
    }
    fs.delete(p(s"$path.compact"), true)
    fs.delete(p(s"$path.old"), true)
    writeZOrdered(spark.read.parquet(path), zcols, s"$path.compact",
      numFiles, bits)
    if (!fs.rename(p(path), p(s"$path.old")) ||
        !fs.rename(p(s"$path.compact"), p(path)))
      throw new IllegalStateException(s"z-order compaction swap failed at $path")
    fs.delete(p(s"$path.old"), true)
  }
}
