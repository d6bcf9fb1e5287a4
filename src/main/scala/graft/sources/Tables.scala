package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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
}
