package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Geometric mean as a typed `Aggregator` — the engine's example of the
  * custom-UDAF surface (reference `to_puffy(aggfunc=...)` accepts
  * arbitrary reducers, `puffbird/frame.py:974-976`; built-in Column
  * aggregates cover most cases, an `Aggregator[IN, BUF, OUT]` covers the
  * rest). Buffer is (sum of logs, count): partial aggregation and merge
  * work map-side like any algebraic aggregate.
  */
object GeoMean extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), x: Double): (Double, Long) =
    if (x > 0) (b._1 + math.log(x), b._2 + 1) else b
  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Double, Long)): Double =
    if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** SQL registration of the engine's custom expressions, making them
  * usable from `spark.sql` alongside the DataFrame API.
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim",
      exprs => CosineSimExpr(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("shingles3",
      exprs => ShinglesExpr(exprs.head, 3), "scala_udf")
    reg.createOrReplaceTempFunction("hash60_array",
      exprs => Hash60ArrayExpr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("doc_fingerprint",
      exprs => FingerprintExpr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("lsh_bucket8",
      exprs => LshBucketExpr(exprs.head, 8), "scala_udf")
    reg.createOrReplaceTempFunction("json_explode",
      exprs => JsonExplodeExpr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("variant_explode",
      exprs => VariantExplodeExpr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sigs16",
      exprs => MinHashSigsExpr(exprs.head, 16), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_buckets",
      exprs => MinHashBucketsExpr(exprs.head, numHashes = 16, bands = 8),
      "scala_udf")
    reg.createOrReplaceTempFunction("simhash16",
      exprs => SimHashExpr(exprs.head, 16), "scala_udf")
    reg.createOrReplaceTempFunction("simhash_bands",
      exprs => SimHashBandsExpr(exprs.head, bits = 16, bands = 4),
      "scala_udf")
    reg.createOrReplaceTempFunction("token_stats",
      exprs => TokenStatsExpr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("image_dims",
      exprs => ImageDimsExpr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("lsh_probes8",
      exprs => LshProbesExpr(exprs.head, planes = 8, probes = 3), "scala_udf")
    reg.createOrReplaceTempFunction("normalize_text",
      exprs => NormalizeTextExpr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("char_shingles3",
      exprs => CharShinglesExpr(exprs.head, 3), "scala_udf")
    reg.createOrReplaceTempFunction("ngrams3",
      exprs => NgramsExpr(exprs.head, 3), "scala_udf")
    reg.createOrReplaceTempFunction("audio_info",
      exprs => AudioInfoExpr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("video_info",
      exprs => VideoInfoExpr(exprs.head), "scala_udf")
    spark.udf.register("geo_mean", udaf(GeoMean))
  }
}
