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
  *
  * Whole-relation operators that have no scalar-function form are on
  * the SQL surface too, as follows (exercised verbatim by ParitySpec's
  * "SQL surface" test):
  *
  *  - '''group top-k''': the bounded-heap partial aggregate
  *    [[graft.operators.TopKAggregator]] registers as `group_topk3`
  *    (other k: `spark.udf.register("group_topkN", udaf(new
  *    TopKAggregator(N), Encoders.product[TopKItem]))`). Usage:
  *    {{{
  *    SELECT k, it.id, it.ord, CAST(pos + 1 AS INT) AS rk
  *    FROM (SELECT k, group_topk3(CAST(score AS DOUBLE),
  *                                CAST(id AS BIGINT)) AS tk
  *          FROM t GROUP BY k)
  *    LATERAL VIEW posexplode(tk.items) AS pos, it
  *    }}}
  *    — the same rows `row_number() <= 3` over the window would keep,
  *    with the map-side-combinable plan shape.
  *
  *  - '''as-of join''' ([[graft.operators.AsofJoin]]'s single-window
  *    union form, linear in |left| + |right|):
  *    {{{
  *    WITH u AS (
  *      SELECT key, ts, 1 AS src,
  *             named_struct('ts', ts, 'lv', lv) AS lp,
  *             CAST(NULL AS DOUBLE) AS rv FROM l
  *      UNION ALL
  *      SELECT key, ts, 0 AS src, NULL, rv FROM r),
  *    m AS (SELECT *, last(rv, true) OVER (PARTITION BY key
  *            ORDER BY ts, src ROWS BETWEEN UNBOUNDED PRECEDING
  *            AND CURRENT ROW) AS rm FROM u)
  *    SELECT key, lp.ts AS ts, lp.lv AS lv, rm AS rv
  *    FROM m WHERE lp IS NOT NULL
  *    }}}
  *    (swap the src tags for strictly-before semantics).
  *
  *  - '''range join''' ([[graft.operators.RangeJoin]]'s bin-bucketized
  *    equi-join, never a nested loop):
  *    {{{
  *    WITH lb AS (SELECT *, CAST(floor(v / 10.0) AS BIGINT) AS bin
  *                FROM l),
  *    rb AS (SELECT r.*, b AS bin FROM r
  *           LATERAL VIEW explode(sequence(
  *             CAST(floor(lo / 10.0) AS BIGINT),
  *             CAST(floor(hi / 10.0) AS BIGINT))) AS b)
  *    SELECT * FROM lb JOIN rb USING (bin)
  *    WHERE v >= lo AND v <= hi
  *    }}}
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
    reg.createOrReplaceTempFunction("webm_info",
      exprs => WebmInfoExpr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("image_dhash",
      exprs => DHashExpr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("byte_shingles8",
      exprs => ByteShinglesExpr(exprs.head, 8), "scala_udf")
    // r11 additions: fused payload hashing, winnowing, repetition
    // stats, positional gram hashes, fixture-vocab BPE counting/ids
    reg.createOrReplaceTempFunction("byte_shingle_hashes8",
      exprs => ByteShingleHashesExpr(exprs.head, 8), "scala_udf")
    reg.createOrReplaceTempFunction("winnow7_4",
      exprs => WinnowExpr(exprs.head, 7, 4), "scala_udf")
    reg.createOrReplaceTempFunction("repetition_stats",
      exprs => RepetitionStatsExpr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("word_gram_hash60_12",
      exprs => WordGramHash60Expr(exprs.head, 12), "scala_udf")
    reg.createOrReplaceTempFunction("bpe_count_fixture",
      exprs => BpeTokenCountExpr(exprs.head, Bpe.fixtureMerges), "scala_udf")
    reg.createOrReplaceTempFunction("bpe_ids_fixture",
      exprs => BpeTokenIdsExpr(exprs.head, Bpe.fixtureMerges), "scala_udf")
    // r13 additions: the substring-dedup removal-grade gram hashes
    // (128-bit — these, not the 60-bit ranking hash, are what the
    // engine's dedupSubstrings/dedupSubstringsBpe run on) and the
    // token-space rewrite
    reg.createOrReplaceTempFunction("word_gram_hash128_12",
      exprs => WordGramHash128Expr(exprs.head, 12), "scala_udf")
    reg.createOrReplaceTempFunction("int_gram_hash128_40",
      exprs => IntGramHash128Expr(exprs.head, 40), "scala_udf")
    reg.createOrReplaceTempFunction("bpe_token_remove_fixture40",
      exprs => BpeTokenRemoveExpr(exprs(0), exprs(1), 40, Bpe.fixtureMerges),
      "scala_udf")
    // r14 additions: the round's scorers as fixture-parameterized SQL
    // forms (the bpe_*_fixture pattern — arithmetic pinned from SQL;
    // trained deployments construct the expressions with real params)
    reg.createOrReplaceTempFunction("hashed_bag_score_fixture",
      exprs => HashedBagScoreExpr(exprs.head,
        HashedBagScoreExpr.fixtureWeights,
        HashedBagScoreExpr.FixtureBuckets), "scala_udf")
    reg.createOrReplaceTempFunction("hashed_bag_score_fixture_bi",
      exprs => HashedBagScoreExpr(exprs.head,
        HashedBagScoreExpr.fixtureWeights,
        HashedBagScoreExpr.FixtureBuckets, ngrams = 2), "scala_udf")
    reg.createOrReplaceTempFunction("langid_nb_score_fixture",
      exprs => LangIdNbScoreExpr(exprs.head,
        LangIdNbScoreExpr.fixtureProfile), "scala_udf")
    // HTML -> text extraction: a pure composition of built-in
    // expressions (regexp_replace/replace chain), registered by
    // converting the SAME Column chain the Scala API uses — one
    // definition, two surfaces
    reg.createOrReplaceTempFunction("html_extract_text",
      exprs => TextFunctions.htmlExtractExpr(exprs.head), "scala_udf")
    spark.udf.register("geo_mean", udaf(GeoMean))
    // group top-k from SQL (see object scaladoc for the full recipe)
    spark.udf.register("group_topk3",
      udaf(new graft.operators.TopKAggregator(3),
        Encoders.product[graft.operators.TopKItem]))
  }
}
