package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.hash60

/** Trainable fastText-style quality classifier (Joulin et al. 2016's
  * linear text classifier over hashed bag-of-words features — the
  * supervised quality-filter axis of the DCLM/fastText recipe,
  * complementing [[TextAnalysis.unigramSurprisal]]'s unsupervised CCNet
  * axis): binary logistic regression, feature `hash60(word) mod
  * buckets`, document vector = the L1-normalized hashed bag plus a bias
  * feature, trained by full-batch gradient descent for a FIXED round
  * count with a deterministic SQL-replayable recipe (no rand(), no
  * data-order dependence — every sum is a commutative double
  * aggregation).
  *
  * Scale shape (the [[Similarity]] Lloyd-pipeline pattern): the corpus-
  * sized work per round is two linear, partial-aggregable shuffles over
  * the feature table — margins (`groupBy(doc).sum(x·w)` after a
  * BROADCAST join with the (buckets+1)-row weight table) and the
  * gradient (`groupBy(bucket).sum(x·residual)` after a 1:1 doc join) —
  * and the only driver state is the (buckets+1)-double weight vector
  * collected per round. A hot feature bucket combines map-side; no
  * window, no pair enumeration. Scoring is [[graft.functions
  * .HashedBagScoreExpr]] — a pure map over the scan, zero shuffles.
  */
object Classifier {

  /** A trained model: `weights(b)` for hashed buckets `b < buckets`,
    * bias at `weights(buckets)`. `ngrams` records the feature space
    * the model was trained in (1 = unigram bag, 2 = unigrams +
    * adjacent word bigrams) so scoring can never hash a different
    * feature set than training did.
    */
  final case class Model(
      weights: Array[Double], buckets: Int, ngrams: Int = 1) {
    require(weights.length == buckets + 1,
      "weights must have buckets+1 entries (bias last)")
    require(ngrams == 1 || ngrams == 2, "ngrams must be 1 or 2")
    def bias: Double = weights(buckets)
  }

  /** The document's feature-token array: its words, plus — for
    * `ngrams = 2`, the fastText recipe's main accuracy lever (Joulin
    * et al. 2016 §2: bag of n-grams as additional features captures
    * the word order a pure bag loses) — every adjacent word pair
    * joined with a single space (hashable as one string, and exactly
    * reproducible in SQL as `w[i] || ' ' || w[i+1]`).
    */
  private def featureTokens(textCol: Column, ngrams: Int): Column = {
    val ws = filter(split(trim(lower(textCol)), "\\s+"),
      w => length(w) > 0)
    if (ngrams == 1) ws
    else concat(ws,
      // guard: sequence(0, -1) would DESCEND, not produce empty
      when(size(ws) >= 2,
        transform(sequence(lit(0), size(ws) - 2),
          i => concat(element_at(ws, i + 1), lit(" "),
            element_at(ws, i + 2))))
        .otherwise(array().cast("array<string>")))
  }

  /** Hashed features `(idCol, __bucket, __x)`: for each document, one
    * row per occupied bucket with `x = count(features in bucket) /
    * n_features`, plus the constant bias row `(buckets, 1.0)` — having
    * the bias live as an ordinary feature keeps every training round
    * one uniform aggregate (and gives token-less documents a feature
    * row, so they still receive margins/gradients). With `ngrams = 2`
    * the feature universe is unigrams + adjacent bigrams in ONE shared
    * bucket space (the fastText layout); n_features = n + (n-1).
    */
  def hashedFeatures(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int,
      ngrams: Int = 1): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(ngrams == 1 || ngrams == 2, "ngrams must be 1 or 2")
    val toks = docs.select(col(idCol),
      featureTokens(col(textCol), ngrams).as("__ws"))
    val tokenRows = toks
      .select(col(idCol), size(col("__ws")).as("__n"),
        explode(col("__ws")).as("__w"))
      .select(col(idCol), col("__n"),
        pmod(hash60(col("__w")), lit(buckets.toLong)).as("__bucket"))
      .groupBy(col(idCol), col("__bucket"), col("__n"))
      .agg((count(lit(1)).cast("double") / col("__n")).as("__x"))
      .select(col(idCol), col("__bucket"), col("__x"))
    val biasRows = docs.select(col(idCol),
      lit(buckets.toLong).as("__bucket"), lit(1.0).as("__x"))
    tokenRows.union(biasRows)
  }

  /** Literal-weight cutoff for the fused training round: below it the
    * round's weight vector rides the plan as an array literal (the
    * margin is a per-row `aggregate` lookup — no join at all), above
    * it weights broadcast-join as a table. 4096 doubles keeps the plan
    * tree and codegen comfortable; a fastText-sized 10M-bucket space
    * takes the join path.
    */
  private val MaxLiteralBuckets = 4096

  /** Train by `rounds` full-batch GD steps from zero weights:
    * `w -= lr · mean_docs((sigmoid(w·x) − y) · x)`. `labelCol` must be
    * 0/1 (castable to double). Deterministic: same corpus → same
    * weights, bit-for-bit up to double-sum rounding.
    *
    * Round shape, small bucket spaces (≤ [[MaxLiteralBuckets]]): the
    * per-doc feature vectors group ONCE into a bounded
    * `array<struct<b,x>>` (≤ buckets+1 entries each — the bucket space
    * caps a doc's occupied buckets) with the label attached, so every
    * GD round is a SINGLE pass: margin = per-row array fold against
    * the round's literal weight array, gradient = one explode into a
    * (buckets+1)-group partial aggregate, one ≤ (buckets+1)-row
    * collect (the Lloyd-fold pattern). No per-round join — r17
    * measured the old two-joins-per-round form spending its 16.6 s on
    * 10 × join scheduling, not math. Larger bucket spaces keep the
    * broadcast-join rounds (a 10M-entry literal has no place in a
    * plan).
    */
  def train(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      buckets: Int = 64,
      rounds: Int = 3,
      lr: Double = 0.5,
      ngrams: Int = 1): Model = {
    require(rounds > 0, "rounds must be positive")
    val w = new Array[Double](buckets + 1)
    if (buckets + 1 <= MaxLiteralBuckets) {
      // per-doc feature vector in ONE native pass (same tokenizer +
      // bucket hash as scoring, [[graft.functions.HashedBagCountsExpr]])
      // with the label riding the same row: the feature build is a pure
      // map — no explode, no shuffle, no join
      import org.apache.spark.sql.GraftColumnCompat._
      // coalesce to '' so NULL-text docs get the bias-only vector the
      // exploded-table path gives them (split(null) would null __fv and
      // silently drop the doc from every round's gradient while still
      // counting it in nDocs — the two paths would train different
      // weights on the same corpus)
      val wordsCol = filter(
        split(trim(lower(coalesce(col(textCol), lit("")))), "\\s+"),
        w => length(w) > 0)
      val docFeats = docs.select(
        toColumn(graft.functions.HashedBagCountsExpr(
          toExpression(wordsCol), buckets, ngrams)).as("__fv"),
        col(labelCol).cast("double").as("__y"))
        .localCheckpoint()
      val nDocs = docFeats.count().toDouble // free: already materialized
      require(nDocs > 0, "cannot train on an empty corpus")
      var r = 0
      while (r < rounds) {
        // typedLit: ONE constant array literal — array(lit, ...) would
        // rebuild the 65-element array per lambda step per row
        val wArr = typedLit(w.toSeq)
        val margin = aggregate(col("__fv"), lit(0.0), (acc, f) =>
          acc + f.getField("x") * element_at(wArr, f.getField("b") + 1))
        val resid =
          (lit(1.0) / (lit(1.0) + exp(-margin)) - col("__y")).as("__r")
        // resid is computed BELOW the explode's Generate node — inside
        // the generate projection it would re-run the margin fold once
        // per feature row (O(|fv|²) per doc per round)
        val grad = docFeats
          .select(col("__fv"), resid)
          .select(col("__r"), explode(col("__fv")).as("f"))
          .groupBy(col("f.b").as("__bucket"))
          .agg(sum(col("f.x") * col("__r")).as("__g"))
          .collect() // bounded: <= buckets+1 rows
        grad.foreach { row =>
          w(row.getInt(0)) -= lr * row.getDouble(1) / nDocs
        }
        r += 1
      }
      return Model(w, buckets, ngrams)
    }
    val spark = docs.sparkSession
    import spark.implicits._
    // both tables feed every round; materialize once (same lifecycle
    // choice as the substring-dedup fan-out tables)
    val feats = hashedFeatures(docs, idCol, textCol, buckets, ngrams)
      .localCheckpoint()
    val labels = docs
      .select(col(idCol), col(labelCol).cast("double").as("__y"))
      .localCheckpoint()
    val nDocs = labels.count().toDouble // free: checkpoint materialized
    require(nDocs > 0, "cannot train on an empty corpus")
    var r = 0
    while (r < rounds) {
      val wDF = w.zipWithIndex
        .map { case (v, b) => (b.toLong, v) }.toSeq
        .toDF("__bucket", "__wt")
      val margins = feats.join(broadcast(wDF), Seq("__bucket"))
        .groupBy(col(idCol))
        .agg(sum(col("__x") * col("__wt")).as("__m"))
      val resid = labels.join(margins, Seq(idCol), "left")
        .select(col(idCol),
          (lit(1.0) / (lit(1.0) + exp(-coalesce(col("__m"), lit(0.0))))
            - col("__y")).as("__r"))
      val grad = feats.join(resid, Seq(idCol))
        .groupBy(col("__bucket"))
        .agg(sum(col("__x") * col("__r")).as("__g"))
        .collect() // bounded: <= buckets+1 rows, the Lloyd-fold pattern
      grad.foreach { row =>
        val b = row.getLong(0).toInt
        w(b) -= lr * row.getDouble(1) / nDocs
      }
      r += 1
    }
    Model(w, buckets, ngrams)
  }

  /** The model's score as a COLUMN over a text column — sigmoid(w·x)
    * in one native-expression map ([[graft.functions
    * .HashedBagScoreExpr]]), no feature materialization, no shuffle.
    * The single definition of scoring-side tokenization: [[score]] and
    * [[Pipeline.curate]]'s quality-model gate both use it, so the
    * feature space can never silently diverge from what [[train]]
    * learned on.
    */
  def scoreColumn(textCol: org.apache.spark.sql.Column,
      model: Model): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftColumnCompat._
    // the expression consumes WORDS and derives bigrams internally
    // when the model says so (ngrams rides in the Model, so a bigram
    // model can never be scored in the unigram space or vice versa)
    val wordsCol = filter(split(trim(lower(textCol)), "\\s+"),
      w => length(w) > 0)
    toColumn(graft.functions.HashedBagScoreExpr(
      toExpression(wordsCol), model.weights.toSeq, model.buckets,
      model.ngrams))
  }

  /** Score documents with a trained model: `(idCol, score)`. */
  def score(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: Model): DataFrame =
    docs.select(col(idCol), scoreColumn(col(textCol), model).as("score"))

  /** Threshold-sweep evaluation of a scored, labeled frame — the table
    * that turns "we trained a quality filter" into a DEPLOYMENT
    * decision (which `maxQualityScore` cut keeps how much junk vs
    * drops how much good text): for every threshold `j/buckets`,
    * confusion counts with positive = `labelCol >= 0.5` (junk) and
    * predicted-positive = `scoreCol > threshold`, plus precision and
    * recall (null when undefined).
    *
    * One pass: each row fans out to `buckets + 1` literal thresholds
    * and the confusion flags partial-aggregate — map-side combine
    * collapses every partition to `buckets + 1` rows before the one
    * tiny exchange. Nothing corpus-sized is sorted or collected.
    * Callers that need cross-engine-stable boundary behavior should
    * pass a pre-rounded score column (the harness rounds to 6).
    */
  def thresholdReport(
      scored: DataFrame,
      scoreCol: String,
      labelCol: String,
      buckets: Int = 20): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val ts = explode(array((0 to buckets).map(j =>
      lit(j.toDouble / buckets)): _*)).as("threshold")
    val flagged = scored
      .select(col(scoreCol).as("__s"),
        (col(labelCol) >= 0.5).as("__pos"), ts)
      .select(col("threshold"),
        when(col("__pos") && col("__s") > col("threshold"), 1L)
          .otherwise(0L).as("__tp"),
        when(!col("__pos") && col("__s") > col("threshold"), 1L)
          .otherwise(0L).as("__fp"),
        when(col("__pos") && !(col("__s") > col("threshold")), 1L)
          .otherwise(0L).as("__fn"),
        when(!col("__pos") && !(col("__s") > col("threshold")), 1L)
          .otherwise(0L).as("__tn"))
    flagged.groupBy(col("threshold"))
      .agg(sum(col("__tp")).as("tp"), sum(col("__fp")).as("fp"),
        sum(col("__fn")).as("fn"), sum(col("__tn")).as("tn"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"),
        col("tn"),
        round(try_divide(col("tp").cast("double"),
          col("tp") + col("fp")), 6).as("precision"),
        round(try_divide(col("tp").cast("double"),
          col("tp") + col("fn")), 6).as("recall"))
  }
}
