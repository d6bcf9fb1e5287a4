package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid retrieval composition: fuse per-query ranked lists from
  * heterogeneous retrievers (BM25 lexical, embedding cosine, ...) into
  * one ranking. The 100 TB shape is inherited, not invented: every
  * input list is already k-BOUNDED per query (the retrievers' top-k
  * contracts), so fusion touches `|queries| × k × |lists|` rows total —
  * a union, one partial-aggregable sum, and one bounded
  * [[TopK.topKPerKey]]. Nothing corpus-sized exists here.
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009):
    * `rrf(d) = Σ_lists 1 / (c + rank_list(d))`, the standard
    * training-free way to merge lexical and vector retrieval. Each
    * input frame must carry `(qidCol, idCol, rankCol)` with rank
    * 1-based within query; docs absent from a list simply contribute
    * nothing (the published behavior). `c = 60` is the paper's
    * constant.
    *
    * The fused score is rounded to 6 decimals BEFORE the final top-k
    * so rankings are engine-stable (the [[graft.functions
    * .VectorExpressions.cosineFast]] convention); ties break by doc id
    * ASC via [[TopK.topKPerKey]]. Output
    * `(qidCol, idCol, rrf, rk)` — the k best fused docs per query.
    */
  def rrfFuse(
      ranked: Seq[DataFrame],
      qidCol: String,
      idCol: String,
      rankCol: String,
      k: Int,
      c: Int = 60): DataFrame = {
    require(ranked.nonEmpty, "need at least one ranked list")
    require(k > 0 && c >= 0, "k must be positive, c non-negative")
    val lists = ranked.map(_.select(col(qidCol), col(idCol),
      col(rankCol).cast("int").as("__rk")))
    val fused = lists.reduce(_ unionByName _)
      .groupBy(col(qidCol), col(idCol))
      .agg(round(sum(lit(1.0) / (lit(c.toDouble) + col("__rk"))), 6)
        .as("rrf"))
    TopK.topKPerKey(fused, Seq(qidCol), "rrf", idCol, k)
  }

  /** Ranked-retrieval recall@k — how every ANN deployment quantifies
    * its recall/latency trade (the FAISS benchmarking practice): the
    * fraction of the ground-truth top-k a candidate retriever also
    * returned, per query. Both inputs are k-BOUNDED ranked frames
    * `(qidCol, idCol, rankCol)` (brute truth vs IVF/PQ/LSH candidates,
    * or any two retrievers against each other), so the comparison is
    * one bounded join + a per-query aggregate — |queries|·k rows
    * total, nothing corpus-sized. Output
    * `(qidCol, n_truth, n_hit, recall)`; queries absent from the
    * candidate frame honestly read recall 0.
    */
  def recallAtK(
      candidates: DataFrame,
      truth: DataFrame,
      qidCol: String,
      idCol: String,
      rankCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val c = candidates.filter(col(rankCol) <= k)
      .select(col(qidCol), col(idCol), lit(1).as("__hit"))
    val t = truth.filter(col(rankCol) <= k)
      .select(col(qidCol), col(idCol))
    t.join(c, Seq(qidCol, idCol), "left")
      .groupBy(col(qidCol))
      .agg(count(lit(1)).as("n_truth"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_hit"))
      .withColumn("recall",
        round(col("n_hit").cast("double") / col("n_truth"), 6))
  }

  /** Mean-reciprocal-rank companion to [[recallAtK]]: per query, the
    * reciprocal rank of the FIRST candidate that appears in the
    * ground-truth top-k (0.0 when none does) — the position-sensitive
    * retrieval metric (recall says whether truth was found, RR says
    * how high). Same bounded shapes: k-bounded frames in, one join +
    * one min aggregate, |queries| rows out. `rr` rounds to 6 (1/3 is
    * not exact; the cross-engine convention). Macro-average the
    * column for the headline MRR.
    */
  def reciprocalRankAtK(
      candidates: DataFrame,
      truth: DataFrame,
      qidCol: String,
      idCol: String,
      rankCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val c = candidates.filter(col(rankCol) <= k)
      .select(col(qidCol), col(idCol), col(rankCol).cast("int").as("__crk"))
    val t = truth.filter(col(rankCol) <= k)
      .select(col(qidCol), col(idCol))
    t.join(c, Seq(qidCol, idCol), "left")
      .groupBy(col(qidCol))
      .agg(min(col("__crk")).as("first_hit_rank"))
      .select(col(qidCol), col("first_hit_rank"),
        coalesce(round(lit(1.0) / col("first_hit_rank"), 6), lit(0.0))
          .as("rr"))
  }

  /** Binary-gain nDCG@k, completing the eval triple with [[recallAtK]]
    * (set overlap) and [[reciprocalRankAtK]] (first hit): position-
    * discounted credit for EVERY true neighbor the candidate list
    * holds — `DCG = Σ 1/log2(1+rank)` over candidate positions
    * occupied by truth members, normalized by the ideal
    * `IDCG = Σ_{i≤n_truth} 1/log2(1+i)` (Järvelin & Kekäläinen 2002,
    * binary gains). Same bounded shapes; `ndcg` rounds to 6. Output
    * `(qidCol, n_truth, dcg, ndcg)`.
    */
  def ndcgAtK(
      candidates: DataFrame,
      truth: DataFrame,
      qidCol: String,
      idCol: String,
      rankCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val c = candidates.filter(col(rankCol) <= k)
      .select(col(qidCol), col(idCol), col(rankCol).cast("int").as("__crk"))
    val t = truth.filter(col(rankCol) <= k)
      .select(col(qidCol), col(idCol))
    def disc(r: org.apache.spark.sql.Column) =
      lit(1.0) / (log(r.cast("double") + 1.0) / log(lit(2.0)))
    t.join(c, Seq(qidCol, idCol), "left")
      .groupBy(col(qidCol))
      .agg(count(lit(1)).as("n_truth"),
        coalesce(sum(when(col("__crk").isNotNull, disc(col("__crk")))),
          lit(0.0)).as("__dcg"))
      .withColumn("__idcg",
        aggregate(sequence(lit(1), col("n_truth").cast("int")),
          lit(0.0), (acc, i) => acc + disc(i)))
      .select(col(qidCol), col("n_truth"),
        round(col("__dcg"), 6).as("dcg"),
        round(col("__dcg") / col("__idcg"), 6).as("ndcg"))
  }

  /** Hard-negative mining for embedding-training data (the DPR/E5
    * practice — Karpukhin et al. 2020 §3.2: the most useful negatives
    * are the highest-scoring NON-positives): given any k-bounded
    * ranked candidate frame `(query_id, neighbor_id, cos_sim, ...)` —
    * brute, IVF, PQ, or RRF-fused, the operator is lens-agnostic —
    * remove candidates that are near-duplicates of their anchor (they
    * are hidden POSITIVES: training against them teaches the model to
    * push paraphrases apart) and keep the `kNeg` best remaining per
    * anchor.
    *
    * `pairs` is any undirected near-dup pair frame `(id_a, id_b)`
    * (LSH, SimHash, cosine, pHash — every family emits this shape).
    * Bounded end to end: |anchors|·k candidate rows in, |anchors|·kNeg
    * out; the pair set is near-dup-sized and the anti-join keys on
    * (query, neighbor) directly. The re-rank window runs on ≤ k rows
    * per anchor. Output `(query_id, neighbor_id, cos_sim, neg_rank)`.
    */
  def hardNegatives(
      candidates: DataFrame,
      pairs: DataFrame,
      kNeg: Int): DataFrame = {
    require(kNeg > 0, "kNeg must be positive")
    val dup = pairs.select(col("id_a").as("query_id"),
        col("id_b").as("neighbor_id"))
      .unionByName(pairs.select(col("id_b").as("query_id"),
        col("id_a").as("neighbor_id")))
    val kept = candidates.join(dup,
      Seq("query_id", "neighbor_id"), "left_anti")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    kept.withColumn("neg_rank", row_number().over(w))
      .filter(col("neg_rank") <= kNeg)
      .select(col("query_id"), col("neighbor_id"),
        col("cos_sim"), col("neg_rank"))
  }
}
