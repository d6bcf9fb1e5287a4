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
}
