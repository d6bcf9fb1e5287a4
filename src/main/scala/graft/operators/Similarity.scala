package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions.cosineFast

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Baseline: brute-force cosine top-k (exact). Scale
  * path: random-hyperplane LSH bucketing — search only within a bucket,
  * turning the quadratic scan into an equi-join.
  */
object Similarity {

  /** Exact brute-force top-k by cosine: every query row is compared with
    * every corpus row. The query set is broadcast (it MUST be small —
    * that is the contract of a brute-force scan), so the corpus is
    * streamed once with no shuffle; ranking shuffles only
    * |queries| × |corpus| similarity rows.
    *
    * The contract is ENFORCED, not advisory: the query side is counted
    * up front and the call fails fast above `maxQueries` — without the
    * guard a caller passing a large query frame gets a silent
    * near-cartesian (|q|×|corpus| scored rows) instead of an error
    * pointing at the ANN variants, which are the scale path. The count
    * is one cheap job on the (small, by contract) query side; the
    * corpus side is never counted.
    *
    * Ties are broken by corpus id so results are deterministic.
    */
  def knnBruteForce(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      maxQueries: Int = 100000): DataFrame = {
    // maxQueries = Int.MaxValue is the documented escape hatch — the
    // +1 probe must not overflow into a negative limit
    val probe = if (maxQueries >= Int.MaxValue) Int.MaxValue
      else maxQueries + 1
    val nq = queries.select(col(idCol)).limit(probe).count()
    require(nq <= maxQueries,
      s"knnBruteForce query side exceeds maxQueries=$maxQueries rows; " +
        "it is broadcast and scored against EVERY corpus row — use the " +
        "ANN variants (lshTopK/ivfTopK) for large query sets, or raise " +
        "maxQueries explicitly if the cross product is intended")
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("__qv")))
    // spread (gated): parallelize the scan side from one small file; at
    // scale the file splits already parallelize the broadcast-join probe
    // and a pre-join shuffle would be pure waste
    val c = Spread.ifNarrow(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv")),
      col("neighbor_id"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineFast(col("__qv"), col("__cv")).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("knn_rank", row_number().over(w))
      .filter(col("knn_rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane coefficient for plane `j`,
    * vector dimension `k` (0-based): uniform-ish in [-1, 1). Pure integer
    * arithmetic so any engine reproduces it exactly.
    */
  def hyperplaneCoef(j: Int, k: Column): Column =
    ((lit(j.toLong * 73856093L) + k * 19349663L) % 2000L - 1000L) / 1000.0

  /** Random-hyperplane LSH bucket id: bit j of the bucket is the sign of
    * the dot product with hyperplane j. Cosine-similar vectors collide
    * with high probability. Linear scan, no shuffle; native expression
    * (one loop over the vector computes all planes). `dim` is implied by
    * the vector length.
    */
  def lshBucket(vec: Column, planes: Int, dim: Int): Column = {
    import org.apache.spark.sql.GraftColumnCompat._
    toColumn(graft.functions.LshBucketExpr(toExpression(vec), planes))
  }

  /** Bucket assignment for a whole table: (id, bucket). */
  def lshBuckets(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      planes: Int = 8,
      dim: Int = 64): DataFrame =
    vecs.select(col(idCol),
      lshBucket(col(vecCol), planes, dim).as("bucket"))

  /** IVF cell assignment: each vector goes to its nearest centroid
    * (cosine, deterministic tie-break on centroid id). Centroids are
    * broadcast — assignment is one linear pass. `centroids` must be
    * small ((centroid_id, vec) pairs); at real scale they come from a
    * sampled k-means, here from any deterministic selection.
    */
  def ivfAssign(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame): DataFrame = {
    val cents = broadcast(centroids)
    // __csim is cosineFast, which is ALREADY rounded to 6 decimals — the
    // window therefore ranks by the same round(cosine, 6) the DuckDB
    // oracles use, so near-ties resolve identically on both engines via
    // the centroid-id tie-break (no raw-double ordering anywhere)
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__csim").desc, col("centroid_id").asc)
    vecs.join(cents)
      .select(col(idCol), col(vecCol),
        col("centroid_id"),
        cosineFast(col(vecCol), col("__cv")).as("__csim"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col(vecCol), col("centroid_id"))
  }

  /** Embedding-space outlier detection — the vector-side quality gate
    * (OOD/noise docs sit far from every topic cluster; dropping or
    * down-weighting them is standard embedding-curation practice):
    * assign each vector to its nearest centroid, compute each
    * cluster's mean/σ of the member→centroid cosine, flag members
    * more than `z` σ BELOW their cluster mean. Complements SemDeDup's
    * within-cell near-dup drop — that removes redundancy, this
    * removes isolation.
    *
    * Scale shape: one broadcast-centroid assignment pass (the
    * [[ivfAssign]] plan, keeping the similarity), one
    * partial-aggregable per-cluster aggregate (≤ |centroids| rows,
    * broadcast back), one stateless flag expression. Engine-stable by
    * the family's conventions: cosines are pre-rounded
    * ([[graft.functions.VectorExpressions.cosineFast]]), and the
    * cluster sums round to 6 BEFORE the mean/σ derivation (the bitext
    * margin convention), so both engines derive identical thresholds.
    *
    * Output `(idCol, centroid_id, cos_sim, cluster_mean, flagged)` for
    * every vector.
    */
  def embeddingOutliers(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      z: Double = 2.0): DataFrame = {
    require(z >= 0, "z must be non-negative")
    val cents = broadcast(centroids)
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("cos_sim").desc, col("centroid_id").asc)
    val assigned = vecs.join(cents)
      .select(col(idCol), col("centroid_id"),
        cosineFast(col(vecCol), col("__cv")).as("cos_sim"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("centroid_id"), col("cos_sim"))
    val stats = assigned.groupBy(col("centroid_id")).agg(
      count(lit(1)).as("__n"),
      round(sum(col("cos_sim")), 6).as("__s1"),
      round(sum(col("cos_sim") * col("cos_sim")), 6).as("__s2"))
    val m = col("__s1") / col("__n")
    val sd = sqrt(greatest(
      col("__s2") / col("__n") - m * m, lit(0.0)))
    assigned.join(broadcast(stats), Seq("centroid_id"))
      .select(col(idCol), col("centroid_id"), col("cos_sim"),
        round(m, 6).as("cluster_mean"),
        (col("cos_sim") < m - lit(z) * sd).as("flagged"))
  }

  /** Like [[ivfAssign]] but keeps each vector's `probes` nearest cells
    * (multi-probe): the standard recall knob — a query near a cell
    * boundary also searches the adjacent cell(s). Output rows fan out
    * `probes`× on the query side only.
    */
  def ivfAssignProbes(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      probes: Int): DataFrame =
    ivfAssignRanked(vecs, idCol, vecCol, centroids, probes)
      .select(col(idCol), col(vecCol), col("centroid_id"))

  /** [[ivfAssignProbes]] keeping the probe rank (`__probe_rn` = 1 for
    * the nearest cell). Lets one ranked frame serve BOTH sides of a
    * multi-probe search: rank-1 rows are exactly [[ivfAssign]]'s
    * output, so the corpus side is a post-window filter on the same
    * subtree instead of a second scoring pass — with identical window
    * limits on both sides the pre-window exchange is reused, where a
    * `rank = 1` window next to a `rank <= probes` window plans two
    * different `WindowGroupLimit` partial limits and two full scoring
    * joins.
    */
  def ivfAssignRanked(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      probes: Int): DataFrame = {
    val cents = broadcast(centroids)
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__csim").desc, col("centroid_id").asc)
    vecs.join(cents)
      .select(col(idCol), col(vecCol),
        col("centroid_id"),
        cosineFast(col(vecCol), col("__cv")).as("__csim"))
      .withColumn("__probe_rn", row_number().over(w))
      .filter(col("__probe_rn") <= probes)
      .select(col(idCol), col(vecCol), col("centroid_id"),
        col("__probe_rn"))
  }

  /** IVF top-k: assign every vector to its nearest centroid cell, then
    * brute-force cosine *within* the cell. The search join keys on
    * centroid_id — shuffle is linear. `probes` > 1 lets each QUERY
    * vector search its `probes` nearest cells (multi-probe), recovering
    * cell-boundary neighbors at `probes`× the query-side join volume;
    * the corpus side always sits in exactly one cell, so a (query,
    * neighbor) pair still matches at most once and no dedup is needed.
    * The coarse quantizer here is a deterministic id-based selection so
    * results are reproducible (swap in sampled k-means centroids at
    * scale — the plan shape is identical).
    */
  def ivfTopK(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroidPred: Column,
      probes: Int = 1): DataFrame = {
    val centroids = vecs.filter(centroidPred)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("__cv"))
    // no explicit repartition: the self-join below plans its own
    // (centroid_id) exchange; for probes = 1 both sides are the identical
    // subtree so the exchange is built once and AQE-reused. For
    // probes > 1 both sides derive from ONE ranked frame (same window
    // limit) — the corpus side filters probe rank 1 post-window, so the
    // scoring join + its exchange are built once instead of per-side
    // (a rank-1 window next to a rank<=probes window plans different
    // WindowGroupLimit partial limits and defeats exchange reuse).
    val (a, b) =
      if (probes == 1) {
        val assigned = ivfAssign(vecs, idCol, vecCol, centroids)
        (assigned.as("a"), assigned.as("b"))
      } else {
        val ranked = ivfAssignRanked(vecs, idCol, vecCol, centroids, probes)
        (ranked.drop("__probe_rn").as("a"),
          ranked.filter(col("__probe_rn") === 1)
            .drop("__probe_rn").as("b"))
      }
    val scored = a.join(b,
        col("a.centroid_id") === col("b.centroid_id") &&
        col(s"a.$idCol") =!= col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("query_id"),
        col(s"b.$idCol").as("neighbor_id"),
        cosineFast(col(s"a.$vecCol"), col(s"b.$vecCol")).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("knn_rank", row_number().over(w))
      .filter(col("knn_rank") <= k)
  }

  /** Lloyd's k-means for IVF coarse quantizers, as pure DataFrame ops:
    * per iteration, assign every vector to its nearest centroid
    * (broadcast join) and recompute centroids as element-wise means
    * (explode to (cell, dim) and aggregate — one shuffle per iteration,
    * linear in corpus size).
    *
    * Seeding is a deterministic pseudo-random sample: the `k` vectors
    * with the smallest `hash60(id)` — a global top-k, which Spark plans
    * as `TakeOrderedAndProject` (per-partition top-k, driver merges
    * k×partitions rows). No global sort, no unpartitioned window, no
    * driver-side `count()` — the r3 seeding serialized the whole corpus
    * through one task (VERDICT r3 finding #1). The hash ordering spreads
    * seeds uniformly over the corpus regardless of id clustering.
    *
    * Each iteration nests one assign + recompute layer into the lazy
    * plan; for the usual coarse-quantizer 2-5 iterations that is fine.
    * Beyond 5 iterations the centroids are localCheckpointed each round
    * (k×dim doubles — a trivial job) so the plan stays flat instead of
    * growing one assign+recompute layer per iteration.
    */
  def trainCentroids(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 3): DataFrame = {
    import graft.functions.TextFunctions.hash60
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = vecs.sparkSession
    val ordKey = hash60(col(idCol).cast("string"))
    // global top-k seed selection plans as TakeOrderedAndProject
    // (per-partition top-k, driver merges k×partitions rows). The k seeds
    // are then RANKED DRIVER-SIDE: ranking them with a global window —
    // even post-limit over exactly k rows — plans an unpartitioned
    // WindowExec and logs Spark's single-partition warning on every run,
    // for work the driver does for free on k rows it already holds.
    val seedRows = vecs
      .select(ordKey.as("__hk"), col(vecCol).cast("array<double>").as("__cv"))
      .orderBy(col("__hk").asc, col(idCol).asc)
      .limit(k)
      .collect()
    // executeCollect of a TakeOrderedAndProject returns sorted rows;
    // stable re-sort on the hash defends the order anyway (preserves the
    // executed id tie-break within equal hashes)
    val seedLocal = seedRows.sortBy(_.getLong(0)).zipWithIndex.map {
      case (r, i) => Row(i.toLong, r.getSeq[Double](1))
    }
    val seedSchema = StructType(Seq(
      StructField("centroid_id", LongType, nullable = false),
      StructField("__cv", ArrayType(DoubleType), nullable = true)))
    var centroids = spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(seedLocal: _*)),
      seedSchema)
    for (i <- 0 until iters) {
      val assigned = ivfAssign(
        vecs.select(col(idCol), col(vecCol)), idCol, vecCol, centroids)
      val recomputed = assigned
        .select(col("centroid_id"),
          posexplode(col(vecCol).cast("array<double>")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .groupBy(col("centroid_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("__ps"))
        .select(col("centroid_id"),
          transform(col("__ps"), p => p.getField("m")).as("__nv"))
      // a cell that attracted no vectors keeps its previous centroid
      centroids = centroids.join(recomputed, Seq("centroid_id"), "left")
        .select(col("centroid_id"),
          coalesce(col("__nv"), col("__cv")).as("__cv"))
      // deep-iteration runs: cut the lineage every round so the plan does
      // not nest one assign+recompute layer per iteration (k rows — the
      // checkpoint job is trivial; the final iteration stays lazy)
      if (iters > 5 && i < iters - 1)
        centroids = centroids.localCheckpoint()
    }
    centroids
  }

  /** Per-label mean embedding — class centroids for label diagnostics,
    * SemDeDup-style cluster summaries, and nearest-centroid filters.
    * Same explode-and-aggregate shape as [[trainCentroids]]'s recompute
    * step: per-(label, dim) partial-aggregable averages, then each
    * label's vector reassembles from its sorted dims — two linear
    * shuffles, and no whole vector ever rides the aggregation path (a
    * hot label shuffles d combined rows, not its member vectors).
    */
  def labelCentroids(
      vecs: DataFrame,
      labelCol: String,
      vecCol: String): DataFrame =
    vecs.select(col(labelCol),
        posexplode(col(vecCol).cast("array<double>")))
      .groupBy(col(labelCol), col("pos"))
      .agg(avg(col("col")).as("m"))
      .groupBy(col(labelCol))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("__ps"))
      .select(col(labelCol),
        transform(col("__ps"), p => p.getField("m")).as("centroid"))

  /** Product-quantization codebook from deterministically selected
    * anchor vectors: code `c` is the `c`-th smallest-id row matching
    * `pred`, taken whole — subspace `j` of code `c` is its coordinate
    * slice. The collect is bounded by construction (k anchor rows, the
    * same driver-side contract as [[trainCentroids]]'s seed rank); at
    * scale swap in per-subspace k-means over a sample — the plan shape
    * of everything downstream is identical.
    */
  def pqCodebook(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      pred: Column): Array[Array[Double]] =
    vecs.filter(pred)
      .select(col(idCol), col(vecCol).cast("array<double>"))
      .orderBy(col(idCol).asc)
      .collect()
      .map(_.getSeq[Double](1).toArray)

  /** Distributed per-subspace PQ codebook training — FAISS-style: each
    * of the `m` coordinate slices gets its own k-means over a
    * deterministic hash-sample of the corpus, ALL subspaces trained in
    * ONE DataFrame pipeline (the vector explodes to its `m` subvectors
    * and Lloyd runs jointly keyed on (sub, code) — m separate jobs would
    * scan the sample m times). Per iteration: broadcast the m×k
    * sub-centroids, assign every (row, sub) to its nearest code by
    * round-6 squared L2 with smaller-code tie-break — the EXACT metric
    * [[graft.functions.PqEncodeExpr]] encodes with, so training
    * optimizes what encoding measures — then recompute each (sub, code)
    * centroid as per-(sub, code, dim) partial-aggregable averages (a hot
    * cell shuffles d_sub combined rows, never its member subvectors).
    *
    * Seeding mirrors [[trainCentroids]]: the k sample rows with the
    * smallest `hash60(id)` (planned as TakeOrderedAndProject; k rows
    * driver-side is the documented bounded collect), sliced per
    * subspace. A cell that attracts no vectors keeps its seed. Training
    * runs on `sampleFraction` of the corpus by id-hash range — the
    * standard PQ recipe (FAISS trains on a sample too); the full corpus
    * is never shuffled for training, and encoding afterwards is the
    * usual shuffle-free pass.
    *
    * Output: `(sub int, code long, __cv array<double>)`, m×k rows.
    */
  def pqTrainSubCentroids(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      k: Int,
      iters: Int = 1,
      sampleFraction: Double = 1.0): DataFrame = {
    import graft.functions.TextFunctions.hash60
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    require(m > 0 && k > 0 && iters >= 0, "m, k positive; iters >= 0")
    require(sampleFraction > 0 && sampleFraction <= 1,
      "sampleFraction must be in (0,1]")
    val spark = vecs.sparkSession
    val hk = hash60(col(idCol).cast("string"))
    val v = vecs.select(col(idCol), col(vecCol).cast("array<double>").as("__vd"))
    val samp = if (sampleFraction >= 1.0) v
      else v.filter(pmod(hk, lit(1000000L)) <
        lit(math.round(sampleFraction * 1000000L)))
    val seedRows = samp.select(hk.as("__hk"), col(idCol), col("__vd"))
      .orderBy(col("__hk").asc, col(idCol).asc)
      .limit(k)
      .collect()
    // fewer sample rows than codes would silently leave phantom codes
    // (zero-filled in the assembled codebook) that vectors near the
    // origin then encode to — fail loudly instead
    require(seedRows.length == k,
      s"PQ training needs at least k=$k sample rows, got " +
        s"${seedRows.length} — lower k or raise sampleFraction")
    val dim = seedRows.head.getSeq[Double](2).length
    require(dim % m == 0, s"vector dim $dim not divisible by m=$m")
    val dsub = dim / m
    val seedLocal = seedRows.sortBy(_.getLong(0)).zipWithIndex.flatMap {
      case (r, c) =>
        val vd = r.getSeq[Double](2)
        (0 until m).map(j =>
          Row(j, c.toLong, vd.slice(j * dsub, (j + 1) * dsub)))
    }
    val schema = StructType(Seq(
      StructField("sub", IntegerType, nullable = false),
      StructField("code", LongType, nullable = false),
      StructField("__cv", ArrayType(DoubleType), nullable = true)))
    var centroids = spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(seedLocal: _*)),
      schema)
    // (id, sub, subvector) fan-out of the sample: m rows per vector, the
    // same total bytes as the input
    val subv = samp.select(col(idCol), posexplode(
        transform(sequence(lit(0), lit(m - 1)),
          j => slice(col("__vd"), j * lit(dsub) + 1, lit(dsub)))))
      .withColumnRenamed("pos", "sub")
      .withColumnRenamed("col", "__xv")
    def d2(a: Column, b: Column): Column =
      round(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, e) => acc + e), 6)
    for (i <- 0 until iters) {
      val w = Window.partitionBy(col(idCol), col("sub"))
        .orderBy(col("__d2").asc, col("code").asc)
      val asg = subv.join(broadcast(centroids), Seq("sub"))
        .select(col(idCol), col("sub"), col("code"), col("__xv"),
          d2(col("__xv"), col("__cv")).as("__d2"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
      val recomputed = asg
        .select(col("sub"), col("code"), posexplode(col("__xv")))
        .groupBy(col("sub"), col("code"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .groupBy(col("sub"), col("code"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("__ps"))
        .select(col("sub"), col("code"),
          transform(col("__ps"), p => p.getField("m")).as("__nv"))
      centroids = centroids.join(recomputed, Seq("sub", "code"), "left")
        .select(col("sub"), col("code"),
          coalesce(col("__nv"), col("__cv")).as("__cv"))
      if (iters > 5 && i < iters - 1)
        centroids = centroids.localCheckpoint()
    }
    centroids
  }

  /** [[pqTrainSubCentroids]] assembled into the `Array[Array[Double]]`
    * codebook shape [[pqEncode]]/[[pqTopK]]/[[ivfPqTopK]] consume: row
    * `c` is the concatenation over subspaces of sub-centroid (j, c) —
    * per-subspace encoding reads exactly its slice, so concatenation
    * loses nothing. The collect is m×k centroid rows (bounded by
    * construction, same contract as [[trainCentroids]]' seed rank).
    */
  def pqTrainCodebook(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      k: Int,
      iters: Int = 1,
      sampleFraction: Double = 1.0): Array[Array[Double]] = {
    val rows = pqTrainSubCentroids(
      vecs, idCol, vecCol, m, k, iters, sampleFraction).collect()
    val dsub = rows.head.getSeq[Double](2).length
    val cb = Array.ofDim[Double](k, m * dsub)
    rows.foreach { r =>
      val j = r.getInt(0); val c = r.getLong(1).toInt
      val cv = r.getSeq[Double](2)
      var i = 0
      while (i < dsub) { cb(c)(j * dsub + i) = cv(i); i += 1 }
    }
    cb
  }

  /** Encode a corpus to PQ codes: `(id, codes array<int>)`. One
    * shuffle-free pass ([[graft.functions.PqEncodeExpr]]); the output is
    * `m` ints per row — the compressed representation a 100 TB corpus
    * stores, shuffles, and caches in place of raw float vectors.
    */
  def pqEncode(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      codebook: Array[Array[Double]],
      m: Int): DataFrame =
    vecs.select(col(idCol),
      graft.functions.VectorFunctions.pqEncode(col(vecCol), codebook, m)
        .as("codes"))

  /** ANN top-k over a PQ-compressed corpus via asymmetric distance
    * computation: exact query vectors score against corpus CODES only.
    * Each query row precomputes its O(k·d) lookup table once
    * ([[graft.functions.PqLutExpr]]); scoring a corpus row is then O(m)
    * lookups. The query side is broadcast (small by the brute-force-scan
    * contract — same shape as [[knnBruteForce]]); the corpus streams
    * its codes once with no shuffle, and only |queries| × |corpus|
    * scored rows reach the ranking exchange.
    */
  def pqTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      codebook: Array[Array[Double]],
      m: Int,
      k: Int): DataFrame = {
    import graft.functions.{VectorFunctions => VF}
    val nCodes = codebook.length
    val norms = VF.pqSubNormSq(codebook, m)
    val q = broadcast(queries.select(
      col(idCol).as("query_id"),
      VF.pqLut(col(vecCol), codebook, m).as("__lut")))
    val c = Spread.ifNarrow(
      pqEncode(corpus, idCol, vecCol, codebook, m)
        .withColumnRenamed(idCol, "neighbor_id"),
      col("neighbor_id"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        VF.pqAdcCosine(col("__lut"), col("codes"), norms, nCodes)
          .as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("knn_rank", row_number().over(w))
      .filter(col("knn_rank") <= k)
  }

  /** IVF-PQ top-k — the standard billion-scale ANN composition (FAISS
    * `IVFxx,PQyy`): the IVF coarse quantizer restricts each query to its
    * `probes` nearest cells, and within a cell the query's exact vector
    * scores corpus PQ CODES via ADC. The search join keys on
    * `centroid_id` (linear shuffle, AQE splits hot cells); the corpus
    * side carries `m` ints + a cell id per vector — at m=8 that is the
    * difference between shuffling 100 TB of float vectors and ~3 TB of
    * codes. Query-side-only fan-out (`probes`×), so a (query, neighbor)
    * pair arises at most once, exactly as in [[ivfTopK]].
    *
    * `centroids` must be `(centroid_id, __cv)` (small, broadcast); the
    * PQ `codebook` refines WITHIN cells, so both quantizers are
    * independent — the same two-level layout as the paper (Jégou et al.
    * 2011 §IV: coarse quantizer + product-quantized residual; cosine
    * ADC here scores the vector itself rather than the residual, which
    * keeps the score engine-reproducible).
    */
  def ivfPqTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      codebook: Array[Array[Double]],
      m: Int,
      k: Int,
      probes: Int = 1): DataFrame =
    ivfPqTopKEncoded(queries,
      ivfPqEncode(corpus, idCol, vecCol, centroids, codebook, m),
      idCol, vecCol, centroids, codebook, m, k, probes)

  /** The corpus half of [[ivfPqTopK]] on its own: cell assignment + PQ
    * codes, `(neighbor_id, centroid_id, codes)`. This is the artifact a
    * train-once-search-many pipeline persists
    * ([[graft.sources.AnnIndex.write]]) — encoding is the only
    * corpus-sized pass in the index build, so storing its output turns
    * every later search job into a scan of m-int codes.
    */
  def ivfPqEncode(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      codebook: Array[Array[Double]],
      m: Int): DataFrame = {
    import graft.functions.{VectorFunctions => VF}
    ivfAssign(corpus, idCol, vecCol, centroids)
      .select(col(idCol).as("neighbor_id"), col("centroid_id"),
        VF.pqEncode(col(vecCol), codebook, m).as("codes"))
  }

  /** The search half of [[ivfPqTopK]] over an already-encoded corpus
    * (`enc` = [[ivfPqEncode]]'s output, fresh or loaded from a
    * persisted index) — no corpus-side vector pass at all.
    */
  def ivfPqTopKEncoded(
      queries: DataFrame,
      enc: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      codebook: Array[Array[Double]],
      m: Int,
      k: Int,
      probes: Int = 1): DataFrame = {
    import graft.functions.{VectorFunctions => VF}
    val nCodes = codebook.length
    val norms = VF.pqSubNormSq(codebook, m)
    val c = enc
    // queries: probes cells each, exact vector -> per-query ADC LUT
    val q = ivfAssignRanked(queries, idCol, vecCol, centroids, probes)
      .select(col(idCol).as("query_id"), col("centroid_id"),
        VF.pqLut(col(vecCol), codebook, m).as("__lut"))
    val scored = q.join(c,
        q("centroid_id") === c("centroid_id") &&
        col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        VF.pqAdcCosine(col("__lut"), col("codes"), norms, nCodes)
          .as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("knn_rank", row_number().over(w))
      .filter(col("knn_rank") <= k)
  }

  /** Residual IVF-PQ top-k — FAISS's IVFADC default: corpus codes
    * encode the RESIDUAL `x - c` of each vector against its cell
    * centroid, with one GLOBAL residual codebook across cells (exactly
    * FAISS's layout — residuals concentrate near the origin, so the
    * same code budget quantizes them far more accurately than raw
    * vectors; [[ivfPqTopK]] remains the raw-vector form). Scoring folds
    * the centroid back in per (query, cell):
    * `cos(q, c + r̂) = (dot(q,c) + Σj lut[j,code_j]) /
    * (‖q‖·√(‖c‖² + Σj cross[j,code_j] + ‖r̂_j‖²))` — the per-cell
    * `cross`/`‖c‖²` fold tables are derived driver-side from the
    * centroid set the driver already holds (cells × m·k doubles,
    * broadcast — never a literal) and the per-pair work stays the O(m)
    * LUT walk ([[graft.functions.PqAdcResidualExpr]]). Join and
    * exchange shapes are identical to [[ivfPqTopK]].
    */
  def ivfPqResidualTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      codebook: Array[Array[Double]],
      m: Int,
      k: Int,
      probes: Int = 1): DataFrame =
    ivfPqResidualTopKEncoded(queries,
      ivfPqResidualEncode(corpus, idCol, vecCol, centroids, codebook, m),
      idCol, vecCol, centroids, codebook, m, k, probes)

  /** The corpus half of [[ivfPqResidualTopK]]: cell assignment +
    * residual PQ codes against each vector's own cell centroid —
    * `(neighbor_id, centroid_id, codes)`, the persistable IVFADC index
    * body ([[graft.sources.AnnIndex]]).
    */
  def ivfPqResidualEncode(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      codebook: Array[Array[Double]],
      m: Int): DataFrame = {
    import graft.functions.{VectorFunctions => VF}
    val cents = broadcast(centroids.select(col("centroid_id"),
      col("__cv").cast("array<double>").as("__cvd")))
    ivfAssign(corpus, idCol, vecCol, centroids)
      .join(cents, Seq("centroid_id"))
      .select(col(idCol).as("neighbor_id"), col("centroid_id"),
        VF.pqEncode(zip_with(col(vecCol).cast("array<double>"),
          col("__cvd"), (x, c) => x - c), codebook, m).as("codes"))
  }

  /** The search half of [[ivfPqResidualTopK]] over already-encoded
    * residual codes (fresh or loaded from a persisted index): the
    * per-cell fold tables are re-derived driver-side from the centroid
    * frame — small by the IVF contract — so a loaded index needs only
    * (centroids, codebook, codes) to reconstitute the full IVFADC
    * search path with zero training or encoding work.
    */
  def ivfPqResidualTopKEncoded(
      queries: DataFrame,
      enc: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      codebook: Array[Array[Double]],
      m: Int,
      k: Int,
      probes: Int = 1): DataFrame = {
    import graft.functions.{VectorFunctions => VF}
    import graft.functions.TextFunctions.dot
    val nCodes = codebook.length
    val norms = VF.pqSubNormSq(codebook, m)
    // per-cell fold tables from the (small, by the IVF contract)
    // centroid set: cross[j*k+c] = 2·dot(c_subj, cb_c_subj), plus ‖c‖²
    val centLocal = centroids
      .select(col("centroid_id"), col("__cv").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    require(centLocal.nonEmpty, "centroids must be non-empty")
    val dim = centLocal.head._2.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val cellRows = centLocal.toSeq.map { case (cid, cv) =>
      val cross = new Array[Double](m * nCodes)
      var j = 0
      while (j < m) {
        var c = 0
        while (c < nCodes) {
          var s = 0.0
          var i = j * dsub
          val end = math.min((j + 1) * dsub,
            math.min(cv.length, codebook(c).length))
          while (i < end) { s += cv(i) * codebook(c)(i); i += 1 }
          cross(j * nCodes + c) = 2.0 * s
          c += 1
        }
        j += 1
      }
      (cid, cross.toSeq, cv.map(x => x * x).sum)
    }
    val spark = queries.sparkSession
    import spark.implicits._
    val cellTable =
      broadcast(cellRows.toDF("centroid_id", "__cross", "__cnorm"))
    val cents = broadcast(centroids.select(col("centroid_id"),
      col("__cv").cast("array<double>").as("__cvd")))
    // queries: probes cells each; ONE residual-codebook LUT per query
    // row plus a per-(query, cell) dot(q, c) and the cell's fold table
    val q = ivfAssignRanked(queries, idCol, vecCol, centroids, probes)
      .join(cents, Seq("centroid_id"))
      .join(cellTable, Seq("centroid_id"))
      .select(col(idCol).as("query_id"), col("centroid_id"),
        VF.pqLut(col(vecCol), codebook, m).as("__lut"),
        dot(col(vecCol), col("__cvd")).as("__cdq"),
        col("__cross"), col("__cnorm"))
    val scored = q.join(enc,
        q("centroid_id") === enc("centroid_id") &&
        col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        VF.pqAdcResidualCosine(col("__lut"), col("codes"), col("__cross"),
          col("__cdq"), col("__cnorm"), norms, nCodes).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("knn_rank", row_number().over(w))
      .filter(col("knn_rank") <= k)
  }

  /** Exact re-rank (refine) stage for IVF-PQ search — the FAISS
    * `IndexRefineFlat` pattern: ADC retrieves R = `refine`·k
    * approximate candidates per query, those candidates' FLOAT vectors
    * join back from the corpus, and EXACT cosine re-ranks them to
    * top-k. One linear hash join bounded by R·|queries| surviving rows
    * recovers most of the quantization recall loss — the emitted
    * `cos_sim` is the exact (round-6) cosine, not an ADC estimate.
    *
    * Scale shape: the ADC pass is [[ivfPqTopK]]/[[ivfPqResidualTopK]]
    * unchanged (codes-only corpus scan); the refine join scans the
    * float-vector table ONCE as a hash join against the
    * R·|queries|-row candidate side — never a second ADC pass, never a
    * vector shuffle proportional to the corpus. Ranks re-break ties by
    * neighbor id, so output is deterministic and oracle-replayable.
    *
    * `residual = true` runs the candidate pass through the IVFADC
    * residual form (its codes quantize `x − c`); the refine half is
    * identical — exactness does not depend on which ADC produced the
    * candidates.
    */
  def ivfPqRefinedTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      codebook: Array[Array[Double]],
      m: Int,
      k: Int,
      probes: Int = 1,
      refine: Int = 4,
      residual: Boolean = false): DataFrame = {
    require(refine >= 1, "refine must be >= 1")
    val adc =
      if (residual)
        ivfPqResidualTopK(queries, corpus, idCol, vecCol, centroids,
          codebook, m, k * refine, probes)
      else
        ivfPqTopK(queries, corpus, idCol, vecCol, centroids, codebook,
          m, k * refine, probes)
    refineExact(adc, queries, corpus, idCol, vecCol, k)
  }

  /** The exact re-rank half on its own — composes with the `Encoded`
    * search variants or a persisted-index probe
    * ([[graft.sources.AnnIndex]]): `cands` is any
    * `(query_id, neighbor_id, …)` candidate frame (typically an ADC
    * top-R); its ids join back to the float vectors and exact cosine
    * takes top-k. The join output is bounded by |cands|; the query
    * side broadcasts (small by the ANN probe contract).
    */
  def refineExact(
      cands: DataFrame,
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    cands.select(col("query_id"), col("neighbor_id"))
      .join(c, Seq("neighbor_id"))
      .join(q, Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineFast(col("__qv"), col("__cv")).as("cos_sim"))
      .withColumn("knn_rank", row_number().over(w))
      .filter(col("knn_rank") <= k)
  }

  /** ANN top-k: brute-force cosine *within* each LSH bucket. The join key
    * is the bucket id — shuffle is linear in corpus size; AQE splits hot
    * buckets. Recall < 1 by construction (bucket-boundary misses); raise
    * `planes` for precision, or query multiple probe buckets upstream.
    */
  def annLshTopK(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      planes: Int = 8,
      dim: Int = 64): DataFrame = {
    // Spread the raw vectors first (gated, single-file local runs), then
    // compute the bucket once; the self-join plans one (bucket) exchange
    // that AQE reuses for both sides.
    val withBucket = Spread.ifNarrow(
        vecs.select(col(idCol), col(vecCol)), col(idCol))
      .select(col(idCol), col(vecCol),
        lshBucket(col(vecCol), planes, dim).as("bucket"))
    val a = withBucket.as("a")
    val b = withBucket.as("b")
    val scored = a.join(b,
        col("a.bucket") === col("b.bucket") &&
        col(s"a.$idCol") =!= col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("query_id"),
        col(s"b.$idCol").as("neighbor_id"),
        cosineFast(col(s"a.$vecCol"), col(s"b.$vecCol")).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("knn_rank", row_number().over(w))
      .filter(col("knn_rank") <= k)
  }

  /** Multi-probe variant of [[annLshTopK]]: each query additionally
    * searches the buckets reached by flipping its `probes - 1`
    * lowest-margin hyperplane bits ([[graft.functions.LshProbesExpr]]) —
    * the standard multi-probe LSH recall lift. Only the query side fans
    * out (shuffle grows `probes`×, still linear); the corpus side keeps
    * exactly one bucket per vector, so a (query, neighbor) pair arises
    * at most once and needs no dedup. Candidate sets are supersets of
    * the single-bucket run's, so per-query top-k quality is monotone in
    * `probes`.
    */
  def annLshMultiprobe(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      planes: Int = 8,
      dim: Int = 64,
      probes: Int = 3): DataFrame = {
    import org.apache.spark.sql.GraftColumnCompat._
    val probeCol = toColumn(graft.functions.LshProbesExpr(
      toExpression(col(vecCol)), planes, probes))
    val base = Spread.ifNarrow(
        vecs.select(col(idCol), col(vecCol)), col(idCol))
    val q = base.select(col(idCol), col(vecCol),
      explode(probeCol).as("bucket"))
    val c = base.select(col(idCol), col(vecCol),
      lshBucket(col(vecCol), planes, dim).as("bucket"))
    val scored = q.as("a").join(c.as("b"),
        col("a.bucket") === col("b.bucket") &&
        col(s"a.$idCol") =!= col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("query_id"),
        col(s"b.$idCol").as("neighbor_id"),
        cosineFast(col(s"a.$vecCol"), col(s"b.$vecCol")).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("knn_rank", row_number().over(w))
      .filter(col("knn_rank") <= k)
  }

  // ------------------------------------------------------------------
  // Margin-based bitext mining (Artetxe & Schwenk 2019, "Margin-based
  // parallel corpus mining with multilingual sentence embeddings" —
  // the CCMatrix/CCAligned recipe)
  // ------------------------------------------------------------------

  /** The margin layer over two precomputed kNN tables — retrieval is
    * PLUGGABLE: `fwd` holds each source row's top-k targets, `bwd` each
    * target's top-k sources, both in the engine's kNN schema
    * `(query_id, neighbor_id, cos_sim, knn_rank)` from ANY retrieval
    * path ([[knnBruteForce]]-shaped scoring, [[ivfTopK]], or the PQ
    * forms at corpus scale). The raw cosine of a candidate pair is
    * normalized by its NEIGHBORHOOD — `margin = 2·cos(x,y) /
    * (mean_k(x→·) + mean_k(·→y))`, the paper's "ratio" margin — which
    * suppresses hubness (a target that is everyone's near-neighbor has
    * a high backward mean and wins no margins). Each source keeps its
    * best-margin candidate (ties: smallest target id) when the margin
    * clears `threshold` (the paper's mined-pair cut, ~1.0-1.2).
    *
    * Scale shape: two ≤ k-row-per-element mean aggregates
    * (partial-aggregable) and two id-keyed linear joins — everything
    * beyond the kNN retrieval it composes is linear in the candidate
    * table. The neighborhood mean is computed as `round(sum, 6) / n`:
    * the true sum of round-6 cosines IS a 6-decimal number, so the
    * round recovers it exactly and aggregation ORDER can never leak
    * into the margin comparison across engines (a rounded AVG still
    * carries the order-dependent last ulp into a tie-breaking round).
    */
  def mineBitextFrom(
      fwd: DataFrame,
      bwd: DataFrame,
      threshold: Double = 1.0): DataFrame = {
    // the forward table feeds TWO consumers (its mean aggregate and the
    // candidate projection); left lazy, the expensive retrieval runs
    // once per consumer. It is k rows per source — LINEAR — so
    // materializing it (eager local checkpoint, ContextCleaner-freed)
    // is cheap and halves the forward kNN cost. The backward table has
    // one consumer and stays lazy.
    val f = fwd.localCheckpoint()
    val fm = f.groupBy(col("query_id").as("src_id"))
      .agg((round(sum(col("cos_sim")), 6) / count(lit(1))).as("__fm"))
    val bm = bwd.groupBy(col("query_id").as("tgt_id"))
      .agg((round(sum(col("cos_sim")), 6) / count(lit(1))).as("__bm"))
    val cand = f.select(col("query_id").as("src_id"),
        col("neighbor_id").as("tgt_id"), col("cos_sim"))
      .join(fm, Seq("src_id"))
      // LEFT: under asymmetric retrieval (IVF probes > 1) a forward
      // candidate's target can have an empty backward neighborhood —
      // an inner join would silently DROP the pair, making the recall
      // knob remove mined pairs. Fall back to the forward mean (margin
      // = cos/fm), the defensible one-sided normalization; symmetric
      // retrieval always has __bm and is unaffected.
      .join(bm, Seq("tgt_id"), "left")
      .select(col("src_id"), col("tgt_id"), col("cos_sim"),
        round(col("cos_sim") * lit(2.0) /
          (col("__fm") + coalesce(col("__bm"), col("__fm"))), 6)
          .as("margin"))
    val w = Window.partitionBy(col("src_id"))
      .orderBy(col("margin").desc, col("tgt_id").asc)
    cand.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("margin") >= lit(threshold))
      .drop("__rn")
  }

  /** Cross-set IVF kNN — [[ivfTopK]] between two DIFFERENT collections
    * under one frozen coarse quantizer: queries and corpus each assign
    * to their nearest cell (broadcast centroids, one linear pass each)
    * and score only within shared cells — the equi-join replaces the
    * cross product, which is the entire scale story. No same-id
    * exclusion (the sides are distinct collections). `probes` fans out
    * the QUERY side only ([[ivfAssignProbes]] — the standard recall
    * knob for cell-boundary queries).
    */
  def ivfTopKCross(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      k: Int,
      probes: Int = 1): DataFrame = {
    val q =
      if (probes == 1) ivfAssign(queries, idCol, vecCol, centroids)
      else ivfAssignProbes(queries, idCol, vecCol, centroids, probes)
    val c = ivfAssign(corpus, idCol, vecCol, centroids)
    val scored = q.as("a").join(c.as("b"),
        col("a.centroid_id") === col("b.centroid_id"))
      .select(col(s"a.$idCol").as("query_id"),
        col(s"b.$idCol").as("neighbor_id"),
        cosineFast(col(s"a.$vecCol"), col(s"b.$vecCol")).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("knn_rank", row_number().over(w))
      .filter(col("knn_rank") <= k)
  }

  /** Cross-set IVF-PQ kNN — [[ivfPqTopKEncoded]] between two DIFFERENT
    * collections (no same-id exclusion): the corpus side rides the
    * cell join as `m` PQ CODES instead of full float vectors — at
    * m = 8 over float 1024-dim embeddings that is a ~500× cut in the
    * bytes the exchange and the cell-local scoring touch — while the
    * query side carries one ADC LUT per probe. Everything else
    * (assignment, probes fan-out, windowed top-k) is [[ivfTopKCross]].
    */
  def ivfPqTopKCross(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      codebook: Array[Array[Double]],
      m: Int,
      k: Int,
      probes: Int = 1): DataFrame = {
    import graft.functions.{VectorFunctions => VF}
    val nCodes = codebook.length
    val norms = VF.pqSubNormSq(codebook, m)
    val enc = ivfPqEncode(corpus, idCol, vecCol, centroids, codebook, m)
    val q = ivfAssignRanked(queries, idCol, vecCol, centroids, probes)
      .select(col(idCol).as("query_id"), col("centroid_id"),
        VF.pqLut(col(vecCol), codebook, m).as("__lut"))
    val scored = q.join(enc, Seq("centroid_id"))
      .select(col("query_id"), col("neighbor_id"),
        VF.pqAdcCosine(col("__lut"), col("codes"), norms, nCodes)
          .as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("knn_rank", row_number().over(w))
      .filter(col("knn_rank") <= k)
  }

  /** [[mineBitext]]'s corpus-scale form: both kNN directions run
    * cell-bounded under one frozen quantizer ([[ivfTopKCross]]) and
    * feed the identical margin layer — no broadcast of either side, no
    * cross product; the one approximation is IVF's (a true neighbor in
    * another cell is invisible — raise `probes` for recall). With
    * `probes = 1` assignment is symmetric, so every forward candidate
    * pair is seen by the backward pass too and the margin join drops
    * nothing.
    */
  def mineBitextIvf(
      src: DataFrame,
      tgt: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      k: Int = 4,
      threshold: Double = 1.0,
      probes: Int = 1): DataFrame =
    mineBitextFrom(
      ivfTopKCross(src, tgt, idCol, vecCol, centroids, k, probes),
      ivfTopKCross(tgt, src, idCol, vecCol, centroids, k, probes),
      threshold)

  /** [[mineBitextIvf]] with PQ-compressed retrieval: each direction
    * runs ADC over the OTHER side's codes ([[ivfPqTopKCross]]), so
    * neither side's float vectors ever cross the cell join — the
    * memory/shuffle profile of mining 100 TB of bitext candidates is
    * that of the code tables (m ints per vector), at the cost of PQ's
    * score quantization inside the margin. The margin layer is
    * UNCHANGED ([[mineBitextFrom]]): each direction's neighborhood
    * means are computed over its own ADC scores, so the ratio test
    * stays internally consistent even though forward and backward
    * cosines quantize differently (forward scores exact-src × coded-
    * tgt, backward exact-tgt × coded-src).
    */
  def mineBitextIvfPq(
      src: DataFrame,
      tgt: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      codebook: Array[Array[Double]],
      m: Int,
      k: Int = 4,
      threshold: Double = 1.0,
      probes: Int = 1): DataFrame =
    mineBitextFrom(
      ivfPqTopKCross(src, tgt, idCol, vecCol, centroids, codebook, m, k,
        probes),
      ivfPqTopKCross(tgt, src, idCol, vecCol, centroids, codebook, m, k,
        probes),
      threshold)

  /** Brute-force bitext mining between two embedding sets (e.g. two
    * language sides of a crawl snapshot): exact top-k in both
    * directions — the query side of each pass broadcasts, so both
    * sides must fit the [[knnBruteForce]] broadcast budget; at corpus
    * scale run [[ivfTopK]] (or the PQ forms) for both directions and
    * feed [[mineBitextFrom]] directly. Unlike [[knnBruteForce]] there
    * is no same-id exclusion: the sides are distinct collections, and
    * an id appearing in both names two different rows.
    */
  def mineBitext(
      src: DataFrame,
      tgt: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 4,
      threshold: Double = 1.0): DataFrame = {
    def sideKnn(q: DataFrame, c: DataFrame): DataFrame = {
      val qq = broadcast(q.select(
        col(idCol).as("query_id"), col(vecCol).as("__qv")))
      val cc = Spread.ifNarrow(c.select(
        col(idCol).as("neighbor_id"), col(vecCol).as("__cv")),
        col("neighbor_id"))
      val scored = qq.join(cc)
        .select(col("query_id"), col("neighbor_id"),
          cosineFast(col("__qv"), col("__cv")).as("cos_sim"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
      scored.withColumn("knn_rank", row_number().over(w))
        .filter(col("knn_rank") <= k)
    }
    mineBitextFrom(sideKnn(src, tgt), sideKnn(tgt, src), threshold)
  }
}
