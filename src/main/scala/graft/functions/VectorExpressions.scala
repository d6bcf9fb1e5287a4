package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector math over `array<float>` / `array<double>` columns.
  *
  * The composable route (`aggregate(zip_with(...))`) is interpreted
  * per-element through the Catalyst eval loop — ~35µs per 64-dim pair.
  * This expression runs one tight JVM loop over the unboxed `ArrayData`
  * (~50× faster), which is the difference between a feasible and an
  * infeasible pairwise stage at 100 TB. Kept `CodegenFallback` (one
  * virtual call per row; the loop itself is primitive).
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim needs array<float|double>, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  @inline private def get(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[ArrayData]
    val y = r.asInstanceOf[ArrayData]
    val xf = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val yf = right.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = if (x.isNullAt(i)) 0.0 else get(x, i, xf)
      val yv = if (y.isNullAt(i)) 0.0 else get(y, i, yf)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH bucket id in one pass: bit j of the result is
  * the sign of the dot product with the deterministic pseudo-random
  * hyperplane j (coefficients `((j*73856093 + k*19349663) % 2000 - 1000)
  * / 1000`). Same left-to-right summation order as the composable
  * `aggregate` form, so results are bit-identical to the SQL oracle.
  */
case class LshBucketExpr(child: Expression, planes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_bucket needs array<float|double>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val isFloat =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val n = v.numElements()
    val dots = new Array[Double](planes)
    var k = 0
    while (k < n) {
      val x = if (v.isNullAt(k)) 0.0
              else if (isFloat) v.getFloat(k).toDouble else v.getDouble(k)
      var j = 0
      while (j < planes) {
        dots(j) += x * (((j.toLong * 73856093L + k.toLong * 19349663L) % 2000L - 1000L) / 1000.0)
        j += 1
      }
      k += 1
    }
    var bucket = 0L
    var j = 0
    while (j < planes) {
      if (dots(j) >= 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  override protected def withNewChildInternal(c: Expression): LshBucketExpr =
    copy(child = c)
}

/** Multi-probe LSH probe list: the base [[LshBucketExpr]] bucket plus
  * the buckets reached by flipping the `probes - 1` LOWEST-MARGIN
  * hyperplane bits (smallest |dot| — the planes the vector sits closest
  * to, where a true near-neighbor most likely landed on the other side).
  * Probing widens the QUERY side only: recall rises without touching the
  * corpus-side bucket layout or adding a corpus shuffle. Dots use the
  * exact [[LshBucketExpr]] summation order (bit-identical to the SQL
  * oracle); margin ties break by plane index.
  */
case class LshProbesExpr(child: Expression, planes: Int, probes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_probes needs array<float|double>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val isFloat =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val n = v.numElements()
    val dots = new Array[Double](planes)
    var k = 0
    while (k < n) {
      val x = if (v.isNullAt(k)) 0.0
              else if (isFloat) v.getFloat(k).toDouble else v.getDouble(k)
      var j = 0
      while (j < planes) {
        dots(j) += x * (((j.toLong * 73856093L + k.toLong * 19349663L) % 2000L - 1000L) / 1000.0)
        j += 1
      }
      k += 1
    }
    var base = 0L
    var j = 0
    while (j < planes) {
      if (dots(j) >= 0) base |= (1L << j)
      j += 1
    }
    val byMargin = (0 until planes).sortBy(j => (math.abs(dots(j)), j))
    val out = new Array[Any](math.min(probes, planes + 1).max(1))
    out(0) = base
    var i = 1
    while (i < out.length) {
      out(i) = base ^ (1L << byMargin(i - 1))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): LshProbesExpr =
    copy(child = c)
}

/** Product-quantization encode (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011): split the vector into `m`
  * contiguous subspaces and store, per subspace, the index of the
  * nearest codebook entry (L2², deterministic tie-break on the smaller
  * code). Output is `array<int>` of length `m` — at the standard
  * m=8/k≤256 setting that is 8 bytes per vector vs 256 for a 64-dim
  * float32 embedding: the 32× reduction is what makes a 100 TB ANN
  * corpus shuffle-able and cacheable.
  *
  * `codebook(c)` is a FULL-dimension anchor vector; subspace `j` of code
  * `c` is its slice `[j*d/m, (j+1)*d/m)`. The codebook is tiny by
  * construction (k vectors) and ships inside the expression — no join,
  * no shuffle: encode is one codegen-adjacent pass over the corpus.
  * Distances are compared after `round(·, 6)` (BigDecimal HALF_UP — the
  * same rounding `functions.round` applies) so near-ties resolve by the
  * code index identically in any engine re-deriving the assignment.
  */
case class PqEncodeExpr(
    child: Expression,
    codebook: Array[Array[Double]],
    m: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode needs array<float|double>, got ${other.simpleString}")
    }

  @inline private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val isFloat =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val d = v.numElements()
    val sub = d / m
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      var best = -1
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < codebook.length) {
        val cb = codebook(c)
        var s = 0.0
        var i = j * sub
        val end = math.min((j + 1) * sub, math.min(d, cb.length))
        while (i < end) {
          val x = if (v.isNullAt(i)) 0.0
                  else if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
          val dx = x - cb(i)
          s += dx * dx
          i += 1
        }
        val r = round6(s)
        if (r < bestD) { bestD = r; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): PqEncodeExpr =
    copy(child = c)
}

/** Query-side PQ lookup table for asymmetric distance computation (ADC):
  * one row per QUERY precomputes `lut[j*k + c] = dot(q_subj, cb_c_subj)`
  * plus the query norm, so scoring a corpus vector from its codes is
  * O(m) table lookups instead of O(d) multiply-adds — the FAISS ADC
  * design. Emits `struct(lut array<double>, qn double)` (`qn` = ‖q‖²).
  * Cost is O(k·d) per query row — queries are the small side by the ANN
  * contract, the corpus pays only the O(m) lookups.
  */
case class PqLutExpr(
    child: Expression,
    codebook: Array[Array[Double]],
    m: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("lut", ArrayType(DoubleType, containsNull = false)),
    StructField("qn", DoubleType)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_lut needs array<float|double>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val isFloat =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val d = v.numElements()
    val sub = d / m
    val k = codebook.length
    val lut = new Array[Any](m * k)
    var qn = 0.0
    var i = 0
    while (i < d) {
      val x = if (v.isNullAt(i)) 0.0
              else if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      qn += x * x
      i += 1
    }
    var j = 0
    while (j < m) {
      var c = 0
      while (c < k) {
        val cb = codebook(c)
        var s = 0.0
        var t = j * sub
        val end = math.min((j + 1) * sub, math.min(d, cb.length))
        while (t < end) {
          val x = if (v.isNullAt(t)) 0.0
                  else if (isFloat) v.getFloat(t).toDouble else v.getDouble(t)
          s += x * cb(t)
          t += 1
        }
        lut(j * k + c) = s
        c += 1
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(lut), qn)
  }

  override protected def withNewChildInternal(c: Expression): PqLutExpr =
    copy(child = c)
}

/** ADC cosine score from a query LUT ([[PqLutExpr]]) and corpus codes
  * ([[PqEncodeExpr]]): `cos ≈ Σj lut[j,cj] / (‖q‖ · √(Σj ‖cb_cj,j‖²))`.
  * The codebook-entry subspace norms `cbn[j*k + c] = ‖cb_c_subj‖²` are
  * static per codebook and ship in the expression. Subspaces are
  * orthogonal coordinate blocks, so the reconstruction norm decomposes
  * exactly — the score equals `cos(q, reconstruction)` (the standard
  * ADC identity), at O(m) per (query, corpus) pair.
  */
case class PqAdcScoreExpr(
    left: Expression,
    right: Expression,
    cbNormSq: Array[Double],
    k: Int)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val lutRow = l.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    val lut = lutRow.getArray(0)
    val qn = lutRow.getDouble(1)
    val codes = r.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var dot = 0.0
    var rn = 0.0
    var j = 0
    while (j < m) {
      val c = codes.getInt(j)
      dot += lut.getDouble(j * k + c)
      rn += cbNormSq(j * k + c)
      j += 1
    }
    if (qn == 0.0 || rn == 0.0) null
    else dot / (math.sqrt(qn) * math.sqrt(rn))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScoreExpr =
    copy(left = newLeft, right = newRight)
}

/** ADC cosine for RESIDUAL product quantization (the FAISS IVFADC
  * default): a corpus vector is stored as its cell id plus PQ codes of
  * the RESIDUAL `x - c`, so the reconstruction is `c + r̂` and
  * `cos(q, c + r̂)` decomposes into per-cell and per-code pieces:
  *
  *   dot  = dot(q, c) + Σj lut[j, code_j]
  *   ‖c+r̂‖² = ‖c‖² + Σj (2·dot(c_subj, cb_code_subj) + ‖cb_code_subj‖²)
  *
  * `lut`/`qn` come from the GLOBAL residual codebook ([[PqLutExpr]] —
  * one codebook across cells, exactly FAISS's layout), `cross[j*k+c]` =
  * 2·dot(c_subj, cb_c_subj) and `cNormSq` ride as columns of a per-cell
  * broadcast table (cells × m × k doubles — small per cell, never a
  * literal), and the residual-codebook norms are static. O(m) per
  * (query, corpus) pair, same as plain ADC.
  */
case class PqAdcResidualExpr(
    lut: Expression,
    codes: Expression,
    cross: Expression,
    cDotQ: Expression,
    cNormSq: Expression,
    cbNormSq: Array[Double],
    k: Int)
    extends org.apache.spark.sql.catalyst.expressions.Expression
    with CodegenFallback {

  override def children: Seq[Expression] =
    Seq(lut, codes, cross, cDotQ, cNormSq)

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = lut.eval(input); val cs = codes.eval(input)
    val cr = cross.eval(input); val dq = cDotQ.eval(input)
    val cn = cNormSq.eval(input)
    if (l == null || cs == null || cr == null || dq == null || cn == null)
      return null
    val lutRow = l.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    val lutArr = lutRow.getArray(0)
    val qn = lutRow.getDouble(1)
    val codesArr = cs.asInstanceOf[ArrayData]
    val crossArr = cr.asInstanceOf[ArrayData]
    val m = codesArr.numElements()
    var dot = dq.asInstanceOf[Double]
    var rn = cn.asInstanceOf[Double]
    var j = 0
    while (j < m) {
      val c = codesArr.getInt(j)
      dot += lutArr.getDouble(j * k + c)
      rn += crossArr.getDouble(j * k + c) + cbNormSq(j * k + c)
      j += 1
    }
    if (qn <= 0.0 || rn <= 0.0) null
    else dot / (math.sqrt(qn) * math.sqrt(rn))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PqAdcResidualExpr =
    copy(lut = newChildren(0), codes = newChildren(1),
      cross = newChildren(2), cDotQ = newChildren(3),
      cNormSq = newChildren(4))
}

object VectorFunctions {
  import org.apache.spark.sql.GraftColumnCompat
  import org.apache.spark.sql.functions._

  /** Cosine similarity rounded to 6 decimals (cross-engine stable). */
  def cosineFast(a: Column, b: Column): Column =
    round(GraftColumnCompat.toColumn(CosineSimExpr(
      GraftColumnCompat.toExpression(a), GraftColumnCompat.toExpression(b))), 6)

  /** Symmetric int8 quantization (the FAISS-SQ8 shape): per-vector
    * `scale = max|x| / 127`, `q_i = floor(x_i / scale + 0.5)` ∈
    * [-127, 127]. Returns `struct(scale double, q array<int>)` — 4× (vs
    * float32) storage/shuffle reduction for a 100 TB embedding corpus,
    * with max dequantization error `scale / 2` per component.
    * `floor(· + 0.5)` (round-half-toward-+∞) rather than `round` because
    * it is bit-identical across engines; an all-zero vector quantizes to
    * scale 0 and zero codes. One pipelined pass at write time; read the
    * codes back with [[dequantizeInt8]].
    */
  def quantizeInt8(vec: Column): Column = {
    val v = vec.cast("array<double>")
    val scale = array_max(transform(v, x => abs(x))) / lit(127.0)
    // bind the scale as a lambda variable so it is evaluated ONCE per
    // row — referencing the scale expression inside the per-element
    // lambda would re-run the array_max for every component (O(d^2))
    element_at(
      transform(array(scale), s =>
        struct(
          s.as("scale"),
          transform(v, x =>
            coalesce(floor(try_divide(x, s) + lit(0.5)), lit(0L))
              .cast("int")).as("q"))),
      1)
  }

  /** Inverse of [[quantizeInt8]]: `x_i ≈ q_i * scale`. */
  def dequantizeInt8(quantized: Column): Column =
    transform(quantized.getField("q"),
      q => q.cast("double") * quantized.getField("scale"))

  /** L2 (unit-norm) normalization — the standard pre-ANN step that
    * turns dot product into cosine: `x / ‖x‖`, null-safe (an all-zero
    * vector normalizes to itself). The norm is bound once per row via
    * the single-element-array trick (same rationale as [[quantizeInt8]]:
    * a bare reference inside the per-element lambda would re-run the
    * `aggregate` per component — O(d²)).
    */
  def l2Normalize(vec: Column): Column = {
    val v = vec.cast("array<double>")
    val norm = sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))
    element_at(
      transform(array(norm), n =>
        transform(v, x => coalesce(try_divide(x, n), x))),
      1)
  }

  /** PQ codes for a vector column ([[PqEncodeExpr]]). */
  def pqEncode(vec: Column, codebook: Array[Array[Double]], m: Int): Column =
    GraftColumnCompat.toColumn(PqEncodeExpr(
      GraftColumnCompat.toExpression(vec), codebook, m))

  /** Query-side ADC lookup table ([[PqLutExpr]]). */
  def pqLut(vec: Column, codebook: Array[Array[Double]], m: Int): Column =
    GraftColumnCompat.toColumn(PqLutExpr(
      GraftColumnCompat.toExpression(vec), codebook, m))

  /** ADC cosine (rounded to 6 decimals, cross-engine stable) from a
    * [[pqLut]] struct and a [[pqEncode]] codes array. `cbNormSq` must be
    * [[pqSubNormSq]] of the same codebook.
    */
  def pqAdcCosine(
      lut: Column, codes: Column,
      cbNormSq: Array[Double], k: Int): Column =
    round(GraftColumnCompat.toColumn(PqAdcScoreExpr(
      GraftColumnCompat.toExpression(lut),
      GraftColumnCompat.toExpression(codes), cbNormSq, k)), 6)

  /** Residual-ADC cosine (rounded to 6 decimals): see
    * [[PqAdcResidualExpr]]. `lut` is a [[pqLut]] struct over the GLOBAL
    * residual codebook; `cross`/`cNormSq` are the per-cell fold columns;
    * `cbNormSq` is [[pqSubNormSq]] of the residual codebook.
    */
  def pqAdcResidualCosine(
      lut: Column, codes: Column, cross: Column,
      cDotQ: Column, cNormSq: Column,
      cbNormSq: Array[Double], k: Int): Column =
    round(GraftColumnCompat.toColumn(PqAdcResidualExpr(
      GraftColumnCompat.toExpression(lut),
      GraftColumnCompat.toExpression(codes),
      GraftColumnCompat.toExpression(cross),
      GraftColumnCompat.toExpression(cDotQ),
      GraftColumnCompat.toExpression(cNormSq), cbNormSq, k)), 6)

  /** Static per-(subspace, code) squared norms of a PQ codebook:
    * `out(j*k + c) = ‖codebook(c)[j*d/m, (j+1)*d/m)‖²`.
    */
  def pqSubNormSq(codebook: Array[Array[Double]], m: Int): Array[Double] = {
    val k = codebook.length
    val d = if (k == 0) 0 else codebook(0).length
    val sub = if (m == 0) 0 else d / m
    val out = new Array[Double](m * k)
    for (j <- 0 until m; c <- 0 until k) {
      var s = 0.0
      var i = j * sub
      val end = math.min((j + 1) * sub, codebook(c).length)
      while (i < end) { s += codebook(c)(i) * codebook(c)(i); i += 1 }
      out(j * k + c) = s
    }
    out
  }
}
