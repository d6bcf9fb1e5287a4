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
}
