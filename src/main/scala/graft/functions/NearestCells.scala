package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native nearest-centroid ranking: indexes of the `nprobe` nearest
  * centroids for one embedding row, with the centroid table inlined as a
  * plan constant. Two metrics:
  *
  *   - `cosine` (maximize) over the whole vector — the IVF coarse
  *     quantizer (e47/e48)
  *   - `l2` (minimize squared distance) over a SUBVECTOR starting at
  *     `sliceStart` — the product-quantization codebook assignment (e50):
  *     the centroid arrays are the sub-codebook, already sliced, and the
  *     row vector is sliced inside the kernel
  *
  * This replaces the `crossJoin(broadcast(centroids))` + per-vector
  * `row_number()` window formulation, which multiplies the corpus ×k and
  * then pays a full-corpus shuffle just to pick an argmin/argmax — with
  * real deployments' thousands of cells that is a 1000× row
  * amplification. Here assignment is a pure per-row projection: zero
  * extra rows, zero shuffle, whole-stage codegen, and `nprobe > 1`
  * multi-probe falls out of the same kernel.
  *
  * Bit-exactness contract: per-centroid scores use strict left-to-right
  * folds (the GraftVec/DuckDB `list_reduce` accumulation); NaN cosines
  * rank greatest, matching both engines' `ORDER BY … DESC` NaN
  * placement; ties go to the lower index, matching an
  * `ORDER BY score, idx LIMIT n` oracle. */
case class GraftNearestCells(
    child: Expression,
    cents: Array[Array[Double]],
    nprobe: Int,
    metric: String = "cosine",
    sliceStart: Int = 0) extends UnaryExpression {

  require(nprobe >= 1, "nprobe must be >= 1")
  require(cents.nonEmpty, "centroid table must be non-empty")
  require(metric == "cosine" || metric == "l2", s"unknown metric $metric")
  require(sliceStart >= 0, "sliceStart must be >= 0")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells requires array<float|double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  private def childIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def l2: Boolean = metric == "l2"

  override def nullSafeEval(arr: Any): Any =
    GraftNearestCells.compute(
      arr.asInstanceOf[ArrayData], cents, nprobe, childIsFloat, l2, sliceStart)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftNearestCells.compute($c, $centsRef, $nprobe, " +
        s"$childIsFloat, $l2, $sliceStart)")
  }

  override protected def withNewChildInternal(newChild: Expression): GraftNearestCells =
    copy(child = newChild)
}

object GraftNearestCells {

  @inline private def elem(a: ArrayData, i: Int, aF: Boolean): Double =
    if (aF) a.getFloat(i).toDouble else a.getDouble(i)

  /** Same fold as GraftVec.cosine with a primitive centroid side;
    * whole-vector (exact length match required). */
  private def cosineTo(a: ArrayData, b: Array[Double], aF: Boolean): Double = {
    val n = a.numElements()
    if (b.length != n) return Double.NegativeInfinity // dim mismatch: never wins
    var ab = 0.0d; var aa = 0.0d; var bb = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return Double.NegativeInfinity
      val x = elem(a, i, aF)
      val y = b(i)
      ab += x * y; aa += x * x; bb += y * y
      i += 1
    }
    val c = ab / (math.sqrt(aa) * math.sqrt(bb))
    // ORDER BY DESC in both engines ranks NaN greatest
    if (java.lang.Double.isNaN(c)) Double.PositiveInfinity else c
  }

  /** Strict left-to-right Σ(x−y)² over the row's slice
    * [start, start + b.length) against the (pre-sliced) centroid. */
  private def l2To(a: ArrayData, b: Array[Double], aF: Boolean, start: Int): Double = {
    val n = b.length
    if (a.numElements() < start + n) return Double.PositiveInfinity // never wins a MIN
    var acc = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(start + i)) return Double.PositiveInfinity
      val d = elem(a, start + i, aF) - b(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(a: ArrayData, cents: Array[Array[Double]], nprobe: Int,
      aF: Boolean, l2: Boolean, start: Int): ArrayData = {
    val k = cents.length
    val score = new Array[Double](k)
    var c = 0
    while (c < k) {
      score(c) = if (l2) l2To(a, cents(c), aF, start) else cosineTo(a, cents(c), aF)
      c += 1
    }
    val n = math.min(nprobe, k)
    val out = new Array[Int](n)
    val taken = new Array[Boolean](k)
    var s = 0
    while (s < n) { // selection: k is small (centroid table), n smaller
      var best = -1
      var i = 0
      while (i < k) {
        if (!taken(i) && (best < 0 ||
          (if (l2) score(i) < score(best) else score(i) > score(best)))) best = i
        i += 1
      }
      taken(best) = true
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }
}
