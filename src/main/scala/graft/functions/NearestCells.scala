package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native IVF coarse quantizer: indexes of the `nprobe` nearest centroids
  * (by cosine, ties to the lower index) for one embedding row, with the
  * centroid table inlined as a plan constant.
  *
  * This replaces the `crossJoin(broadcast(centroids))` + per-vector
  * `row_number()` window formulation, which multiplies the corpus ×k and
  * then pays a full-corpus shuffle just to pick an argmax — with
  * real deployments' thousands of cells that is a 1000× row amplification.
  * Here assignment is a pure per-row projection: zero extra rows, zero
  * shuffle, runs inside whole-stage codegen, and `nprobe > 1` multi-probe
  * search falls out of the same kernel (take the first n of the ranking
  * instead of the first 1).
  *
  * Bit-exactness contract: per-centroid cosine uses the identical
  * fused-fold accumulation as GraftVec.cosine (and therefore the DuckDB
  * `list_reduce` oracle spelling); NaN cosines rank greatest, matching
  * both engines' `ORDER BY … DESC` NaN placement, so the selected indexes
  * agree with an `ORDER BY cosine DESC, idx LIMIT n` oracle. */
case class GraftNearestCells(
    child: Expression,
    cents: Array[Array[Double]],
    nprobe: Int) extends UnaryExpression {

  require(nprobe >= 1, "nprobe must be >= 1")
  require(cents.nonEmpty, "centroid table must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells requires array<float|double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  private def childIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(arr: Any): Any =
    GraftNearestCells.compute(
      arr.asInstanceOf[ArrayData], cents, nprobe, childIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftNearestCells.compute($c, $centsRef, $nprobe, $childIsFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): GraftNearestCells =
    copy(child = newChild)
}

object GraftNearestCells {

  /** Same fold as GraftVec.cosine with a primitive centroid side. */
  private def cosineTo(a: ArrayData, b: Array[Double], aF: Boolean): Double = {
    val n = a.numElements()
    if (b.length != n) return Double.NegativeInfinity // dim mismatch: never wins
    var ab = 0.0d; var aa = 0.0d; var bb = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return Double.NegativeInfinity
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = b(i)
      ab += x * y; aa += x * x; bb += y * y
      i += 1
    }
    val c = ab / (math.sqrt(aa) * math.sqrt(bb))
    // ORDER BY DESC in both engines ranks NaN greatest
    if (java.lang.Double.isNaN(c)) Double.PositiveInfinity else c
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(a: ArrayData, cents: Array[Array[Double]], nprobe: Int,
      aF: Boolean): ArrayData = {
    val k = cents.length
    val cos = new Array[Double](k)
    var c = 0
    while (c < k) { cos(c) = cosineTo(a, cents(c), aF); c += 1 }
    val n = math.min(nprobe, k)
    val out = new Array[Int](n)
    val taken = new Array[Boolean](k)
    var s = 0
    while (s < n) { // selection: k is small (centroid table), n smaller
      var best = -1
      var i = 0
      while (i < k) {
        if (!taken(i) && (best < 0 || cos(i) > cos(best))) best = i
        i += 1
      }
      taken(best) = true
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }
}
