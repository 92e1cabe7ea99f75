package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native vector kernels for embedding columns (array<float> or
  * array<double>): dot product and one-pass cosine similarity.
  *
  * Why custom Expressions (SURVEY.md §7.4 preference order): the
  * higher-order-function spelling — `aggregate(zip_with(a, b, (x,y) ->
  * x*y), 0D, (acc,v) -> acc+v)` — allocates an intermediate product array
  * per row and evaluates the lambdas INTERPRETED per element; cosine needs
  * three such folds (a·b, a·a, b·b), i.e. three traversals plus three
  * arrays, per pair. These operators run one fused primitive loop inside
  * whole-stage codegen (static call, no boxing, no allocation) — the shape
  * a 100 TB ANN/dedup pass needs. A Scala UDF would additionally copy the
  * arrays out of Tungsten format per row.
  *
  * Bit-exactness contract (what makes the DuckDB oracles hold): products
  * are computed in double and accumulated STRICTLY LEFT TO RIGHT — the
  * identical operation sequence as the HOF fold and DuckDB's
  * `list_reduce(list_prepend(0.0, ...), (acc,v) -> acc+v)`, so results are
  * bit-identical to both (see graft.sim.Similarity). Null element, null
  * array, or length mismatch → NULL (the zip_with/aggregate semantics).
  */
trait GraftVecExpr extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float|double> inputs, got ${l.simpleString} / ${r.simpleString}")
  }
  override def dataType: DataType = DoubleType
  /** Result may be NULL for non-null inputs (length mismatch / null
    * element), so nullability is unconditional. */
  override def nullable: Boolean = true

  protected def leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  protected def rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Name of the static compute method on GraftVec. */
  protected def kernel: String

  override def nullSafeEval(a: Any, b: Any): Any = kernel match {
    case "dot" => GraftVec.dot(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], leftIsFloat, rightIsFloat)
    case "cosine" => GraftVec.cosine(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], leftIsFloat, rightIsFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("vecres")
      s"""
         |java.lang.Double $tmp =
         |  graft.functions.GraftVec.$kernel($a, $b, $leftIsFloat, $rightIsFloat);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })
}

/** a · b as a strict left-to-right double fold. */
case class GraftDot(left: Expression, right: Expression) extends GraftVecExpr {
  override def prettyName: String = "graft_dot"
  override protected def kernel: String = "dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GraftDot =
    copy(left = l, right = r)
}

/** cosine(a, b) = a·b / (√(a·a) · √(b·b)), all three folds fused into one
  * loop with the same per-fold accumulation order as three separate
  * folds (addition order within each accumulator is unchanged — only the
  * loop interleaving differs, which doesn't affect IEEE results). */
case class GraftCosine(left: Expression, right: Expression) extends GraftVecExpr {
  override def prettyName: String = "graft_cosine"
  override protected def kernel: String = "cosine"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GraftCosine =
    copy(left = l, right = r)
}

object GraftVec {

  @inline private def elem(arr: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)

  /** Null (boxed) on length mismatch or any null element — matching
    * zip_with + aggregate null propagation. */
  def dot(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += elem(a, i, aF) * elem(b, i, bF)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def cosine(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var ab = 0.0d
    var aa = 0.0d
    var bb = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = elem(a, i, aF)
      val y = elem(b, i, bF)
      ab += x * y
      aa += x * x
      bb += y * y
      i += 1
    }
    java.lang.Double.valueOf(ab / (math.sqrt(aa) * math.sqrt(bb)))
  }
}
