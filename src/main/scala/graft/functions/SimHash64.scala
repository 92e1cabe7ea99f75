package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: 64-bit SimHash of a token array.
  *
  * Semantics: bit b of the result is 1 iff the sum over tokens of
  * (+1 if bit b of MD5(token) is set else -1) is >= 0. Near-identical
  * token multisets → small Hamming distance, the classic near-dup sketch.
  *
  * Why a custom Expression (SURVEY.md §7.4 preference order): the
  * higher-order-function formulation (graft.text.TextFunctions.simhashBits)
  * re-hashes every token once PER BIT — 64× the MD5 work — and builds
  * per-bit strings. This operator hashes each token once and runs inside
  * whole-stage codegen via a static call (`doGenCode` below), so it
  * vectorizes with the surrounding projection: the right shape for a
  * 100 TB dedup pass. A Scala UDF would serialize UTF8String → String per
  * row and break codegen.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  // manual check (AbstractDataType/ExpectsInputTypes are private[sql] in 4.x)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(arr: Any): Any =
    SimHash64.compute(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val md = digest.get()
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val h = md.digest(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h(b >> 3) >> (7 - (b & 7))) & 1) == 1) votes(b) += 1
          else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) >= 0) out |= 1L << (63 - b)
      b += 1
    }
    out
  }
}
