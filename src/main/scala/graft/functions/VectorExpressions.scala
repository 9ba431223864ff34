package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for dense-vector math over
  * `array<double>` columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`)
  * is correct but evaluates a closure per element OUTSIDE whole-stage
  * codegen, allocating an intermediate array per row-pair. These
  * expressions compile to a single static-call loop inside the generated
  * code — on the ANN/dedup hot paths (a probe batch × a 100 TB corpus)
  * the per-pair cost is the entire job cost.
  *
  * Accumulation is strictly left-to-right, bit-identical to the HOF
  * versions in [[VectorFunctions]] (asserted by VectorExprSpec), so
  * swapping them cannot move oracle-checked results.
  */
object VectorOps {
  // NULL semantics match the HOF formulations exactly: zip_with
  // null-pads unequal lengths and a null element nulls its product, so
  // aggregate's running sum becomes NULL — therefore unequal lengths or
  // ANY null element → NULL result (returned as a boxed null here,
  // surfaced via the expression's null flag).

  private def invalid(a: ArrayData, b: ArrayData): Boolean = {
    if (a.numElements() != b.numElements()) return true
    var i = 0
    while (i < a.numElements()) {
      if (a.isNullAt(i) || b.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** Called from generated code; null ⇒ SQL NULL. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    if (invalid(a, b)) return null
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    if (invalid(a, b)) return null
    val n = a.numElements()
    var dab = 0.0; var daa = 0.0; var dbb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dab += x * y; daa += x * x; dbb += y * y
      i += 1
    }
    val denom = math.sqrt(daa) * math.sqrt(dbb)
    if (denom == 0.0) 0.0 else dab / denom
  }

  def l2sq(a: ArrayData, b: ArrayData): java.lang.Double = {
    if (invalid(a, b)) return null
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { val d = a.getDouble(i) - b.getDouble(i); acc += d * d; i += 1 }
    acc
  }
}

abstract class VectorBinaryExpr extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  // may be NULL even for non-null inputs (null element / length mismatch)
  override def nullable: Boolean = true
  /** Name of the static VectorOps method backing this expression. */
  def op: String
  override def nullSafeEval(a: Any, b: Any): Any = op match {
    case "dot"    => VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    case "cosine" => VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    case "l2sq"   => VectorOps.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r = graft.functions.VectorOps.$op($a, $b);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.doubleValue();
         |}
       """.stripMargin
    })
}

case class DotProductExpr(left: Expression, right: Expression) extends VectorBinaryExpr {
  override def op: String = "dot"
  override def prettyName: String = "vec_dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductExpr =
    copy(left = l, right = r)
}

case class CosineSimExpr(left: Expression, right: Expression) extends VectorBinaryExpr {
  override def op: String = "cosine"
  override def prettyName: String = "vec_cosine"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimExpr =
    copy(left = l, right = r)
}

case class L2SqExpr(left: Expression, right: Expression) extends VectorBinaryExpr {
  override def op: String = "l2sq"
  override def prettyName: String = "vec_l2sq"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2SqExpr =
    copy(left = l, right = r)
}
