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
  // NULL semantics match the HOF formulations EXACTLY.
  // dot/l2sq: zip_with null-pads unequal lengths and a null element
  // nulls its product, so the aggregate sum is NULL ⇒ unequal lengths
  // or ANY null element → NULL.
  // cosine: the HOF form is when(denom === 0, 0.0).otherwise(dot/denom)
  // with denom from full-array self-dots — so ANY null element → NULL,
  // else a zero-norm side → 0.0 (EVEN for unequal lengths: the zero
  // check short-circuits before the zipped dot), else unequal lengths
  // → NULL, else the value.

  private def anyNull(a: ArrayData, b: ArrayData): Boolean = {
    var i = 0
    while (i < a.numElements()) { if (a.isNullAt(i)) return true; i += 1 }
    i = 0
    while (i < b.numElements()) { if (b.isNullAt(i)) return true; i += 1 }
    false
  }

  /** Exact (null-handling) variants; boxed null ⇒ SQL NULL. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double =
    if (a.numElements() != b.numElements() || anyNull(a, b)) null
    else dotFast(a, b)

  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    if (anyNull(a, b)) return null
    var daa = 0.0; var dbb = 0.0
    var i = 0
    while (i < a.numElements()) { val x = a.getDouble(i); daa += x * x; i += 1 }
    i = 0
    while (i < b.numElements()) { val y = b.getDouble(i); dbb += y * y; i += 1 }
    val denom = math.sqrt(daa) * math.sqrt(dbb)
    if (denom == 0.0) return 0.0
    if (a.numElements() != b.numElements()) return null
    // reuse the norms already accumulated (same left-to-right order as
    // cosineFast, so the result is bit-identical) — only dab remains
    var dab = 0.0
    i = 0
    while (i < a.numElements()) { dab += a.getDouble(i) * b.getDouble(i); i += 1 }
    dab / denom
  }

  def l2sq(a: ArrayData, b: ArrayData): java.lang.Double =
    if (a.numElements() != b.numElements() || anyNull(a, b)) null
    else l2sqFast(a, b)

  /** Primitive fast paths — caller guarantees equal lengths and no null
    * elements (the codegen no-null branch); single pass, no boxing.
    */
  def dotFast(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  def cosineFast(a: ArrayData, b: ArrayData): Double = {
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

  def l2sqFast(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { val d = a.getDouble(i) - b.getDouble(i); acc += d * d; i += 1 }
    acc
  }

  /** PQ asymmetric-distance lookup: Σ_j luts[j][codes[j]] — one probe's
    * ADC distance to a coded vector, accumulated strictly in subspace
    * order (bit-identical to the old per-subspace `element_at` sum).
    * NULL on length mismatch, a null code/LUT element, or an
    * out-of-range code — the vec-ops mismatch-⇒-NULL posture (codes
    * from [[graft.operators.ProductQuant.encode]] are in range by
    * construction).
    */
  def pqAdc(codes: ArrayData, luts: ArrayData): java.lang.Double = {
    val m = codes.numElements()
    if (luts.numElements() != m) return null
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j) || luts.isNullAt(j)) return null
      val lut = luts.getArray(j)
      val c = codes.getInt(j)
      if (c < 0 || c >= lut.numElements() || lut.isNullAt(c)) return null
      acc += lut.getDouble(c)
      j += 1
    }
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

  /** True when the input schemas guarantee no null ELEMENTS — the hot
    * path (parquet embeddings are containsNull=false) then skips the
    * null scan and boxing entirely; only a length check remains.
    */
  private lazy val noNullElements: Boolean = (left.dataType, right.dataType) match {
    case (ArrayType(_, ln), ArrayType(_, rn)) => !ln && !rn
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (noNullElements && aa.numElements() == bb.numElements()) op match {
      case "dot"    => VectorOps.dotFast(aa, bb)
      case "cosine" => VectorOps.cosineFast(aa, bb)
      case "l2sq"   => VectorOps.l2sqFast(aa, bb)
    } else op match {
      case "dot"    => VectorOps.dot(aa, bb)
      case "cosine" => VectorOps.cosine(aa, bb)
      case "l2sq"   => VectorOps.l2sq(aa, bb)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val fast = if (noNullElements)
        s"""if ($a.numElements() == $b.numElements()) {
           |  ${ev.value} = graft.functions.VectorOps.${op}Fast($a, $b);
           |} else""".stripMargin
      else ""
      s"""
         |$fast {
         |  java.lang.Double ${ev.value}_r = graft.functions.VectorOps.$op($a, $b);
         |  if (${ev.value}_r == null) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = ${ev.value}_r.doubleValue();
         |  }
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

/** PQ ADC distance: left = array<int> codes, right = array<array<double>>
  * per-subspace LUTs. ONE codegen'd expression regardless of probe-batch
  * size — the previous per-probe `element_at`-forest formulation grew
  * the generated method past janino's 64 KB limit at ~50 probes
  * (caught by the sf1 sweep) and silently fell back to interpreted
  * eval on the corpus×probes hot path.
  */
case class PqAdcExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(org.apache.spark.sql.types.IntegerType, _),
          ArrayType(ArrayType(DoubleType, _), _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc requires (array<int>, array<array<double>>), got " +
        s"${l.simpleString} and ${r.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.pqAdc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |java.lang.Double ${ev.value}_r = graft.functions.VectorOps.pqAdc($a, $b);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.doubleValue();
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcExpr =
    copy(left = l, right = r)
}
