package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Vector math over `array<double>` columns.
  *
  * The public API is backed by native Catalyst expressions
  * ([[VectorExpressions]]) that stay inside whole-stage codegen; the
  * `*Hof` variants are the reference formulations in pure built-in
  * higher-order functions, kept for cross-checking (VectorExprSpec
  * asserts bit-identical results — both accumulate strictly
  * left-to-right, so either matches an oracle that sums in element
  * order).
  */
object VectorFunctions {

  private def bin(f: (org.apache.spark.sql.catalyst.expressions.Expression,
                      org.apache.spark.sql.catalyst.expressions.Expression) =>
                     org.apache.spark.sql.catalyst.expressions.Expression)
                 (a: Column, b: Column): Column =
    ColumnBridge.column(f(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Dot product of two equal-length array<double> columns (codegen'd). */
  def dot(a: Column, b: Column): Column = bin(DotProductExpr.apply)(a, b)

  /** Cosine similarity; 0.0 for zero vectors (no NaN propagation). */
  def cosine(a: Column, b: Column): Column = bin(CosineSimExpr.apply)(a, b)

  /** Squared Euclidean distance (cell assignment metric for IVF). */
  def l2sq(a: Column, b: Column): Column = bin(L2SqExpr.apply)(a, b)

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** PQ ADC distance: Σ_j luts[j][codes[j]] over an `array<int>` codes
    * column and an `array<array<double>>` LUT column (codegen'd; one
    * expression regardless of probe-batch size).
    */
  def pqAdc(codes: Column, luts: Column): Column = bin(PqAdcExpr.apply)(codes, luts)

  // --- reference HOF formulations (built-ins only, interpreted) ---

  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def normHof(a: Column): Column = sqrt(dotHof(a, a))

  def cosineHof(a: Column, b: Column): Column = {
    val denom = normHof(a) * normHof(b)
    when(denom === 0.0, 0.0).otherwise(dotHof(a, b) / denom)
  }

  def l2sqHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)
}
