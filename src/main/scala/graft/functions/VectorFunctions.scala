package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<double>` columns using native (codegen'd)
  * higher-order functions — no UDFs in the hot path.
  *
  * Accumulation is strictly left-to-right over the array, so results are
  * bit-identical across partitionings and match an oracle that sums in
  * element order.
  */
object VectorFunctions {

  /** Dot product of two equal-length array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 for zero vectors (no NaN propagation). */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0.0, 0.0).otherwise(dot(a, b) / denom)
  }

  /** Squared Euclidean distance (cell assignment metric for IVF). */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)
}
