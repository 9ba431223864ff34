package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(key)` over a driver-built [[BloomFilter]] — the
  * runtime-filter primitive behind [[graft.operators.BloomJoin]].
  *
  * The filter is a few hundred KB for millions of keys, so it ships to
  * executors inside the serialized expression (the same mechanism Spark's
  * own injected runtime filters use) and each row pays only k hash
  * probes inside whole-stage codegen — no join, no shuffle, no UDF
  * boundary. A false positive answers `true` (callers MUST re-verify
  * with an exact join); a false negative never happens, which is the
  * property that makes pre-filtering semantically safe.
  */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint key, got ${child.dataType.simpleString}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContainLong =
    copy(child = c)
}

object BloomFunctions {
  /** True iff `key` might be in `bloom` (codegen'd; false positives only). */
  def mightContainLong(key: Column, bloom: BloomFilter): Column =
    ColumnBridge.column(BloomMightContainLong(ColumnBridge.expression(key), bloom))
}
