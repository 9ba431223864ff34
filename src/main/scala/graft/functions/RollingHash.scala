package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit FNV-1a document fingerprint as a native Catalyst expression.
  *
  * A Scala UDF would box every row and fall out of whole-stage codegen;
  * this expression generates a direct static call, so fingerprinting
  * stays inside the generated loop — the difference between a codegen
  * pipeline break and none at 100 TB.
  */
case class RollingHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  // SQL-registered (GraftExtensions): a non-string argument must be a
  // clean AnalysisException, not a mid-query ClassCastException or a
  // Janino compile failure
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string argument, got ${child.dataType.simpleString}")
  override def nullSafeEval(input: Any): Any =
    RollingHash.hash64(input.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.hash64($c.getBytes())")
  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)
  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  final val Prime = 1099511628211L
  final val Offset = -3750763034362895579L

  /** FNV-1a over raw UTF-8 bytes; called from generated code. */
  def hash64(bytes: Array[Byte]): Long = {
    var h = Offset
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * Prime
      i += 1
    }
    h
  }

  def fingerprint(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(RollingHashExpr(ColumnBridge.expression(c)))
  }
}
