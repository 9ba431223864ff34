package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for exact-phrase scanning of a token
  * array (q155's hot loop).
  *
  * The per-document adjacency test IS the phrase query at corpus
  * scale, so it must stay a primitive loop inside whole-stage codegen.
  * The HOF formulation — `filter(sequence(1, size(ws)), i -> ...)` —
  * materializes an index array per row and evaluates the lambda
  * through the interpreted expression walker per element: measured
  * 5.2 s → 0.5 s at sf0.1 for the same scan (the BitmapExpressions
  * lesson, same fix).
  */
object PhraseOps {
  /** One pass over the token array: [match count, 1-based position of
    * the first phrase start (0 when none)]. Null tokens never match.
    */
  def scan(ws: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = ws.numElements()
    var cnt = 0L
    var first = 0L
    var i = 0
    while (i < n - 1) {
      if (!ws.isNullAt(i) && !ws.isNullAt(i + 1) &&
        ws.getUTF8String(i).equals(a) && ws.getUTF8String(i + 1).equals(b)) {
        cnt += 1L
        if (first == 0L) first = i + 1L
      }
      i += 1
    }
    new GenericArrayData(Array(cnt, first))
  }
}

case class PhraseScanExpr(child: org.apache.spark.sql.catalyst.expressions.Expression,
                          phraseA: String, phraseB: String) extends UnaryExpression {
  private val utfA = UTF8String.fromString(phraseA)
  private val utfB = UTF8String.fromString(phraseB)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, false)
  override def prettyName: String = "phrase_scan"

  override def nullSafeEval(ws: Any): Any =
    PhraseOps.scan(ws.asInstanceOf[ArrayData], utfA, utfB)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("phraseA", utfA, classOf[UTF8String].getName)
    val bRef = ctx.addReferenceObj("phraseB", utfB, classOf[UTF8String].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.PhraseOps.scan($c, $aRef, $bRef)")
  }

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): PhraseScanExpr =
    copy(child = c)
}

object PhraseFunctions {
  /** `[n_matches, first_pos]` of the exact two-token phrase in a
    * token-array column (codegen'd single pass; first_pos 1-based,
    * 0 when absent).
    */
  def phraseScan(ws: Column, a: String, b: String): Column =
    ColumnBridge.column(PhraseScanExpr(ColumnBridge.expression(ws), a, b))
}
