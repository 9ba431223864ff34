package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for character n-gram extraction (q177's
  * hot loop; the building block of char-level LM statistics and the
  * lang-id feature family).
  *
  * The HOF formulation — `transform(sequence(1, length(s)-n+1),
  * i -> substring(s, i, n))` — walks the interpreted expression
  * evaluator per element AND re-scans the string from byte 0 on every
  * `substring` call (character indexing is a linear walk over UTF-8),
  * so a d-char document costs O(d²) interpreted work. This expression
  * computes the code-point boundary table ONCE per row and slices
  * n-grams as zero-walk byte ranges — O(d) per document, inside
  * whole-stage codegen (the PhraseScanExpr lesson, same fix).
  */
object NgramOps {
  /** All character n-grams of `s` in order (d - n + 1 of them; empty
    * array when the string is shorter than n). Character = code point
    * boundary per UTF-8 leading byte, matching both engines'
    * character-based `substring`.
    */
  def charNgrams(s: UTF8String, n: Int): ArrayData = {
    val total = s.numChars()
    val cnt = total - n + 1
    if (cnt <= 0) return new GenericArrayData(Array.empty[Any])
    val bytes = s.getBytes
    val offs = new Array[Int](total + 1)
    var i = 0
    var b = 0
    while (i < total) {
      offs(i) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      i += 1
    }
    offs(total) = b
    val out = new Array[Any](cnt)
    var j = 0
    while (j < cnt) {
      out(j) = UTF8String.fromBytes(bytes, offs(j), offs(j + n) - offs(j))
      j += 1
    }
    new GenericArrayData(out)
  }
}

case class CharNgramExpr(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    n: Int) extends UnaryExpression {
  require(n >= 1, s"char_ngrams needs n >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, false)
  override def prettyName: String = "char_ngrams"

  override def nullSafeEval(s: Any): Any =
    NgramOps.charNgrams(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramOps.charNgrams($c, $n)")

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): CharNgramExpr =
    copy(child = c)
}

object NgramFunctions {
  /** Array of all character n-grams of a string column (codegen'd
    * single pass; empty for strings shorter than n, null for null).
    */
  def charNgrams(s: Column, n: Int): Column =
    ColumnBridge.column(CharNgramExpr(ColumnBridge.expression(s), n))
}
