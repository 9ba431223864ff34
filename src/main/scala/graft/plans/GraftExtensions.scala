package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimExpr, DotProductExpr, L2SqExpr, RollingHashExpr}

/** SparkSessionExtensions entry point: registers graft's native Catalyst
  * expressions with the SQL function registry, so pure-SQL users get the
  * same codegen'd operators as the Scala API:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * spark.sql("SELECT rolling_hash(text) FROM docs")
  * }}}
  *
  * Or via config (no code): spark.sql.extensions=graft.plans.GraftExtensions
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHashExpr].getName, "rolling_hash"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "rolling_hash takes exactly one argument")
        RollingHashExpr(children.head)
      }))
    def binary(name: String, clazz: Class[_],
               make: (Expression, Expression) => Expression): Unit =
      e.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        (children: Seq[Expression]) => {
          require(children.length == 2, s"$name takes exactly two arguments")
          make(children.head, children(1))
        }))
    binary("vec_dot", classOf[DotProductExpr], DotProductExpr.apply)
    binary("vec_cosine", classOf[CosineSimExpr], CosineSimExpr.apply)
    binary("vec_l2sq", classOf[L2SqExpr], L2SqExpr.apply)
    // the dedup-verifier primitives, for pure-SQL near-dup pipelines
    binary("bitmap_and_count", classOf[graft.functions.BitmapAndCountExpr],
      graft.functions.BitmapAndCountExpr.apply)
    binary("sorted_and_count", classOf[graft.functions.SortedAndCountExpr],
      graft.functions.SortedAndCountExpr.apply)
    binary("pack_bits", classOf[graft.functions.PackBitsExpr],
      graft.functions.PackBitsExpr.apply)
    def ternary(name: String, clazz: Class[_],
                make: (Expression, Expression, Expression) => Expression): Unit =
      e.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        (children: Seq[Expression]) => {
          require(children.length == 3, s"$name takes exactly three arguments")
          make(children.head, children(1), children(2))
        }))
    ternary("sorted_and_count_bounded",
      classOf[graft.functions.SortedAndCountBoundedExpr],
      graft.functions.SortedAndCountBoundedExpr.apply)
    ternary("no_earlier_band_match",
      classOf[graft.functions.NoEarlierBandMatchExpr],
      graft.functions.NoEarlierBandMatchExpr.apply)
    // phrase_scan(tokens, 'a', 'b') → [n_matches, first_pos]; the two
    // phrase terms must be string literals (they compile into the
    // codegen'd matcher as constants)
    e.injectFunction((
      new FunctionIdentifier("phrase_scan"),
      new ExpressionInfo(classOf[graft.functions.PhraseScanExpr].getName, "phrase_scan"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "phrase_scan takes (tokens, termA, termB)")
        def lit(c: Expression, which: String): String = c match {
          case l if l.foldable && l.dataType == org.apache.spark.sql.types.StringType =>
            Option(l.eval(null)).map(_.toString).getOrElse(
              throw new IllegalArgumentException(s"phrase_scan $which term must not be NULL"))
          case other => throw new IllegalArgumentException(
            s"phrase_scan $which term must be a string literal, got $other")
        }
        graft.functions.PhraseScanExpr(children.head,
          lit(children(1), "second"), lit(children(2), "third"))
      }))
    // char_ngrams(text, n) → array of all character n-grams; n must be
    // a positive integer literal (it compiles into the codegen'd
    // extractor as a constant)
    e.injectFunction((
      new FunctionIdentifier("char_ngrams"),
      new ExpressionInfo(classOf[graft.functions.CharNgramExpr].getName, "char_ngrams"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "char_ngrams takes (text, n)")
        val n = children(1) match {
          case l if l.foldable && l.dataType == org.apache.spark.sql.types.IntegerType =>
            Option(l.eval(null)).map(_.asInstanceOf[Int]).getOrElse(
              throw new IllegalArgumentException("char_ngrams n must not be NULL"))
          case other => throw new IllegalArgumentException(
            s"char_ngrams n must be an integer literal, got $other")
        }
        graft.functions.CharNgramExpr(children.head, n)
      }))
    // keyless interval joins → bucketed equi-join (no cartesian/BNL)
    e.injectOptimizerRule(_ => RangeJoinRewrite)
    // native point-in-time join: AsOfJoinNode → AsOfJoinExec
    e.injectPlannerStrategy(_ => new AsOfJoinStrategy)
  }
}
