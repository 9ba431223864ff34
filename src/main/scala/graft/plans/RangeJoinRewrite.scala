package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Max, Min}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{CalendarIntervalType, DataType, TimestampNTZType, TimestampType}
import org.apache.spark.unsafe.types.CalendarInterval

/** Optimizer rule: rewrite a keyless interval join
  *
  * {{{ points JOIN intervals ON ts >= start AND ts <= end }}}
  *
  * — which Spark can only execute as a broadcast-nested-loop or
  * cartesian product — into the bucketed equi-join shape of
  * [[graft.operators.RangeJoin]]: the interval side is exploded into the
  * month buckets it spans, the point side maps to exactly one bucket,
  * and the join gains a `bucket = bucket` equality Spark can hash- or
  * sort-merge-join; the original range predicate stays as an exact
  * post-condition.
  *
  * Fires only on an Inner join whose condition is a pure two-sided
  * range (one TimestampType point attribute from one side between two
  * TimestampType bound attributes of the other) with NO equality
  * conjunct — joins that already have an equi-key (e.g. the SCD as-of
  * join) hash-partition fine and are left alone. The rewritten join
  * contains an equality, so the rule cannot re-fire (fixpoint-safe).
  *
  * Buckets are months, so an interval spanning Y years would explode
  * into 12·Y rows — fine for calendar windows, pathological for
  * open-ended sentinels like SCD2's 9999-12-31 (~96k rows/interval).
  * The rewrite therefore clamps every interval's bucket range to the
  * point side's actual [min, max] month, injected as uncorrelated
  * scalar subqueries (the same shape Spark's InjectRuntimeFilter uses):
  * buckets outside the points' calendar span can never match a point,
  * so dropping them is semantics-preserving, and the per-interval
  * explosion is bounded by the DATA's span regardless of sentinels.
  * Every rewrite logs a warning so a fired rule is diagnosable; disable
  * with `spark.graft.rangeJoinRewrite.enabled=false`.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.rangeJoinRewrite.enabled"

  private val oneMonth = Literal(new CalendarInterval(1, 0, 0), CalendarIntervalType)

  /** Month truncation with every timezone-aware link resolved explicitly
    * (the analyzer is done by the time an optimizer rule runs, so nothing
    * will fill in timeZoneId for us). TIMESTAMP_NTZ operands are cast to
    * session-local TIMESTAMP first — both join sides go through the same
    * cast, and bucket granularity only affects candidate generation; the
    * exact range predicate is preserved as a post-condition.
    */
  private def truncMonth(ts: Expression): Expression = {
    val tz = SQLConf.get.sessionLocalTimeZone
    val ltz = if (ts.dataType == TimestampNTZType)
      Cast(ts, TimestampType, Some(tz)) else ts
    TruncTimestamp(Literal("month"), ltz, Some(tz))
  }

  /** Month-bucket sequence over [s, e] ∩ [ptMin, ptMax].
    *
    * `ptMin`/`ptMax` are scalar-subquery min/max point months: buckets
    * outside the points' span match nothing, so intersecting with it
    * changes no results while bounding sequence length by the data's
    * calendar span (Greatest/Least skip NULLs, so an empty point side
    * degrades to the unclamped bounds). Stop is then clamped to
    * >= start: a degenerate interval (end < start, or one entirely
    * outside the points' span) matched nothing under the naive join but
    * would make Sequence THROW; with the clamp it emits one spurious
    * bucket row that the preserved exact range predicate then rejects.
    */
  private def monthSequence(s: Expression, e: Expression,
                            ptMin: Expression, ptMax: Expression): Expression = {
    val lo = Greatest(Seq(truncMonth(s), ptMin))
    val hi = Least(Seq(truncMonth(e), ptMax))
    new Sequence(lo, Greatest(Seq(hi, lo)), oneMonth)
      .withTimeZone(SQLConf.get.sessionLocalTimeZone)
  }

  /** Uncorrelated scalar subquery `SELECT agg(trunc('month', p)) FROM
    * points` — evaluated once before the main query, like a runtime
    * filter; the scan it adds is a single pruned column (often answered
    * from parquet footer stats).
    */
  private def ptMonthBound(points: LogicalPlan, p: Attribute,
                           agg: Expression => AggregateExpression): Expression = {
    val a = Alias(agg(truncMonth(p)), "__pt_month_bound")()
    ScalarSubquery(Aggregate(Nil, Seq(a), points))
  }

  private def isTs(t: DataType): Boolean =
    t == TimestampType || t == TimestampNTZType

  /** (point, start, end) when the condition is exactly the pure range. */
  private def asRange(cond: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[(Attribute, Attribute, Attribute, Boolean)] = cond match {
    case And(GreaterThanOrEqual(p: Attribute, s: Attribute),
             LessThanOrEqual(p2: Attribute, e: Attribute))
        if p.semanticEquals(p2) && isTs(p.dataType) &&
          isTs(s.dataType) && isTs(e.dataType) =>
      val lo = left.outputSet
      val ro = right.outputSet
      if (lo.contains(p) && ro.contains(s) && ro.contains(e))
        Some((p, s, e, true)) // intervals on the right
      else if (ro.contains(p) && lo.contains(s) && lo.contains(e))
        Some((p, s, e, false)) // intervals on the left
      else None
    case _ => None
  }

  /** Lenient boolean parse: the rule runs inside optimization of EVERY
    * query, so a malformed conf value must not throw — anything not an
    * explicit disable spelling keeps the rule on.
    */
  private def enabled: Boolean =
    SQLConf.get.getConfString(EnabledKey, "true").trim.toLowerCase match {
      case "false" | "0" | "no" | "off" => false
      case _ => true
    }
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else rewrite(plan)

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      asRange(cond, left, right) match {
        // The clamp bounds RE-EXECUTE the points plan as scalar
        // subqueries; a non-deterministic points side (rand() sampling,
        // current_timestamp, non-deterministic UDF) could sample a
        // DIFFERENT row set there than in the join's own scan, clamping
        // away buckets that real join rows need — silently dropping
        // matches. Only rewrite fully deterministic point plans.
        case Some((p, s, e, intervalsRight))
            if (if (intervalsRight) left else right)
              .find(n => !n.expressions.forall(_.deterministic)).isEmpty =>
          val (points, intervals) = if (intervalsRight) (left, right) else (right, left)
          logWarning(s"graft: rewriting keyless range join ($p between $s and $e) " +
            "to a month-bucketed equi-join (bucket span clamped to the point " +
            s"side's min/max month); disable with $EnabledKey=false.")
          // intervals side: one row per spanned month bucket, clamped to
          // the points' calendar span so open-ended sentinels stay cheap
          val ptMin = ptMonthBound(points, p, x => Min(x).toAggregateExpression())
          val ptMax = ptMonthBound(points, p, x => Max(x).toAggregateExpression())
          val bucketGen = AttributeReference("__bucket", TimestampType)()
          val gen = Generate(
            Explode(monthSequence(s, e, ptMin, ptMax)),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(bucketGen), child = intervals)
          // points side: exactly one bucket per row
          val bucketPt = Alias(truncMonth(p), "__bucket")()
          val proj = Project(points.output :+ bucketPt, points)
          val newCond = And(EqualTo(bucketPt.toAttribute, bucketGen), cond)
          val (nl, nr) = if (intervalsRight) (proj, gen) else (gen, proj)
          Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
        case _ => j // no range shape, or non-deterministic points side
      }
  }
}
