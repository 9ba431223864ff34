package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the Deequ-shaped constraint
  * suite the reference's ETL implies but never formalizes (its staging
  * loads trust the file format; bad rows surface only as merge
  * failures). A check suite turns those implicit assumptions into an
  * auditable metrics table: one row per constraint with the exact
  * violation count, evaluated against the WHOLE table.
  *
  * Scale contract: all row-local checks (null / range / set / unique)
  * fold into ONE aggregate over ONE scan — adding a check adds a
  * column to the same partial-aggregable agg, not a pass. A
  * referential check joins the broadcast distinct key set of its
  * dimension BEFORE that same aggregate, so the fact is still scanned
  * once regardless of how many checks run. (For a dimension too large
  * to broadcast, pre-shrink it to the distinct keys — that projection
  * is what ships — or run the check as a separate shuffle-join count;
  * the API takes the keys as a DataFrame precisely so the caller
  * controls that.) Uniqueness uses count − count(distinct col):
  * Spark plans the distinct as an Expand over the same scan, not a
  * second read.
  */
object Checks {

  sealed trait Check { def name: String }

  /** `col` must never be null. */
  final case class NotNull(col: String) extends Check {
    val name = s"not_null_$col"
  }

  /** Non-null `col` must be unique across the table (violations =
    * surplus non-null rows). NULLs are ignored, the SQL-standard UNIQUE
    * semantics — completeness is [[NotNull]]'s job, and counting NULL
    * rows as duplicates would fail a clean-but-sparse column with a
    * misleading verdict.
    */
  final case class Unique(col: String) extends Check {
    val name = s"unique_$col"
  }

  /** Non-null `col` must be ≥ 0. */
  final case class NonNegative(col: String) extends Check {
    val name = s"non_negative_$col"
  }

  /** Non-null `col` must be one of `values`. */
  final case class InSet(col: String, values: Seq[String]) extends Check {
    val name = s"known_$col"
  }

  /** Every non-null `col` must appear in `dim`'s `dimCol` (referential
    * integrity). `dim` is reduced to its distinct keys and broadcast.
    */
  final case class RefIn(col: String, dim: DataFrame, dimCol: String) extends Check {
    val name = s"${col}_in_$dimCol"
  }

  /** Evaluate every check in one pass; returns
    * (check_name, violations, total, pass) — one row per check.
    */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    require(checks.map(_.name).distinct.size == checks.size,
      "duplicate check names in suite")
    // referential joins first (each broadcast, fact scanned once)
    val joined = checks.zipWithIndex.foldLeft(df) {
      case (acc, (RefIn(c, dim, dimCol), i)) =>
        val keys = dim.select(col(dimCol).as(s"__ref_$i")).distinct()
        acc.join(broadcast(keys), acc(c) === col(s"__ref_$i"), "left")
      case (acc, _) => acc
    }
    val aggs = checks.zipWithIndex.map {
      case (NotNull(c), i) =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__v_$i")
      case (Unique(c), i) =>
        (count(col(c)) - countDistinct(col(c))).as(s"__v_$i")
      case (NonNegative(c), i) =>
        sum(when(col(c).isNotNull && col(c) < 0, 1L).otherwise(0L)).as(s"__v_$i")
      case (InSet(c, vs), i) =>
        sum(when(col(c).isNotNull && !col(c).isInCollection(vs), 1L)
          .otherwise(0L)).as(s"__v_$i")
      case (RefIn(c, _, _), i) =>
        sum(when(col(c).isNotNull && col(s"__ref_$i").isNull, 1L)
          .otherwise(0L)).as(s"__v_$i")
    }
    val wide = joined.agg(aggs.head, (aggs.tail :+ count(lit(1)).as("__total")): _*)
    val stackArgs = checks.zipWithIndex
      .map { case (c, i) => s"'${c.name}', CAST(__v_$i AS BIGINT)" }
      .mkString(", ")
    wide.selectExpr(
        s"stack(${checks.size}, $stackArgs) AS (check_name, violations)",
        "CAST(__total AS BIGINT) AS total")
      .withColumn("pass", col("violations") === 0L)
  }
}
