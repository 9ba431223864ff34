package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}

/** Bridge to the package-private DataFrame constructor
  * (`classic.Dataset.ofRows`, Spark 4.x) — needed to surface a custom
  * LogicalPlan (graft.plans.AsOfJoinNode) as a user-facing DataFrame,
  * the same technique ColumnBridge uses for Column ↔ Expression.
  */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}
