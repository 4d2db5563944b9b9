package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one `private[sql]` doorway graft needs: turning a custom
  * [[LogicalPlan]] (plans.AsOfJoin) into a DataFrame. `Dataset.ofRows`
  * is `private[sql]` in Spark 4, so this shim lives under the
  * `org.apache.spark.sql` package — the standard extension-library
  * idiom (no internal behavior is altered; everything else in graft
  * goes through `SparkSessionExtensions`). Original code.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
