package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal `private[sql]` access shim (the standard extension-library
  * pattern): wrap a custom [[LogicalPlan]] — e.g. `graft.plans
  * .TopKPerKey` — in a DataFrame. `classic.Dataset.ofRows` is public
  * bytecode but Scala-scoped `private[sql]`, so the bridge must live in
  * this package. Nothing else may be added here. */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
