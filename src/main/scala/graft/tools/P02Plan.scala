package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the incremental-probe plan for p02 (r18): verifies the
  * shingle-index join exchanges only the delta side. */
object P02Plan {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-p02-plan")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val idx = graft.ops.Pipeline.p02Index(spark, dir)
    println("[p02-plan] shingleIdx partitioning: " +
      idx.shingleIdx.queryExecution.executedPlan.outputPartitioning)
    val run = graft.ops.Pipeline.p02Incremental(spark, dir, idx)
    println(run.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
