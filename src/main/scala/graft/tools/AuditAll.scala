package graft.tools

import org.apache.spark.sql.SparkSession

/** r18 optimization-round checklist sweep: build EVERY registry query's
  * DataFrame and count plan-shape features (exchanges, join strategies,
  * scan-stage UDF evaluation, cartesians) in the analyzed physical
  * plan — the per-operator audit table for OPTIMIZATION_r18.md. Builds
  * plans only (no execution of the final query; fixture-building
  * entries still run their fixtures). One line per query:
  *   [audit] <name> exch=N bhj=N smj=N shj=N bnlj=N cart=N codegen=N
  * Run:
  *   SPARK_GRAFT_CPUS=8 sbt 'runMain graft.tools.AuditAll /root/testdata/sf0.01 [prefix,...]'
  */
object AuditAll {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val keep: String => Boolean =
      if (args.length > 1) { val ps = args(1).split(','); n => ps.exists(n.startsWith) }
      else _ => true
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-audit-all")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val plan = df.queryExecution.executedPlan.toString
        def c(p: String) = p.r.findAllIn(plan).length
        println(s"[audit] $name exch=${c("Exchange")} " +
          s"bhj=${c("BroadcastHashJoin")} smj=${c("SortMergeJoin")} " +
          s"shj=${c("ShuffledHashJoin")} bnlj=${c("BroadcastNestedLoop")} " +
          s"cart=${c("CartesianProduct")} codegen=${c("WholeStageCodegen")} " +
          // word-bounded: "(?i)invoke" also matched Invoke/StaticInvoke
          // codegen expressions (encoders, object serializers) and
          // systematically overcounted scan-stage UDF evaluation (r18
          // advice item)
          s"pyudf=${c("BatchEval")} scalaudf=${c("\\bScalaUDF\\b")}")
      } catch { case e: Throwable =>
        println(s"[audit] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
