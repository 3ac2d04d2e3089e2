package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for registry queries to files — the
  * r18 optimization round's plan-evidence artifacts
  * (plans/r18/<query>_{before,after}.txt). Bench-shaped session
  * (local[$SPARK_GRAFT_CPUS], shuffle.partitions = cpus, AQE on) so the
  * captured plan is the one the bench actually runs.
  *
  * Run:
  *   SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.PlanDump \
  *     /root/testdata/sf0.1 plans/r18 before q01_pricing_summary,...'
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanDump <dataDir> <outDir> <suffix> <name,name,...>")
    val Array(dir, outDir, suffix, namesCsv) = args.take(4)
    val names = namesCsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plan-dump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val all = graft.SparkEntry.queries
    names.foreach { name =>
      val out = Paths.get(outDir, s"${name}_$suffix.txt")
      try {
        val df = all(name)(spark, dir)
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(out, formatted)
        println(s"[plandump] wrote $out")
      } catch { case e: Throwable =>
        Files.writeString(out, s"PLAN DUMP FAILED: ${e.getMessage}\n")
        println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
