package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: s02's ×10 factor jumped 2.44× (r11) → 27.7× (r12
  * bench) after the round's TopK changes. Measures s02 at sf0.1 and the
  * cached ×10 corpus, with the rewrite on/off, and prints the executed
  * plan's operator mix to locate the regression.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.S02Diag'
  */
object S02Diag {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("s02-diag")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sf01 = "/root/testdata/sf0.1"
    val x10 = new java.io.File("target/bench-sf10x-sf0.1").getAbsolutePath

    for ((label, dir) <- Seq("sf0.1" -> sf01, "x10" -> x10);
         mode <- Seq("on", "off")) {
      spark.conf.set(graft.plans.TopKWindowRewrite.EnabledKey,
        if (mode == "on") "true" else "false")
      val df = graft.ops.Similarity.s02(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.executedPlan.toString
      def cnt(s: String) = s.r.findAllIn(plan).length
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.ops.Similarity.s02(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[s02diag] $label rewrite=$mode topk=${cnt("TopKPerKeyFinal")} " +
        f"win=${cnt("Window")} smj=${cnt("SortMergeJoin")} " +
        f"times=${times.map(t => f"$t%.3f").mkString(",")} median=${times.sorted.apply(1)}%.3f")
    }
    spark.stop()
  }
}
