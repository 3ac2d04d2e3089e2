package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev diagnostic for q04's ×10 scale curve (carryover advice item:
  * 7.39× in r10, 5.15× in r11 — is there a broadcast→sort-merge
  * crossover at the bigger scale, and which join is the time?).
  *
  * Prints the executed join strategies, the per-join build sizes AQE
  * saw, and 5 timed runs at sf0.1 and the cached ×10 corpus.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.Q04Diag'
  */
object Q04Diag {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("q04-diag")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sf01 = "/root/testdata/sf0.1"
    val x10 = new java.io.File("target/bench-sf10x-sf0.1").getAbsolutePath
    require(new java.io.File(x10, "_DONE").exists(), s"no cached x10 corpus at $x10")

    for ((label, dir) <- Seq("sf0.1" -> sf01, "x10" -> x10)) {
      val q = graft.queries.Relational.q04(spark, dir)
      q.write.format("noop").mode("overwrite").save()
      val plan = q.queryExecution.executedPlan.toString
      def cnt(s: String) = s.r.findAllIn(plan).length
      println(s"[q04diag] $label plan: bhj=${cnt("BroadcastHashJoin")} " +
        s"smj=${cnt("SortMergeJoin")} shj=${cnt("ShuffledHashJoin")} " +
        s"exchanges=${cnt("Exchange")} aqeShuffleReads=${cnt("AQEShuffleRead")}")
      // which keys each join strategy landed on (first line of each join node)
      plan.linesIterator
        .filter(l => l.contains("Join") && !l.contains("Reused"))
        .map(_.trim.take(150)).foreach(l => println(s"[q04diag] $label   $l"))
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        graft.queries.Relational.q04(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[q04diag] $label times=${times.map(t => f"$t%.3f").mkString(",")} " +
        f"median=${times.sorted.apply(2)}%.3f")
    }
    spark.stop()
  }
}
