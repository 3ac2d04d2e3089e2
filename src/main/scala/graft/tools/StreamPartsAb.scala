package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B the streaming drains' state-partition count INSIDE one JVM —
  * the host's half-hour speed windows make cross-run seconds
  * incomparable, so the targetPartitionBytes sweep runs interleaved:
  * for each conf value, warm once then median-of-3 of the full drain.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.StreamPartsAb \
  *   /root/testdata/sf0.1 st07_stream_stream_join 33554432,8388608,2097152'
  */
object StreamPartsAb {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir = args(0)
    val name = args(1)
    val targets = args(2).split(",").map(_.trim.toLong).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-stream-ab")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.SparkEntry.queries(name)
    def once(): Double = {
      val t0 = System.nanoTime()
      q(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[streamab] canary_pre=${graft.Bench.canarySec()}%.3f")
    // interleave: one pass of all targets (warm), then 3 measured passes
    once()
    val runs = scala.collection.mutable.Map.empty[Long, List[Double]]
    for (_ <- 1 to 3; t <- targets) {
      spark.conf.set("spark.graft.stream.targetPartitionBytes", t.toString)
      val s = once()
      runs(t) = s :: runs.getOrElse(t, Nil)
    }
    targets.foreach { t =>
      val rs = runs(t).sorted
      println(f"[streamab] $name target=$t median=${rs(rs.size / 2)}%.3f " +
        s"runs=[${rs.map(r => f"$r%.3f").mkString(",")}]")
    }
    println(f"[streamab] canary_post=${graft.Bench.canarySec()}%.3f")
    spark.stop()
  }
}
