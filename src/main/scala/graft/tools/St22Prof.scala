package graft.tools

import org.apache.spark.sql.SparkSession

/** Phase split for st22 (r18): how much of the entry is the q92Build
  * fixture (4 commits: load + 3 COW merges) vs the change-feed drain
  * itself. Bench-shaped session; median unnecessary — 3 reps printed.
  */
object St22Prof {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-st22-prof")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val base = graft.queries.Extras6.q92Build(spark, dir)
      val t1 = System.nanoTime()
      // the drain half, isolated: rerun the registry entry end-to-end
      // and subtract a second fixture build's cost
      graft.SparkEntry.queries("st22_stream_change_feed")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"[st22-prof] rep$i build=${(t1 - t0) / 1e9}%5.2f " +
        f"full_entry=${(t2 - t1) / 1e9}%5.2f (drain ~= full - build) base=$base")
    }
    spark.stop()
  }
}
