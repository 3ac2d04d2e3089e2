package graft.tools

import org.apache.spark.sql.SparkSession

/** Phase split for p02 (r18): standing-index build vs the incremental
  * delta probe, timed separately (the registry entry composes both). */
object P02Prof {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-p02-prof")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val idx = graft.ops.Pipeline.p02Index(spark, dir)
      val t1 = System.nanoTime()
      graft.ops.Pipeline.p02Incremental(spark, dir, idx)
        .write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"[p02-prof] rep$i index=${(t1 - t0) / 1e9}%5.2f " +
        f"incremental=${(t2 - t1) / 1e9}%5.2f")
    }
    spark.stop()
  }
}
