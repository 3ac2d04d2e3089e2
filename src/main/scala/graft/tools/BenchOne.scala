package graft.tools

import org.apache.spark.sql.SparkSession

/** Clean-JVM re-pin for individual bench entries (the r15 judge's item
  * 2: adjudicate q01's +32% official-run residual and the sf1 block's
  * s05 10.39 s / g01 13.82 s ×10 readings on code untouched since) —
  * the S11Diag doctrine: a DEDICATED fresh JVM per invocation, the
  * host canary printed alongside (nominal ≈ 0.15 s; parked ≈ 0.4 s),
  * median-of-5 after one warm-up, full plans through the noop sink
  * exactly like the bench. Run the tool 2-3 times for independent
  * placements; read medians only at nominal canary.
  *
  * Run:
  *   SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.BenchOne \
  *     /root/testdata/sf0.1 q01_pricing_summary,s05_knn_join'
  * (pass `target/bench-sf10x-sf0.1` as the dir to read the cached ×10
  * corpus the bench's sf1 block builds)
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    require(args.length >= 2, "usage: BenchOne <dataDir> <name,name,...>")
    val dir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val c0 = graft.Bench.canarySec()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-one")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all = graft.SparkEntry.queries
    println(f"[benchone] canary_pre=$c0%.3f dir=$dir")
    names.foreach { name =>
      val q = all.getOrElse(name,
        sys.error(s"unknown registry query: $name"))
      def once(): Double = {
        val t0 = System.nanoTime()
        q(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up: source caches, codegen
      val runs = (1 to 5).map(_ => once())
      val med = runs.sorted.apply(2)
      println(f"[benchone] $name median=$med%.3f " +
        s"runs=[${runs.map(r => f"$r%.3f").mkString(",")}]")
    }
    val c1 = graft.Bench.canarySec()
    println(f"[benchone] canary_post=$c1%.3f")
    spark.stop()
  }
}
