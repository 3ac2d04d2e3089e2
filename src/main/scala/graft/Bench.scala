package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — driver runs this per-round with SPARK_GRAFT_SF_DIR set
  * (sf0.1). Prints ONE JSON line. Queries are materialized through the
  * `noop` sink so the full plan (all columns, all operators) executes —
  * `count()` would let Catalyst prune the projections being measured.
  */
object Bench {

  /** Representative headline set: scan+agg, selective scan, star join,
    * windows, top-k, JSON, set ops, as-of. Names missing from the
    * registry are reported as failed (value -1). */
  val headline: Seq[String] = Seq(
    "q01_pricing_summary", "q02_selective_filter", "q03_bcast_join",
    "q04_multiway_join", "q07_topk_per_group", "q09_global_topk",
    "q15_json_extract", "q19_time_bucket", "q20_asof_join")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val all = SparkEntry.queries
    // JIT/codegen warm-up: run each headline query once on the smallest SF
    // so measured times are steady state, not classloading/janino compile.
    headline.filter(all.contains).foreach { name =>
      try all(name)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    // failed or unknown queries report -1 and are excluded from the total
    val results = headline.map { name =>
      if (!all.contains(name)) {
        System.err.println(s"[bench] $name not in registry")
        name -> -1.0
      } else {
        val t0 = System.nanoTime()
        try {
          all(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
          name -> (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          name -> -1.0
        }
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.filter(_._2 >= 0).map(_._2).sum
    val failed = results.count(_._2 < 0)
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
