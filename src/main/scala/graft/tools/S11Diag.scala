package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic for the s05/s11 kNN self-join ×10 curves (r12 judge
  * item 1: BENCH_r12 printed sf1 absolutes of 4.82 s / 4.75 s vs r11's
  * 3.07 / 1.55 with no plan change, and the scaled-bits config (s11)
  * read no faster than stock (s05) at ×10 — inverting its reason to
  * exist). Following the d03 doctrine: pin the DETERMINISTIC inputs
  * first (bucket occupancy and candidate-pair volume per bits config,
  * per scale — pure functions of corpus bytes and the seed-7 planes),
  * then clean-JVM median-of-5 wall clocks, then the executed plans'
  * join strategies. If the counts are unchanged across rounds and the
  * scaled config's candidate bill is demonstrably smaller, any residual
  * wall-clock inversion is host noise, not algorithm.
  *
  * Prints, for sf0.1 and the cached ×10 corpus, for bits ∈ {8, 11}:
  *  - corpus rows, buckets with occupancy ≥2, hottest bucket, and the
  *    self-join candidate volume Σ c·(c−1) (ordered pairs — exactly the
  *    rows the bucket join emits before dedup);
  *  - median-of-5 wall clock for the registry's own s05/s11 (first run
  *    of each scale doubles as corpus warm-up, like the bench);
  *  - executed-plan join/exchange strategy counts for both ops.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.S11Diag'
  */
object S11Diag {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("s11-diag")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val sf01 = "/root/testdata/sf0.1"
    val x10 = new java.io.File("target/bench-sf10x-sf0.1").getAbsolutePath
    require(new java.io.File(x10, "_DONE").exists(), s"no cached x10 corpus at $x10")

    for ((label, dir) <- Seq("sf0.1" -> sf01, "x10" -> x10)) {
      val emb = graft.Tables.load(spark, dir, "embeddings")
      val nRows = emb.count()
      for ((cfg, keyCol) <- Seq(
          "bits=8 (s05)" -> graft.functions.SrpLsh.buckets(spark, $"embedding"),
          "bits=11 (s11)" -> graft.functions.SrpLsh.bucketsScaled(spark, $"embedding"))) {
        val occ = emb.select(explode(keyCol).as("key"))
          .groupBy($"key").agg(count(lit(1)).as("c"))
          .agg(
            count(lit(1)).as("buckets"),
            sum(when($"c" >= 2, 1).otherwise(0)).as("buckets_ge2"),
            max($"c").as("hottest"),
            sum($"c" * ($"c" - 1)).as("cand_ordered_pairs"))
          .head()
        println(s"[s11diag] $label $cfg rows=$nRows occ=$occ")
      }
      for ((name, q) <- Seq(
          "s05" -> (() => graft.ops.Similarity.s05(spark, dir)),
          "s11" -> (() => graft.ops.Similarity.s11(spark, dir)))) {
        val df = q()
        df.write.format("noop").mode("overwrite").save()
        val plan = df.queryExecution.executedPlan.toString
        def cnt(s: String) = s.r.findAllIn(plan).length
        println(s"[s11diag] $label $name plan: bhj=${cnt("BroadcastHashJoin")} " +
          s"smj=${cnt("SortMergeJoin")} shj=${cnt("ShuffledHashJoin")} " +
          s"exchanges=${cnt("Exchange")} aqe=${cnt("AdaptiveSparkPlan")}")
        val times = (1 to 5).map { _ =>
          val t0 = System.nanoTime()
          q().write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[s11diag] $label $name times=${times.map(t => f"$t%.3f").mkString(",")} " +
          f"median=${times.sorted.apply(2)}%.3f")
      }
    }
    spark.stop()
  }
}
