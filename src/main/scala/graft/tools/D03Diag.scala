package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic for d03's ×10 scale curve (r11 advice item 4: the
  * ratio moved 3.20× → 5.89× across rounds with no code change).
  *
  * Prints, for sf0.1 and the cached ×10 corpus:
  *  - deterministic band-occupancy stats (buckets ≥2, buckets over the
  *    64 cap, capped candidate pairs, hottest bucket) — if these are
  *    identical across rounds the movement is runtime, not algorithmic;
  *  - the executed plan's join strategies (broadcast vs sort-merge) for
  *    the signature re-join, the one AQE decision that could flip
  *    bimodally near a threshold at the bigger scale;
  *  - 5 timed runs per scale so run-to-run variance is visible.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.D03Diag'
  */
object D03Diag {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("d03-diag")
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
      // --- deterministic candidate stats (same banding math as d03) ---
      val docs = graft.Tables.load(spark, dir, "documents")
      val withSig = docs
        .select($"doc_id", graft.functions.MinHash.sigCol(spark, lower($"text")).as("sig"))
        .filter($"sig".isNotNull)
      val bands = (0 until graft.functions.MinHash.Bands).map { j =>
        struct(lit(j).as("j") +: (0 until graft.functions.MinHash.RowsPerBand).map(r =>
          element_at($"sig", j * graft.functions.MinHash.RowsPerBand + r + 1).as(s"k$r")): _*)
      }
      val occ = withSig.select($"doc_id", explode(array(bands: _*)).as("band_key"))
        .groupBy($"band_key").agg(count(lit(1)).as("c"))
        .filter($"c" >= 2)
        .agg(
          count(lit(1)).as("buckets_ge2"),
          sum(when($"c" > 64, 1).otherwise(0)).as("buckets_over_cap"),
          sum(when($"c" <= 64, $"c" * ($"c" - 1) / 2).otherwise(0)).as("capped_pairs"),
          sum($"c" * ($"c" - 1) / 2).as("uncapped_pairs"),
          max($"c").as("hottest"))
        .head()
      println(s"[d03diag] $label docs=${docs.count()} stats=$occ")

      // --- executed plan join strategies + timings ---
      val q = graft.ops.Dedup.d03(spark, dir)
      q.write.format("noop").mode("overwrite").save()
      val plan = q.queryExecution.executedPlan.toString
      def cnt(s: String) = s.r.findAllIn(plan).length
      println(s"[d03diag] $label plan: bhj=${cnt("BroadcastHashJoin")} " +
        s"smj=${cnt("SortMergeJoin")} shj=${cnt("ShuffledHashJoin")} " +
        s"exchanges=${cnt("Exchange")}")
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        graft.ops.Dedup.d03(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[d03diag] $label times=${times.map(t => f"$t%.3f").mkString(",")} " +
        f"median=${times.sorted.apply(2)}%.3f")
    }
    spark.stop()
  }
}
