package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase split for d06 (the r18 verdict's item 5 ask): how much of the
  * entry is d02's capped-Jaccard pair generation vs the label-
  * propagation loop. Times each phase through its own materialization
  * (median of 3 after warm-up), bench-shaped session.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.D06Prof /root/testdata/sf0.1'
  */
object D06Prof {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-d06-prof")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def med(f: => Unit): Double = {
      f // warm
      val rs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      rs.sorted.apply(1)
    }
    val c0 = graft.Bench.canarySec()
    // phase 0: the capped shingle index alone (kernel + explode + df-cap)
    val tIdx = med {
      graft.ops.Dedup.cappedShingleIndex(
        graft.Tables.load(spark, dir, "documents"))
        .write.format("noop").mode("overwrite").save()
    }
    println(f"[d06prof] shingle_index=$tIdx%.2f")
    // phase 1: pair generation (d02 on documents), materialized
    val tPairs = med {
      graft.ops.Dedup.d02On(graft.Tables.load(spark, dir, "documents"))
        .select($"doc_a", $"doc_b")
        .write.format("noop").mode("overwrite").save()
    }
    // full entry for reference
    val tFull = med {
      graft.SparkEntry.queries("d06_dup_clusters")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    val c1 = graft.Bench.canarySec()
    println(f"[d06prof] pairs=$tPairs%.2f full=$tFull%.2f " +
      f"loop≈${tFull - tPairs}%.2f canary=$c0%.3f/$c1%.3f")
    spark.stop()
  }
}
