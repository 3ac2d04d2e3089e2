package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only stage profiler (test scope — never shipped). Times individual
  * pipeline stages at an SF dir to direct optimization work. Run:
  *   sbt "Test/runMain graft.tools.Profile /root/testdata/sf0.1"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions._

    def time(name: String)(f: => Unit): Unit = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF $name%-28s ${runs.min}%8.3f s  (runs: ${runs.map(r => f"$r%.2f").mkString(", ")})")
    }

    val docs = graft.Tables.load(spark, dir, "documents")
    println(s"docs: ${docs.count()}")

    // d03 stages
    val sig = docs.select($"doc_id",
      graft.functions.MinHash.sigCol(spark, lower($"text")).as("sig"))
      .filter($"sig".isNotNull)
    time("d03.sig-only")(sig.write.format("noop").mode("overwrite").save())
    time("d03.full")(graft.ops.Dedup.d03(spark, dir).write.format("noop").mode("overwrite").save())

    // d02 / d06 stages
    time("d02.full")(graft.ops.Dedup.d02(spark, dir).write.format("noop").mode("overwrite").save())
    time("d06.full")(graft.ops.Dedup.d06(spark, dir).write.format("noop").mode("overwrite").save())

    // how many docs participate in near-dup pairs (prefilter potential)?
    val pairs = graft.ops.Dedup.d02(spark, dir).select($"doc_a", $"doc_b")
    val nDocs = pairs.select(explode(array($"doc_a", $"doc_b"))).distinct().count()
    println(s"docs in d02 pairs: $nDocs")

    // t08 winnow overlap
    time("t08.full")(graft.ops.TextOps.t08(spark, dir).write.format("noop").mode("overwrite").save())

    // LSH band candidate doc count (prefilter selectivity)
    val bandsOnly = {
      val withSig = sig
      val bandKeys = (0 until graft.functions.MinHash.Bands).map { j =>
        struct(lit(j).as("j") +: (0 until graft.functions.MinHash.RowsPerBand).map(r =>
          element_at($"sig", j * graft.functions.MinHash.RowsPerBand + r + 1).as(s"k$r")): _*)
      }
      withSig.select($"doc_id", explode(array(bandKeys: _*)).as("band_key"))
    }
    val candDocs = bandsOnly.groupBy($"band_key").agg(collect_list($"doc_id").as("ds"), count(lit(1)).as("n"))
      .filter($"n" >= 2)
      .select(explode($"ds").as("doc_id")).distinct()
    time("lsh-band-cand-docs")(println(s"  band-cand docs: ${candDocs.count()}"))

    spark.stop()
  }
}
