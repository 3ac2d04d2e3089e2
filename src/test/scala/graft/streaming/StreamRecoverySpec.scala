package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Fault tolerance: a streaming aggregation killed between micro-batches
  * and restarted from its checkpoint must produce exactly-once output —
  * no lost windows, no duplicates — because the checkpoint persists both
  * source offsets and watermark/agg state. This is the property a
  * production deployment of the windowed aggs actually relies on; the
  * oracle-gate drains (EventsStream) never exercise it because they run
  * each query in one uninterrupted lifetime.
  */
class StreamRecoverySpec extends SparkSpec {

  test("hourly agg restarted from checkpoint emits each closed window exactly once") {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = graft.Tables.load(spark, sf, "events")
      .select($"ts", $"event_type").orderBy($"ts").collect()

    val srcDir = Files.createTempDirectory("recov_src_").toFile
    val outDir = Files.createTempDirectory("recov_out_").toString
    val ckDir = Files.createTempDirectory("recov_ck_").toString
    def writeBatch(rows: Seq[org.apache.spark.sql.Row], name: String): Unit =
      spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("ts",
              org.apache.spark.sql.types.TimestampType),
            org.apache.spark.sql.types.StructField("event_type",
              org.apache.spark.sql.types.StringType))))
        .write.parquet(s"$srcDir/$name")

    // lifetime 1: first half of the stream, then a hard stop
    val (first, second) = events.splitAt(events.length / 2)
    writeBatch(first.toSeq, "b1")
    def run(): Unit = {
      val src = spark.readStream
        .schema("ts TIMESTAMP, event_type STRING")
        .option("pathGlobFilter", "*.parquet").parquet(s"$srcDir/*")
      val q = StreamOps.hourlyCounts(src)
        .select($"window.start".as("wstart"), $"event_type", $"n_events")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckDir)
        .format("parquet").option("path", outDir)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()

    // lifetime 2: the "recovered" query — same checkpoint, more data
    writeBatch(second.toSeq, "b2")
    run()

    val got = spark.read.parquet(outDir)
      .select(date_format($"wstart", "yyyy-MM-dd HH:00:00").as("hour_bucket"),
        $"event_type", $"n_events")
      .orderBy($"hour_bucket", $"event_type")
      .collect().map(_.toSeq)
    // expected = batch aggregation restricted to watermark-closed windows
    // (window end ≤ max ts − 1 h), the same predicate as st08's oracle
    val expected = graft.Tables.load(spark, sf, "events")
      .select(date_trunc("hour", $"ts").as("w"), $"event_type", $"ts")
      .withColumn("mx", max($"ts").over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .filter($"w" + expr("INTERVAL 1 HOUR") <= $"mx" - expr("INTERVAL 1 HOUR"))
      .groupBy(date_format($"w", "yyyy-MM-dd HH:00:00").as("hour_bucket"), $"event_type")
      .agg(count(lit(1)).as("n_events"))
      .orderBy($"hour_bucket", $"event_type")
      .collect().map(_.toSeq)
    assert(got.length == expected.length,
      s"row count after recovery: got ${got.length}, expected ${expected.length}")
    assert(got.sameElements(expected) || got.toSeq == expected.toSeq,
      "recovered stream output differs from the batch oracle")
  }
}
