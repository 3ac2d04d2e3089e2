package graft.sources

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AvroStreamSpec extends SparkSpec {

  test("gavro micro-batch read: one file per trigger, exactly-once, settles to batch truth") {
    import spark.implicits._
    val ev = graft.Tables.load(spark, sf, "events")
      .select($"event_id", $"user_id", $"event_type")
    val lz = graft.Scratch.dir("avro_stream_spec")
    (0 to 2).foreach { i =>
      ev.filter($"event_id" % 3 === i)
        .write.format("graft.sources.AvroDataSource").mode("append").save(lz)
      // pin listing order: commit i's files strictly older than commit i+1's
      new java.io.File(lz).listFiles()
        .filter(f => f.getName.endsWith(".avro") && f.lastModified() > i * 1000000L)
        .foreach(f => f.setLastModified((i + 1) * 1000000L))
    }
    val nBatches = new AtomicLong(0)
    val rowsSeen = new AtomicLong(0)
    val idsSeen = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val q = spark.readStream.format("graft.sources.AvroDataSource")
      .option("maxFilesPerTrigger", "1").load(lz)
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = batch.select($"event_id").collect().map(_.getLong(0))
        nBatches.incrementAndGet()
        rowsSeen.addAndGet(ids.length.toLong)
        ids.foreach(id => assert(idsSeen.add(id), s"event $id delivered twice"))
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()

    val truth = ev.count()
    assert(nBatches.get() >= 3, s"expected >= 3 micro-batches, got ${nBatches.get()}")
    assert(rowsSeen.get() == truth, s"rows ${rowsSeen.get()} != batch truth $truth")
    assert(idsSeen.size().toLong == truth, "exactly-once violated")
  }

  test("gavro stream restart resumes from the committed offset, no re-read") {
    import spark.implicits._
    val ev = graft.Tables.load(spark, sf, "events")
      .select($"event_id", $"user_id", $"event_type")
    val lz = graft.Scratch.dir("avro_stream_resume")
    val ckpt = graft.Scratch.dir("avro_stream_ckpt")
    ev.filter($"event_id" % 2 === 0)
      .write.format("graft.sources.AvroDataSource").mode("append").save(lz)
    def drainOnce(): Long = {
      val n = new AtomicLong(0)
      val q = spark.readStream.format("graft.sources.AvroDataSource").load(lz)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          n.addAndGet(b.count()); ()
        }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
      n.get()
    }
    val first = drainOnce()
    assert(first == ev.filter($"event_id" % 2 === 0).count())
    // land the second half, restart from the checkpoint: only the delta reads
    ev.filter($"event_id" % 2 === 1)
      .write.format("graft.sources.AvroDataSource").mode("append").save(lz)
    val second = drainOnce()
    assert(second == ev.filter($"event_id" % 2 === 1).count(),
      s"restart re-read or missed rows: got $second")
  }
}
