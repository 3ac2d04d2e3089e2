package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The production-deployment property the windowed aggs rely on:
  * append mode + watermark keeps the state store BOUNDED — closed
  * windows are emitted exactly once and their state rows evicted, so
  * state size tracks the watermark horizon (open windows only), not the
  * total number of windows ever seen. Verified directly through
  * `StreamingQueryProgress.stateOperators.numRowsTotal` across many
  * micro-batches of steadily advancing event time.
  */
// Top-level so the case-class encoders codegen (an inner class would
// need an outer pointer and silently falls back to interpreter mode).
private[streaming] case class RawEv(ts: Timestamp, event_type: String)
private[streaming] case class DupEv(ts: Timestamp, user_id: Long, event_type: String)

class StreamEvictionSpec extends SparkSpec {

  private def ts(day: Int, h: Int, m: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-$day%02d $h%02d:$m%02d:00")

  /** Feed `hours` one-hour batches (2 event types per hour) through the
    * given transform in append mode; return (state-rows trace, emitted
    * row count, emitted max window start hour). */
  private def run(hours: Int, name: String,
      xform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : (Seq[Long], Long) = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[RawEv]
    val q = xform(input.toDF())
      .select($"window.start".as("wstart"), $"event_type", $"n_events")
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    val trace = scala.collection.mutable.ArrayBuffer[Long]()
    try {
      (0 until hours).foreach { h =>
        val (day, hod) = (1 + h / 24, h % 24)
        input.addData(
          RawEv(ts(day, hod, 0), "click"), RawEv(ts(day, hod, 10), "click"),
          RawEv(ts(day, hod, 30), "view"))
        q.processAllAvailable()
        val p = q.lastProgress
        if (p != null && p.stateOperators.nonEmpty)
          trace += p.stateOperators.head.numRowsTotal
      }
    } finally q.stop()
    (trace.toSeq, spark.table(name).count())
  }

  test("tumbling append: watermark evicts closed windows, state stays bounded") {
    val hours = 30
    val (trace, emitted) = run(hours, "evict_tumbling", StreamOps.hourlyCounts(_))
    // Without eviction the agg state would grow to hours × 2 types = 60
    // rows. With a 1-hour watermark only the open tail (last window plus
    // the one the watermark hasn't closed) stays resident.
    assert(trace.nonEmpty, "no state-operator progress captured")
    assert(trace.max <= 8,
      s"state grew with stream length — eviction not happening: $trace")
    // Every closed window emitted exactly once: after feeding N hours the
    // final watermark is (N-1):30 − 1h, closing windows 0 .. N-3
    // (window.end = h+1 ≤ wm) → (N-2) hours × 2 types.
    assert(emitted == (hours - 2) * 2L,
      s"expected ${(hours - 2) * 2} closed-window rows, got $emitted")
  }

  test("streaming dedup: duplicates drop, first occurrences emit, state evicts") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val hours = 30
    val input = MemoryStream[DupEv]
    val q = StreamOps.dedupKeys(input.toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName("evict_dedup").start()
    val trace = scala.collection.mutable.ArrayBuffer[Long]()
    try {
      (0 until hours).foreach { h =>
        val (day, hod) = (1 + h / 24, h % 24)
        // 3 duplicate (user 1, click) arrivals + 1 (user 2, view) per hour
        input.addData(
          DupEv(ts(day, hod, 0), 1L, "click"), DupEv(ts(day, hod, 10), 1L, "click"),
          DupEv(ts(day, hod, 20), 1L, "click"), DupEv(ts(day, hod, 30), 2L, "view"))
        q.processAllAvailable()
        val p = q.lastProgress
        if (p != null && p.stateOperators.nonEmpty)
          trace += p.stateOperators.head.numRowsTotal
      }
    } finally q.stop()
    // dedup emits first occurrences immediately — no close predicate —
    // so every distinct (hour, user, type) key appears exactly once
    assert(spark.table("evict_dedup").count() == hours * 2L,
      "expected one emitted row per distinct key")
    // without eviction the dedup state would hold hours × 2 = 60 keys;
    // the 1-hour watermark keeps only the unexpired tail resident
    assert(trace.nonEmpty, "no state-operator progress captured")
    assert(trace.max <= 8,
      s"dedup state grew with stream length — eviction not happening: $trace")
  }

  test("sliding append: overlap multiplies state by window/slide, not by stream length") {
    val hours = 30
    val (trace, emitted) = run(hours, "evict_sliding", StreamOps.slidingCounts(_))
    assert(trace.nonEmpty, "no state-operator progress captured")
    // 2 open 1h/30min windows per type per unclosed hour — still O(1).
    assert(trace.max <= 16,
      s"state grew with stream length — eviction not happening: $trace")
    assert(emitted > 0)
  }
}
