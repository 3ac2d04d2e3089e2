package graft.streaming

import graft.SparkSpec

/** st11's claims, asserted: the foreachBatch upsert really runs across
  * MULTIPLE micro-batches (otherwise it would silently degenerate to a
  * one-shot batch agg and demonstrate nothing), and the settled table
  * equals the one-shot batch aggregate exactly — the associativity
  * property that makes the merge safe under ANY micro-batch split.
  */
class StreamUpsertSpec extends SparkSpec {

  test("st11 merges across >= 2 micro-batches and converges to the batch agg") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val (out, nBatches) = EventsStream.st11Run(spark, sf)
    assert(nBatches >= 2, s"expected multiple micro-batches, got $nBatches")

    val ev = graft.Tables.load(spark, sf, "events")
    val expected = ev.groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("sum_value"),
        date_format(min($"ts"), "yyyy-MM-dd HH:mm:ss").as("first_ts"),
        date_format(max($"ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"))
    assert(out.except(expected).isEmpty && expected.except(out).isEmpty,
      "upsert result differs from the one-shot batch aggregate")
  }
}
