package graft.streaming

import graft.SparkSpec

/** r18 optimization: stateful streaming drains derive their state
  * partition count from input size (clamp(ceil(bytes/target), 1,
  * parallelism)) instead of inheriting the session's cluster-shaped
  * `spark.sql.shuffle.partitions`. Two properties pinned here:
  * the formula's edges, and that a stateful drain under an adaptive
  * (small) partition count emits the same rows as the registry entry
  * always did — partition-count invariance is what makes the knob
  * safe to turn. */
class AdaptivePartitionSpec extends SparkSpec {

  test("adaptiveStatePartitions clamps to [1, parallelism] and scales with bytes") {
    val t = 32L << 20
    // tiny input → one partition, not the session constant
    assert(EventsStream.adaptiveStatePartitions(0L, 32, t) == 1)
    assert(EventsStream.adaptiveStatePartitions(2L << 20, 32, t) == 1)
    // one partition per target chunk, rounded up
    assert(EventsStream.adaptiveStatePartitions(t, 32, t) == 1)
    assert(EventsStream.adaptiveStatePartitions(t + 1, 32, t) == 2)
    assert(EventsStream.adaptiveStatePartitions(10 * t, 32, t) == 10)
    // saturates at the session's parallelism (the 100 TB end)
    assert(EventsStream.adaptiveStatePartitions(10_000L * t, 32, t) == 32)
    // degenerate guards
    assert(EventsStream.adaptiveStatePartitions(t, 0, t) == 1)
    assert(EventsStream.adaptiveStatePartitions(t, 32, 0L) >= 1)
  }

  test("a stateful drain's emitted rows are unchanged vs a wide partition count") {
    val dir = "/root/testdata/sf0.001"
    // st10 (dropDuplicates) exercises a state store end-to-end; run the
    // registry entry (adaptive: ~1 partition at this SF) and compare
    // against the same transform drained under the session's own wide
    // shuffle-partition setting.
    val adaptive = EventsStream.queries("st10_stream_dedup")(spark, dir)
      .collect().toSeq
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    // pin wide partitions and a huge target so the adaptive path
    // resolves to the same wide count — the old behavior
    spark.conf.set("spark.graft.stream.targetPartitionBytes", "1")
    val wide =
      try EventsStream.queries("st10_stream_dedup")(spark, dir)
        .collect().toSeq
      finally {
        spark.conf.unset("spark.graft.stream.targetPartitionBytes")
        spark.conf.set(key, prev)
      }
    assert(adaptive == wide)
  }
}
