package graft.ops

import java.util.concurrent.CyclicBarrier

import graft.SparkSpec

/** r19: the adaptive shuffle-partition scope shared by streaming drains
  * and iterative driver loops. Pins the r18 verdict's two flagged
  * hazards: (1) concurrent scopes must not cross-talk (the set/restore
  * pair is serialized), and (2) an UNKNOWN size (n <= 0 — e.g. a
  * filesystem that reports no bytes) must keep the session default
  * instead of collapsing to one partition. */
class AdaptiveScopeSpec extends SparkSpec {

  test("partitionsFor clamps to [1, parallelism] and scales with units") {
    assert(Adaptive.partitionsFor(0L, 32, 100L) == 1)
    assert(Adaptive.partitionsFor(100L, 32, 100L) == 1)
    assert(Adaptive.partitionsFor(101L, 32, 100L) == 2)
    assert(Adaptive.partitionsFor(1000L * 100L, 32, 100L) == 32)
    assert(Adaptive.partitionsFor(100L, 0, 100L) == 1)
    assert(Adaptive.partitionsFor(100L, 32, 0L) >= 1)
  }

  test("n <= 0 (unknown size) keeps the session default") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    Adaptive.withShufflePartitions(spark, 0) {
      assert(spark.conf.get(key) == before)
    }
    Adaptive.withShufflePartitions(spark, -1) {
      assert(spark.conf.get(key) == before)
    }
    assert(spark.conf.get(key) == before)
  }

  test("concurrent scopes don't cross-talk and the restore survives") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    // Two threads race distinct overrides. Serialization means each
    // scope observes exactly its own n while it runs, and the session
    // value is `before` again once both finish — no clobbered restore.
    val barrier = new CyclicBarrier(2)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String)]()
    def scope(n: Int): Unit =
      Adaptive.withShufflePartitions(spark, n) {
        seen.add((n, spark.conf.get(key)))
        // give the other thread a chance to enter (it must block)
        Thread.sleep(20)
        seen.add((n, spark.conf.get(key)))
      }
    val t1 = new Thread(() => { barrier.await(); scope(3) })
    val t2 = new Thread(() => { barrier.await(); scope(7) })
    t1.start(); t2.start(); t1.join(); t2.join()
    import scala.jdk.CollectionConverters._
    seen.asScala.foreach { case (n, v) =>
      assert(v == n.toString, s"scope n=$n observed partitions=$v")
    }
    assert(spark.conf.get(key) == before)
  }

  test("a thrown body still restores the previous value") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    intercept[RuntimeException] {
      Adaptive.withShufflePartitions(spark, 5) { throw new RuntimeException("boom") }
    }
    assert(spark.conf.get(key) == before)
  }
}
