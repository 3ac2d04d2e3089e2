package graft.ops

import java.util.concurrent.locks.ReentrantLock

import org.apache.spark.sql.SparkSession

/** SCALE-ADAPTIVE SHUFFLE PARTITIONING for driver-loop operators — the
  * r18 streaming-drain mechanism (EventsStream.adaptiveStatePartitions)
  * promoted to a shared house utility (optimization guide §2: derive
  * partitioning from input size, never from a constant tuned for one
  * deployment).
  *
  * Why loops need it when AQE exists: AQE coalesces the partitions of
  * ONE adaptive query after its shuffles materialize, but an iterative
  * operator (BPE training rounds, label propagation, micro-batch
  * drains) runs dozens of SMALL queries whose per-stage floor is the
  * session's `spark.sql.shuffle.partitions` — the cluster-shaped
  * default (= core count here). Each tiny round then pays
  * (stages × partitions) task launches plus AQE's per-shuffle
  * re-planning for work that fits in a handful of tasks. Deriving the
  * loop's partition count from the LOOP STATE's size keeps small
  * fixtures at a few tasks per stage while saturating every core at
  * 100 TB (the clamp's upper bound is the session's default
  * parallelism, so this is not a local-mode trick).
  *
  * Thread safety (the r18 verdict's "What's wrong" item 2):
  * `spark.sql.shuffle.partitions` is SESSION-GLOBAL, and a set/restore
  * pair is not reentrant — two concurrent scopes on one session could
  * observe each other's override or clobber the restore. All scopes
  * serialize on one per-JVM lock (scopes are driver-side and brief
  * relative to the work they schedule; `Materialize.inParallel` chains
  * INSIDE a scope still run concurrently — they don't touch the conf).
  * `AdaptiveScopeSpec` pins no-cross-talk under concurrent scopes.
  */
object Adaptive {

  /** clamp(ceil(units / targetUnits), 1, parallelism): the partition
    * count for loop state of `units` size (bytes or rows — pick ONE
    * unit per call site and size `targetUnits` in it). `units <= 0`
    * means the size is UNKNOWN (e.g. a filesystem that reports no
    * content summary): callers must then leave the session default in
    * place rather than collapse to 1 partition (the r18 advice item —
    * on HDFS/S3 a silent 0 would serialize every stateful stage). */
  def partitionsFor(units: Long, parallelism: Int, targetUnits: Long): Int =
    math.max(1L, math.min(math.max(1, parallelism).toLong,
      (units + targetUnits - 1) / math.max(1L, targetUnits))).toInt

  private val lock = new ReentrantLock()

  /** Run `f` with `spark.sql.shuffle.partitions` pinned to `n`
    * (restored afterwards), serialized against every other adaptive
    * scope in the JVM. `n <= 0` (unknown size) runs `f` unchanged —
    * the session default is the safe production value.
    *
    * `disableAqe` additionally scopes `spark.sql.adaptive.enabled` off:
    * for an ITERATIVE loop whose partition count is already derived
    * from the measured loop-state size, AQE has nothing left to decide
    * — its join-strategy picks are pre-empted by explicit broadcast
    * hints, its coalescing by the derived count, and it cannot split
    * window or aggregation skew — but it still materializes every
    * exchange as its own job-with-barrier, which for a
    * dozens-of-tiny-queries loop is the dominant scheduling cost
    * (measured on t24: each AQE stage surfaces as one Spark job).
    * Leave it ON (default) for one-shot queries, where runtime
    * re-planning earns its barriers. */
  def withShufflePartitions[A](spark: SparkSession, n: Int,
      disableAqe: Boolean = false)(f: => A): A =
    if (n <= 0) f
    else {
      lock.lock()
      try {
        val keys = Seq("spark.sql.shuffle.partitions" -> n.toString) ++
          (if (disableAqe) Seq("spark.sql.adaptive.enabled" -> "false")
           else Seq.empty)
        val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
        keys.foreach { case (k, v) => spark.conf.set(k, v) }
        try f finally prev.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
      } finally lock.unlock()
    }
}
