package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage cut for corpus-scale intermediates that are consumed more
  * than once (LSH signature/band frames, shingle indexes, quantized
  * corpora): materializes the frame once and severs the plan so
  * downstream consumers read the materialized blocks instead of
  * re-executing the producing pipeline per consumer.
  *
  * Two durability modes, selected by whether the session has a reliable
  * checkpoint directory configured (`SparkContext.setCheckpointDir` —
  * the standard cluster deployment knob; nothing graft-specific):
  *
  *  - RELIABLE (`df.checkpoint()`): blocks go to the checkpoint
  *    filesystem (HDFS/object store). An executor loss re-reads them;
  *    a multi-hour 100 TB dedup run survives. This is the mode a real
  *    cluster job should run in.
  *  - LOCAL (`df.localCheckpoint()`): blocks pin in executor storage —
  *    no distributed-FS round-trip, right for local mode and tests,
  *    but an executor loss drops blocks whose lineage no longer exists
  *    and fails the job.
  *
  * Both modes produce identical results (spec'd in MaterializeSpec);
  * only failure-recovery durability differs.
  */
object Materialize {

  /** Materialize `df`, reliably iff the session has a checkpoint dir. */
  def apply(df: DataFrame): DataFrame =
    apply(df, df.sparkSession.sparkContext.getCheckpointDir.isDefined)

  /** Materialize `df` with the durability mode chosen explicitly. */
  def apply(df: DataFrame, reliable: Boolean): DataFrame =
    if (reliable) df.checkpoint() else df.localCheckpoint()

  /** [[Materialize]] as a chainable method, so call sites read like the
    * `.localCheckpoint()` they replace. */
  implicit class MaterializeOps(private val df: DataFrame) extends AnyVal {
    def materialize: DataFrame = Materialize(df)
  }

  /** Run two independent job chains concurrently (optimization guide
    * §2.6: actions are only sequential because driver code calls them
    * sequentially; FIFO scheduling back-fills one chain's stage tails
    * with the other's tasks). The caller guarantees the chains share no
    * data dependency, so results are unchanged. */
  def inParallel[A, B](a: => A, b: => B): (A, B) = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fa = Future(a)
      val fb = Future(b)
      (Await.result(fa, Duration.Inf), Await.result(fb, Duration.Inf))
    } finally pool.shutdown()
  }
}
