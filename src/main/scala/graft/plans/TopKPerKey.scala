package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Descending, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** TOP-K PER KEY as a native whole-operator extension — the one rung of
  * the extension ladder the function kernels can't reach: a custom
  * `LogicalPlan` node, planned by a custom `SparkStrategy` into a
  * two-phase `SparkPlan` pair, installed via `SparkSessionExtensions`
  * (or `spark.experimental.extraStrategies`).
  *
  * Why an operator and not a window: `row_number() OVER (PARTITION BY k
  * ORDER BY o) <= K` — the pattern every ANN/top-k query in this library
  * uses — makes Spark shuffle EVERY row to its key's partition and SORT
  * every partition fully, O(n log n) per key and full-width shuffle, to
  * keep K rows. The reference semantics only need a bounded heap:
  *
  *  - [[TopKPerKeyPartialExec]] (map side, no distribution requirement):
  *    one hash map of K-bounded heaps per input partition; at most
  *    K · |local keys| rows survive — the shuffle shrinks the same way
  *    a partial aggregation shrinks it, O(n log K) CPU.
  *  - [[TopKPerKeyFinalExec]] (requires `ClusteredDistribution(keys)`,
  *    so `EnsureRequirements` plants the hash exchange): merges the
  *    partial survivors per key, then emits each key's rows in order
  *    with a `rank` column appended (1-based, dense by construction).
  *
  * The operator never materializes or sorts a full partition on the
  * happy path — memory is O(K · |distinct keys per task|), the same
  * bound a hash aggregate carries — and, like a hash aggregate falling
  * back to sort-based aggregation, each task carries a heap-memory
  * budget (`spark.graft.topk.heapBudgetBytes`) past which it switches
  * to spillable sort-based selection, so a hot key-space degrades to
  * the window plan's profile instead of OOMing (see
  * [[TopKPerKeyFinalExec]]). Results are identical to the `row_number`
  * window whenever
  * the ordering is total per key (ties broken by trailing order
  * columns), which is how every registry consumer already orders.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    rankAttr: Attribute = AttributeReference("rank", LongType, nullable = false)())
  extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Plans [[TopKPerKey]] into the partial/final physical pair. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child, rankAttr) =>
      TopKPerKeyFinalExec(keys, order, k, rankAttr,
        TopKPerKeyPartialExec(keys, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

private[plans] object TopKHeaps {
  /** The memory budget one task's heap map may hold before the phase
    * stops consuming and falls back (partial: pass-through; final:
    * spillable sort-based selection). Same flavor of bound a hash
    * aggregate's fallback-to-sort threshold carries. */
  val BudgetKey = "spark.graft.topk.heapBudgetBytes"
  val BudgetDefault: Long = 256L * 1024 * 1024

  /** Estimated retained bytes of one held row (payload + heap/map overhead). */
  def sizeOf(row: InternalRow): Long = row match {
    case u: UnsafeRow => u.getSizeInBytes.toLong + 32L
    case other => 64L + 8L * other.numFields
  }

  /** Consume a partition into a map of K-bounded heaps (head = worst
    * row kept, so admission is an O(1) compare + O(log K) sift).
    *
    * Returns `(heaps, stoppedEarly)`. `stoppedEarly = true` means the
    * iterator was LEFT MID-PARTITION and the caller must handle the
    * remainder; it happens two ways:
    *  - adaptive bypass (`probeRows` > 0, the partial phase): after
    *    that many rows, if more than 75% were held — the heaps are
    *    dropping almost nothing — heaping is pure overhead;
    *  - memory budget (`budgetBytes`): the held-row estimate crossed
    *    the budget, the O(K · |keys per task|) bound this operator
    *    carries is about to stop being "bounded" — the caller switches
    *    to its spill-safe path instead of OOMing.
    * Either way the held rows plus the untouched remainder are a
    * correctness-preserving superset of every key's true top-k (each
    * dropped row lost to k better rows of its own key, so it can't be
    * in any top-k that includes them).
    *
    * Heaps size from a small constant and grow on demand — NEVER from
    * k: a `rn <= 500000000` "keep effectively everything" bound must
    * not eagerly allocate a k-sized array per distinct key. */
  def build(
      iter: Iterator[InternalRow],
      keyExprs: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      input: Seq[Attribute],
      probeRows: Int = 0,
      budgetBytes: Long = Long.MaxValue): (java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]], Boolean) = {
    val keyProj = UnsafeProjection.create(keyExprs, input)
    val ord = RowOrdering.create(order, input)
    val worstFirst = new java.util.Comparator[InternalRow] {
      override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
    }
    val initialCap = math.min(k, 16) + 1
    val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]
    var rows = 0L
    var held = 0L
    var heldBytes = 0L
    var stop = false
    while (!stop && iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        heap = new java.util.PriorityQueue[InternalRow](initialCap, worstFirst)
        val kc = key.copy()
        heaps.put(kc, heap)
        heldBytes += sizeOf(kc)
      }
      if (heap.size < k) {
        val c = row.copy()
        heap.add(c); held += 1; heldBytes += sizeOf(c)
      } else if (ord.compare(row, heap.peek()) < 0) {
        heldBytes -= sizeOf(heap.poll())
        val c = row.copy()
        heap.add(c); heldBytes += sizeOf(c)
      }
      rows += 1
      if ((rows == probeRows && held * 4 > rows * 3) || heldBytes > budgetBytes)
        stop = true
    }
    (heaps, stop)
  }

  /** Drain one heap best-first (ascending under `order`): the queue is
    * worst-first, so polling fills the array back-to-front. Runs once
    * PER KEY — must stay allocation-light (an earlier version created
    * an unused RowOrdering here; per-key codegen-cache lookups were the
    * bulk of the final phase's 4× loss on low-rows-per-key shapes). */
  def drain(heap: java.util.PriorityQueue[InternalRow]): Array[InternalRow] = {
    val arr = new Array[InternalRow](heap.size)
    var i = arr.length - 1
    while (i >= 0) { arr(i) = heap.poll(); i -= 1 } // worst drains first
    arr
  }
}

/** Map-side phase: keep at most k rows per key per input partition.
  * Output schema is unchanged — survivors only, no rank yet.
  *
  * ADAPTIVE, the same way Spark's hash aggregate can skip partial
  * aggregation: the phase is semantically a filter (any superset of
  * each key's true top-k is correct — the final phase re-selects), so
  * after a probe window, if fewer than 25% of rows were dropped —
  * rows/key barely above k, near-pure overhead — the phase emits what
  * it holds and passes the rest of the partition through untouched.
  * This caps the damage on low-rows-per-key shapes; it does NOT make
  * them fast (at ~15 rows/key with k=3 the probe drops ~80% and keeps
  * heaping, and the final phase still pays the per-key-queue cost —
  * the measured reason the SQL rewrite is opt-in). Where rows/key >>
  * k (the ANN candidate sets this operator was built for) the probe
  * keeps heaping and the shuffle shrinks to ~k rows per key. */
case class TopKPerKeyPartialExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {
  private val ProbeRows = 4096
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] = {
    val (lKeys, lOrder, lK, lIn, probe) = (keys, order, k, child.output, ProbeRows)
    val budget = conf.getConfString(TopKHeaps.BudgetKey,
      TopKHeaps.BudgetDefault.toString).toLong
    child.execute().mapPartitions({ iter =>
      val (heaps, bypassed) =
        TopKHeaps.build(iter, lKeys, lOrder, lK, lIn, probeRows = probe,
          budgetBytes = budget)
      val heldIter = {
        val it = heaps.values().iterator()
        new Iterator[InternalRow] {
          private var cur: java.util.PriorityQueue[InternalRow] = _
          override def hasNext: Boolean = {
            while ((cur == null || cur.isEmpty) && it.hasNext) cur = it.next()
            cur != null && !cur.isEmpty
          }
          override def next(): InternalRow = { hasNext; cur.poll() }
        }
      }
      if (bypassed) heldIter ++ iter else heldIter
    }, preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Reduce-side phase: merge partial survivors per key (the required
  * clustered distribution makes each key whole here), emit rows
  * best-first with the 1-based `rank` appended.
  *
  * SPILL SAFETY: the heap map is O(K · |distinct keys per task|) —
  * bounded for the shapes this operator targets, but a hot key-space
  * (or a huge K) can blow it up where the stock window plan would just
  * spill its sort. So heap building carries a byte budget
  * (`spark.graft.topk.heapBudgetBytes`, default 256 MB/task); when the
  * estimate crosses it, the task FALLS BACK to sort-based selection:
  * everything held so far plus the untouched remainder (a
  * correctness-preserving superset of each key's top-k) goes through
  * Spark's spillable `UnsafeExternalRowSorter` ordered by (keys,
  * order), and a streaming group-limit pass emits ranks 1..k per key —
  * exactly the window plan's memory profile, reached only when it's
  * needed. `sortFallbackTasks` in the node's SQL metrics counts how
  * often. */
case class TopKPerKeyFinalExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
    "sortFallbackTasks" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "tasks that fell back to spillable sort"))

  override protected def doExecute(): RDD[InternalRow] = {
    val (lKeys, lOrder, lK, lIn, lOut) = (keys, order, k, child.output, output)
    val budget = conf.getConfString(TopKHeaps.BudgetKey,
      TopKHeaps.BudgetDefault.toString).toLong
    val fallbacks = longMetric("sortFallbackTasks")
    child.execute().mapPartitions({ iter =>
      val (heaps, stopped) =
        TopKHeaps.build(iter, lKeys, lOrder, lK, lIn, budgetBytes = budget)
      val proj = UnsafeProjection.create(lOut, lOut)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      import scala.jdk.CollectionConverters._
      if (!stopped) {
        heaps.values().asScala.iterator.flatMap { heap =>
          val rows = TopKHeaps.drain(heap)
          rows.iterator.zipWithIndex.map { case (r, i) =>
            rankRow.update(0, (i + 1).toLong)
            proj(joined(r, rankRow))
          }
        }
      } else {
        fallbacks += 1
        // budget exceeded mid-partition: spill-safe selection. Feed the
        // held superset + the remainder into Spark's external sorter
        // (keys first so each key's rows are adjacent, then the
        // requested order within the key), then stream out ranks 1..k.
        val schema = org.apache.spark.sql.types.StructType(
          lIn.map(a => org.apache.spark.sql.types.StructField(a.name, a.dataType, a.nullable)))
        val fullOrder = lKeys.map(SortOrder(_, Ascending)) ++ lOrder
        val ordering = RowOrdering.create(fullOrder, lIn)
        val prefixComputer = new org.apache.spark.sql.execution.UnsafeExternalRowSorter.PrefixComputer {
          private val result =
            new org.apache.spark.sql.execution.UnsafeExternalRowSorter.PrefixComputer.Prefix
          override def computePrefix(row: InternalRow)
              : org.apache.spark.sql.execution.UnsafeExternalRowSorter.PrefixComputer.Prefix = {
            result.isNull = false; result.value = 0L; result // full-compare sort
          }
        }
        val sorter = org.apache.spark.sql.execution.UnsafeExternalRowSorter.create(
          schema, ordering,
          org.apache.spark.util.collection.unsafe.sort.PrefixComparators.LONG,
          prefixComputer,
          org.apache.spark.SparkEnv.get.memoryManager.pageSizeBytes,
          false)
        val toUnsafe = UnsafeProjection.create(lIn, lIn)
        val heldIter = heaps.values().asScala.iterator.flatMap { h =>
          new Iterator[InternalRow] {
            override def hasNext: Boolean = !h.isEmpty
            override def next(): InternalRow = h.poll()
          }
        }
        val sorted = sorter.sort((heldIter ++ iter).map(r => toUnsafe(r)))
        val keyProj = UnsafeProjection.create(lKeys, lIn)
        var curKey: UnsafeRow = null
        var rank = 0L
        sorted.flatMap { row =>
          val key = keyProj(row)
          if (curKey == null || key != curKey) { curKey = key.copy(); rank = 1L }
          else rank += 1L
          if (rank <= lK) {
            rankRow.update(0, rank)
            Iterator.single(proj(joined(row, rankRow)))
          } else Iterator.empty
        }
      }
    }, preservesPartitioning = false)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Public API + installation. */
object GraftPlans {
  /** Idempotently add [[TopKStrategy]] to the session's planner and
    * [[TopKWindowRewrite]] to its optimizer — SQL `row_number() <= k`
    * filters then plan as the native heap operator automatically. */
  def install(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(TopKStrategy))
      exp.extraStrategies = exp.extraStrategies :+ TopKStrategy
    if (!exp.extraOptimizations.contains(TopKWindowRewrite))
      exp.extraOptimizations = exp.extraOptimizations :+ TopKWindowRewrite
  }

  /** Top `k` rows per `keyCols` group under `orderSpec`
    * ((column, ascending) pairs — make the order total per key, e.g.
    * with a trailing unique id, for deterministic output), with a
    * 1-based `rank` column appended. */
  def topKPerKey(
      df: DataFrame,
      keyCols: Seq[String],
      orderSpec: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    require(keyCols.nonEmpty, "topKPerKey needs at least one key column")
    require(orderSpec.nonEmpty, "topKPerKey needs at least one order column")
    val spark = df.sparkSession
    install(spark)
    val plan = df.queryExecution.analyzed
    def attr(n: String): Attribute = plan.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"topKPerKey: no column '$n' in [${plan.output.map(_.name).mkString(", ")}]"))
    val order = orderSpec.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    org.apache.spark.sql.GraftSqlShim.ofRows(
      spark, TopKPerKey(keyCols.map(attr), order, k, plan))
  }
}
