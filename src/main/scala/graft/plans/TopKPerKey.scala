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
  * The operator never materializes or sorts a full partition — memory is
  * O(K · |distinct keys per task|), the same bound a hash aggregate
  * carries (and like a no-spill hash agg it targets bounded key
  * cardinality per task; the window form remains the spill-safe
  * fallback). Results are identical to the `row_number` window whenever
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
  /** Consume a partition into a map of K-bounded heaps (head = worst
    * row kept, so admission is an O(1) compare + O(log K) sift).
    *
    * `probeRows` > 0 enables the adaptive bypass (the partial phase):
    * after that many rows, if more than 75% were held — i.e. the heaps
    * are dropping almost nothing — consumption STOPS with the iterator
    * left at its current position and `true` returned; the caller
    * chains the held rows with the untouched remainder. 0 (the final
    * phase) always consumes everything.
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
      probeRows: Int = 0): (java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]], Boolean) = {
    val keyProj = UnsafeProjection.create(keyExprs, input)
    val ord = RowOrdering.create(order, input)
    val worstFirst = new java.util.Comparator[InternalRow] {
      override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
    }
    val initialCap = math.min(k, 16) + 1
    val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]
    var rows = 0L
    var held = 0L
    var bypass = false
    while (!bypass && iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        heap = new java.util.PriorityQueue[InternalRow](initialCap, worstFirst)
        heaps.put(key.copy(), heap)
      }
      if (heap.size < k) {
        heap.add(row.copy()); held += 1
      } else if (ord.compare(row, heap.peek()) < 0) {
        heap.poll()
        heap.add(row.copy())
      }
      rows += 1
      if (rows == probeRows && held * 4 > rows * 3) bypass = true
    }
    (heaps, bypass)
  }

  /** Drain one heap best-first (ascending under `order`). */
  def drain(
      heap: java.util.PriorityQueue[InternalRow],
      order: Seq[SortOrder],
      input: Seq[Attribute]): Array[InternalRow] = {
    val ord = RowOrdering.create(order, input)
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
    child.execute().mapPartitions({ iter =>
      val (heaps, bypassed) =
        TopKHeaps.build(iter, lKeys, lOrder, lK, lIn, probeRows = probe)
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
  * best-first with the 1-based `rank` appended. */
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
  override protected def doExecute(): RDD[InternalRow] = {
    val (lKeys, lOrder, lK, lIn, lOut) = (keys, order, k, child.output, output)
    child.execute().mapPartitions({ iter =>
      val (heaps, _) = TopKHeaps.build(iter, lKeys, lOrder, lK, lIn)
      val proj = UnsafeProjection.create(lOut, lOut)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      import scala.jdk.CollectionConverters._
      heaps.values().asScala.iterator.flatMap { heap =>
        val rows = TopKHeaps.drain(heap, lOrder, lIn)
        rows.iterator.zipWithIndex.map { case (r, i) =>
          rankRow.update(0, (i + 1).toLong)
          proj(joined(r, rankRow))
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
