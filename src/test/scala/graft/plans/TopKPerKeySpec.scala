package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The native top-k-per-key operator vs the row_number window it
  * replaces: identical rows on real data, correct edge behavior, and
  * the two-phase plan shape. */
class TopKPerKeySpec extends SparkSpec {

  test("operator rows are identical to the row_number window") {
    import spark.implicits._
    // pin the rewrite off so the window side stays the STOCK plan —
    // topKPerKey's install() puts TopKWindowRewrite in this shared
    // session, and an auto-rewritten reference would compare the
    // operator against itself
    spark.conf.set(TopKWindowRewrite.EnabledKey, "false")
    try topKvsWindow() finally spark.conf.unset(TopKWindowRewrite.EnabledKey)
  }

  private def topKvsWindow(): Unit = {
    import spark.implicits._
    val li = Tables.load(spark, sf, "lineitem")
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
        $"l_extendedprice".cast("decimal(18,2)").as("price"))
    val native = GraftPlans.topKPerKey(li, Seq("l_suppkey"),
      Seq(("price", false), ("l_orderkey", true), ("l_linenumber", true)), 3)
    val w = Window.partitionBy($"l_suppkey")
      .orderBy($"price".desc, $"l_orderkey".asc, $"l_linenumber".asc)
    val win = li.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
      .select(native.columns.map(col).toIndexedSeq: _*)
    assert(native.count() == win.count())
    assert(native.except(win).isEmpty && win.except(native).isEmpty,
      "operator and window top-k disagree")
  }

  test("k larger than the group emits every row, ranks dense from 1") {
    import spark.implicits._
    val df = Seq(("a", 3L), ("a", 1L), ("b", 2L)).toDF("g", "x")
    val got = GraftPlans.topKPerKey(df, Seq("g"), Seq(("x", true)), 10)
      .orderBy($"g", $"rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", 1L, 1L), ("a", 3L, 2L), ("b", 2L, 1L)))
  }

  test("null keys group together; null order values follow Spark order") {
    import spark.implicits._
    val df = Seq((Some("a"), Some(2L)), (None, Some(5L)), (None, Some(1L)),
        (None, None)).toDF("g", "x")
    val got = GraftPlans.topKPerKey(df, Seq("g"), Seq(("x", true)), 2)
      .filter($"g".isNull).orderBy($"rank")
      .collect().map(r => (r.isNullAt(1), r.getLong(2)))
    // ascending => NULLS FIRST (Spark default), then the smallest value
    assert(got.toSeq == Seq((true, 1L), (false, 2L)))
  }

  test("plan is the two-phase heap pair: partial below the exchange, no Window") {
    import spark.implicits._
    val li = Tables.load(spark, sf, "lineitem")
      .select($"l_suppkey", $"l_orderkey", $"l_extendedprice")
    val df = GraftPlans.topKPerKey(li, Seq("l_suppkey"),
      Seq(("l_extendedprice", false), ("l_orderkey", true)), 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyPartial") && plan.contains("TopKPerKeyFinal"),
      s"expected the two-phase operator pair:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("WindowExec"),
      s"operator must not fall back to a window:\n$plan")
    val partialFirst = plan.indexOf("TopKPerKeyFinal") < plan.indexOf("TopKPerKeyPartial")
    assert(partialFirst, s"partial phase must sit below the final phase:\n$plan")
  }

  /** shuffleRecordsWritten of every exchange in an EXECUTED plan.
    * AQE wraps materialized stages in QueryStageExec LEAVES (their
    * inner plan is not a child), so TreeNode.collect never reaches the
    * exchanges — walk them explicitly. */
  private def shuffleRecords(
      p: org.apache.spark.sql.execution.SparkPlan): Seq[Long] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      shuffleRecords(a.executedPlan)
    case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      shuffleRecords(s.plan)
    case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
      e.metrics("shuffleRecordsWritten").value +: e.children.flatMap(shuffleRecords)
    case other => other.children.flatMap(shuffleRecords)
  }

  test("map-side partial bounds the shuffle: at most k rows per key per task") {
    import spark.implicits._
    // 4 input partitions x 1000 rows over 5 keys, k=2: the exchange may
    // carry at most 4 partitions x 5 keys x 2 rows = 40 rows
    val df = spark.range(0, 4000, 1, 4)
      .select(($"id" % 5).as("g"), $"id".as("x"))
    val topk = GraftPlans.topKPerKey(df.toDF(), Seq("g"), Seq(("x", false)), 2)
    // collect() (not count()) so the metrics land on THIS dataset's
    // QueryExecution — count() plans its own aggregate execution and
    // leaves these exchanges unexecuted (metrics would read 0 and the
    // <= bound would pass vacuously)
    assert(topk.collect().length == 10)
    val metrics = shuffleRecords(topk.queryExecution.executedPlan)
    assert(metrics.nonEmpty && metrics.exists(_ > 0) &&
      metrics.forall(_ <= 40),
      s"partial did not bound the shuffle: $metrics rows crossed")
  }

  /** Find every TopKPerKeyFinalExec in an executed plan, walking AQE
    * query-stage leaves like [[shuffleRecords]] does. */
  private def finalExecs(
      p: org.apache.spark.sql.execution.SparkPlan): Seq[TopKPerKeyFinalExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      finalExecs(a.executedPlan)
    case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      finalExecs(s.plan)
    case f: TopKPerKeyFinalExec => f +: f.children.flatMap(finalExecs)
    case other => other.children.flatMap(finalExecs)
  }

  test("heap budget exceeded: final phase spills to sort-based selection, result-identical") {
    import spark.implicits._
    // 40k rows over 8k keys, k=5 — every row is held (5 rows/key), so a
    // 64 KB budget is crossed early in every task: this is exactly the
    // hot-key-space shape that would OOM an unbounded heap map at scale.
    // Hash the key so sort order != generation order exercises the sort.
    spark.conf.set(TopKWindowRewrite.EnabledKey, "false")
    spark.conf.set(TopKHeaps.BudgetKey, "65536")
    try {
      val df = spark.range(0, 40000, 1, 4)
        .select(($"id" % 8000).cast("string").as("g"),
          (hash($"id").cast("long")).as("x"), $"id")
      val native = GraftPlans.topKPerKey(df.toDF(), Seq("g"),
        Seq(("x", false), ("id", true)), 5)
      assert(native.collect().length == 40000)
      val execs = finalExecs(native.queryExecution.executedPlan)
      assert(execs.nonEmpty, "no TopKPerKeyFinalExec in the executed plan")
      val fallbacks = execs.map(_.metrics("sortFallbackTasks").value).sum
      assert(fallbacks > 0,
        s"expected the 64 KB budget to force the sort fallback; metric=$fallbacks")
      // value identity vs the stock window plan, same data
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"g").orderBy($"x".desc, $"id".asc)
      val win = df.withColumn("rank", row_number().over(w).cast("long"))
        .filter($"rank" <= 5)
        .select(native.columns.map(col).toIndexedSeq: _*)
      assert(native.except(win).isEmpty && win.except(native).isEmpty,
        "sort-fallback path disagrees with the window plan")
    } finally {
      spark.conf.unset(TopKHeaps.BudgetKey)
      spark.conf.unset(TopKWindowRewrite.EnabledKey)
    }
  }

  test("heap budget exceeded mid-selection: dropped rows stay dropped, ranks exact") {
    import spark.implicits._
    // few keys, many rows/key (2000 rows over 4 keys, k=3): the heaps
    // DROP most rows before a tiny budget stops consumption, proving the
    // fallback's input (held superset + remainder) still selects the
    // true top-k with exact ranks.
    spark.conf.set(TopKHeaps.BudgetKey, "512")
    try {
      val df = spark.range(0, 2000, 1, 4)
        .select(($"id" % 4).as("g"), $"id".as("x"))
      val got = GraftPlans.topKPerKey(df.toDF(), Seq("g"), Seq(("x", false)), 3)
        .orderBy($"g", $"rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val want = (0L until 4L).flatMap { g =>
        val top = (0L until 2000L).filter(_ % 4 == g).sortBy(-_).take(3)
        top.zipWithIndex.map { case (x, i) => (g, x, i + 1L) }
      }
      assert(got.toSeq == want, s"got ${got.toSeq}")
    } finally spark.conf.unset(TopKHeaps.BudgetKey)
  }

  test("adaptive partial bypass: low rows-per-key stays correct (and shuffles through)") {
    import spark.implicits._
    // 4 partitions x 5k rows over 10k keys (2 rows/key, k=3): each
    // partition's 4096-row probe sees ~zero drop and the partial phase
    // must bypass itself — every row crosses the shuffle — while the
    // final phase still selects and ranks exactly like the window.
    // (Several input partitions matter: a single-partition child
    // satisfies ClusteredDistribution trivially and plans no exchange.)
    val df = spark.range(0, 20000, 1, 4)
      .select(($"id" % 10000).as("g"), $"id".as("x"))
    val topk = GraftPlans.topKPerKey(df.toDF(), Seq("g"), Seq(("x", true)), 3)
    // collect() so the metrics land on this dataset's QueryExecution
    assert(topk.collect().length == 20000) // k=3 > 2/key: all survive
    val metrics = shuffleRecords(topk.queryExecution.executedPlan)
    assert(metrics.exists(_ == 20000),
      s"expected the bypassed partial to pass all rows through: $metrics")
    // rank correctness on a bypassed partition: each key's 2 rows in
    // ascending x order, ranks 1..2
    val rows = topk.filter($"g" === 7).orderBy($"rank")
      .collect().map(r => (r.getLong(2), r.getLong(1)))
    assert(rows.toSeq == Seq((1L, 7L), (2L, 10007L)),
      s"bypassed partial changed results: ${rows.toSeq}")
  }
}
