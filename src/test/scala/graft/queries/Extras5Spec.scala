package graft.queries

import graft.SparkSpec

class Extras5Spec extends SparkSpec {

  test("q72: deliberately-tight constraints fire; clean constraints pass") {
    val rows = Extras5.q72(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // clean by construction in the synthetic corpus
    for (c <- Seq("c1_orderkey_not_null", "c2_orderkey_unique",
        "c3_status_accepted", "c6_custkey_fk")) {
      assert(rows(c) == ((0L, true)), s"$c should pass clean")
    }
    // deliberately tighter than the data: the suite must demonstrably fire
    for (c <- Seq("c4_totalprice_range", "c5_orderdate_bound")) {
      val (n, passed) = rows(c)
      assert(n > 0L && !passed, s"$c should fire (got $n violations)")
    }
  }

  test("q74: the weekly aggregate's exchange is planned once and reused") {
    val df = Extras5.q74(spark, sf)
    df.collect() // materialize so AQE finalizes stage reuse
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"expected exchange reuse in the final plan:\n$plan")
  }

  test("q76: the band join plans as an equi-join, not a nested loop") {
    val df = Extras5.q76(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"band join degenerated to a cross product:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
        || plan.contains("BroadcastHashJoin"),
      s"expected a hash/merge equi-join on the bin key:\n$plan")
  }

  test("g01: BFS levels are disjoint and the frontier stays within the graph") {
    val rows = Extras5.g01(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows.keySet == Set(("supplier", 0L), ("part", 1L),
      ("supplier", 2L), ("part", 3L)))
    assert(rows(("supplier", 0L)) > 0L, "seed set must be non-empty")
    assert(rows(("part", 1L)) > 0L, "seeds must reach parts at distance 1")
    // the graph is near-connected: supplier level 2 absorbs most of the
    // remaining suppliers, so level-3 parts are the residual tail
    val nSupp = graft.Tables.load(spark, sf, "supplier").count()
    assert(rows(("supplier", 0L)) + rows(("supplier", 2L)) <= nSupp)
  }
}
