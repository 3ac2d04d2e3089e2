package graft.ops

import graft.SparkSpec

/** p02's incremental contract: the standing index is built once and
  * PROBED by each delta ingest — never rebuilt inside the incremental
  * DAG — and repeated ingests against the same index are idempotent. */
class P02IndexSpec extends SparkSpec {

  test("the incremental DAG probes the materialized index, never the corpus") {
    val idx = Pipeline.p02Index(spark, sf)
    val run = Pipeline.p02Incremental(spark, sf, idx)
    val rows = run.collect()
    assert(rows.nonEmpty)
    val plan = run.queryExecution.executedPlan.toString
    // the standing index arrives as materialized RDD scans (shingle
    // index + hot list + rare fps + bench fps all enter this plan)
    assert("Scan ExistingRDD".r.findAllIn(plan).size >= 3,
      s"expected the index's materialized frames in the plan:\n$plan")
    // and the corpus side is never re-derived: the only doc_id % 10
    // filter in the incremental plan is the DELTA's (= 0); the index
    // build's corpus filter (NOT (% 10 = 0)) must be absent. (% 11
    // negations are fine — those are the optimizer pushing the
    // benchmark-membership predicate around, not a corpus rescan.)
    assert("NOT \\(\\(doc_id#\\d+L? % 10\\)".r.findFirstIn(plan).isEmpty,
      s"incremental run re-filtered the corpus side (index rebuild):\n$plan")
    assert(plan.contains("% 10) = 0"),
      s"expected the delta filter in the incremental plan:\n$plan")
  }

  test("two ingests against one index are identical, and stages partition the delta") {
    val idx = Pipeline.p02Index(spark, sf)
    val a = Pipeline.p02Incremental(spark, sf, idx).collect().map(_.toString).toSeq
    val b = Pipeline.p02Incremental(spark, sf, idx).collect().map(_.toString).toSeq
    assert(a == b, "repeated ingest against the same index changed results")
    // stage-exclusive accounting: every delta doc lands in exactly one bucket
    Pipeline.p02Incremental(spark, sf, idx).collect().foreach { r =>
      val (nDelta, bench, dup, contam, qual, adm) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))
      assert(nDelta == bench + dup + contam + qual + adm,
        s"stages do not partition the delta: $r")
    }
  }
}
