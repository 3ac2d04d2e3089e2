package graft.queries

import graft.SparkSpec

class BucketedJoinSpec extends SparkSpec {

  test("bucketed join plans without shuffle exchanges") {
    import spark.implicits._
    // disable broadcast so the co-located sort-merge path is what plans
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = Extras.q29(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      // the join itself must not shuffle: the only allowed exchange is
      // the one feeding the final aggregation/sort, which sits above the
      // join. Assert the join inputs are bucket scans (no Exchange
      // between FileScan and SortMergeJoin).
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"expected a sort-merge join:\n$plan")
      val belowJoin = plan.substring(joinIdx)
      assert(!belowJoin.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle its inputs:\n$plan")
      assert(df.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
