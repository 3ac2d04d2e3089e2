package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** t21's contracts beyond the per-doc oracle hash:
  * - partition-independence: the assignment is identical under a
  *   different partitioning (the property rand(seed) lacks);
  * - incremental stability: restricting the input to a subset leaves
  *   every surviving doc's split unchanged (new ingest batches never
  *   reshuffle old assignments);
  * - rough uniformity of the three splits at the 80/10/10 cuts;
  * - zero-exchange plan: the assignment itself is a narrow projection.
  */
class DetSplitSpec extends SparkSpec {

  test("t21 split is partition-independent, subset-stable, and balanced") {
    import spark.implicits._
    val a = TextOps.t21(spark, sf).collect()
    assert(a.nonEmpty)

    // same assignment when the scan is repartitioned first
    val docs = graft.Tables.load(spark, sf, "documents")
      .select($"doc_id").repartition(7, $"doc_id")
    val b = docs.withColumn("split_bucket", TextOps.splitBucket($"doc_id"))
      .orderBy($"doc_id").collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      b.map(r => (r.getLong(0), r.getLong(1))).toSeq,
      "assignment changed under repartitioning")

    // subset stability: every doc keeps its split when half the corpus
    // is missing
    val half = docs.filter($"doc_id" % 2 === 0)
      .withColumn("split_bucket", TextOps.splitBucket($"doc_id")).collect()
    val full = a.map(r => r.getLong(0) -> r.getLong(1)).toMap
    half.foreach(r => assert(full(r.getLong(0)) == r.getLong(1),
      s"doc ${r.getLong(0)} moved buckets in the subset run"))

    // balance: train share within [0.6, 0.95] even at tiny SF
    val n = a.length.toDouble
    val train = a.count(_.getString(2) == "train") / n
    assert(train > 0.6 && train < 0.95, s"train share $train implausible")

    // the assignment is a narrow projection — no exchange in the plan
    // before the (oracle-only) final sort
    val planned = graft.Tables.load(spark, sf, "documents")
      .select($"doc_id", TextOps.splitBucket($"doc_id").as("b"))
    val exchanges = planned.queryExecution.executedPlan.toString()
      .linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 0, "split assignment should not shuffle")
  }
}
