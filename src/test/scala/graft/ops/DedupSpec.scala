package graft.ops

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  test("exact dedup groups equal normalized texts") {
    val df = Dedup.d01(spark, sf)
    import spark.implicits._
    val total = df.agg(org.apache.spark.sql.functions.sum($"n_copies")).head.getLong(0)
    assert(total == 500) // every document accounted for exactly once
  }

  test("minhash LSH candidates cover the exact jaccard pairs (recall)") {
    import spark.implicits._
    val exact = Dedup.d02(spark, sf).select($"doc_a", $"doc_b")
      .as[(Long, Long)].collect().toSet
    val lsh = Dedup.d03(spark, sf).select($"doc_a", $"doc_b")
      .as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "testdata should contain planted near-dups")
    val recall = exact.count(lsh.contains).toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall over ${exact.size} true pairs")
  }

  test("simhash pairs are symmetric-free and within hamming bound") {
    import spark.implicits._
    val rows = Dedup.d04(spark, sf)
      .as[(Long, Long, Int)].collect()
    rows.foreach { case (a, b, h) =>
      assert(a < b); assert(h >= 0 && h <= 6)
    }
  }
}
