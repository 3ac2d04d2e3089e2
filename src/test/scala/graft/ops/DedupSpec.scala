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

  test("shingle kernel == interpreted HOF formulation on testdata") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, sf, "documents")
    val both = docs.select($"doc_id",
      Dedup.shingles(spark, $"text").as("fast"),
      Dedup.shinglesInterpreted($"text").as("slow"))
    val bad = both.filter(!($"fast" <=> $"slow")).count()
    assert(bad == 0, s"$bad docs with diverging shingle sets")
  }

  test("d03 codegen kernels == interpreted column pipeline") {
    // the MinHashSig/MinHashAgree kernels must reproduce the pre-round-6
    // explode + 128-min-agg + zip_with formulation row for row (same
    // doubles — the oracle hash contract depends on it)
    val fast = Dedup.d03(spark, sf).collect()
    val slow = Dedup.d03Interpreted(spark, sf).collect()
    assert(fast.length == slow.length)
    fast.zip(slow).foreach { case (a, b) => assert(a == b) }
  }

  test("minhash_sig drops <3-token docs and agrees with itself at 128") {
    import spark.implicits._
    import graft.functions.MinHash
    val df = Seq((1L, "a b"), (2L, ""), (3L, "one two three four"))
      .toDF("doc_id", "text")
    val sigs = df.select($"doc_id",
        MinHash.sigCol(spark, org.apache.spark.sql.functions.lower($"text")).as("sig"))
    val rows = sigs.collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(rows == Map(1L -> true, 2L -> true, 3L -> false))
    val agree = sigs.filter($"sig".isNotNull)
      .select(MinHash.agreeCol(spark, $"sig", $"sig"))
      .head.getInt(0)
    assert(agree == MinHash.NumHashes)
  }

  test("simhash pairs are symmetric-free and within hamming bound") {
    import spark.implicits._
    val rows = Dedup.d04(spark, sf)
      .as[(Long, Long, Int)].collect()
    rows.foreach { case (a, b, h) =>
      assert(a < b); assert(h >= 0 && h <= 6)
    }
  }

  test("d04 codegen kernel == interpreted explode pipeline") {
    val fast = Dedup.d04(spark, sf).collect()
    val slow = Dedup.d04Interpreted(spark, sf).collect()
    assert(fast.length == slow.length)
    assert(fast.nonEmpty)
    fast.zip(slow).foreach { case (a, b) => assert(a == b) }
  }

  test("d06 clusters are consistent with the d02 pair graph") {
    import spark.implicits._
    val pairs = Dedup.d02(spark, sf).select($"doc_a", $"doc_b")
      .as[(Long, Long)].collect()
    val clusters = Dedup.d06(spark, sf)
      .as[(Long, Long)].collect().map { case (rep, v) => v -> rep }.toMap
    assert(clusters.nonEmpty)
    // every paired doc is labeled, both ends share a label, and the
    // label is the component's minimum doc_id (exact for the small
    // planted clusters at this SF)
    pairs.foreach { case (a, b) =>
      assert(clusters.contains(a) && clusters.contains(b))
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
      assert(clusters(a) <= math.min(a, b))
    }
    clusters.foreach { case (v, rep) => assert(rep <= v) }
  }

  test("label propagation converges on a planted diameter-5 chain") {
    import spark.implicits._
    // path 1-2-3-4-5-6 (diameter 5 — a fixed 3-round loop splits it),
    // a separate pair, and a triangle with ids out of order
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L),
      (22L, 20L), (21L, 22L), (20L, 21L)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    val want = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 6L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L)
    assert(got == want, s"got $got")
  }

  test("d02 df-cap bounds candidate pairs under a hot boilerplate shingle") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 4 * DfCap docs all sharing one boilerplate trigram; the rest of
    // each doc is unique. Without the cap the boilerplate shingle alone
    // enumerates n*(n-1)/2 candidate pairs; with it, zero survive.
    val n = 4 * Dedup.DfCap
    val docs = (0 until n).map { i =>
      (i.toLong, s"lorem ipsum dolor unique$i word$i token$i")
    }.toDF("doc_id", "text")
    val uncappedPairs = {
      val sh = docs.select($"doc_id", explode(Dedup.shingles(spark, $"text")).as("w"))
      sh.as("a").join(sh.as("b"), $"a.w" === $"b.w" && $"a.doc_id" < $"b.doc_id").count()
    }
    assert(uncappedPairs >= n.toLong * (n - 1) / 2,
      s"fixture should blow up uncapped: $uncappedPairs")
    val shc = Dedup.cappedShingleIndex(docs)
    assert(shc.filter($"w" === "lorem ipsum dolor").count() == 0,
      "hot shingle must be dropped by the df-cap")
    val cappedPairs = shc.as("a").join(shc.as("b"),
      $"a.w" === $"b.w" && $"a.doc_id" < $"b.doc_id").count()
    assert(cappedPairs == 0, s"capped candidates should be 0, got $cappedPairs")
    // the full operator still runs clean on the fixture
    assert(Dedup.d02On(docs).count() == 0)
  }

  test("d08 block cap drops a boilerplate-keyed megablock (adversarial)") {
    import spark.implicits._
    // EditBlockCap+36 docs share the same 20-char prefix AND length
    // bucket (a template-heavy corpus, the r7 finding): uncapped, one
    // block degenerates to O(B²) Levenshtein calls — the cap must drop
    // the whole block. A small near-dup family in a different block
    // (same prefix only after char 20) must still come through.
    val pfx = "the quick brown fox " // exactly 20 chars
    val big = (0 until Dedup.EditBlockCap + 36).map { i =>
      (i.toLong, pfx + s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}")
    }
    val fam = Seq(
      (1000L, "this is a shared prefix string alpha"),
      (1001L, "this is a shared prefix string alphb"))
    val docs = (big ++ fam).toDF("doc_id", "text")
    val out = Dedup.d08On(docs).collect()
    assert(out.nonEmpty, "the legit small family must survive the cap")
    assert(out.forall(_.getLong(0) >= 1000L),
      s"megablock pairs leaked past the cap: ${out.take(3).mkString(", ")}")
    assert(out.length == 1 && out.head.getLong(2) == 1L,
      s"expected the single alpha/alphb pair at distance 1: ${out.mkString(", ")}")
  }

  test("d09 finds the planted cross-document token span, exactly") {
    import spark.implicits._
    val n = Dedup.SubstrN // 50
    // a 60-token run shared verbatim by docs 1 and 2, nowhere else
    val shared = (0 until 60).map(i => s"shared$i").mkString(" ")
    def filler(seed: String, k: Int) =
      (0 until k).map(i => s"$seed$i").mkString(" ")
    val docs = Seq(
      (1L, s"${filler("a", 30)} $shared ${filler("b", 25)}"),
      (2L, s"${filler("c", 10)} $shared ${filler("d", 40)}"),
      (3L, filler("e", 120))).toDF("doc_id", "text")
    val out = Dedup.d09On(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 60-token run -> 60-n+1 = 11 flagged window starts, one merged span
    // per doc, starting right after the per-doc filler prefix
    assert(out.toSeq == Seq(
      (1L, 31L, 90L, 11L),
      (2L, 11L, 70L, 11L)), out.mkString(", "))
  }

  test("d09 stays linear: no all-pairs operator anywhere in the plan") {
    val df = Dedup.d09(spark, sf)
    df.write.format("noop").mode("overwrite").save() // finalize AQE plan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs operator in d09 plan:\n$plan")
    assert(df.collect().nonEmpty, "sf0.001 corpus has known duplicate spans")
  }
}
