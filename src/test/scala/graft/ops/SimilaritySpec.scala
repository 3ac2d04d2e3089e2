package graft.ops

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData

import graft.SparkSpec
import graft.functions.SrpLsh

/** Accuracy of the ANN machinery. The DuckDB oracles verify each op
  * computes its own approximation exactly; this spec verifies the
  * approximation is GOOD where LSH makes a promise: genuinely-near
  * vectors (high cosine) collide in at least one bucket with high
  * probability, while near-orthogonal vectors rarely do. (A plain
  * recall-vs-exact assertion on the testdata would be meaningless: the
  * synthetic embeddings are near-uniform — the best "neighbors" are at
  * cosine ≈ 0.43, barely above noise, where no sub-linear method can or
  * should find them; the planted-geometry test below pins the actual
  * retrieval contract instead.)
  */
class SimilaritySpec extends SparkSpec {

  private val rnd = new scala.util.Random(7)

  private def gaussianUnit(d: Int): Array[Double] = {
    val v = Array.fill(d)(rnd.nextGaussian())
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  /** A unit vector at exactly `cos` cosine to `a`. */
  private def atCosine(a: Array[Double], cos: Double): Array[Double] = {
    val g = gaussianUnit(a.length)
    val dot = a.zip(g).map { case (x, y) => x * y }.sum
    val orth = g.zip(a).map { case (y, x) => y - dot * x }
    val on = math.sqrt(orth.map(x => x * x).sum)
    val o = orth.map(_ / on)
    a.zip(o).map { case (x, y) => cos * x + math.sqrt(1 - cos * cos) * y }
  }

  private def keys(v: Array[Double]): Set[Long] =
    graft.functions.SrpBuckets(Literal.create(v.map(_.toFloat)))
      .eval(null).asInstanceOf[ArrayData].toLongArray().toSet

  test("SRP buckets: high-cosine pairs collide, near-orthogonal pairs don't") {
    val trials = 300
    def collisionRate(cos: Double): Double =
      (1 to trials).count { _ =>
        val a = gaussianUnit(SrpLsh.Dim)
        val b = atCosine(a, cos)
        (keys(a) & keys(b)).nonEmpty
      }.toDouble / trials
    val r90 = collisionRate(0.9)
    val r70 = collisionRate(0.7)
    val r00 = collisionRate(0.0)
    info(f"collision rate: cos0.9=$r90%.3f cos0.7=$r70%.3f cos0.0=$r00%.3f")
    assert(r90 >= 0.85, f"near-duplicates must be retrieved: $r90%.3f")
    assert(r70 >= 0.40, f"near vectors should usually be retrieved: $r70%.3f")
    assert(r00 <= 0.15, f"orthogonal vectors must rarely collide: $r00%.3f")
  }

  test("every approximate path answers all queries with exact-shaped output") {
    import spark.implicits._
    val exact = Similarity.s01(spark, sf)
      .select($"q_id", $"rank", $"vec_id").as[(Long, Long, Long)].collect()
    val qids = exact.map(_._1).toSet
    assert(exact.length == qids.size * 5) // top-5 per query
    for ((name, df) <- Seq(
        "s02" -> Similarity.s02(spark, sf),
        "s03" -> Similarity.s03(spark, sf),
        "s04" -> Similarity.s04(spark, sf))) {
      val rows = df.select($"q_id", $"rank", $"vec_id").as[(Long, Long, Long)].collect()
      assert(rows.map(_._1).toSet == qids, s"$name must answer every query")
      rows.groupBy(_._1).foreach { case (q, rs) =>
        assert(rs.map(_._2).sorted.sameElements(1 to rs.length),
          s"$name query $q ranks not contiguous")
        assert(rs.length <= 5)
      }
    }
  }

  test("s11 scaled kNN join: no all-pairs operator; recall tracks the dial's trade") {
    val df = Similarity.s11(spark, sf)
    df.write.format("noop").mode("overwrite").save() // finalize AQE plan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs operator in s11 plan:\n$plan")
    // the scaled planes REFINE the stock planes (SrpLsh.planesFor:
    // table t's first BitsPerTable planes are the stock planes, extra
    // bits subdivide the bucket), so a scaled collision implies the
    // stock collision and scaled candidates are a SUBSET of stock's —
    // the <= below is structural, on any corpus, not an accident of
    // this test data. It must still answer for a non-trivial share of
    // vectors — an empty result would mean the scaled buckets stopped
    // colliding at all
    val stock = Similarity.s05(spark, sf).count()
    val scaled = df.count()
    assert(scaled > 0, "scaled index answers nothing")
    assert(scaled <= stock,
      s"scaled occupancy cannot yield MORE candidates: $scaled > $stock")
  }

  test("s08 semdedup: verdict covers the corpus and cluster minima survive") {
    import spark.implicits._
    val out = Similarity.s08(spark, sf)
      .select($"vec_id", $"cluster", $"n_dup_lower", $"keep")
      .as[(Long, Long, Long, Boolean)].collect()
    val corpus = graft.Tables.load(spark, sf, "embeddings").count()
    assert(out.length == corpus, "one verdict per vector")
    out.foreach { case (id, _, nDup, keep) =>
      assert(keep == (nDup == 0), s"vec $id: keep flag inconsistent")
    }
    // greedy keep-lowest-id: the smallest vec_id of every cluster has no
    // lower-id cluster-mate, so it can never be dropped
    out.groupBy(_._2).foreach { case (c, vs) =>
      val lead = vs.minBy(_._1)
      assert(lead._4, s"cluster $c: lowest vec_id ${lead._1} was dropped")
    }
  }

  test("s15 nprobe sweep: a proper frontier (monotone, bounded, non-trivial)") {
    import spark.implicits._
    val rows = Similarity.s15(spark, sf)
      .select($"nprobe", $"n_candidates", $"n_hits", $"recall_at_5")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L))
    // candidate sets are nested by construction -> counts monotone
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.toSeq)
    // more probes can only add hits (same index, wider candidate set)
    assert(rows.map(_._3).toSeq == rows.map(_._3).sorted.toSeq)
    rows.foreach { case (np, nc, nh, r) =>
      assert(r >= 0.0 && r <= 1.0, s"nprobe=$np recall $r out of range")
      assert(nc >= nh, s"nprobe=$np: hits $nh exceed candidates $nc")
    }
    // the sweep must actually trade: widest probe beats narrowest
    assert(rows.last._3 > rows.head._3 || rows.head._4 == 1.0,
      "nprobe=8 found no more exact neighbors than nprobe=1")
  }
}
