package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SrpLshSpec extends SparkSpec {

  /** Reference bucket computation, independent of the expression code:
    * plain Scala doubles, same ascending-index accumulation order. */
  private def bucketsRef(v: Array[Float]): Array[Long] =
    Array.tabulate(SrpLsh.Tables) { t =>
      var bucket = 0L
      for (j <- 0 until SrpLsh.BitsPerTable) {
        val plane = SrpLsh.planes(t * SrpLsh.BitsPerTable + j)
        var dot = 0.0
        for (i <- 0 until math.min(v.length, SrpLsh.Dim)) dot += v(i).toDouble * plane(i)
        if (dot >= 0.0) bucket |= (1L << j)
      }
      (t.toLong << SrpLsh.BitsPerTable) | bucket
    }

  test("srp_buckets matches the reference on real embeddings (codegen path)") {
    import spark.implicits._
    val rows = graft.Tables.load(spark, sf, "embeddings").limit(50)
      .select($"vec_id", $"embedding",
        SrpLsh.buckets(spark, $"embedding").as("keys"))
      .as[(Long, Array[Float], Array[Long])].collect()
    assert(rows.length == 50)
    rows.foreach { case (id, emb, keys) =>
      assert(keys.sameElements(bucketsRef(emb)), s"vec $id")
    }
  }

  test("srp_buckets packs (table, bucket) uniquely and in table order") {
    import spark.implicits._
    val keys = Seq(Tuple1(Array.fill(SrpLsh.Dim)(0.5f))).toDF("v")
      .select(SrpLsh.buckets(spark, $"v")).as[Array[Long]].head()
    assert(keys.length == SrpLsh.Tables)
    keys.zipWithIndex.foreach { case (k, t) =>
      assert((k >> SrpLsh.BitsPerTable) == t, s"table id of key $k")
      assert((k & ((1L << SrpLsh.BitsPerTable) - 1)) >= 0)
    }
    assert(keys.distinct.length == keys.length)
  }

  test("srp_buckets partial-dot semantics on vectors shorter than Dim") {
    import spark.implicits._
    val short = Array.tabulate(10)(i => (if (i % 2 == 0) 0.25f else -0.75f) * (i + 1))
    val got = Seq(Tuple1(short)).toDF("v")
      .select(SrpLsh.buckets(spark, $"v")).as[Array[Long]].head()
    assert(got.sameElements(bucketsRef(short)),
      "codegen path must use only the vector's own elements")
    // empty vector: every dot is 0.0, which signs positive -> all bits set
    val empty = Seq(Tuple1(Array.empty[Float])).toDF("v")
      .select(SrpLsh.buckets(spark, $"v")).as[Array[Long]].head()
    assert(empty.sameElements(bucketsRef(Array.empty[Float])))
    empty.zipWithIndex.foreach { case (k, t) =>
      assert(k == ((t.toLong << SrpLsh.BitsPerTable) | ((1L << SrpLsh.BitsPerTable) - 1)))
    }
  }

  test("srp_buckets interpreted eval agrees with the codegen result") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import spark.implicits._
    val emb = graft.Tables.load(spark, sf, "embeddings").limit(5)
      .select($"embedding").as[Array[Float]].collect()
    emb.foreach { v =>
      val interp = SrpBuckets(Literal.create(v))
        .eval(null).asInstanceOf[ArrayData].toLongArray()
      assert(interp.sameElements(bucketsRef(v)))
    }
  }
}
