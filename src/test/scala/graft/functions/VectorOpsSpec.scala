package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorOpsSpec extends SparkSpec {

  private def cosRef(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (i <- 0 until n) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
    }
    if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("cosine_sim matches reference on fixed vectors (codegen path)") {
    import spark.implicits._
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(-1.0f, 0.5f, 2.0f)
    val df = Seq((a, b)).toDF("x", "y")
    val got = df.select(VectorOps.cosineSim(spark, $"x", $"y")).head.getDouble(0)
    assert(math.abs(got - cosRef(a, b)) < 1e-12)
  }

  test("cosine_sim: identical vectors -> 1, orthogonal -> 0, zero -> 0") {
    import spark.implicits._
    val v = Array(0.3f, -0.7f, 1.1f)
    val rows = Seq(
      (v, v, 1.0),
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f), 0.0),
      (Array(0f, 0f, 0f), v, 0.0))
    val df = rows.toDF("x", "y", "want")
      .select(VectorOps.cosineSim(spark, $"x", $"y").as("got"), $"want")
    df.collect().foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("int8_dot matches the interpreted HOF formula it replaced (s04 parity)") {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    import spark.implicits._
    // the exact Column chain s04 used before the codegen kernel
    def quant(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val s = array_max(transform(v, x => abs(x.cast(DoubleType))))
      when(s === 0.0, transform(v, _ => lit(0L)))
        .otherwise(transform(v, x =>
          floor(x.cast(DoubleType) * 127.0 / s + 0.5).cast(LongType)))
    }
    val hof = aggregate(
      zip_with(quant($"x"), quant($"y"), (a, b) => a * b),
      lit(0L), (acc, v) => acc + v)
    val emb = graft.Tables.load(spark, sf, "embeddings").limit(40)
      .select($"embedding").as[Array[Float]].collect()
    val pairs = emb.sliding(2, 2).collect { case Array(a, b) => (a, b) }.toSeq
    val df = (pairs :+ ((Array(0f, 0f, 0f), Array(1f, -2f, 3f)))).toDF("x", "y")
    df.select(VectorOps.int8Dot(spark, $"x", $"y").as("got"), hof.as("want"))
      .collect()
      .foreach(r => assert(r.getLong(0) == r.getLong(1),
        s"int8_dot ${r.getLong(0)} != interpreted ${r.getLong(1)}"))
  }

  test("cosine_sim matches reference on real embeddings (interpreted == codegen)") {
    import spark.implicits._
    val emb = graft.Tables.load(spark, sf, "embeddings").limit(20)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val df = graft.Tables.load(spark, sf, "embeddings").limit(20)
    val first = emb.head._2
    val got = df.select($"vec_id",
        VectorOps.cosineSim(spark, $"embedding", typedLit(first.toSeq)).as("c"))
      .as[(Long, Double)].collect().toMap
    emb.foreach { case (id, v) =>
      assert(math.abs(got(id) - cosRef(v, first)) < 1e-9, s"vec $id")
    }
  }
}
