package graft.ops

import graft.SparkSpec

class MultiprobeSpec extends SparkSpec {

  private def top5Map(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      .groupBy((p: (Long, Long)) => p._1)
      .map { case (q, s) => q -> s.map(_._2) }

  test("s13: multiprobe recall@5 dominates single-probe, never below") {
    val exact = top5Map(Similarity.s01(spark, sf))
    val single = top5Map(Similarity.s02(spark, sf))
    val multi = top5Map(Similarity.s13(spark, sf))
    def recall(approx: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (q, t) =>
        approx.getOrElse(q, Set.empty).count(t) / t.size.toDouble
      }
      per.sum / per.size
    }
    val (rSingle, rMulti) = (recall(single), recall(multi))
    assert(rMulti >= rSingle,
      s"multiprobe recall $rMulti below single-probe $rSingle")
    assert(rMulti > 0.5, s"multiprobe recall $rMulti implausibly low")
  }

  test("s13: the 1-bit-flip probe set strictly widens the candidate pool") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.load(spark, sf, "embeddings")
      .select($"vec_id", explode(
        graft.functions.SrpLsh.buckets(spark, $"embedding")).as("key"))
    val q = graft.Tables.load(spark, sf, "embeddings")
      .filter($"vec_id" % 47 === 0)
      .select($"vec_id".as("q_id"), explode(
        graft.functions.SrpLsh.buckets(spark, $"embedding")).as("home"))
    val singleCand = emb.join(q, $"key" === $"home" && $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id").distinct().count()
    val probes = ($"home" +: (0 until graft.functions.SrpLsh.BitsPerTable)
      .map(j => $"home".bitwiseXOR(lit(1L << j)))).toSeq
    val multiCand = emb.join(
        q.select($"q_id", explode(array(probes: _*)).as("key")),
        Seq("key"))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id").distinct().count()
    assert(multiCand > singleCand,
      s"multiprobe candidates $multiCand not above single-probe $singleCand")
  }
}
