package graft.ops

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorOps

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  *  - s01: brute-force cosine top-k — the exact baseline. Queries are a
  *    small deterministic subset, broadcast against the corpus scan; one
  *    pass, per-query top-k via ranking window. At 100 TB the corpus scan
  *    dominates and parallelizes per-split; the broadcast side stays tiny.
  *  - s02: SRP-LSH bucketed top-k — the scale path: the corpus is hashed
  *    into 2^16 buckets once; each query probes only its own bucket, so
  *    cost per query is |bucket| not |corpus|. Recall < 1 by design.
  */
object Similarity {

  private def queriesSubset(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "embeddings")
      .filter($"vec_id" % 47 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
  }

  def s01(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.load(spark, dir, "embeddings")
    val q = queriesSubset(spark, dir)
    val scored = emb.crossJoin(broadcast(q))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id",
        VectorOps.cosineSim(spark, $"embedding", $"q_emb").as("cosine"))
    val w = Window.partitionBy($"q_id").orderBy($"cosine".desc, $"vec_id".asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 5)
      .select($"q_id", $"rank", $"vec_id", $"cosine")
      .orderBy($"q_id", $"rank")
  }

  def s02(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.load(spark, dir, "embeddings")
      .select($"vec_id", $"embedding",
        explode(Dedup.srpTableKeys($"embedding")).as("key"))
    val q = queriesSubset(spark, dir)
      .select($"q_id", $"q_emb", explode(Dedup.srpTableKeys($"q_emb")).as("key"))
    val scored = emb.join(broadcast(q), Seq("key"))
      .filter($"vec_id" =!= $"q_id")
      .dropDuplicates("q_id", "vec_id")
      .select($"q_id", $"vec_id",
        VectorOps.cosineSim(spark, $"embedding", $"q_emb").as("cosine"))
    val w = Window.partitionBy($"q_id").orderBy($"cosine".desc, $"vec_id".asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 5)
      .select($"q_id", $"rank", $"vec_id", $"cosine")
      .orderBy($"q_id", $"rank")
  }

  /** IVF (inverted-file) ANN: a KMeans coarse quantizer partitions the
    * corpus into nlist=16 cells; each query probes its nprobe=2 nearest
    * cells and scores only those candidates. At 100 TB the cell
    * assignment is one narrow pass (centroids broadcast), the index is
    * just a cluster column (partition/bucket by it on disk), and query
    * cost is nprobe/nlist of the corpus. Complements s02's LSH path. */
  def s03(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val emb = Tables.load(spark, dir, "embeddings")
      .withColumn("fv", array_to_vector($"embedding"))
    val model = new KMeans().setK(16).setSeed(42).setMaxIter(5)
      .setFeaturesCol("fv").setPredictionCol("cluster")
      .fit(emb)
    val corpus = model.transform(emb)
      .select($"vec_id", $"embedding", $"cluster".cast("int").as("cluster"))
    // centroid table (16 rows) → per-query top-nprobe cells by euclidean
    val centroids = model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray) }
      .toDF("cluster", "centroid")
    val q = queriesSubset(spark, dir)
    val wProbe = Window.partitionBy($"q_id").orderBy($"d2".asc, $"cluster".asc)
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("d2", aggregate(
        zip_with($"q_emb", $"centroid", (x, c) => (x - c) * (x - c)),
        lit(0.0), (acc, v) => acc + v))
      .withColumn("pr", row_number().over(wProbe))
      .filter($"pr" <= 2)
      .select($"q_id", $"q_emb", $"cluster")
    val scored = corpus.join(broadcast(probes), Seq("cluster"))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id",
        VectorOps.cosineSim(spark, $"embedding", $"q_emb").as("cosine"))
    val w = Window.partitionBy($"q_id").orderBy($"cosine".desc, $"vec_id".asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 5)
      .select($"q_id", $"rank", $"vec_id", $"cosine")
      .orderBy($"q_id", $"rank")
  }

  /** s04: int8 scalar-quantized ANN — per-vector symmetric quantization
    * (q = floor(x·127/absmax + 0.5), an explicit round-half-up both
    * engines compute identically), integer-dot-product candidate scoring
    * (top-20), exact-cosine re-rank (top-5). At 100 TB this is the
    * memory-bound path: the int8 corpus is 4× smaller than fp32, the
    * candidate pass is exact integer arithmetic (SIMD-able, spill-free),
    * and the expensive float math touches only 20 candidates per query. */
  def s04(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types.{DoubleType, LongType}
    def quantized(df: DataFrame, vecCol: String): DataFrame = df
      .withColumn("s", array_max(transform(col(vecCol), x => abs(x.cast(DoubleType)))))
      .withColumn("qv", when($"s" === 0.0,
          transform(col(vecCol), _ => lit(0L)))
        .otherwise(transform(col(vecCol), x =>
          floor(x.cast(DoubleType) * 127.0 / $"s" + 0.5).cast(LongType))))
      .drop("s")
    val corpus = quantized(Tables.load(spark, dir, "embeddings"), "embedding")
    val q = quantized(
      queriesSubset(spark, dir).withColumnRenamed("q_emb", "q_embedding"),
      "q_embedding")
      .withColumnRenamed("qv", "q_qv")
    val iscore = aggregate(zip_with($"qv", $"q_qv", (a, b) => a * b),
      lit(0L), (acc, v) => acc + v)
    val wCand = Window.partitionBy($"q_id").orderBy($"iscore".desc, $"vec_id".asc)
    val cands = corpus.crossJoin(broadcast(q))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id", $"embedding", $"q_embedding", iscore.as("iscore"))
      .withColumn("crank", row_number().over(wCand))
      .filter($"crank" <= 20)
    val wFinal = Window.partitionBy($"q_id").orderBy($"cosine".desc, $"vec_id".asc)
    cands
      .select($"q_id", $"vec_id", $"iscore",
        VectorOps.cosineSim(spark, $"embedding", $"q_embedding").as("cosine"))
      .withColumn("rank", row_number().over(wFinal).cast("long"))
      .filter($"rank" <= 5)
      .select($"q_id", $"rank", $"vec_id", $"iscore", $"cosine")
      .orderBy($"q_id", $"rank")
  }

  private def s04Sql: String = {
    val qexpr = (v: String) =>
      s"""CASE WHEN list_max(list_transform($v, x -> abs(CAST(x AS DOUBLE)))) = 0.0
         | THEN list_transform($v, x -> CAST(0 AS BIGINT))
         | ELSE list_transform($v, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0
         |   / list_max(list_transform($v, y -> abs(CAST(y AS DOUBLE)))) + 0.5) AS BIGINT))
         | END""".stripMargin.replaceAll("\n", " ")
    val idot = (1 to 64).map(i => s"qa[$i] * qb[$i]").mkString(" + ")
    val dot = PortableSql.dotSql("emb", "q_emb", 64)
    val na = PortableSql.dotSql("emb", "emb", 64)
    val nb = PortableSql.dotSql("q_emb", "q_emb", 64)
    val cos = PortableSql.cosineFromPartsSql("dot", "na", "nb")
    s"""WITH corpus AS (
       |  SELECT vec_id, embedding, ${qexpr("embedding")} AS qv FROM embeddings),
       |q AS (SELECT vec_id AS q_id, embedding AS q_embedding, qv AS q_qv
       |  FROM corpus WHERE vec_id % 47 = 0),
       |pairs AS (
       |  SELECT q_id, vec_id, embedding AS emb, q_embedding AS q_emb,
       |    c.qv AS qa, q.q_qv AS qb
       |  FROM corpus c CROSS JOIN q WHERE vec_id <> q_id),
       |scored AS (SELECT q_id, vec_id, emb, q_emb, $idot AS iscore FROM pairs),
       |cands AS (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY iscore DESC, vec_id ASC) AS crank
       |  FROM scored),
       |top AS (SELECT * FROM cands WHERE crank <= 20),
       |parts AS (SELECT q_id, vec_id, iscore, $dot AS dot, $na AS na, $nb AS nb FROM top),
       |rescored AS (SELECT q_id, vec_id, iscore, $cos AS cosine FROM parts),
       |ranked AS (
       |  SELECT q_id, vec_id, iscore, cosine,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id ASC) AS rank
       |  FROM rescored)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, iscore, cosine
       |FROM ranked WHERE rank <= 5
       |ORDER BY q_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Oracles: explicit 64-term dot products (left-associated, matching
  // CosineSimilarity's fold order) make the doubles bit-equal, so the ANN
  // results are hash-verified, not rows-only. s03's KMeans quantizer is
  // iterative ML with engine-private float reductions — rows-only there.
  // ---------------------------------------------------------------------
  private def rankedSql(candCte: String): String = {
    val dot = PortableSql.dotSql("emb", "q_emb", 64)
    val na = PortableSql.dotSql("emb", "emb", 64)
    val nb = PortableSql.dotSql("q_emb", "q_emb", 64)
    val cos = PortableSql.cosineFromPartsSql("dot", "na", "nb")
    s"""$candCte,
       |parts AS (SELECT q_id, vec_id, $dot AS dot, $na AS na, $nb AS nb FROM cand),
       |scored AS (SELECT q_id, vec_id, $cos AS cosine FROM parts),
       |ranked AS (
       |  SELECT q_id, vec_id, cosine,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id ASC) AS rank
       |  FROM scored)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, cosine
       |FROM ranked WHERE rank <= 5
       |ORDER BY q_id, rank""".stripMargin
  }

  private def s01Sql: String = rankedSql(
    """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id % 47 = 0),
      |cand AS (
      |  SELECT q_id, vec_id, embedding AS emb, q_emb
      |  FROM embeddings CROSS JOIN q WHERE vec_id <> q_id)""".stripMargin)

  private def s02Sql: String = rankedSql(
    s"""WITH keys AS (
       |  ${Dedup.srpKeysSql("embeddings")}),
       |qk AS (SELECT * FROM keys WHERE vec_id % 47 = 0),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS q_id, k.vec_id AS vec_id,
       |    k.embedding AS emb, q.embedding AS q_emb
       |  FROM keys k JOIN qk q ON k.t = q.t AND k.b = q.b AND k.vec_id <> q.vec_id)""".stripMargin)

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "s01_ann_bruteforce" -> (s01 _),
    "s02_ann_lsh" -> (s02 _),
    "s03_ann_ivf" -> (s03 _),
    "s04_ann_int8_rerank" -> (s04 _))

  val oracle: ListMap[String, String] = ListMap(
    "s01_ann_bruteforce" -> s01Sql,
    "s02_ann_lsh" -> s02Sql,
    "s04_ann_int8_rerank" -> s04Sql)
}
