package graft.ops

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.ops.Materialize.MaterializeOps

/** The end-to-end corpus-preparation pipeline, as ONE declarative DAG:
  * quality gate (t09) → exact dedup (d01's fingerprint) → sequence
  * packing yield (t14's unit), reported per source. This is the
  * composability claim of the library made concrete: each stage is the
  * registry op's own logic (the gate is t09's output, the fingerprint
  * is d01's expression, the pack unit is t14's constant), chained as
  * plain DataFrames so Catalyst plans the pipeline end to end —
  * partial aggregation everywhere, and the only shuffles are the gate
  * join (co-keyed on doc_id), the fingerprint groupBy, and the final
  * per-source rollup: exactly the three key changes the semantics
  * require. The one lineage cut is the post-gate frame, which feeds
  * two consumers (see below). At 100 TB each stage's scale story is
  * unchanged from its standalone op.
  */
object Pipeline {

  private val PackLen = 2048L

  def p01(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    // stage 1: the t09 gate, joined back on the co-keyed doc_id (the
    // gate frame derives from the same scan; AQE plans a local join)
    val gate = TextOps.t09(spark, dir).select($"doc_id", $"n_tokens", $"keep")
    // materialized once (the d02/d03/d09 multi-consumer rule): the
    // gate-join + fingerprint frame feeds BOTH the dedup winners and
    // the per-source kept census; without the cut the corpus-wide
    // join + md5 stage is planned and executed twice
    val kept = docs.join(gate, "doc_id").filter($"keep")
      .select($"doc_id", $"source", $"n_tokens",
        md5(lower(trim($"text"))).as("fp"))
      .materialize
    // stage 2: d01's exact dedup — one winner per fingerprint, stats
    // attributed to the winner's source (min doc_id, d01's keep rule)
    val winners = kept.groupBy($"fp")
      .agg(min_by($"source", $"doc_id").as("source"),
        min_by($"n_tokens", $"doc_id").as("n_tokens"))
    // stage 3: packing yield per source from the surviving token mass
    val inCounts = docs.groupBy($"source").agg(count(lit(1)).as("n_docs_in"))
    val keptCounts = kept.groupBy($"source")
      .agg(count(lit(1)).as("n_kept_quality"))
    val dedupStats = winners.groupBy($"source")
      .agg(count(lit(1)).as("n_after_dedup"),
        sum($"n_tokens".cast(LongType)).as("total_tokens"))
    val nSeq = expr(s"(total_tokens + ${PackLen - 1}) div $PackLen")
    inCounts
      .join(keptCounts, Seq("source"), "left")
      .join(dedupStats, Seq("source"), "left")
      .select($"source", $"n_docs_in",
        coalesce($"n_kept_quality", lit(0L)).as("n_kept_quality"),
        coalesce($"n_after_dedup", lit(0L)).as("n_after_dedup"),
        coalesce($"total_tokens", lit(0L)).as("total_tokens"),
        coalesce(nSeq, lit(0L)).as("n_sequences"),
        when(coalesce(nSeq, lit(0L)) > 0,
          $"total_tokens".cast(DoubleType) /
            (nSeq * lit(PackLen)).cast(DoubleType))
          .otherwise(0.0).as("fill_ratio"))
      .orderBy($"source")
  }

  private def p01Sql: String =
    s"""WITH ${TextOps.t09QualityCtes},
       |kept AS (
       |  SELECT d.doc_id, d.source, f.n_tokens,
       |    md5(lower(trim(d.text))) AS fp
       |  FROM documents d JOIN frac f USING (doc_id)
       |  WHERE ${TextOps.t09KeepSql}),
       |winners AS (
       |  SELECT fp, arg_min(source, doc_id) AS source,
       |    arg_min(n_tokens, doc_id) AS n_tokens
       |  FROM kept GROUP BY fp),
       |icounts AS (
       |  SELECT source, COUNT(*) AS n_docs_in FROM documents GROUP BY source),
       |kcounts AS (
       |  SELECT source, COUNT(*) AS n_kept_quality FROM kept GROUP BY source),
       |dstats AS (
       |  SELECT source, COUNT(*) AS n_after_dedup,
       |    CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
       |  FROM winners GROUP BY source)
       |SELECT i.source, i.n_docs_in,
       |  COALESCE(k.n_kept_quality, 0) AS n_kept_quality,
       |  COALESCE(d.n_after_dedup, 0) AS n_after_dedup,
       |  COALESCE(d.total_tokens, 0) AS total_tokens,
       |  COALESCE((d.total_tokens + ${PackLen - 1}) // $PackLen, 0) AS n_sequences,
       |  CASE WHEN COALESCE((d.total_tokens + ${PackLen - 1}) // $PackLen, 0) > 0
       |    THEN CAST(d.total_tokens AS DOUBLE)
       |      / CAST(((d.total_tokens + ${PackLen - 1}) // $PackLen) * $PackLen AS DOUBLE)
       |    ELSE 0.0 END AS fill_ratio
       |FROM icounts i
       |LEFT JOIN kcounts k ON i.source = k.source
       |LEFT JOIN dstats d ON i.source = d.source
       |ORDER BY i.source""".stripMargin

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "p01_corpus_pipeline" -> (p01 _))

  val oracle: ListMap[String, String] = ListMap(
    "p01_corpus_pipeline" -> p01Sql)
}
