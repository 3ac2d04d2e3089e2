package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Engine-portable deterministic kernels, expressed twice: as Spark
  * `Column`s and as DuckDB SQL text. Both sides produce bit-identical
  * values, which is what lets sketch/LSH operators (minhash, simhash,
  * SRP, KMV) be *hash-verified* against the DuckDB oracle instead of
  * rows-only checked.
  *
  * The shared primitive is a 60-bit hash from md5 hex (md5 is the one
  * cryptographic hash both engines expose identically); 60 bits keeps
  * every product/sum used downstream inside a signed 64-bit long under
  * ANSI overflow checking.
  *
  * Exactness rules (see also Relational.scala): double sums are written
  * as explicit left-associated `+` chains in SQL, matching Spark's
  * sequential fold order, so IEEE results are bit-equal.
  */
object PortableSql {

  /** 60-bit non-negative hash of a string column: first 15 md5 hex chars. */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** DuckDB text for [[h60]] over the given SQL expression. */
  def h60Sql(expr: String): String =
    s"CAST('0x' || substring(md5($expr), 1, 15) AS BIGINT)"

  /** Explicit dim-term dot product `a·b` (1-based SQL array indexing),
    * left-associated like Spark's sequential fold. */
  def dotSql(a: String, b: String, dim: Int): String =
    (1 to dim).map(i => s"CAST($a[$i] AS DOUBLE) * CAST($b[$i] AS DOUBLE)")
      .mkString(" + ")

  /** Explicit dim-term weighted sum `Σ w(k)·a[k]` with literal weights
    * (used for SRP hyperplane projections; Double.toString round-trips
    * exactly through DuckDB's double parser). Indices beyond the array's
    * length contribute 0.0 — the same partial-dot semantics as the
    * SrpBuckets kernel; the trailing `+0.0` terms cannot flip the sign
    * decision (`-0.0 + 0.0 = +0.0` and both compare `>= 0.0`). The
    * length guard is explicit (not COALESCE) so a genuinely-null
    * IN-range element still poisons the sum to NULL and fails the
    * oracle loudly instead of silently contributing 0. */
  def weightedSumSql(a: String, weights: Array[Double]): String =
    weights.zipWithIndex
      .map { case (w, k) =>
        s"(CASE WHEN len($a) >= ${k + 1} THEN CAST($a[${k + 1}] AS DOUBLE) * $w ELSE 0.0 END)" }
      .mkString(" + ")

  /** Cosine similarity from precomputed dot/na/nb columns, mirroring
    * graft.functions.CosineSimilarity's zero-norm convention. */
  def cosineFromPartsSql(dot: String, na: String, nb: String): String =
    s"(CASE WHEN $na = 0.0 OR $nb = 0.0 THEN 0.0 " +
      s"ELSE $dot / (sqrt($na) * sqrt($nb)) END)"
}
