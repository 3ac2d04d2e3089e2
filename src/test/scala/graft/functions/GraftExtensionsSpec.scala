package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The `spark.sql.extensions` route: a session built with
  * `GraftExtensions` resolves every kernel from PURE SQL — no Scala
  * column helpers — and produces the same values they do. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("all kernels resolve and compute through spark.sql with the extension") {
    // force a fresh SparkSession so withExtensions applies (the shared
    // suite session was built without them); restore defaults after
    val prior = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import spark.implicits._
      Seq((1L, "the quick brown fox jumps over the lazy dog the quick brown fox"))
        .toDF("doc_id", "text").createOrReplaceTempView("docs")
      Seq((1L, Array(1.0f, 0.0f, 2.0f)), (2L, Array(0.5f, 0.0f, 1.0f)))
        .toDF("vec_id", "embedding").createOrReplaceTempView("vecs")

      val r = spark.sql(
        """SELECT simhash_sig(text) AS sh,
          |  size(minhash_sig(text)) AS msz,
          |  minhash_agree(minhash_sig(text), minhash_sig(text)) AS agree,
          |  repetition_stats(text).n_2grams AS n2,
          |  size(shingle_set(text)) AS nsh,
          |  winnow_fp(text).n_fp AS nfp,
          |  size(winnow_fp_sample(text, 1, 0)) AS nfps
          |FROM docs""".stripMargin).head()
      assert(!r.isNullAt(0))
      assert(r.getInt(1) == MinHash.NumHashes)
      assert(r.getInt(2) == MinHash.NumHashes)
      assert(r.getInt(3) == 12) // 13 tokens -> 12 adjacent 2-grams
      assert(r.getInt(4) == 9) // 11 3-grams, 2 repeats -> 9 distinct
      assert(r.getInt(5) == r.getInt(6)) // mod-1 sample == full set

      val cos = spark.sql(
        """SELECT cosine_sim(a.embedding, b.embedding) AS c,
          |  size(srp_buckets(a.embedding)) AS nb
          |FROM vecs a JOIN vecs b ON a.vec_id = 1 AND b.vec_id = 2""".stripMargin)
        .head()
      assert(math.abs(cos.getDouble(0) - 1.0) < 1e-6) // parallel vectors
      assert(cos.getInt(1) == SrpLsh.Tables)

      // values equal the Scala column-helper route on the same session
      val viaSql = spark.sql("SELECT simhash_sig(lower(text)) AS s FROM docs").head().getLong(0)
      val viaCol = spark.table("docs")
        .select(SimHash.sigCol(spark, org.apache.spark.sql.functions.lower($"text")).as("s"))
        .head().getLong(0)
      assert(viaSql == viaCol)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
