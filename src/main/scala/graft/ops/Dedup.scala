package graft.ops

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.VectorOps

/** Deduplication operators over `documents` / `embeddings`:
  *
  *  - d01 exact (normalize → md5 → group)
  *  - d02 exact n-gram Jaccard (shingle inverted-index join — no O(n²))
  *  - d03 MinHash + LSH banding (the 100 TB-scale near-dup path)
  *  - d04 SimHash + banded Hamming search
  *  - d05 embedding near-dup via signed-random-projection LSH + exact
  *    cosine verify (codegen'd `CosineSimilarity`)
  *
  * Scale design: every op is generate-candidates-by-key → verify, where
  * candidate generation is a shuffle on a content-derived key (shingle,
  * band key, SRP bucket). Nothing enumerates all pairs; skew on hot keys
  * is bounded because signatures/buckets are hashes (uniform).
  */
object Dedup {

  /** Distinct word-3-gram shingles of a text column (empty if <3 tokens). */
  def shingles(text: Column): Column = {
    val L = TextOps.tokens(lower(text))
    when(size(L) >= 3,
      array_distinct(transform(sequence(lit(1), size(L) - 2), i =>
        concat_ws(" ", element_at(L, i), element_at(L, i + 1), element_at(L, i + 2)))))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  // ---------------------------------------------------------------------
  // d01: exact dedup — one hash-shuffle on the fingerprint.
  // ---------------------------------------------------------------------
  def d01(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .groupBy(md5(lower(trim($"text"))).as("fingerprint"))
      .agg(min($"doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy($"fingerprint")
  }

  private val d01Sql =
    """SELECT md5(lower(trim(text))) AS fingerprint,
      |  MIN(doc_id) AS keep_doc_id,
      |  COUNT(*) AS n_copies
      |FROM documents
      |GROUP BY fingerprint
      |ORDER BY fingerprint""".stripMargin

  // ---------------------------------------------------------------------
  // d02: exact n-gram Jaccard near-dup pairs. Any pair with J >= t (t>0)
  // shares a shingle, so the inverted-index join is lossless; the
  // threshold prunes before output. The shingle join key is the shuffle
  // key — 100 TB-safe because shingle frequencies are bounded by vocab.
  // ---------------------------------------------------------------------
  def d02(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val sh = docs.select($"doc_id", explode(shingles($"text")).as("w"))
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        $"a.w" === $"b.w" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.as("sa"), $"doc_a" === $"sa.doc_id")
      .join(sizes.as("sb"), $"doc_b" === $"sb.doc_id")
      .select($"doc_a", $"doc_b",
        ($"c".cast(DoubleType) / ($"sa.n" + $"sb.n" - $"c")).as("jaccard"))
      .filter($"jaccard" >= 0.8)
      .orderBy($"doc_a", $"doc_b")
  }

  private val d02Sql =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS L FROM documents),
      |sh AS (
      |  SELECT doc_id, list_distinct([L[i] || ' ' || L[i+1] || ' ' || L[i+2] for i in range(1, len(L)-1)]) AS S
      |  FROM toks WHERE len(L) >= 3),
      |sizes AS (SELECT doc_id, len(S) AS n FROM sh),
      |tok AS (SELECT doc_id, unnest(S) AS w FROM sh),
      |inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      |  FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b,
      |  CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
      |FROM inter
      |JOIN sizes sa ON doc_a = sa.doc_id
      |JOIN sizes sb ON doc_b = sb.doc_id
      |WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8
      |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------------
  // d03: MinHash + LSH banding. 128 permutation-hashes (min over shingle
  // base hashes under (a*h+b) mod P) computed as 128 partial-aggregated
  // mins — one shuffle on doc_id. Band keys (32 bands × 4 rows) bucket
  // candidates; estimated Jaccard = signature agreement. At 100 TB this
  // is the standard layout: no pass ever holds more than (doc, 128 longs).
  // ---------------------------------------------------------------------
  private val NumHashes = 128
  private val Bands = 32
  private val RowsPerBand = NumHashes / Bands
  private val P = 2038074743L // prime < 2^31
  private val hashCoefs: Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(NumHashes)((rnd.nextInt((P - 1).toInt).toLong + 1L,
      rnd.nextInt(P.toInt).toLong))
  }

  def d03(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    // base hash reduced into [0, P) so a*h+b stays < 2^62 (ANSI-safe).
    val sh = docs.select($"doc_id", explode(shingles($"text")).as("w"))
      .withColumn("h", pmod(xxhash64($"w"), lit(P)))
    val minExprs = hashCoefs.zipWithIndex.map { case ((a, b), i) =>
      min(pmod($"h" * lit(a) + lit(b), lit(P))).as(s"s$i")
    }
    val sigs = sh.groupBy($"doc_id").agg(minExprs.head, minExprs.tail: _*)
    val sigArr = array((0 until NumHashes).map(i => col(s"s$i")): _*)
    val withSig = sigs.select($"doc_id", sigArr.as("sig"))
    val bandKeys = (0 until Bands).map { j =>
      val parts = (0 until RowsPerBand).map(r => element_at($"sig", j * RowsPerBand + r + 1))
      xxhash64(lit(j) +: parts: _*)
    }
    val bands = withSig.select($"doc_id", $"sig",
      explode(array(bandKeys: _*)).as("band_key"))
    val cand = bands.as("x").join(bands.as("y"),
        $"x.band_key" === $"y.band_key" && $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"),
        $"x.sig".as("sig_a"), $"y.sig".as("sig_b"))
      .dropDuplicates("doc_a", "doc_b")
    cand
      .withColumn("est_jaccard",
        aggregate(zip_with($"sig_a", $"sig_b",
            (a, b) => when(a === b, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast(DoubleType) / NumHashes)
      .filter($"est_jaccard" >= 0.5)
      .select($"doc_a", $"doc_b", $"est_jaccard")
      .orderBy($"doc_a", $"doc_b")
  }

  // ---------------------------------------------------------------------
  // d04: SimHash — 64-bit signature from token-frequency-weighted bit
  // votes; candidates from 4×16-bit band equality; verified by Hamming
  // distance (bit_count of XOR, codegen'd builtin).
  // ---------------------------------------------------------------------
  def d04(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val tok = docs.select($"doc_id", explode(TextOps.tokens(lower($"text"))).as("t"))
      .withColumn("h", xxhash64($"t"))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright($"h", j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$j")
    }
    val agged = tok.groupBy($"doc_id").agg(bitSums.head, bitSums.tail: _*)
    val simhash = (0 until 64).map { j =>
      when(col(s"b$j") >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    val sigs = agged.select($"doc_id", simhash.as("simhash"))
    val chunks = sigs.select($"doc_id", $"simhash",
      explode(array((0 until 4).map(k =>
        struct(lit(k).as("k"),
          shiftrightunsigned($"simhash", k * 16).bitwiseAND(0xFFFFL).as("v"))): _*))
        .as("chunk"))
    chunks.as("x").join(chunks.as("y"),
        $"x.chunk" === $"y.chunk" && $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"),
        bit_count($"x.simhash".bitwiseXOR($"y.simhash")).as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter($"hamming" <= 6)
      .orderBy($"doc_a", $"doc_b")
  }

  // ---------------------------------------------------------------------
  // d05: embedding near-dup — SRP-LSH bucket (16 signed random
  // projections → 16-bit bucket) generates candidates; exact cosine
  // (native codegen expression) verifies. The bucket key is the shuffle
  // key; the verify join touches only same-bucket pairs.
  // ---------------------------------------------------------------------
  /** Signed-random-projection LSH, multi-table layout: `Tables` hash
    * tables of `BitsPerTable` hyperplanes each. A vector lands in one
    * bucket per table; two vectors are candidates if they collide in ANY
    * table. Recall at cos θ is 1-(1-p^k)^L with p = 1-θ/π — at cos 0.9
    * (θ≈25.8°), 8 tables × 8 bits gives ~0.94, vs ~0.08 for one 16-bit
    * table. Returns an array of (table, bucket) structs to explode.
    */
  private val SrpTables = 8
  private val BitsPerTable = 8

  private[ops] def srpTableKeys(emb: Column): Column = {
    val rnd = new scala.util.Random(7)
    val planes = Seq.fill(SrpTables * BitsPerTable)(Array.fill(64)(rnd.nextGaussian()))
    val buckets = (0 until SrpTables).map { t =>
      val bucket = (0 until BitsPerTable).map { j =>
        val dot = aggregate(
          zip_with(emb, typedLit(planes(t * BitsPerTable + j).toSeq),
            (x, w) => x.cast(DoubleType) * w),
          lit(0.0), (acc, v) => acc + v)
        when(dot >= 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce((a, b) => a.bitwiseOR(b))
      struct(lit(t).as("t"), bucket.as("b"))
    }
    array(buckets: _*)
  }

  def d05(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.load(spark, dir, "embeddings")
      .select($"vec_id", $"embedding",
        explode(srpTableKeys($"embedding")).as("key"))
    emb.as("x").join(emb.as("y"),
        $"x.key" === $"y.key" && $"x.vec_id" < $"y.vec_id")
      .select($"x.vec_id".as("vec_a"), $"y.vec_id".as("vec_b"),
        VectorOps.cosineSim(spark, $"x.embedding", $"y.embedding").as("cosine"))
      .dropDuplicates("vec_a", "vec_b")
      .filter($"cosine" >= 0.9)
      .orderBy($"vec_a", $"vec_b")
  }

  // ---------------------------------------------------------------------

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "d01_exact_dedup" -> (d01 _),
    "d02_ngram_jaccard" -> (d02 _),
    "d03_minhash_lsh" -> (d03 _),
    "d04_simhash" -> (d04 _),
    "d05_embed_neardup" -> (d05 _))

  val oracle: ListMap[String, String] = ListMap(
    "d01_exact_dedup" -> d01Sql,
    "d02_ngram_jaccard" -> d02Sql)
}
