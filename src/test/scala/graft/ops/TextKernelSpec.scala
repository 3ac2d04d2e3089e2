package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextKernels

/** The codegen'd RepetitionStats kernel must be row-identical to the
  * interpreted higher-order-function formulation it replaced (same
  * doubles, not just approximately equal — the oracle hash contract
  * depends on it). */
class TextKernelSpec extends SparkSpec {

  test("t07 codegen kernel == interpreted HOF formulation on testdata") {
    val fast = TextOps.t07(spark, sf).collect()
    val slow = TextOps.t07Interpreted(spark, sf).collect()
    assert(fast.length == slow.length)
    fast.zip(slow).foreach { case (a, b) => assert(a == b) }
  }

  test("t06 codegen winnow kernel == interpreted HOF formulation on testdata") {
    import spark.implicits._
    // a 1-in-5 sample keeps the interpreted witness fast; full-corpus t06
    // coverage comes from the DuckDB oracle in the correctness gate
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter($"doc_id" % 5 === 0)
    val fast = TextOps.t06On(spark, docs).collect()
    val slow = TextOps.t06InterpretedOn(docs).collect()
    assert(fast.length == slow.length)
    assert(fast.nonEmpty)
    fast.zip(slow).foreach { case (a, b) => assert(a == b) }
  }

  test("winnow kernel edge cases: short texts, one window, repetition, multibyte") {
    import spark.implicits._
    val df = Seq(
      (1L, ""),                  // null (no window)
      (2L, "1234567"),           // 7 chars → null
      (3L, "12345678"),          // exactly one window of 4 k-grams
      (4L, "aaaaaaaaaaaa"),      // all k-grams equal → 1 distinct min
      (5L, "größenwahn äöü xyz") // multibyte chars count as 1 position
    ).toDF("doc_id", "text")
    val fast = df.select($"doc_id",
        TextKernels.winnowFpCol(spark, lower($"text")).as("st"))
      .filter($"st".isNotNull)
      .select($"doc_id", $"st.n_kgrams".as("n_kgrams"), $"st.n_fp".as("n_fp"),
        $"st.fp_min".as("fp_min"), $"st.fp_xor".as("fp_xor"))
    // witness: the interpreted column formulation over the same frame
    val txt = lower($"text")
    val n = length($"text")
    val hashes = transform(sequence(lit(1), n - 4), i =>
      PortableSql.h60(txt.substr(i, lit(5))))
    val mins = transform(sequence(lit(1), n - 7), j =>
      array_min(slice(hashes, j, lit(4))))
    val slow = df.filter(n >= 8)
      .withColumn("fp", array_distinct(mins))
      .select($"doc_id", (n - 4).as("n_kgrams"), size($"fp").as("n_fp"),
        array_min($"fp").as("fp_min"),
        aggregate($"fp", lit(0L), (acc, x) => acc.bitwiseXOR(x)).as("fp_xor"))
    val f = fast.collect().sortBy(_.getLong(0))
    val s = slow.collect().sortBy(_.getLong(0))
    assert(f.length == 3 && s.length == 3) // rows 1-2 are null (no window)
    f.zip(s).foreach { case (a, b) => assert(a == b) }
    val r4 = f.find(_.getLong(0) == 4L).get
    assert(r4.getInt(2) == 1) // all-equal k-grams → single distinct fingerprint
  }

  test("winnow sample kernel: mod-1 == full set, mod-8 filters, minKeep keeps whole") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter($"doc_id" % 7 === 0)
    val both = docs.select($"doc_id",
        TextKernels.winnowFpCol(spark, lower($"text")).as("st"),
        TextKernels.winnowFpSampleCol(spark, lower($"text"), 1, 0).as("all"),
        TextKernels.winnowFpSampleCol(spark, lower($"text"), 8, 0).as("s8"),
        TextKernels.winnowFpSampleCol(spark, lower($"text"), 8, 64).as("ad"))
      .filter($"st".isNotNull)
    assert(both.count() > 0)
    // mod-1 sample == the full distinct-min set summarized by winnow_fp;
    // the adaptive form keeps the whole set for fp-poor docs and the
    // mod-8 filter for fp-rich ones
    val bad = both.filter(
      size($"all") =!= $"st.n_fp" ||
        element_at($"all", 1) =!= $"st.fp_min" ||
        aggregate($"all", lit(0L), (acc, x) => acc.bitwiseXOR(x)) =!= $"st.fp_xor" ||
        !($"s8" <=> filter($"all", x => x % 8 === 0)) ||
        !($"ad" <=> when($"st.n_fp" <= 64, $"all").otherwise($"s8")))
    assert(bad.count() == 0)
    // both branches of the adaptive rule are exercised on testdata
    assert(both.filter($"st.n_fp" <= 64).count() > 0)
    assert(both.filter($"st.n_fp" > 64).count() > 0)
  }

  test("t08 winnow overlap detects partial containment that Jaccard misses") {
    import spark.implicits._
    // doc 2 contains doc 1's paragraph inside a much larger document:
    // word-3-gram Jaccard is far below d02's 0.8 threshold, but the
    // lifted paragraph's fingerprints are shared. Docs 3-4 are unrelated
    // filler (distinct vocabularies), doc 5 is a short unrelated note.
    val para = "the winnowing algorithm selects the minimum hash in each sliding window and guarantees any sufficiently long match is detected by construction"
    val filler = (1 to 40).map(i => s"unrelated$i filler$i content$i").mkString(" ")
    val docs = Seq(
      (1L, para),
      (2L, s"$filler $para completely different surrounding prose here"),
      (3L, (1 to 60).map(i => s"alpha$i beta$i gamma$i").mkString(" ")),
      (4L, (1 to 60).map(i => s"delta$i epsilon$i zeta$i").mkString(" ")),
      (5L, "short unrelated note")).toDF("doc_id", "text")
    val overlaps = TextOps.t08On(spark, docs)
      .as[(Long, Long, Long)].collect()
    assert(overlaps.exists { case (a, b, _) => a == 1L && b == 2L },
      s"containment pair (1,2) not detected: ${overlaps.toSeq}")
    assert(!overlaps.exists { case (a, b, _) => Set(a, b).contains(3L) || Set(a, b).contains(4L) },
      s"unrelated filler docs reported: ${overlaps.toSeq}")
    // the Jaccard dedup op does NOT pair them (that's the point of t08)
    val jac = Dedup.d02On(docs).as[(Long, Long, Double)].collect()
    assert(!jac.exists { case (a, b, _) => a == 1L && b == 2L })
  }

  test("t08 on testdata is non-trivial and symmetric-free") {
    import spark.implicits._
    val rows = TextOps.t08(spark, sf).as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty, "testdata should contain overlapping docs")
    rows.foreach { case (a, b, n) =>
      assert(a < b)
      assert(n >= 3)
    }
  }

  test("t09 quality gate flags each failure mode and keeps clean prose") {
    import spark.implicits._
    import java.nio.file.Files
    // write a fixture documents.parquet so t09 runs its real path
    val dir = Files.createTempDirectory("t09_").toString
    Seq(
      (1L, "the cat sat on the mat and it is a fine day to be out in the sun", "en"),
      (2L, "tiny doc", "en"),                                   // too_short
      (3L, (1 to 40).map(i => s"w$i").mkString(" "), "en"),     // low_stopword
      (4L, "the !!! ??? *** ### $$$ %%% of ((( ))) @@@ ^^^ &&& it", "en"), // high_punct
      (5L, ("the dog " * 30).trim + " and it is a of to in", "en")) // repetitive
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.t09(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(4), r.getString(5)))).toMap
    assert(out(1L) == ((true, "")))
    assert(out(2L)._2.contains("too_short") && !out(2L)._1)
    assert(out(3L)._2 == "low_stopword")
    assert(out(4L)._2.contains("high_punct") && !out(4L)._1)
    assert(out(5L)._2.contains("repetitive") && !out(5L)._1)
  }

  test("t10 mixture gate downsamples skewed sources toward the smallest stratum") {
    import spark.implicits._
    // testdata sources are balanced (rate 1.0 everywhere), so the
    // sampling branch is exercised on a skewed fixture: 1000/250/50
    val docs = (
      (1 to 1000).map(i => (i.toLong, s"text $i", "big")) ++
        (1 to 250).map(i => (2000L + i, s"text b$i", "mid")) ++
        (1 to 50).map(i => (3000L + i, s"text c$i", "small")))
      .toDF("doc_id", "text", "source")
    val out = TextOps.t10On(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("small") == ((50L, 50L))) // rate 1.0: the target stratum keeps all
    // hash gating is binomial around target=50: allow generous noise
    val (bigN, bigKept) = out("big")
    val (midN, midKept) = out("mid")
    assert(bigN == 1000 && midN == 250)
    assert(bigKept > 20 && bigKept < 90, s"big kept $bigKept, want ≈50")
    assert(midKept > 20 && midKept < 90, s"mid kept $midKept, want ≈50")
    // deterministic: a second run is bit-identical (no RNG state)
    val again = TextOps.t10On(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(again == out)
  }

  test("kernel edge cases: empty, single token, runs, multi-space") {
    import spark.implicits._
    val df = Seq(
      (1L, ""),
      (2L, "one"),
      (3L, "  padded   spaces  "),
      (4L, "a a a a a"),          // grams: 4× "a a" → dup 3/4, top 4/4
      (5L, "x y x y x"),          // grams: x y, y x, x y, y x → dup 1/2, top 1/2
      (6L, "all distinct tokens here now")) // 4 distinct grams
      .toDF("doc_id", "text")
    val out = df.select($"doc_id",
        TextKernels.repetitionStatsCol(spark, lower($"text")).as("st"))
      .select($"doc_id", $"st.n_2grams", $"st.dup_2gram_frac", $"st.top_2gram_frac")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(out(1L) == ((0, 0.0, 0.0)))
    assert(out(2L) == ((0, 0.0, 0.0)))
    assert(out(3L) == ((1, 0.0, 1.0)))
    assert(out(4L) == ((4, 0.75, 1.0)))
    assert(out(5L) == ((4, 0.5, 0.5)))
    assert(out(6L) == ((4, 0.0, 0.25)))
  }

  test("substr_window_keys: rolling recurrence == direct formula, all edge ns") {
    import org.apache.spark.unsafe.types.UTF8String
    def fnv(tok: String): Long = {
      var x = 0xcbf29ce484222325L
      tok.getBytes("UTF-8").foreach(b => x = (x ^ (b & 0xffL)) * 0x100000001b3L)
      x ^= x >>> 33; x *= 0xff51afd7ed558ccdL; x ^= x >>> 33
      x
    }
    def direct(toks: Array[String], n: Int): Array[Long] =
      (0 to toks.length - n).map { i =>
        (0 until n).map(k =>
          java.lang.Long.rotateLeft(fnv(toks(i + k)), (n - 1 - k) & 63))
          .reduce(_ ^ _)
      }.toArray
    val rnd = new scala.util.Random(7)
    // n = 64/65 exercise the mod-64 rotation edges of the recurrence
    for (n <- Seq(1, 2, 50, 63, 64, 65); trial <- 1 to 3) {
      val toks = Array.fill(n + rnd.nextInt(40))(s"w${rnd.nextInt(9)}")
      val got = TextKernels
        .substrWindowKeys(UTF8String.fromString(toks.mkString(" ")), n)
        .toLongArray()
      assert(got.sameElements(direct(toks, n)), s"n=$n trial=$trial")
    }
  }

  test("substr_window_keys: equal grams collide, short texts yield empty") {
    import org.apache.spark.unsafe.types.UTF8String
    val gram = (0 until 50).map(i => s"g$i")
    val toks = Seq("a1", "a2") ++ gram ++ Seq("b1") ++ gram ++ Seq("b2", "b3")
    val keys = TextKernels
      .substrWindowKeys(UTF8String.fromString(toks.mkString(" ")), 50)
      .toLongArray()
    assert(keys(2) == keys(2 + 50 + 1), "identical 50-grams must share a key")
    assert(keys(0) != keys(1), "shifted distinct grams should differ")
    assert(TextKernels.substrWindowKeys(
      UTF8String.fromString("only three tokens"), 50).numElements() == 0)
    // empty tokens are kept (oracle string_split parity): "a  b" has 3 tokens
    assert(TextKernels.substrWindowKeys(
      UTF8String.fromString("a  b"), 3).numElements() == 1)
  }
}
