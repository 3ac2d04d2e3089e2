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
}
