package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q71's contracts the value-hashing oracle can't see:
  * - the manifest prune actually SKIPS files (kept < total for a
  *   one-year window over a range-partitioned multi-year layout);
  * - the pruned read returns exactly the full-scan answer (skipping
  *   is an optimization, never a semantics change);
  * - a window covering everything keeps every file (no over-pruning).
  */
class ManifestSkipSpec extends SparkSpec {

  test("q71 manifest prune skips files and preserves the full-scan answer") {
    import spark.implicits._
    val path = Extras3.q71Layout(spark, sf)
    val total = new java.io.File(path).listFiles()
      .count(f => f.getName.startsWith("part-"))
    assert(total > 1, s"layout produced $total files; range layout broken")

    val kept = Extras3.q71Prune(spark, path, "1996-01-01", "1996-12-31")
    assert(kept.nonEmpty && kept.length < total,
      s"expected real pruning, kept ${kept.length} of $total")

    val all = Extras3.q71Prune(spark, path, "1900-01-01", "2100-01-01")
    assert(all.length == total, s"full window kept ${all.length} of $total")

    def answer(paths: Seq[String]) =
      spark.read.parquet(paths: _*)
        .filter($"l_shipdate".between(
          lit("1996-01-01").cast("timestamp"),
          lit("1996-12-31").cast("timestamp")))
        .agg(count(lit(1)), sum($"l_quantity".cast("decimal(18,2)")))
        .collect().head.toSeq
    assert(answer(kept) == answer(all),
      "pruned read diverges from the full scan")
  }
}
