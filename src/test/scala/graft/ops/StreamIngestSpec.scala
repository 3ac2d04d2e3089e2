package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** p03's contracts beyond the per-(source, split) oracle:
  * - the run is genuinely multi-batch (the ledger merged across
  *   micro-batches rather than seeing everything at once);
  * - the settled ledger equals the one-shot batch dedup winners;
  * - the merge is IDEMPOTENT: replaying the entire corpus as one more
  *   delta leaves the ledger unchanged (exactly-once without
  *   source-side dedup).
  */
class StreamIngestSpec extends SparkSpec {

  test("p03 ledger converges to batch truth across batches and is replay-safe") {
    import spark.implicits._
    val (ledger, nBatches) = Pipeline.p03Run(spark, sf)
    assert(nBatches >= 2, s"expected a multi-batch run, got $nBatches")

    // batch truth: gate → fingerprint → min-doc_id winner per fp
    val docs = graft.Tables.load(spark, sf, "documents")
    val gate = TextOps.t09(spark, sf).select($"doc_id", $"n_tokens", $"keep")
    val winners = docs.join(gate, "doc_id").filter($"keep")
      .select($"doc_id", $"source", $"n_tokens",
        md5(lower(trim($"text"))).as("fp"))
      .groupBy($"fp")
      .agg(min($"doc_id").as("doc_id"),
        min_by($"source", $"doc_id").as("source"),
        min_by($"n_tokens", $"doc_id").as("n_tokens"))

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"fp", $"doc_id", $"source", $"n_tokens")
        .collect().map(_.toSeq).toSet
    val settled = rows(ledger)
    assert(settled == rows(winners), "settled ledger diverges from batch winners")

    // replay: merging the full corpus again must be a no-op
    val replayed = graft.streaming.StreamOps.dedupLedgerMerge(ledger, winners)
    assert(rows(replayed) == settled, "replayed delta changed the ledger")
  }
}
