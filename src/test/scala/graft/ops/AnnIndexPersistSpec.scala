package graft.ops

import graft.SparkSpec

class AnnIndexPersistSpec extends SparkSpec {

  test("s14: serving reads the stored index, never rebuilding the quantizers") {
    import spark.implicits._
    val idx = Similarity.s14Build(spark, sf)
    // query vectors arrive in-memory (the serving-tier shape: they come
    // from the request, not the corpus) — so the serve plan must touch
    // ZERO corpus files; every FileScan is an index artifact
    val qRows = graft.Tables.load(spark, sf, "embeddings")
      .filter($"vec_id" % 47 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
      .toSeq
    val queries = qRows.toDF("q_id", "q_emb")
    val served = Similarity.s14Serve(spark, idx, queries)
    val plan = served.queryExecution.executedPlan.toString
    val corpusScans = "embeddings\\.parquet".r.findAllIn(plan).size
    assert(corpusScans == 0,
      s"serve plan scans the corpus $corpusScans times (index rebuild?)")
    // and the index artifacts are what it reads
    assert(plan.contains("s14_index"), "serve plan must scan the stored index")

    // serving is deterministic and reproduces the one-shot s09 pipeline
    val a = served.collect().toSeq
    val b = Similarity.s14Serve(spark, idx, queries).collect().toSeq
    assert(a == b, "re-serving from the same index must be byte-identical")
    val oneShot = Similarity.s09(spark, sf).collect().toSeq
    assert(a.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) ==
      oneShot.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))),
      "persisted-index serving must reproduce the one-shot IVF-PQ results")
  }
}
