package graft.codec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared-dictionary training for the `.bro` codec.
  *
  * A prefix dictionary pays off through LONG backward references, so the
  * artifact should be contiguous real corpus text, not a bag of short
  * n-gram phrases — chopped phrases cap match length at the boundary.
  * The trainer therefore selects whole representative documents by
  * greedy weighted shingle coverage:
  *
  *   1. one Spark pass computes 3-gram shingle document frequencies and
  *      each candidate document's boilerplate mass Σ (df−1)·|shingle|;
  *   2. the top candidates (a few dozen rows) come to the driver, where
  *      a greedy max-coverage loop picks documents by marginal
  *      uncovered-shingle benefit per byte until the budget is full —
  *      the standard (1−1/e) approximation for coverage selection;
  *   3. picks are packed most-valuable LAST: encoder backward references
  *      reach the window tail cheapest, and prefix semantics make late
  *      dictionary bytes the closest ones.
  *
  * Deterministic end to end (ties break on id), so the artifact is
  * reproducible from the same sample. At 100 TB: train on a sample,
  * write the artifact next to the data, set `bro.dictionary.file`;
  * every executor reads it once (BrotliCodec caches per JVM).
  */
object BroDictionary {

  def train(df: DataFrame, textCol: String, idCol: String,
      maxBytes: Int = 64 * 1024, sampleRows: Int = 10000,
      candidates: Int = 64): Array[Byte] = {
    val spark = df.sparkSession
    import spark.implicits._
    val sample = df.orderBy(col(idCol)).limit(sampleRows)
      .select(col(idCol).cast("long").as("id"),
        col(textCol).cast("string").as("t"))
    val toks = filter(split(lower($"t"), " "), x => x =!= "")
    val sh = sample.select($"id", $"t",
      when(size(toks) >= 3,
        array_distinct(transform(sequence(lit(1), size(toks) - 2), i =>
          concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
            element_at(toks, i + 2)))))
        .otherwise(array().cast("array<string>")).as("s"))
    val dfCounts = sh.select(explode($"s").as("w"))
      .groupBy($"w").agg(count(lit(1)).as("df"))
      .filter($"df" >= 2)
    // the explode carries only (id, w) — not the document text, which
    // would otherwise ship once per shingle through the join shuffle;
    // texts re-join only for the final ≤`candidates` rows
    val topIds = sh.select($"id", explode($"s").as("w"))
      .join(dfCounts, "w")
      .groupBy($"id")
      .agg(collect_list(struct($"w", $"df")).as("ws"),
        sum(($"df" - 1) * (length($"w") + 1)).as("mass"))
      .orderBy($"mass".desc, $"id".asc)
      .limit(candidates)
    val cand = topIds
      .join(sample.withColumnRenamed("id", "sid"), $"id" === $"sid")
      .select($"id", $"t", $"ws", $"mass")
      .orderBy($"mass".desc, $"id".asc)
      .as[(Long, String, Seq[(String, Long)], Long)]
      .collect()
    // driver-side greedy max-coverage over ≤`candidates` rows
    val covered = scala.collection.mutable.Set.empty[String]
    val picks = scala.collection.mutable.ArrayBuffer.empty[String]
    var used = 0
    var continueSearch = true
    while (continueSearch) {
      var best: (Double, Long, String, Seq[String]) = null
      for ((id, t, ws, _) <- cand) {
        val bytes = t.getBytes("UTF-8").length + 1
        if (used + bytes <= maxBytes && !picks.contains(t)) {
          val fresh = ws.collect { case (w, df) if !covered(w) => (w, df) }
          val benefit = fresh.map { case (w, df) => (df - 1).toDouble * (w.length + 1) }.sum
          val density = benefit / bytes
          if (benefit > 0 &&
              (best == null || density > best._1 ||
                (density == best._1 && id < best._2)))
            best = (density, id, t, fresh.map(_._1))
        }
      }
      if (best == null) continueSearch = false
      else {
        picks += best._3
        covered ++= best._4
        used += best._3.getBytes("UTF-8").length + 1
      }
    }
    picks.reverse.mkString("\n").getBytes("UTF-8")
  }
}
