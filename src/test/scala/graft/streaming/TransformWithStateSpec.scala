package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** st14's contracts the DuckDB oracle can't see:
  * - the run is genuinely MULTI-batch (the MapState accumulates across
  *   micro-batches rather than seeing all input at once);
  * - each re-emission of a user's profile carries a strictly larger
  *   n_events (the property the settle step's argmax relies on);
  * - the RocksDB provider conf is scoped to the query and restored,
  *   so later streaming queries in the same session are untouched.
  */
class TransformWithStateSpec extends SparkSpec {

  test("st14 accumulates MapState across micro-batches and settles to the batch truth") {
    import spark.implicits._
    val before = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    val raw = EventsStream.st14Raw(spark, sf).cache()
    try {
      val perUser = raw.groupBy($"user_id")
        .agg(count(lit(1)).as("emissions"),
          count_distinct($"n_events").as("distinct_totals"))
        .collect()
      assert(perUser.exists(_.getLong(1) > 1),
        "no user emitted more than once — the run was not multi-batch")
      // strictly-increasing totals: every emission of a user has a
      // distinct n_events, so emissions == distinct_totals per user
      perUser.foreach { r =>
        assert(r.getLong(1) == r.getLong(2),
          s"user ${r.getLong(0)}: repeated n_events across emissions")
      }
      // settled rows equal the batch aggregation computed in Spark
      val settled = raw
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"user_id").orderBy($"n_events".desc)))
        .filter($"rn" === 1).drop("rn")
      val batch = graft.Tables.load(spark, sf, "events")
        .groupBy($"user_id").agg(count(lit(1)).as("n_events"))
      val joined = settled.join(batch.withColumnRenamed("n_events", "b_n"),
        Seq("user_id"), "full_outer")
      assert(joined.filter($"n_events".isNull || $"b_n".isNull ||
        $"n_events" =!= $"b_n").count() == 0,
        "settled totals diverge from the batch aggregation")
      assert(spark.conf.getOption(
        "spark.sql.streaming.stateStore.providerClass") == before,
        "state store provider conf leaked out of st14")
    } finally raw.unpersist()
  }
}
