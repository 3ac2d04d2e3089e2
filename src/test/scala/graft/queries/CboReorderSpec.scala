package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cost-based-optimizer surface: table statistics (ANALYZE) drive join
  * reordering. The query is written in the PESSIMAL order — (tiny ⋈
  * huge) ⋈ tiny — and CBO, fed row counts, rewrites it so the two tiny
  * relations reduce each other before the huge one joins. The spec pins
  * (a) the reorder actually happened (optimized plans differ with CBO
  * on vs off) and (b) it is semantics-preserving (identical results).
  * At 100 TB join order is routinely a 100× cost factor and no human
  * orders every generated query by hand — stats + CBO are the engine's
  * answer, and this proves the machinery is live in this build.
  */
class CboReorderSpec extends SparkSpec {

  test("ANALYZE statistics drive a semantics-preserving join reorder") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    def optimizedOrder(on: Boolean): (String, Seq[Long]) = {
      spark.conf.set("spark.sql.cbo.enabled", on.toString)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", on.toString)
      val df = spark.table("g_cbo_a")
        .join(spark.table("g_cbo_big"), "k")
        .join(spark.table("g_cbo_c"), "k")
        .groupBy($"k" % 3).agg(count(lit(1)).as("n"), sum($"payload").as("s"))
      val order = "g_cbo_(a|big|c)".r
        .findAllIn(df.queryExecution.optimizedPlan.toString).toSeq
      (order.mkString(","), df.orderBy($"n").collect()
        .flatMap(r => Seq(r.getLong(1), r.getLong(2))).toSeq)
    }
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.range(200).select($"id".as("k")).write
        .mode("overwrite").saveAsTable("g_cbo_a")
      spark.range(100000).select(($"id" % 400).as("k"), $"id".as("payload"))
        .write.mode("overwrite").saveAsTable("g_cbo_big")
      spark.range(50).select(($"id" * 4).as("k")).write
        .mode("overwrite").saveAsTable("g_cbo_c")
      Seq("g_cbo_a", "g_cbo_big", "g_cbo_c").foreach(t =>
        spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS"))
      val (orderOff, resOff) = optimizedOrder(on = false)
      val (orderOn, resOn) = optimizedOrder(on = true)
      assert(orderOn != orderOff,
        s"CBO did not reorder the join: off=$orderOff on=$orderOn")
      // the reordered plan pairs the two tiny tables below the big one
      assert(orderOn.indexOf("g_cbo_big") >
          math.max(orderOn.indexOf("g_cbo_a"), orderOn.indexOf("g_cbo_c")) ||
          orderOn.startsWith("g_cbo_a,g_cbo_c") ||
          orderOn.startsWith("g_cbo_c,g_cbo_a"),
        s"unexpected CBO order: $orderOn")
      assert(resOn == resOff, "reorder changed the results")
    } finally {
      Seq("g_cbo_a", "g_cbo_big", "g_cbo_c").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
