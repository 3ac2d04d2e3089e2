package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic: determine empirically which UNMATCHED purchases emit
  * their null-click row by the end of a drained left-outer
  * stream-stream join (st13's oracle needs the exact watermark cutoff
  * predicate). Prints, per SF: total purchases, matched rows, streamed
  * null rows, and the min/max p_ts of streamed nulls vs candidate
  * cutoffs (maxTs - 1h, - 2h).
  */
object St13Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("st13-diag")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val out = graft.streaming.EventsStream.st13Raw(spark, sf)
      val ev = graft.Tables.load(spark, sf, "events")
      val maxTs = ev.agg(max($"ts")).head().getTimestamp(0)
      val nulls = out.filter($"click_id".isNull)
      val nullBounds = nulls.agg(min($"p_ts"), max($"p_ts")).head()
      val purchases = ev.filter($"event_type" === "purchase")
      // batch truth: unmatched purchases (no click in the preceding hour)
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id".as("c_user"), $"ts".as("c_ts"))
      val unmatched = purchases.join(clicks,
          $"user_id" === $"c_user" &&
            $"c_ts" >= $"ts" - expr("INTERVAL 1 HOUR") && $"c_ts" < $"ts",
          "left_anti")
      val unmatchedCount = unmatched.count()
      // the watermark is computed per FILTERED input: W = min side-max - 1h
      val maxP = purchases.agg(max($"ts")).head().getTimestamp(0)
      val maxC = ev.filter($"event_type" === "click")
        .agg(max($"ts")).head().getTimestamp(0)
      val w = if (maxP.before(maxC)) maxP else maxC
      val cutW = unmatched.filter($"ts" < lit(w) - expr("INTERVAL 1 HOUR")).count()
      val cutWe = unmatched.filter($"ts" <= lit(w) - expr("INTERVAL 1 HOUR")).count()
      val cutW2 = unmatched.filter($"ts" < lit(w) - expr("INTERVAL 2 HOUR")).count()
      println(s"[st13diag] $sf maxTs=$maxTs maxP=$maxP maxC=$maxC " +
        s"purchases=${purchases.count()} " +
        s"matched=${out.filter($"click_id".isNotNull).count()} " +
        s"streamedNulls=${nulls.count()} nullPtsBounds=$nullBounds " +
        s"unmatchedBatch=$unmatchedCount cutW<=${cutWe} cutW<${cutW} cutW2<${cutW2}")
    }
    spark.stop()
  }
}
