package graft.tools
import org.apache.spark.sql.SparkSession
private[graft] object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .appName("audit").config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (name <- Seq("q88_merge_cow_mor", "q89_compact_commit",
        "q91_vacuum_expire", "q92_change_feed", "s15_nprobe_sweep",
        "t24_bpe_train", "t25_bpe_apply", "st21_stream_cdc_merge")) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      def c(s: String) = s.r.findAllIn(plan).length
      println(s"[audit] $name bnlj=${c("BroadcastNestedLoop")} cart=${c("CartesianProduct")} " +
        s"bhj=${c("BroadcastHashJoin")} smj=${c("SortMergeJoin")} exch=${c("Exchange")}")
    }
    spark.stop()
  }
}
