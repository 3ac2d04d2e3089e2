package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev diagnostic for the row_number()<=k rewrite decision (r11 advice
  * item 6): measures the SQL top-k idiom with the rewrite OFF (stock
  * sort + WindowGroupLimit) vs ON (native heap operator) on the two
  * shapes that disagree — the LOW rows-per-key shape that made the
  * rewrite opt-in (lineitem top-3/supplier: ~60 rows/key at sf0.1, and
  * orders top-3/customer: ~10 rows/key) and a HIGH rows-per-key ANN-ish
  * shape (events per (user % 64): thousands of rows/key).
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.TopKDiag'
  */
object TopKDiag {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("topk-diag")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftPlans.install(spark)

    val sf01 = "/root/testdata/sf0.1"
    graft.Tables.load(spark, sf01, "lineitem").createOrReplaceTempView("li")
    graft.Tables.load(spark, sf01, "orders").createOrReplaceTempView("ord")
    graft.Tables.load(spark, sf01, "events").createOrReplaceTempView("ev")

    val shapes = Seq(
      "li_top3_per_supp (~60/key)" ->
        """SELECT * FROM (
          |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
          |    row_number() OVER (PARTITION BY l_suppkey
          |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
          |  FROM li) WHERE rn <= 3""".stripMargin,
      "ord_top3_per_cust (~10/key)" ->
        """SELECT * FROM (
          |  SELECT o_custkey, o_orderkey, o_totalprice,
          |    row_number() OVER (PARTITION BY o_custkey
          |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
          |  FROM ord) WHERE rn <= 3""".stripMargin,
      "ev_top5_per_user (~100/key)" ->
        """SELECT * FROM (
          |  SELECT user_id, event_id, value,
          |    row_number() OVER (PARTITION BY user_id
          |      ORDER BY value DESC, event_id) AS rn
          |  FROM ev) WHERE rn <= 5""".stripMargin)

    for ((label, sql) <- shapes; mode <- Seq("off", "on")) {
      spark.conf.set(graft.plans.TopKWindowRewrite.EnabledKey,
        if (mode == "on") "true" else "false")
      // warm-up + plan check
      val df = spark.sql(sql)
      df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.executedPlan.toString
      val native = plan.contains("TopKPerKeyFinal")
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        spark.sql(sql).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[topkdiag] $label rewrite=$mode native=$native " +
        f"times=${times.map(t => f"$t%.3f").mkString(",")} median=${times.sorted.apply(2)}%.3f")
    }
    spark.stop()
  }
}
