package graft.plans

import org.apache.spark.sql.DataFrame

import graft.{SparkSpec, Tables}

/** The optimizer rewrite that turns SQL's `row_number() <= k` window
  * filters into the native heap operator: fires on the idiom, leaves
  * every ineligible shape on the stock window path, and never changes
  * results (checked against the stock plan via the conf escape hatch). */
class TopKWindowRewriteSpec extends SparkSpec {

  // plan shape only — executedPlan materializes lazily without running
  // the query (a noop write here would execute a SEPARATE QueryExecution
  // and change nothing about this one)
  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def stockRows(sql: String): Set[String] = {
    // restore (not unset!) the previous value: withView pins the conf
    // to "true" around its body, and unsetting here would silently
    // disable the rewrite for every later plan() in the same test —
    // the negative assertions would pass vacuously
    val prev = spark.conf.getOption(TopKWindowRewrite.EnabledKey)
    spark.conf.set(TopKWindowRewrite.EnabledKey, "false")
    try spark.sql(sql).collect().map(_.toString).toSet
    finally prev match {
      case Some(v) => spark.conf.set(TopKWindowRewrite.EnabledKey, v)
      case None => spark.conf.unset(TopKWindowRewrite.EnabledKey)
    }
  }

  private def withView(body: => Unit): Unit = {
    GraftPlans.install(spark)
    Tables.load(spark, sf, "lineitem")
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity")
      .createOrReplaceTempView("rw_li")
    // DEFAULT ON since r12 (see TopKWindowRewrite's measured rationale);
    // pinned explicitly so these tests stay meaningful under any session
    spark.conf.set(TopKWindowRewrite.EnabledKey, "true")
    try body finally spark.conf.unset(TopKWindowRewrite.EnabledKey)
  }

  test("the rewrite is DEFAULT ON: an unset conf takes the heap path") {
    GraftPlans.install(spark)
    Tables.load(spark, sf, "lineitem")
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity")
      .createOrReplaceTempView("rw_li_dflt")
    val prev = spark.conf.getOption(TopKWindowRewrite.EnabledKey)
    spark.conf.unset(TopKWindowRewrite.EnabledKey)
    try {
      val df = spark.sql(
        """SELECT l_suppkey, rn FROM (
          |  SELECT *, row_number() OVER (PARTITION BY l_suppkey
          |    ORDER BY l_quantity DESC, l_orderkey, l_linenumber) AS rn
          |  FROM rw_li_dflt) WHERE rn <= 3""".stripMargin)
      assert(plan(df).contains("TopKPerKeyFinal"),
        s"rewrite must fire with no conf set (default-on):\n${plan(df)}")
      // and "false" remains the escape hatch to the stock plan
      spark.conf.set(TopKWindowRewrite.EnabledKey, "false")
      val off = spark.sql(
        """SELECT l_suppkey, rn FROM (
          |  SELECT *, row_number() OVER (PARTITION BY l_suppkey
          |    ORDER BY l_quantity DESC, l_orderkey, l_linenumber) AS rn
          |  FROM rw_li_dflt) WHERE rn <= 3""".stripMargin)
      assert(!plan(off).contains("TopKPerKeyFinal"),
        "conf=false must pin the stock window plan")
    } finally prev match {
      case Some(v) => spark.conf.set(TopKWindowRewrite.EnabledKey, v)
      case None => spark.conf.unset(TopKWindowRewrite.EnabledKey)
    }
  }

  test("row_number <= k rewrites to the heap operator with identical rows") {
    withView {
      val q =
        """SELECT l_suppkey, l_orderkey, l_linenumber, rn FROM (
          |  SELECT *, row_number() OVER (PARTITION BY l_suppkey
          |    ORDER BY l_quantity DESC, l_orderkey, l_linenumber) AS rn
          |  FROM rw_li) WHERE rn <= 3""".stripMargin
      val df = spark.sql(q)
      val p = plan(df)
      assert(p.contains("TopKPerKeyPartial") && p.contains("TopKPerKeyFinal"),
        s"idiom not rewritten to the heap operator:\n$p")
      assert(!p.contains("Window"), s"stock window survived the rewrite:\n$p")
      assert(df.collect().map(_.toString).toSet == stockRows(q),
        "rewritten rows differ from the stock window plan")
    }
  }

  test("residual conjuncts stay as a Filter above the heap") {
    withView {
      val q =
        """SELECT l_suppkey, rn FROM (
          |  SELECT *, row_number() OVER (PARTITION BY l_suppkey
          |    ORDER BY l_quantity DESC, l_orderkey, l_linenumber) AS rn
          |  FROM rw_li) WHERE rn <= 2 AND l_quantity > 10""".stripMargin
      val df = spark.sql(q)
      val p = plan(df)
      assert(p.contains("TopKPerKeyFinal"), s"not rewritten:\n$p")
      // the quantity predicate must still apply — compare full results
      assert(df.collect().map(_.toString).toSet == stockRows(q),
        "residual predicate lost or misapplied")
    }
  }

  test("rn = 1 (argmax idiom) rewrites; rn = 2 does not") {
    withView {
      val base =
        """SELECT l_suppkey, rn FROM (
          |  SELECT *, row_number() OVER (PARTITION BY l_suppkey
          |    ORDER BY l_quantity DESC, l_orderkey, l_linenumber) AS rn
          |  FROM rw_li) WHERE rn %s""".stripMargin
      val eq1 = spark.sql(base.format("= 1"))
      assert(plan(eq1).contains("TopKPerKeyFinal"),
        "rn = 1 should take the heap path")
      assert(eq1.collect().map(_.toString).toSet == stockRows(base.format("= 1")))
      val eq2 = spark.sql(base.format("= 2"))
      assert(!plan(eq2).contains("TopKPerKeyFinal"),
        "rn = 2 selects a row the heap cannot address alone — stock path")
    }
  }

  test("ineligible shapes keep the stock window") {
    withView {
      // rank() is not row_number (ties share ranks; the heap's dense
      // 1-based rank would change results)
      val rank = spark.sql(
        """SELECT l_suppkey, r FROM (
          |  SELECT *, rank() OVER (PARTITION BY l_suppkey
          |    ORDER BY l_quantity DESC) AS r
          |  FROM rw_li) WHERE r <= 3""".stripMargin)
      assert(!plan(rank).contains("TopKPerKeyFinal"),
        "rank() must not take the row_number heap path")
      // a second window expression needs the full partition
      val multi = spark.sql(
        """SELECT l_suppkey, rn, s FROM (
          |  SELECT *, row_number() OVER (PARTITION BY l_suppkey
          |      ORDER BY l_quantity DESC, l_orderkey, l_linenumber) AS rn,
          |    sum(l_quantity) OVER (PARTITION BY l_suppkey) AS s
          |  FROM rw_li) WHERE rn <= 3""".stripMargin)
      assert(!plan(multi).contains("TopKPerKeyFinal"),
        "multi-expression windows must keep the stock path")
      // global top-k (no partition) plans as TakeOrderedAndProject
      val global = spark.sql(
        """SELECT l_orderkey, rn FROM (
          |  SELECT *, row_number() OVER (
          |    ORDER BY l_quantity DESC, l_orderkey, l_linenumber) AS rn
          |  FROM rw_li) WHERE rn <= 3""".stripMargin)
      assert(!plan(global).contains("TopKPerKeyFinal"),
        "global top-k is TakeOrdered territory, not the keyed heap")
    }
  }
}
