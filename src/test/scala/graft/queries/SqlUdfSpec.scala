package graft.queries

import graft.SparkSpec

/** q70's Catalyst claim: SQL-defined functions INLINE into the calling
  * plan — no black-box evaluation node, and the table function's
  * parameterized `WHERE l_returnflag = flag` reaches the parquet scan
  * as a pushed-down literal filter. A Scala udf() in the same position
  * would fence both off.
  */
class SqlUdfSpec extends SparkSpec {

  test("q70's SQL UDFs inline: no UDF node, filter pushed to the scan") {
    val df = Extras4.q70(spark, sf)
    assert(df.collect().length == 6)
    val plan = df.queryExecution.executedPlan.toString()
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      "SQL function left a black-box UDF node in the plan")
    assert(plan.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,A)]"),
      s"TVF parameter filter not pushed to the scan:\n$plan")
  }
}
