package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants of the newest text ops — properties the DuckDB
  * oracle's hash equality can't state directly.
  */
class TextOpsPropertySpec extends SparkSpec {

  test("t12 redaction: counts follow the injection pattern and scrubbed text is PII-free") {
    import spark.implicits._
    val out = TextOps.t12(spark, sf).collect()
    // the injector adds exactly one email iff doc_id % 3 == 0 and one
    // phone iff doc_id % 5 == 0 (the corpus itself carries none)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (if (id % 3 == 0) 1 else 0),
        s"doc $id: email count ${r.getInt(1)}")
      assert(r.getInt(2) == (if (id % 5 == 0) 1 else 0),
        s"doc $id: phone count ${r.getInt(2)}")
    }
    // and the test is not vacuous: the injection really planted PII
    assert(out.map(r => r.getInt(1) + r.getInt(2)).sum > 0,
      "injection produced no PII — the scrub verified nothing")
  }

  test("t13 count-min: estimate is never below the exact count") {
    import spark.implicits._
    val rows = TextOps.t13(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2),
        s"token ${r.getString(0)}: est ${r.getLong(1)} < exact ${r.getLong(2)} " +
          "— count-min can only overestimate")
    }
  }
}
