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

  test("t26 gopher rules: verdict is the conjunction of its own columns") {
    import spark.implicits._
    val rows = TextOps.t26(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val recomputed =
        r.getLong(1) >= 50 && r.getLong(1) <= 100000 &&
          r.getDouble(2) >= 3.0 && r.getDouble(2) <= 10.0 &&
          r.getDouble(3) <= 0.1 && r.getDouble(4) >= 0.8 &&
          r.getLong(5) >= 2 &&
          r.getDouble(6) <= 0.9 && r.getDouble(7) <= 0.3
      assert(r.getBoolean(8) == recomputed, s"doc ${r.getLong(0)}")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
    // the ruleset must actually filter (not vacuously pass/fail all)
    val passes = rows.count(_.getBoolean(8))
    assert(passes > 0 && passes < rows.length,
      s"gopher rules passed $passes of ${rows.length} — no discrimination")
  }

  test("t19 vocab stats: counts nest and shares are consistent with t01") {
    import spark.implicits._
    val rows = TextOps.t19(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTok, nVocab, nHapax) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nHapax <= nVocab && nVocab <= nTok, s"${r.getString(0)}: nesting")
      assert(r.getDouble(4) > 0 && r.getDouble(4) <= 1.0, "type_token_ratio")
      assert(r.getLong(7) >= 1 && r.getLong(7) <= nTok, "top_cnt")
      assert(r.getDouble(8) == r.getLong(7).toDouble / nTok, "top_share")
    }
    // token mass must reconcile with the per-doc counter (t01)
    val t01Total = TextOps.t01(spark, sf)
      .agg(sum($"n_tokens")).as[Long].head()
    assert(rows.map(_.getLong(1)).sum == t01Total,
      "per-source token mass != per-doc token mass")
  }

  test("t20 bigram LM: every multi-token doc scores with n_tokens-1 bigrams") {
    import spark.implicits._
    val t20 = TextOps.t20(spark, sf).collect()
    val nTok = TextOps.t01(spark, sf)
      .select($"doc_id", $"n_tokens").as[(Long, Int)].collect().toMap
    assert(t20.nonEmpty && t20.exists(_.getLong(1) > 0))
    t20.foreach { r =>
      val id = r.getLong(0)
      val expected = math.max(nTok(id) - 1, 0)
      assert(r.getLong(1) == expected, s"doc $id: ${r.getLong(1)} bigrams, " +
        s"expected $expected from ${nTok(id)} tokens")
      val (avg, mn) = (r.getDouble(2), r.getDouble(3))
      if (r.getLong(1) > 0) {
        assert(mn > 0 && mn <= avg && avg <= 1.0,
          s"doc $id: min=$mn avg=$avg out of range — p(b|a) is a " +
            "count ratio in (0,1]")
      } else assert(avg == 0.0 && mn == 0.0)
    }
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
