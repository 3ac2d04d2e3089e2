package graft.ops

import graft.SparkSpec

class AudioFingerprintSpec extends SparkSpec {

  test("m06: every snippet identifies its source track at the hidden offset") {
    val rows = Multimodal.m06(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val queries = graft.Tables.load(spark, sf, "documents")
      .filter("doc_id % 10 = 0").count()
    // exactly one surviving (track, offset) cell per query: the true
    // match — chance landmark collisions never reach the 5-vote bar
    assert(rows.length == queries, s"${rows.length} matches for $queries queries")
    rows.foreach { case (q, track, off, votes) =>
      assert(track == q, s"query $q matched foreign track $track")
      assert(off == q % 7, s"query $q: offset $off, hidden truth ${q % 7}")
      // 12-step snippet minus every 4th step leaves exactly 6
      // consecutive-pair landmarks, all voting for the true offset
      assert(votes == 6L, s"query $q: $votes votes")
    }
  }
}
