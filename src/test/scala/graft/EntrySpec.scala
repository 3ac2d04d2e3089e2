package graft

class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has a registry function; oracle keys are a subset") {
    val q = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(q))
  }

  test("registry never shrinks below the round-7 inventory") {
    // Guard against silent coverage loss: 118 entries were registered and
    // verified as of round 7; any drop below that is a regression, not a
    // refactor. Raise the floor when new operators land.
    assert(SparkEntry.queries.size >= 118,
      s"registry shrank: ${SparkEntry.queries.size} < 118 entries")
  }

  test("all queries run on sf0.001 (smoke; all failures reported together)") {
    // One environment change (e.g. regenerated testdata with a different
    // parquet layout) can break many entries at once — collect every
    // failure so the report names all broken queries in one run instead
    // of stopping at the first.
    val failures = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      try { fn(spark, sf).count(); None }
      catch { case e: Exception =>
        Some(s"$name: ${e.toString.linesIterator.next()}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} registry entries fail on sf0.001:\n${failures.mkString("\n")}")
  }
}
