package graft

class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has a registry function; oracle keys are a subset") {
    val q = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(q))
  }

  test("registry matches the checked-in manifest (no silent coverage loss)") {
    // The ratchet is the manifest FILE (src/test/resources/
    // registry_manifest.txt), not a hardcoded count: every verified
    // entry is named, so a rename or drop is reported by name, and
    // landing a new operator means adding its name here — the manifest
    // updates alongside the verification artifacts (r7 ADVICE).
    val manifest = scala.io.Source.fromInputStream(
        getClass.getResourceAsStream("/registry_manifest.txt"))
      .getLines().map(_.trim).filter(_.nonEmpty).toSeq
    assert(manifest.size >= 118, "manifest itself shrank below the r7 floor")
    val reg = SparkEntry.queries.keySet
    val lost = manifest.filterNot(reg)
    assert(lost.isEmpty, s"registry lost manifest entries: ${lost.mkString(", ")}")
    val unlisted = reg -- manifest
    assert(unlisted.isEmpty,
      s"registry entries missing from the manifest (add them): ${unlisted.mkString(", ")}")
  }

  test("every bench headline and ops name is a registry entry") {
    // Bench reports -1 and silently excludes unknown names from the
    // total (Bench.scala), so a renamed query would shrink the measured
    // gate unnoticed — cross-check every benched name here instead.
    val reg = SparkEntry.queries.keySet
    val missing = (Bench.headline ++ Bench.opNames).filterNot(reg)
    assert(missing.isEmpty, s"bench names not in registry: ${missing.mkString(", ")}")
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
