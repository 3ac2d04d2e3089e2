package graft.tools

import graft.SparkSpec

/** Negative control for the oracle harness (r9 judge item 6): the
  * check.py compare must FAIL when the Spark dump and the DuckDB oracle
  * run at different scale factors. Until r10 this was per-round
  * workflow discipline; as a checked-in spec, a future oracle bug that
  * made the compare vacuously pass (empty frames, dropped hash, a
  * json.load that swallows everything) is caught by `sbt test` instead
  * of shipping a green CORRECTNESS file that checks nothing.
  *
  * Shape: dump ONE cheap query (q01) at sf0.001 in Verify's exact
  * layout (parquet files under outDir/name + oracle_sql.json), then run
  * tools/check.py against it twice — matched sf must PASS (positive
  * control: the harness itself works in this environment), mismatched
  * sf must FAIL with exit 1.
  */
class CheckNegativeControlSpec extends SparkSpec {

  private val queryName = "q01_pricing_summary"

  private def havePython: Boolean =
    try {
      val p = new ProcessBuilder("python3", "-c", "import duckdb, pandas").start()
      p.waitFor() == 0
    } catch { case _: Throwable => false }

  /** (exit code, combined output) of check.py over a fresh q01 dump. */
  private def runCheck(oracleSf: String, dumpDir: java.io.File): (Int, String) = {
    val pb = new ProcessBuilder("python3", "tools/check.py",
      oracleSf, dumpDir.getPath)
    pb.directory(new java.io.File("."))
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes())
    p.waitFor()
    (p.exitValue(), out)
  }

  private def dumpQ01(): java.io.File = {
    val dir = java.nio.file.Files.createTempDirectory("graft_negctl_").toFile
    graft.SparkEntry.queries(queryName)(spark, sf)
      .coalesce(1).write.mode("overwrite").parquet(s"${dir.getPath}/$queryName")
    val sql = graft.SparkEntry.oracleSql(queryName)
    val esc = sql.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"${dir.getPath}/oracle_sql.json"),
      s"""{"$queryName": "$esc"}""")
    dir
  }

  test("check.py fails on a mismatched sf and passes on the matched one") {
    assume(havePython, "python3+duckdb+pandas not available here")
    val dump = dumpQ01() // spark side at sf0.001
    val (okCode, okOut) = runCheck(sf, dump)
    assert(okCode == 0, s"positive control must pass:\n$okOut")
    assert(okOut.contains(s"PASS $queryName"), okOut)
    val (badCode, badOut) = runCheck("/root/testdata/sf0.01", dump)
    assert(badCode != 0, s"mismatched sf must fail:\n$badOut")
    assert(badOut.contains("FAIL") || badOut.contains("fail"), badOut)
    assert("([1-9][0-9]*) fail".r.findFirstIn(badOut).isDefined,
      s"expected >=1 FAIL in:\n$badOut")
  }
}
