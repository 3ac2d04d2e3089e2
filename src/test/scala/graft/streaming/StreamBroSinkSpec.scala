package graft.streaming

import graft.SparkSpec

/** st12's contract: the streaming foreachBatch sink really lands
  * `.bro`-compressed files, and the compressed directory holds every
  * event exactly once (the read-back row count equals the table's).
  * The per-type stats themselves are hash-checked by the DuckDB oracle;
  * this spec pins the parts the oracle can't see — the on-disk format
  * and the exactly-once file landing.
  */
class StreamBroSinkSpec extends SparkSpec {

  test("st12 lands .bro files and preserves every event exactly once") {
    import spark.implicits._
    val out = EventsStream.st12(spark, sf).collect()
    assert(out.nonEmpty, "no per-type stats emitted")
    val expected = graft.Tables.load(spark, sf, "events").count()
    assert(out.map(_.getLong(1)).sum == expected,
      s"compressed sink lost/duplicated events: ${out.map(_.getLong(1)).sum} != $expected")
    // the sink must have produced .bro-compressed part files
    val root = new java.io.File(
      sys.props("java.io.tmpdir")).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("graft_scratch_"))
    val broFiles = root.flatMap { d =>
      val sinks = d.listFiles().filter(_.getName.startsWith("st12_bro_sink"))
      sinks.flatMap(_.listFiles().filter(_.getName.endsWith(".json.bro")))
    }
    assert(broFiles.nonEmpty, "no .json.bro part files under the st12 sink dir")
  }
}
