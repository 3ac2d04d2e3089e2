package graft.functions

import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch: keep the k smallest
  * *distinct* hash values seen; estimate = (k−1) · 2^60 / kth_min for
  * 60-bit uniform hashes (Bar-Yossef et al., "Counting distinct elements
  * in a data stream", RANDOM 2002).
  *
  * Why it exists next to q24's HLL++: HLL sketches are engine-private
  * (approx results can't be cross-checked), while KMV over the portable
  * md5-based h60 hash (PortableSql) is fully deterministic — the same k
  * minima fall out of any engine, so the *approximate* answer itself is
  * hash-verified against the DuckDB oracle.
  *
  * Scale: state is a bounded sorted array of ≤ k longs per group —
  * partial-aggregated map-side, merged by sorted-union-trim. At 100 TB
  * this is O(groups · k · 8 bytes) of state, no shuffle of raw values.
  */
final class KmvSketch(k: Int) extends Aggregator[Long, Array[Long], Double] {
  require(k >= 2)

  override def zero: Array[Long] = Array.emptyLongArray

  /** Insert h keeping the buffer sorted, distinct, and ≤ k long. */
  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) buf // already present
    else {
      val ins = -pos - 1
      if (ins >= k) buf // larger than the current k minima
      else {
        val n = math.min(buf.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // sorted-union-trim: classic merge keeping the k smallest distinct
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    var last = Long.MinValue
    while (n < k && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (n == 0 || v != last) { out(n) = v; n += 1; last = v }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(buf: Array[Long]): Double =
    if (buf.length < k) buf.length.toDouble
    else (k - 1).toDouble * 1152921504606846976.0 /* 2^60 */ / buf(k - 1)

  override def bufferEncoder =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder = org.apache.spark.sql.Encoders.scalaDouble
}
