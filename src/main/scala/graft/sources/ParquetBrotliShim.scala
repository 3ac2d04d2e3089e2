// The package is dictated by parquet-mr, not by us: CompressionCodecName
// (parquet-hadoop 1.16.0) hardcodes the BROTLI entry's codec class as the
// string "org.apache.hadoop.io.compress.BrotliCodec" (the classname the
// abandoned jbrotli-based brotli-codec artifact used), so the ONLY way to
// serve brotli parquet pages through the stock parquet writer/reader is to
// answer to that exact FQCN. See SURVEY §4 (r12 verdict item 7 spike).
package org.apache.hadoop.io.compress

/** Parquet-side brotli: the pure-JVM graft codec published under the FQCN
  * parquet-mr's codec factory resolves for `CompressionCodecName.BROTLI`.
  *
  * With this class on the classpath,
  * `df.write.option("compression", "brotli").parquet(...)` (or
  * `spark.sql.parquet.compression.codec=brotli`) produces standard
  * BROTLI-tagged parquet pages, and Spark's vectorized reader decodes
  * them back through the same codec — closing the reference's format gap
  * (its JNI codec serves only text formats; parquet never could resolve
  * it because the reference registers as `graft...BroCodec`, reference
  * BroCodec.java:18). Page streams are raw RFC 7932 — exactly what
  * parquet's BROTLI spec expects — so files interoperate with any
  * parquet reader that bundles a brotli decoder (arrow/parquet-cpp);
  * `ParquetBrotliSpec` pins the page codec id from the file footer and
  * the round-trip, and the q90 registry entry hash-verifies contents
  * against the DuckDB oracle on the source table.
  */
class BrotliCodec extends graft.codec.BrotliCodec {
  /** parquet-mr's sanctioned quality key, `compression.brotli.quality`,
    * is also part of its codec CACHE key (CodecFactory.cacheKey —
    * alongside zlib's and zstd's level keys), so two writes at
    * different qualities get distinct codec instances instead of the
    * first binding winning process-wide. Map it onto the graft codec's
    * `bro.quality`; an explicit `bro.quality` still takes precedence. */
  override def setConf(c: org.apache.hadoop.conf.Configuration): Unit = {
    val pq = if (c == null) null else c.get("compression.brotli.quality")
    if (pq != null && c.get(graft.codec.BrotliCodec.QualityKey) == null) {
      val c2 = new org.apache.hadoop.conf.Configuration(c)
      c2.setInt(graft.codec.BrotliCodec.QualityKey, pq.trim.toInt)
      super.setConf(c2)
    } else super.setConf(c)
  }
}
