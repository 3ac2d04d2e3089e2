package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the parquet-brotli shim (r12 verdict item 7): writing with
  * `compression=brotli` must produce pages actually TAGGED brotli in
  * the parquet footer (not a silent fallback), the file must round-trip
  * through Spark's vectorized reader, and brotli must beat uncompressed
  * on size for compressible data.
  */
class ParquetBrotliSpec extends SparkSpec {
  import spark.implicits._

  test("brotli parquet: footer codec id, round-trip, compression") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text", $"n_chars")
    val out = graft.Scratch.dir("pq_brotli")
    docs.write.option("compression", "brotli").parquet(out)

    // footer says BROTLI (read via parquet-mr, not our own writer state)
    val part = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .head
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(part.getAbsolutePath),
      spark.sessionState.newHadoopConf())
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    val codecs =
      try reader.getFooter.getBlocks.get(0).getColumns.asInstanceOf[java.util.List[
        org.apache.parquet.hadoop.metadata.ColumnChunkMetaData]]
        .toArray.map(_.asInstanceOf[
          org.apache.parquet.hadoop.metadata.ColumnChunkMetaData].getCodec.name()).toSet
      finally reader.close()
    assert(codecs == Set("BROTLI"), s"expected all-BROTLI chunks, got $codecs")

    // round-trip row-identical
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    assert(docs.exceptAll(back).isEmpty && back.exceptAll(docs).isEmpty)

    // smaller than uncompressed (text is compressible)
    val raw = graft.Scratch.dir("pq_raw")
    docs.write.option("compression", "uncompressed").parquet(raw)
    def bytes(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    assert(bytes(out) < bytes(raw),
      s"brotli ${bytes(out)} B not smaller than uncompressed ${bytes(raw)} B")
  }

  test("brotli parquet honors parquet-mr's compression.brotli.quality key") {
    // the parquet-sanctioned key participates in CodecFactory's codec
    // CACHE key, so per-write qualities actually take effect (a codec
    // cached at first use would otherwise bind the quality process-wide)
    val docs = graft.Tables.load(spark, sf, "documents").select($"doc_id", $"text")
    def writeAt(q: Int): Long = {
      val out = graft.Scratch.dir(s"pq_brotli_q$q")
      spark.sparkContext.hadoopConfiguration
        .setInt("compression.brotli.quality", q)
      try docs.coalesce(1).write.option("compression", "brotli").parquet(out)
      finally spark.sparkContext.hadoopConfiguration
        .unset("compression.brotli.quality")
      new java.io.File(out).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    }
    val (q1, q9) = (writeAt(1), writeAt(9))
    assert(q9 < q1, s"q9 ($q9 B) should compress tighter than q1 ($q1 B)")
  }
}
