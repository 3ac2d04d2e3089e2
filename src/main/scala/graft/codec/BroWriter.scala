package graft.codec

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Spark-side integration for the `.bro` codec.
  *
  * `.bro` streams are non-splittable (one task per file — the reference
  * shares this property: BroCodec.java:18 implements no
  * `SplittableCompressionCodec`), so the 100 TB layout rule is
  * *many medium files*: parallelism comes from file count, set at write
  * time. `writeSized` sizes the partition count from the plan's size
  * estimate so files land near the target (SURVEY.md §4.2).
  */
object BroWriter {

  val CodecClass: String = classOf[BrotliCodec].getName
  /** The splittable framed variant (`.brf`, see BroFramedCodec). */
  val FramedCodecClass: String = classOf[BroFramedCodec].getName

  /** Append our codecs (`.bro` whole-stream + `.brf` splittable framed)
    * to `io.compression.codecs` (preserving any user-configured codecs;
    * the Hadoop defaults list is used only when the key is unset);
    * `CompressionCodecFactory` then resolves both extensions on the read
    * path. */
  def register(spark: SparkSession): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    val defaults = Seq(
      "org.apache.hadoop.io.compress.DefaultCodec",
      "org.apache.hadoop.io.compress.GzipCodec",
      "org.apache.hadoop.io.compress.BZip2Codec",
      "org.apache.hadoop.io.compress.DeflateCodec",
      "org.apache.hadoop.io.compress.SnappyCodec",
      "org.apache.hadoop.io.compress.Lz4Codec")
    val cur = Option(hc.get("io.compression.codecs")).map(_.trim).filter(_.nonEmpty)
    val have = cur.map(_.split(',').map(_.trim).toSeq).getOrElse(defaults)
    val want = Seq(CodecClass, FramedCodecClass).filterNot(have.contains)
    if (want.nonEmpty)
      hc.set("io.compression.codecs", (have ++ want).mkString(","))
  }

  /** Write a DataFrame as `.bro`-compressed files of the given format
    * (`text`/`csv`/`json`), repartitioned so each file is ~targetFileBytes
    * of *input* data (the non-splittable-codec layout rule). */
  def writeSized(df: DataFrame, path: String, format: String = "csv",
      targetFileBytes: Long = 256L << 20): Unit = {
    register(df.sparkSession)
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts = math.max(1, (estBytes / BigInt(targetFileBytes)).toInt)
    df.repartition(parts).write
      .option("compression", CodecClass)
      .format(format)
      .save(path)
  }
}
