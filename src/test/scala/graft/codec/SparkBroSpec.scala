package graft.codec

import java.nio.file.Files

import graft.SparkSpec

/** Spark-level integration: `.bro` files written by `df.write` are read
  * back transparently by extension (the reference's whole deployment
  * story, SURVEY.md §3.3). */
class SparkBroSpec extends SparkSpec {

  test("df.write csv + .bro → spark.read csv round-trips content") {
    import spark.implicits._
    BroWriter.register(spark)
    val dir = Files.createTempDirectory("bro_spark_").toString + "/t"
    val df = graft.Tables.load(spark, sf, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    df.write.option("compression", BroWriter.CodecClass).csv(dir)
    val files = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".bro"))
    assert(files.nonEmpty, "output files must carry the .bro extension")
    val back = spark.read
      .schema("o_orderkey LONG, o_orderstatus STRING, o_totalprice DOUBLE")
      .csv(dir)
    assert(back.count() == df.count())
    val a = df.orderBy($"o_orderkey").collect().map(_.toString)
    val b = back.orderBy($"o_orderkey").collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("sc.textFile reads .bro written by saveAsTextFile path (json)") {
    import spark.implicits._
    BroWriter.register(spark)
    val dir = Files.createTempDirectory("bro_spark_").toString + "/j"
    val df = graft.Tables.load(spark, sf, "nation")
    df.write.option("compression", BroWriter.CodecClass).json(dir)
    val back = spark.read.json(dir)
    assert(back.count() == 25)
    assert(back.columns.sorted.sameElements(df.columns.sorted))
  }

  test("writeSized produces at least one file and round-trips") {
    import spark.implicits._
    val dir = Files.createTempDirectory("bro_spark_").toString + "/s"
    val df = graft.Tables.load(spark, sf, "region")
    BroWriter.writeSized(df, dir, "json")
    val back = spark.read.json(dir)
    assert(back.count() == 5)
  }

  test("BroDictionary.train beats a naive corpus-head dictionary on ratio") {
    import spark.implicits._
    import graft.brotli.Brotli
    val budget = 4 * 1024
    val docs = graft.Tables.load(spark, sf, "documents")
    val trained = BroDictionary.train(docs, "text", "doc_id", maxBytes = budget)
    assert(trained.nonEmpty && trained.length <= budget)
    // deterministic: same inputs → byte-identical artifact
    val again = BroDictionary.train(docs, "text", "doc_id", maxBytes = budget)
    assert(java.util.Arrays.equals(trained, again))
    // equal-budget baseline: the corpus head truncated to the same bytes
    val naive = docs.orderBy($"doc_id").limit(20).select($"text")
      .as[String].collect().mkString("\n").getBytes("UTF-8").take(budget)
    // compress held-out documents (beyond the head) with each dictionary
    val payload = docs.orderBy($"doc_id".desc).limit(100).select($"text")
      .as[String].collect().mkString("\n").getBytes("UTF-8")
    val withTrained = Brotli.compress(payload, 6, trained).length
    val withNaive = Brotli.compress(payload, 6, naive).length
    val without = Brotli.compress(payload, 6).length
    assert(withTrained < without,
      s"trained dictionary must help: $withTrained vs $without")
    assert(withTrained <= withNaive,
      s"trained ($withTrained) should beat corpus-head ($withNaive)")
    // and round-trips
    assert(java.util.Arrays.equals(
      Brotli.decompress(Brotli.compress(payload, 6, trained), trained), payload))
  }

  test("bro.dictionary.file conf compresses and reads with a shared dictionary") {
    import spark.implicits._
    BroWriter.register(spark)
    val hc = spark.sparkContext.hadoopConfiguration
    // text with heavy shared boilerplate the dictionary captures
    val lines = (0 until 500)
      .map(i => s"common preamble for every record in this corpus; id=$i")
    val df = lines.toDF("line")
    val dict = Files.createTempDirectory("bro_dict_").resolve("d.bin")
    Files.write(dict, lines.take(3).mkString("\n").getBytes)
    val plainDir = Files.createTempDirectory("bro_spark_").toString + "/p"
    df.write.option("compression", BroWriter.CodecClass).text(plainDir)
    val dictDir = Files.createTempDirectory("bro_spark_").toString + "/d"
    hc.set(BrotliCodec.DictionaryFileKey, dict.toString)
    try {
      df.write.option("compression", BroWriter.CodecClass).text(dictDir)
      val expected = lines.sorted.mkString("\n")
      val back = spark.read.textFile(dictDir).collect().sorted.mkString("\n")
      assert(back == expected)
      // reading dictionary-compressed files WITHOUT the conf must not
      // silently yield the same content (the dictionary participates)
      hc.unset(BrotliCodec.DictionaryFileKey)
      val wrong = try spark.read.textFile(dictDir).collect().sorted.mkString("\n")
        catch { case _: Exception => "" }
      assert(wrong != expected,
        "dictionary-compressed files decoded identically without the dictionary")
    } finally hc.unset(BrotliCodec.DictionaryFileKey)
    def dirSize(d: String): Long =
      new java.io.File(d).listFiles.filter(_.getName.endsWith(".bro")).map(_.length).sum
    assert(dirSize(dictDir) < dirSize(plainDir),
      s"dictionary output ${dirSize(dictDir)} not smaller than plain ${dirSize(plainDir)}")
  }
}
