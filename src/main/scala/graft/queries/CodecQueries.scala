package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Scratch, Tables}
import graft.codec.BroWriter

/** The codec exercised inside the correctness gate: lineitem flows
  * parquet → `.bro` CSV (our encoder) → back through our decoder → an
  * exact aggregate that must equal the same aggregate DuckDB computes on
  * the original parquet. Proves write path, extension-based codec
  * resolution, read path, and schema-on-read in one oracle-checked query.
  */
object CodecQueries {

  def q22(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    BroWriter.register(spark)
    val tmp = Scratch.dir("lineitem_csv")
    val li = Tables.load(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice",
        $"l_returnflag")
    li.write.option("compression", BroWriter.CodecClass)
      .option("header", "false")
      .csv(tmp)
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType),
      StructField("l_returnflag", StringType)))
    val back = spark.read.schema(schema).csv(tmp)
    back.groupBy($"l_returnflag")
      .agg(
        sum($"l_quantity".cast(DecimalType(18, 2))).cast(DoubleType).as("sum_qty"),
        sum($"l_extendedprice".cast(DecimalType(18, 2))).cast(DoubleType).as("sum_price"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag")
  }

  private val q22Sql =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------------
  // q38: JSON-lines over `.bro` — the second text-based source format
  // through the codec (reference semantics: the codec is transparent
  // under ANY Hadoop text format). Doubles survive the JSON round-trip
  // exactly (shortest-round-trip repr), so min/max are oracle-exact.
  // ---------------------------------------------------------------------
  def q38(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    BroWriter.register(spark)
    val tmp = Scratch.dir("events_json")
    val ev = Tables.load(spark, dir, "events")
      .select($"event_id", $"user_id", $"event_type", $"value")
    ev.write.option("compression", BroWriter.CodecClass).json(tmp)
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val back = spark.read.schema(schema).json(tmp)
    back.groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        min($"value").as("min_value"),
        max($"value").as("max_value"),
        countDistinct($"user_id").as("n_users"))
      .orderBy($"event_type")
  }

  private val q38Sql =
    """SELECT event_type,
      |  COUNT(*) AS n_events,
      |  MIN(value) AS min_value,
      |  MAX(value) AS max_value,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q41: plain-text lines over `.bro` — the reference's original use
  // case (TextInputFormat payloads, SURVEY §1.1). Lines round-trip
  // through our encoder/decoder; the hash-checksum aggregate proves
  // byte-exact content, not just counts.
  // ---------------------------------------------------------------------
  def q41(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    BroWriter.register(spark)
    val tmp = Scratch.dir("docs_text")
    Tables.load(spark, dir, "documents")
      .select($"text")
      .write.option("compression", BroWriter.CodecClass).text(tmp)
    val lines = spark.read.textFile(tmp)
    lines.toDF("line")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(length($"line")).as("total_chars"),
        sum(pmod(graft.ops.PortableSql.h60($"line"), lit(1000000007L)))
          .as("content_checksum"))
  }

  private def q41Sql = {
    val h = graft.ops.PortableSql.h60Sql("text")
    s"""SELECT COUNT(*) AS n_lines,
       |  CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       |  CAST(SUM($h % 1000000007) AS BIGINT) AS content_checksum
       |FROM documents""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q44: dictionary-compressed `.bro` round-trip — the reference's sole
  // TODO (README.md:4-5), reachable from Spark: `bro.dictionary.file`
  // names a shared dictionary on any Hadoop FS; every stream written and
  // read under that conf is prefix-dictionary compressed. The dictionary
  // is the shipped trainer's artifact (greedy shingle-coverage document
  // selection, BroDictionary.train — deterministic, so the oracle stays
  // reproducible). Oracle = the same content checksum DuckDB computes on
  // the original table, so any dictionary-path corruption breaks the
  // hash match.
  // ---------------------------------------------------------------------
  def q44(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    BroWriter.register(spark)
    val docs = Tables.load(spark, dir, "documents")
    val dictBytes =
      graft.codec.BroDictionary.train(docs, "text", "doc_id", maxBytes = 16 * 1024)
    val dictPath = java.nio.file.Paths.get(graft.Scratch.dir("bro_dict") + ".bin")
    java.nio.file.Files.createDirectories(dictPath.getParent)
    java.nio.file.Files.write(dictPath, dictBytes)
    // the dictionary conf is global Hadoop state: scope it to exactly
    // this query's write+read jobs (materialized eagerly), so other
    // `.bro` queries' lazily-executed reads never see a dictionary their
    // files weren't written with
    val hc = spark.sparkContext.hadoopConfiguration
    val prevDict = hc.get(graft.codec.BrotliCodec.DictionaryFileKey)
    hc.set(graft.codec.BrotliCodec.DictionaryFileKey, dictPath.toString)
    try {
      val tmp = Scratch.dir("docs_text_dict")
      docs.select($"text")
        .write.option("compression", BroWriter.CodecClass).text(tmp)
      val row = spark.read.textFile(tmp).toDF("line")
        .agg(
          count(lit(1)).as("n_lines"),
          sum(length($"line")).as("total_chars"),
          sum(pmod(graft.ops.PortableSql.h60($"line"), lit(1000000007L)))
            .as("content_checksum"))
        .head()
      Seq((row.getLong(0), row.getLong(1), row.getLong(2)))
        .toDF("n_lines", "total_chars", "content_checksum")
    } finally {
      // restore, don't clobber: the session may have its own dictionary
      if (prevDict == null) hc.unset(graft.codec.BrotliCodec.DictionaryFileKey)
      else hc.set(graft.codec.BrotliCodec.DictionaryFileKey, prevDict)
    }
  }

  // ---------------------------------------------------------------------
  // q46: SPLITTABLE framed codec (`.brf`, BroFramedCodec) — the
  // capability the reference lacks entirely (BroCodec.java:18 implements
  // no SplittableCompressionCodec; SURVEY §4.2 calls non-splittability
  // the defining 100 TB constraint). lineitem is written as ONE `.brf`
  // file, read back through Hadoop's SplittableCompressionCodec path
  // with split thresholds forced small, and the query REQUIRES the scan
  // to produce multiple splits — a splitting regression fails the
  // correctness gate, not just a spec. The aggregate (same contract as
  // q22) is computed through that multi-split scan and hash-checked
  // against DuckDB on the original parquet, so a boundary bug that
  // loses or duplicates a line breaks the oracle hash.
  //
  // Conf scoping follows q44: frame size and split thresholds are
  // session/Hadoop state, so the write+read are materialized eagerly
  // inside the scope and restored in `finally`.
  // ---------------------------------------------------------------------
  def q46(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    BroWriter.register(spark)
    val hc = spark.sparkContext.hadoopConfiguration
    val prevFrame = hc.get(graft.codec.BroFramed.FrameSizeKey)
    hc.setInt(graft.codec.BroFramed.FrameSizeKey, 8 * 1024)
    val prevMax = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    val prevOpen = spark.conf.getOption("spark.sql.files.openCostInBytes")
    try {
      val tmp = Scratch.dir("lineitem_brf")
      val li = Tables.load(spark, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice",
          $"l_returnflag")
      li.coalesce(1).write.option("compression", BroWriter.FramedCodecClass)
        .option("header", "false")
        .csv(tmp)
      spark.conf.set("spark.sql.files.maxPartitionBytes", (8 * 1024).toString)
      spark.conf.set("spark.sql.files.openCostInBytes", "1024")
      val schema = StructType(Seq(
        StructField("l_orderkey", LongType),
        StructField("l_linenumber", IntegerType),
        StructField("l_quantity", DoubleType),
        StructField("l_extendedprice", DoubleType),
        StructField("l_returnflag", StringType)))
      val back = spark.read.schema(schema).csv(tmp)
      val nSplits = back.rdd.getNumPartitions
      require(nSplits > 1,
        s"one .brf file must scan as multiple splits, got $nSplits")
      val rows = back.groupBy($"l_returnflag")
        .agg(
          sum($"l_quantity".cast(DecimalType(18, 2))).cast(DoubleType).as("sum_qty"),
          sum($"l_extendedprice".cast(DecimalType(18, 2))).cast(DoubleType).as("sum_price"),
          count(lit(1)).as("n_rows"))
        .orderBy($"l_returnflag")
        .collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      rows.toSeq.toDF("l_returnflag", "sum_qty", "sum_price", "n_rows")
    } finally {
      if (prevFrame == null) hc.unset(graft.codec.BroFramed.FrameSizeKey)
      else hc.set(graft.codec.BroFramed.FrameSizeKey, prevFrame)
      prevMax match {
        case Some(v) => spark.conf.set("spark.sql.files.maxPartitionBytes", v)
        case None => spark.conf.unset("spark.sql.files.maxPartitionBytes")
      }
      prevOpen match {
        case Some(v) => spark.conf.set("spark.sql.files.openCostInBytes", v)
        case None => spark.conf.unset("spark.sql.files.openCostInBytes")
      }
    }
  }

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "q22_bro_roundtrip" -> (q22 _),
    "q38_json_bro" -> (q38 _),
    "q41_text_bro" -> (q41 _),
    "q44_dict_bro" -> (q44 _),
    "q46_splittable_bro" -> (q46 _))

  val oracle: ListMap[String, String] = ListMap(
    "q22_bro_roundtrip" -> q22Sql,
    "q38_json_bro" -> q38Sql,
    "q41_text_bro" -> q41Sql,
    "q44_dict_bro" -> q41Sql, // same content contract as q41
    "q46_splittable_bro" -> q22Sql) // same aggregate contract as q22
}
