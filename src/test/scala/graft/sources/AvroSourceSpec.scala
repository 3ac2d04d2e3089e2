package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The first-party Avro DSv2 connector: value-exact round-trips across
  * the full type surface, sync-marker split planning (every row exactly
  * once under multi-split reads), column pruning reaching the scan, and
  * overwrite-truncate semantics.
  */
class AvroSourceSpec extends SparkSpec {

  private def tmp(name: String): String = graft.Scratch.dir(name)

  test("round-trip is value-exact across the supported type surface") {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("i", IntegerType),
      StructField("f", FloatType),
      StructField("d", DoubleType),
      StructField("b", BooleanType),
      StructField("s", StringType),
      StructField("bin", BinaryType),
      StructField("ts", TimestampType),
      StructField("dt", DateType),
      StructField("arr", ArrayType(FloatType, containsNull = false)),
      StructField("sarr", ArrayType(StringType, containsNull = true))))
    val rows = Seq(
      Row(1L, 7, 1.5f, 2.25, true, "héllo ✓", Array[Byte](0, 1, -1),
        java.sql.Timestamp.valueOf("2024-02-29 23:59:59.123456"),
        java.sql.Date.valueOf("2024-02-29"),
        Seq(1.0f, -2.5f), Seq("a", null, "c")),
      Row(2L, null, null, null, null, null, null, null, null,
        Seq(0.0f), Seq.empty[String]),
      Row(3L, -7, Float.MinValue, Double.MaxValue, false, "",
        Array.empty[Byte],
        java.sql.Timestamp.valueOf("1969-12-31 23:59:59.999999"),
        java.sql.Date.valueOf("1969-12-31"), Seq.empty[Float], null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = tmp("avro_types")
    df.write.format("gavro").mode("overwrite").save(dir)
    val back = spark.read.format("gavro").load(dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      schema.map(f => (f.name, f.dataType)))
    val a = df.orderBy("id").collect().map(normalize)
    val b = back.orderBy("id").collect().map(normalize)
    assert(a.toSeq === b.toSeq)
  }

  // Row equality on Array[Byte]/WrappedArray is referential — stringify
  private def normalize(r: Row): String =
    r.toSeq.map {
      case b: Array[Byte] => b.mkString("[", ",", "]")
      case v => String.valueOf(v)
    }.mkString("|")

  test("splits: a multi-block file reads every row exactly once") {
    import spark.implicits._
    val dir = tmp("avro_split")
    val n = 50000
    spark.range(n).select($"id", concat(lit("payload_"),
      lpad($"id".cast("string"), 12, "0")).as(("s")))
      .coalesce(1) // ONE file, many avro blocks
      .write.format("gavro").option("compression", "null")
      .mode("overwrite").save(dir)
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      // force ~dozens of splits over the single file
      spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
      val back = spark.read.format("gavro").load(dir)
      assert(back.rdd.getNumPartitions > 4,
        s"expected multi-split read, got ${back.rdd.getNumPartitions}")
      assert(back.count() === n)
      assert(back.agg(sum("id")).head.getLong(0) === n.toLong * (n - 1) / 2)
      assert(back.select("id").distinct().count() === n)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("column pruning reaches the scan; filters stay correct post-scan") {
    import spark.implicits._
    val dir = tmp("avro_prune")
    spark.range(1000)
      .select($"id", ($"id" % 7).as("k"), lit("wide_payload").as("w"))
      .write.format("gavro").mode("overwrite").save(dir)
    val q = spark.read.format("gavro").load(dir)
      .filter($"k" === 3).select("id")
    val scans = q.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).filter(_.contains("gavro ReadSchema"))
    assert(scans.nonEmpty, "expected a gavro scan leaf")
    // pruned to the two referenced columns — the wide payload is gone
    assert(scans.head.contains("id") && scans.head.contains("k"))
    assert(!scans.head.contains("w,") && !scans.head.contains(",w"))
    assert(q.count() === spark.range(1000).filter($"id" % 7 === 3).count())
  }

  test("overwrite truncates; append accumulates") {
    import spark.implicits._
    val dir = tmp("avro_modes")
    spark.range(10).write.format("gavro").mode("overwrite").save(dir)
    spark.range(10).write.format("gavro").mode("append").save(dir)
    assert(spark.read.format("gavro").load(dir).count() === 20)
    spark.range(5).write.format("gavro").mode("overwrite").save(dir)
    assert(spark.read.format("gavro").load(dir).count() === 5)
  }

  test("schema evolution: a field absent from the file reads as null") {
    import spark.implicits._
    val dir = tmp("avro_evolve")
    spark.range(3).select($"id").write.format("gavro")
      .mode("overwrite").save(dir)
    val wider = StructType(Seq(
      StructField("id", LongType),
      StructField("later_added", StringType)))
    val back = spark.read.format("gavro").schema(wider).load(dir)
    assert(back.count() === 3)
    assert(back.filter($"later_added".isNull).count() === 3)
  }

  test("unsupported types fail at plan time, on the driver") {
    import spark.implicits._
    val e = intercept[Exception] {
      spark.range(1).select(map(lit("k"), $"id").as("m"))
        .write.format("gavro").mode("overwrite").save(tmp("avro_bad"))
    }
    assert(e.getMessage.contains("unsupported"), e.getMessage)
  }

  test("TimestampNTZ round-trips via local-timestamp-micros") {
    import spark.implicits._
    val dir = tmp("avro_ntz")
    val df = spark.range(3).select($"id",
      to_timestamp_ntz(lit("2024-02-29 23:59:59.123456")).as("ntz"),
      array(to_timestamp_ntz(lit("1969-12-31 23:59:59.999999"))).as("ntz_arr"))
    df.write.format("gavro").mode("overwrite").save(dir)
    val back = spark.read.format("gavro").load(dir)
    assert(back.schema("ntz").dataType === TimestampNTZType)
    assert(back.schema("ntz_arr").dataType ===
      ArrayType(TimestampNTZType, containsNull = true))
    assert(back.orderBy("id").collect().map(normalize).toSeq ===
      df.orderBy("id").collect().map(normalize).toSeq)
  }

  test("corpus orders table (NTZ o_orderdate) round-trips value-exact") {
    import spark.implicits._
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice", $"o_orderdate")
    // the corpus' parquet is isAdjustedToUTC=0 → Spark 4 reads NTZ; this
    // is exactly the column that crashed the r11 connector at plan time
    assert(orders.schema("o_orderdate").dataType === TimestampNTZType)
    val dir = tmp("avro_orders")
    orders.write.format("gavro").mode("overwrite").save(dir)
    val back = spark.read.format("gavro").load(dir)
    assert(back.count() === orders.count())
    val a = orders.orderBy("o_orderkey").limit(50).collect().map(normalize)
    val b = back.orderBy("o_orderkey").limit(50).collect().map(normalize)
    assert(a.toSeq === b.toSeq)
  }

  test("a failed overwrite leaves the previous generation readable") {
    import spark.implicits._
    val dir = tmp("avro_abort")
    spark.range(10).write.format("gavro").mode("overwrite").save(dir)
    val boom = udf((id: Long) =>
      if (id >= 3) throw new RuntimeException("boom") else id)
    intercept[Exception] {
      spark.range(5).select(boom($"id").as("id")).coalesce(1)
        .write.format("gavro").mode("overwrite").save(dir)
    }
    // truncate is deferred to commit and staging is swept on abort:
    // the old 10 rows survive and no partial/staging files are visible
    assert(spark.read.format("gavro").load(dir).count() === 10)
    val left = new java.io.File(dir).listFiles().map(_.getName)
    assert(!left.exists(_.startsWith(".staging-")), left.mkString(","))
  }

  test("nested directory layouts read recursively, skipping _/. names") {
    import spark.implicits._
    val root = tmp("avro_nested")
    spark.range(4).write.format("gavro").mode("overwrite").save(s"$root/a")
    spark.range(6).write.format("gavro").mode("overwrite").save(s"$root/b/c")
    new java.io.File(s"$root/_hidden").mkdirs()
    spark.range(99).write.format("gavro").mode("overwrite")
      .save(s"$root/_hidden/x") // metadata-prefixed: must be invisible
    assert(spark.read.format("gavro").load(root).count() === 10)
  }
}
