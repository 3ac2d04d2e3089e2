package graft.queries

import scala.collection.immutable.ListMap
import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
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
    val tmp = Files.createTempDirectory("graft_bro_").toString + "/lineitem_csv"
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

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "q22_bro_roundtrip" -> (q22 _))

  val oracle: ListMap[String, String] = ListMap(
    "q22_bro_roundtrip" -> q22Sql)
}
