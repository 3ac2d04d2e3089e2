package graft.tools
import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
object Q80Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def tm[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val base = Tables.load(spark, dir, "lineitem")
      .select($"l_partkey", $"l_suppkey",
        $"l_quantity".cast(DecimalType(18, 2)).as("qty"))
    val tiled = base.withColumn("tile", shiftright($"l_partkey", 3).cast(LongType))
    for (round <- 1 to 2) {
      val r1 = graft.Scratch.dir("q80p_a")
      tm("write default") {
        tiled.repartition($"tile").write.partitionBy("tile").parquet(r1)
      }
      val r2 = graft.Scratch.dir("q80p_b")
      tm("write small-block") {
        tiled.repartition($"tile").write
          .option("parquet.block.size", 1L << 20)
          .option("parquet.page.size", 64 * 1024)
          .partitionBy("tile").parquet(r2)
      }
      val r3 = graft.Scratch.dir("q80p_c")
      tm("write small-block nocomp nodict") {
        tiled.repartition($"tile").write
          .option("compression", "none")
          .option("parquet.block.size", 1L << 20)
          .option("parquet.page.size", 64 * 1024)
          .option("parquet.enable.dictionary", "false")
          .partitionBy("tile").parquet(r3)
      }
      tm("read-count small-block") {
        spark.read.parquet(r2).agg(count(lit(1))).collect()
      }
      tm("read-count small-block lowopencost") {
        spark.conf.set("spark.sql.files.openCostInBytes", 16 * 1024)
        try spark.read.parquet(r3).agg(count(lit(1))).collect()
        finally spark.conf.set("spark.sql.files.openCostInBytes", 4 * 1024 * 1024)
      }
    }
    spark.stop()
  }
}
