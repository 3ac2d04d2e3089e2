package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Every query in the engine takes `(spark, sfDir)` and reads parquet from
  * `sfDir` through here. At 100 TB the same code path holds: parquet scans
  * get predicate pushdown + column pruning from Catalyst, and parallelism
  * comes from file/row-group splits (parquet is splittable, unlike `.bro`
  * streams — see SURVEY.md §4.2 and the codec package).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // Some testdata generations write events.ts as TIMESTAMP(NANOS),
      // which Spark's vectorized reader rejects unless read as raw longs.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEventsTs(spark.read.parquet(s"$dir/$name.parquet"))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Normalize the events `ts` column to session-TZ TimestampType.
    *
    * The driver has generated events.parquet with three different `ts`
    * physical layouts across rounds, so the loader sniffs the schema
    * instead of hardcoding one:
    *   - TIMESTAMP(NANOS), read as raw `Long` nanos via `nanosAsLong`:
    *     integer-divide to micros (ns values exceed 2^53, so no double
    *     math) and convert.
    *   - TIMESTAMP_MICROS with isAdjustedToUTC=false, read as
    *     TIMESTAMP_NTZ: cast to TimestampType — lossless because every
    *     session in this project pins spark.sql.session.timeZone=UTC.
    *   - TimestampType already: pass through.
    * Works on batch and streaming DataFrames alike (schema-only sniff).
    */
  def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }

  /** Register the named tables as temp views (for spark.sql-based
    * queries). Callers should register only the tables their SQL
    * references: at catalog scale, eagerly loading ten tables to serve a
    * three-table query is wasted footer I/O — and a breaking layout
    * change in an unrelated table would fail the query by collateral. */
  def register(spark: SparkSession, dir: String, tables: String*): Unit =
    tables.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Register all tables as temp views. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    register(spark, dir, names: _*)
}
