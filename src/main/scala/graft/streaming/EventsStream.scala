package graft.streaming

import scala.collection.immutable.ListMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming over the events table: the same tumbling-window
  * aggregation as the batch `q19`, executed through the streaming engine
  * (file source → watermark → windowed agg → memory sink), drained
  * synchronously so the result is a deterministic DataFrame the oracle
  * can check.
  *
  * At scale this is the production shape: `readStream` over an arriving
  * directory, event-time watermark bounding state, windowed aggregation
  * state in the state store partitioned by (window, key).
  */
object EventsStream {

  private val counter = new AtomicLong(0)

  def st01(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // events.ts is parquet TIMESTAMP(NANOS): stream it as raw nanos and
    // convert (see graft.Tables.load).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    val rawSchema = spark.read.parquet(path).schema
    // the file streaming source wants a directory: stream the sf dir with
    // a glob filter selecting just the events file.
    val stream = spark.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n_events"))
    val name = s"st01_out_${counter.incrementAndGet()}"
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
      .select(date_format($"window.start", "yyyy-MM-dd HH:00:00").as("hour_bucket"),
        $"event_type", $"n_events")
      .orderBy($"hour_bucket", $"event_type")
  }

  private val st01Sql =
    """SELECT strftime(ts, '%Y-%m-%d %H:00:00') AS hour_bucket, event_type,
      |  COUNT(*) AS n_events
      |FROM events
      |GROUP BY hour_bucket, event_type
      |ORDER BY hour_bucket, event_type""".stripMargin

  /** Stateful streaming sessionization: 30-minute-gap session windows
    * per user through the streaming engine's session-window state store.
    * Append mode + watermark means only watermark-closed sessions emit —
    * the correct unbounded-stream semantics (so no batch oracle; sessions
    * still open at end-of-input are legitimately withheld). */
  def st02(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    val rawSchema = spark.read.parquet(path).schema
    val stream = spark.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
    val name = s"st02_out_${counter.incrementAndGet()}"
    val q = stream.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
      .select(date_format($"session_window.start", "yyyy-MM-dd HH:mm:ss").as("session_start"),
        $"user_id", $"n_events")
      .orderBy($"user_id", $"session_start")
  }

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "st01_stream_hourly" -> (st01 _),
    "st02_stream_sessionize" -> (st02 _))

  val oracle: ListMap[String, String] = ListMap(
    "st01_stream_hourly" -> st01Sql)
}
