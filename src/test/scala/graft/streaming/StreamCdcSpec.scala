package graft.streaming

import graft.SparkSpec
import graft.queries.{Extras5, Extras6}
import org.apache.spark.sql.functions._

/** Pins st21's CDC-apply contract:
  *  - the STREAMED apply (one COW merge commit per micro-batch, file-
  *    to-batch assignment engine-chosen) produces exactly the same final
  *    table as a ONE-SHOT batch merge of the whole feed — upserts and
  *    deletes over unique keys commute across batches;
  *  - every intermediate version is a complete, readable snapshot and
  *    v1 is untouched (time travel through a CDC stream's history);
  *  - commit count = micro-batch count (4 feed files, maxFilesPerTrigger=1).
  */
class StreamCdcSpec extends SparkSpec {
  import spark.implicits._

  private def feed = {
    import org.apache.spark.sql.types.DecimalType
    graft.Tables.load(spark, sf, "orders")
      .filter($"o_orderkey" % 7 <= 1)
      .select($"o_orderkey".as("d_key"),
        when($"o_orderstatus" === "F", "D").otherwise("U").as("d_op"),
        $"o_orderstatus".as("d_status"),
        ($"o_totalprice".cast(DecimalType(18, 2)) + 50)
          .cast(DecimalType(18, 2)).as("d_price"))
  }

  test("st21 streamed CDC equals a one-shot merge of the whole feed") {
    val (base, nCommits, feedFiles) = EventsStream.st21Run(spark, sf)
    assert(nCommits == feedFiles, "one commit per feed file")
    val streamed = spark.read.parquet(
      Extras5.q78Resolve(base, (1 + nCommits).toInt): _*)

    val oneBase = Extras6.cdcBase(spark, sf)
    Extras6.cowMergeCommit(spark, oneBase, 1, feed)
    val oneShot = spark.read.parquet(Extras5.q78Resolve(oneBase, 2): _*)

    assert(streamed.count() == oneShot.count())
    assert(streamed.exceptAll(oneShot).isEmpty && oneShot.exceptAll(streamed).isEmpty)

    // every intermediate version resolves and reads completely
    for (v <- 1 to (1 + nCommits).toInt) {
      val files = Extras5.q78Resolve(base, v)
      assert(files.nonEmpty)
      assert(spark.read.parquet(files: _*).count() > 0)
    }
    // v1 unchanged: only keys ≡ 0 (mod 3), original prices
    val v1 = spark.read.parquet(Extras5.q78Resolve(base, 1): _*)
    assert(v1.filter($"o_orderkey" % 3 =!= 0).count() == 0)
    // the stream actually changed the table
    assert(v1.exceptAll(streamed).count() > 0)
  }
}
