package graft.sources

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType

import graft.queries.Extras5

/** STREAMING READS FROM A GRAFT TABLE — `spark.readStream.table
  * ("graft.t")`, the Delta streaming-source shape: offsets ARE manifest
  * versions (the engine's checkpoint is the resume protocol, exactly
  * like the change feed), and each micro-batch serves the files a
  * commit ADDED — INSERT INTO appends, the streaming sink's epochs, a
  * MOR merge's delta files. Admission control is one commit per
  * micro-batch; Trigger.AvailableNow pins its ceiling at query start.
  *
  * An append-only stream cannot represent a commit that REMOVES or
  * rewrites rows (COW DELETE/UPDATE/MERGE, INSERT OVERWRITE, purge,
  * compaction, a deletion-vector republish, RESTORE): by default such
  * a commit FAILS the stream with a pointer at the change feed
  * (`graft.<t>.changes` serves the full pre/post picture) — Delta's
  * "data update detected" contract; with `skipChangeCommits=true` the
  * ENTIRE commit is skipped (its appends too — skipping half a commit
  * would be a torn read) and the stream continues with later appends.
  *
  * `startingVersion` is EXCLUSIVE like the change feed's (default 0:
  * the first batch serves v1 — a new subscriber replays the table's
  * whole history as appends, then follows).
  *
  * At 100 TB: a batch's cost ∝ the commit's appended bytes, never
  * table size; planning is O(#files) manifest metadata per transition;
  * the leaf I/O is the same vectorized columnar path as snapshot
  * reads.
  */
private[graft] class GraftTableStream(base: String, schema: StructType,
    startingVersion: Int, skipChangeCommits: Boolean,
    physicalOf: Map[String, String]) extends MicroBatchStream
    with SupportsTriggerAvailableNow {

  @volatile private var plannedAnyDv = false
  @volatile private var availableNowCap: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(Extras5.q78Latest(base))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** One commit per micro-batch (the change feed's admission rule): a
    * restart resumes at a committed version, never mid-commit. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[GraftVersionOffset].v
    val ceiling = availableNowCap.getOrElse(Extras5.q78Latest(base))
    GraftVersionOffset(math.max(s, math.min(s + 1, ceiling)))
  }

  override def initialOffset(): Offset = GraftVersionOffset(startingVersion)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-control form")

  override def deserializeOffset(json: String): Offset =
    GraftVersionOffset(json.toInt)

  override def commit(end: Offset): Unit = () // manifests are immutable

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftVersionOffset].v
    val e = end.asInstanceOf[GraftVersionOffset].v
    val planned = (s + 1 to e).flatMap { v =>
      val pre = if (v <= 1) Seq.empty[Extras5.ManifestEntry]
        else GraftChangeFeed.resolveOrRetentionError(base, v - 1)
      val post = GraftChangeFeed.resolveOrRetentionError(base, v)
      val prePaths = pre.map(_.path).toSet
      val postByPath = post.map(en => en.path -> en).toMap
      val removed = pre.filterNot(en => postByPath.contains(en.path))
      val preByPath = pre.map(en => en.path -> en).toMap
      // a re-DV'd file keeps its path but changes rows — a data change
      val redv = post.filter(en =>
        preByPath.get(en.path).exists(_.identity != en.identity))
      if (removed.nonEmpty || redv.nonEmpty) {
        if (!skipChangeCommits) throw new UnsupportedOperationException(
          s"streaming table read of $base found a non-append commit at " +
            s"v$v (${removed.size} file(s) removed/rewritten, " +
            s"${redv.size} re-DV'd): a table stream serves appends only. " +
            "Read updates/deletes through the change feed " +
            "(graft.<table>.changes), or set skipChangeCommits=true to " +
            "skip changed commits entirely")
        Seq.empty // skip the WHOLE commit — half a commit is a torn read
      } else {
        val added = post.filterNot(en => prePaths(en.path)).sortBy(_.path)
        val dvByPath = added.collect {
          case en if en.dv.isDefined => en.path -> en.dv.get
        }.toMap
        GraftParquetIO.planSplits(added.map(_.path),
          f => Map("_file" -> f), dvByPath.get)
      }
    }
    plannedAnyDv = planned.exists(_.dv.isDefined)
    planned.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftVectorizedReaderFactory(schema, Set("_file"),
      anyDv = plannedAnyDv, physicalOf = physicalOf)

  override def stop(): Unit = ()
}
