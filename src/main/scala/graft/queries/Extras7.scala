package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.sources.GraftDv

/** Round-15 queries: merge-on-read DELETE via positional deletion
  * vectors, DV purge (OPTIMIZE), TIMESTAMP AS OF time travel, and
  * RESTORE — the remaining Delta/Iceberg lifecycle verbs on the q78
  * manifest protocol.
  *
  * q96 — DELETE via DELETION VECTORS: where q88/q93 delete rows by
  * rewriting every touched file (copy-on-write), a DV delete touches NO
  * data file: it computes the matching rows' (file, position) pairs,
  * writes one tiny sidecar per file listing the dead ordinals, and
  * republishes the manifest with each entry's `dv` field set. Write
  * cost is O(matched rows) — at 100 TB, deleting a few rows scattered
  * across ten thousand 128 MB files costs kilobytes of sidecar instead
  * of a terabyte-scale rewrite. Readers (the graft catalog's vectorized
  * scan) subtract the positions at scan time; purge (q96's v4) rewrites
  * the DV'd files without the dead rows and restores the fully columnar
  * read path — exactly Delta's DV lifecycle.
  *
  * q97 — TIMESTAMP AS OF: every commit records a `#ts` header (epoch
  * millis) inside the atomically-published manifest; resolution picks
  * the latest version committed at or before the requested timestamp
  * (the Delta/Iceberg rule) and then reads exactly like VERSION AS OF.
  *
  * q98 — RESTORE: rolling a table back to version N is just one more
  * commit whose entry list is N's — nothing is deleted, so the rolled-
  * back-over versions stay readable (time travel across the restore),
  * and the restore itself is O(#files) metadata.
  */
object Extras7 {

  private val D2 = DecimalType(18, 2)

  private def parts(dir: String): Seq[String] =
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath).toSeq.sorted

  /** `_metadata.file_path` is a `file:` URI; manifest entries are plain
    * absolute paths — normalize executor-side (pure function). */
  private[queries] def dropScheme(p: String): String =
    if (p.startsWith("file:")) new java.net.URI(p).getPath else p

  // ---------------------------------------------------------------------
  // DELETE via deletion vectors (merge-on-read), with optimistic
  // concurrency.
  // ---------------------------------------------------------------------

  /** Matching rows' (file, position) pairs under `predicate`, with each
    * file's EXISTING deletion vector subtracted (already-dead rows must
    * not be re-listed). Fully distributed: Spark's parquet scan provides
    * `_metadata.row_index` (file-global ordinals — the same ordinals
    * GraftDvRowReader skips by), and old DVs explode to (file, pos)
    * executor-side. */
  private def matchedPositions(spark: SparkSession,
      entries: Seq[Extras5.ManifestEntry],
      predicate: Column): DataFrame = {
    import spark.implicits._
    val raw = spark.read.parquet(entries.map(_.path): _*)
      .filter(predicate)
      .select(
        expr("regexp_replace(_metadata.file_path, '^file:/*', '/')").as("file"),
        col("_metadata.row_index").as("pos"))
    val withDv = entries.collect { case e if e.dv.isDefined => (e.path, e.dv.get) }
    if (withDv.isEmpty) raw
    else {
      val old = spark.createDataset(withDv)
        .flatMap { case (f, d) => GraftDv.read(d).map(p => (f, p)) }
        .toDF("file", "pos")
      raw.join(old, Seq("file", "pos"), "left_anti")
    }
  }

  /** MERGE-ON-READ DELETE: commits deletion-vector sidecars for every
    * file holding a row matching `predicate` — no data file is read into
    * a rewrite, none is touched. Optimistic concurrency: the commit
    * rebases over concurrent commits that left every touched file's
    * (path, dv) identity intact (disjoint writers, appends — the
    * WriteSerializable allowance: the delete applies to the snapshot's
    * rows); a winner that rewrote or re-DV'd a touched file invalidates
    * the computed positions, so the whole delete recomputes against the
    * new snapshot. Returns the committed version (or the current one if
    * nothing matched — an empty delete is a no-op, not a commit). */
  private[graft] def deleteMorOcc(spark: SparkSession, base: String,
      predicate: Column, tsMillis: Option[Long] = None,
      maxAttempts: Int = 10): Int = {
    import spark.implicits._
    val headers = tsMillis.map(t => "ts" -> t.toString).toSeq
    var attempts = 0
    while (attempts < maxAttempts) {
      attempts += 1
      val from = Extras5.q78Latest(base)
      val entries = Extras5.q78ResolveEntries(base, from)
      if (entries.isEmpty) return from // empty table: nothing to delete
      val oldDvByPath = entries.collect {
        case e if e.dv.isDefined => (e.path, e.dv.get)
      }.toMap
      val dvDir = s"$base/dv"
      // one task per touched file: sort fresh ordinals, union the old
      // sidecar, write the merged DV (positions per file are bounded by
      // the file's row count — a 128 MB file's worst case is a few MB)
      val newDvs: Map[String, String] = matchedPositions(spark, entries, predicate)
        .as[(String, Long)]
        .groupByKey(_._1)
        .mapGroups { (file, it) =>
          val fresh = it.map(_._2).toArray
          val old = oldDvByPath.get(file).map(GraftDv.read)
            .getOrElse(Array.empty[Long])
          val merged = (fresh ++ old).distinct.sorted
          val dvPath = s"$dvDir/${java.util.UUID.randomUUID().toString.take(12)}.gdv"
          GraftDv.write(dvPath, merged)
          (file, dvPath)
        }.collect().toMap // O(#touched files) driver metadata
      if (newDvs.isEmpty) return from
      val touched = entries.filter(e => newDvs.contains(e.path))
      // CAS loop: rebase while every touched identity is stable
      var stable = true
      while (stable && attempts < maxAttempts) {
        val now = Extras5.q78Latest(base)
        val cur = Extras5.q78ResolveEntries(base, now)
        val curByPath = cur.map(e => e.path -> e).toMap
        stable = touched.forall(e =>
          curByPath.get(e.path).exists(_.identity == e.identity))
        if (stable) {
          val updated = cur.map(e =>
            newDvs.get(e.path).fold(e)(d => e.copy(dv = Some(d))))
          if (Extras5.q78TryCommitEntries(base, now + 1, updated, headers))
            return now + 1
          attempts += 1 // lost the CAS: re-check identities and retry
        }
      }
      // a touched file was rewritten or re-DV'd: the computed positions
      // are stale — drop the written sidecars and redo from scratch
      newDvs.values.foreach(p =>
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(p)))
    }
    throw new IllegalStateException(
      s"deleteMorOcc: gave up after $maxAttempts attempts on $base")
  }

  /** PURGE (OPTIMIZE on DV'd files): rewrites every file carrying a
    * deletion vector without its dead rows, drops the DVs, and commits
    * — restoring the fully columnar read path for those files. Like
    * compaction (q89), purge is optional maintenance: on conflict with
    * a data writer it ABANDONS (deletes its output, returns None)
    * rather than fight. Returns the committed version, or Some(current)
    * when there was nothing to purge. */
  private[graft] def purgeDv(spark: SparkSession, base: String,
      statsColumn: Option[String] = None, tsMillis: Option[Long] = None,
      maxAttempts: Int = 10): Option[Int] = {
    import spark.implicits._
    val headers = tsMillis.map(t => "ts" -> t.toString).toSeq
    val from = Extras5.q78Latest(base)
    val entries = Extras5.q78ResolveEntries(base, from)
    val dvd = entries.filter(_.dv.isDefined)
    if (dvd.isEmpty) return Some(from)
    val outDir = s"$base/files-purge-${java.util.UUID.randomUUID().toString.take(8)}"
    val dvPairs = spark.createDataset(dvd.map(e => (e.path, e.dv.get)))
      .flatMap { case (f, d) => GraftDv.read(d).map(p => (f, p)) }
      .toDF("file", "pos")
    // live rows = DV'd files minus their dead ordinals; coalesce keeps
    // one output per input file without a shuffle
    spark.read.parquet(dvd.map(_.path): _*)
      .withColumn("file",
        expr("regexp_replace(_metadata.file_path, '^file:/*', '/')"))
      .withColumn("pos", col("_metadata.row_index"))
      .join(dvPairs, Seq("file", "pos"), "left_anti")
      .drop("file", "pos")
      .coalesce(dvd.size)
      .write.parquet(outDir)
    val outputs = parts(outDir)
    val stats = statsColumn.map(Extras5.parquetKeyStats(outputs, _))
      .getOrElse(Map.empty)
    val newEntries = outputs.map(f => Extras5.ManifestEntry(f, stats.get(f)))
    val dvdIds = dvd.map(_.identity).toSet
    var attempts = 0
    while (attempts < maxAttempts) {
      attempts += 1
      val now = Extras5.q78Latest(base)
      val cur = Extras5.q78ResolveEntries(base, now)
      if (!dvdIds.subsetOf(cur.map(_.identity).toSet)) {
        // a data writer touched an input (rewrite or new DV): yield
        Extras6.deleteRecursively(outDir)
        return None
      }
      val dvdPaths = dvd.map(_.path).toSet
      val carried = cur.filterNot(e => dvdPaths(e.path))
      if (Extras5.q78TryCommitEntries(base, now + 1,
          carried ++ newEntries, headers))
        return Some(now + 1)
    }
    Extras6.deleteRecursively(outDir)
    None
  }

  /** RESTORE to `toVersion`: one more commit whose entry list is the
    * old version's — no file is deleted or rewritten, so every version
    * (including those being rolled back over) stays readable. Appends
    * never conflict; the CAS just rebases the version number. */
  private[graft] def restoreVersion(base: String, toVersion: Int,
      tsMillis: Option[Long] = None, maxAttempts: Int = 10): Int = {
    val entries = Extras5.q78ResolveEntries(base, toVersion)
    val headers = tsMillis.map(t => "ts" -> t.toString).toSeq ++
      Seq("restore" -> toVersion.toString)
    var attempts = 0
    while (attempts < maxAttempts) {
      attempts += 1
      val now = Extras5.q78Latest(base)
      if (Extras5.q78TryCommitEntries(base, now + 1, entries, headers))
        return now + 1
    }
    throw new IllegalStateException(
      s"restoreVersion: gave up after $maxAttempts attempts on $base")
  }

  // ---------------------------------------------------------------------
  // q96: DELETE VIA DELETION VECTORS + PURGE, read through the catalog.
  //   v1: orders keys ≡ 0 (mod 3), 8 range-partitioned files with key
  //       stats (the q93 shape).
  //   v2: MOR delete of 'F'-status even keys — sidecars only, every
  //       data file byte-identical after the commit.
  //   v3: second MOR delete ('O'-status keys ≡ 15 mod 30) — merges
  //       positions into the existing sidecars (DV union, not replace).
  //   v4: purge — DV'd files rewritten without dead rows, DVs dropped.
  // All four versions read side by side through SQL VERSION AS OF via
  // the graft catalog: v2/v3 exercise the DV-subtracting read path,
  // v4 must equal v3 row-for-row (purge is layout maintenance — the
  // invariant the hash pins). Extras7Spec pins the file-level contract
  // (v2/v3 data files identical to v1's, sidecar counts, purge
  // restores columnar splits, conflict identity under COW).
  // ---------------------------------------------------------------------

  private[queries] def q96Build(spark: SparkSession, dir: String): String = {
    import spark.implicits._
    val base = graft.Scratch.dir("q96_table")
    Tables.load(spark, dir, "orders")
      .filter($"o_orderkey" % 3 === 0)
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice".cast(D2).as("price"))
      .repartitionByRange(8, $"o_orderkey")
      .write.parquet(s"$base/files-v1")
    val v1 = parts(s"$base/files-v1")
    val v1Stats = Extras5.parquetKeyStats(v1, "o_orderkey")
    Extras5.q78CommitEntries(base, 1,
      v1.map(f => Extras5.ManifestEntry(f, v1Stats.get(f))))
    deleteMorOcc(spark, base,
      col("o_orderstatus") === "F" && col("o_orderkey") % 2 === 0)
    deleteMorOcc(spark, base,
      col("o_orderstatus") === "O" && col("o_orderkey") % 30 === 15)
    purgeDv(spark, base, statsColumn = Some("o_orderkey"))
    base
  }

  def q96(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.sources.GraftCatalog.install(spark)
    val base = q96Build(spark, dir)
    val name = s"dv_${java.util.UUID.randomUUID().toString.take(8)}"
    graft.sources.GraftCatalog.register(name, base)
    def agg(v: Int, label: String): DataFrame =
      spark.sql(s"SELECT * FROM graft.$name VERSION AS OF $v")
        .agg(count(lit(1)).as("n_rows"),
          count(when($"o_orderstatus" === "F", 1)).as("n_f_status"),
          sum($"price").cast(DoubleType).as("sum_price"))
        .withColumn("snapshot", lit(label))
    agg(1, "1_full")
      .unionByName(agg(2, "2_dv_delete"))
      .unionByName(agg(3, "3_dv_merged"))
      .unionByName(agg(4, "4_purged"))
      .select($"snapshot", $"n_rows", $"n_f_status", $"sum_price")
      .orderBy($"snapshot")
  }

  private val q96Sql =
    """WITH v1 AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS s,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS p
      |  FROM orders WHERE o_orderkey % 3 = 0),
      |v2 AS (SELECT k, s, p FROM v1 WHERE NOT (s = 'F' AND k % 2 = 0)),
      |v3 AS (SELECT k, s, p FROM v2 WHERE NOT (s = 'O' AND k % 30 = 15)),
      |snaps AS (
      |  SELECT '1_full' AS snapshot, s, p FROM v1
      |  UNION ALL SELECT '2_dv_delete', s, p FROM v2
      |  UNION ALL SELECT '3_dv_merged', s, p FROM v3
      |  UNION ALL SELECT '4_purged', s, p FROM v3)
      |SELECT snapshot, COUNT(*) AS n_rows,
      |  COUNT(*) FILTER (s = 'F') AS n_f_status,
      |  CAST(SUM(p) AS DOUBLE) AS sum_price
      |FROM snaps GROUP BY snapshot ORDER BY snapshot""".stripMargin

  // ---------------------------------------------------------------------
  // q97: TIMESTAMP AS OF — three commits at controlled `#ts` headers
  // (fixed instants, so the fixture is deterministic), read back by
  // timestamp through the catalog: a timestamp between commits resolves
  // DOWN to the version current at that moment (the Delta/Iceberg
  // rule); a timestamp at/after the last commit reads the latest. The
  // literal is rendered in the session's own time zone, so the query is
  // TZ-config-independent. VERSION AS OF 2 rides along labeled
  // identically to its timestamp twin — the hash pins that both
  // addressing modes hit the same snapshot.
  // ---------------------------------------------------------------------

  /** 2026-03-01T00:00:00Z + `h` hours, epoch millis. */
  private def q97Ts(h: Int): Long =
    java.time.Instant.parse("2026-03-01T00:00:00Z")
      .plus(java.time.Duration.ofHours(h.toLong)).toEpochMilli

  /** Renders epoch millis as a TIMESTAMP literal in the session's time
    * zone — what SQL `TIMESTAMP AS OF '<literal>'` parses back to the
    * same instant regardless of spark.sql.session.timeZone. */
  private def tsLiteral(spark: SparkSession, millis: Long): String = {
    val zone = java.time.ZoneId.of(
      spark.conf.get("spark.sql.session.timeZone"))
    java.time.Instant.ofEpochMilli(millis).atZone(zone).toLocalDateTime
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
  }

  private[queries] def q97Build(spark: SparkSession, dir: String): String = {
    import spark.implicits._
    val base = graft.Scratch.dir("q97_table")
    val orders = Tables.load(spark, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice".cast(D2).as("price"))
    def slice(m: Int, out: String): Seq[String] = {
      orders.filter($"o_orderkey" % 3 === m).write.parquet(s"$base/$out")
      parts(s"$base/$out")
    }
    val f1 = slice(0, "files-v1")
    Extras5.q78TryCommitEntries(base, 1, f1.map(Extras5.ManifestEntry(_)),
      Seq("ts" -> q97Ts(0).toString))
    val f2 = slice(1, "files-v2")
    Extras5.q78TryCommitEntries(base, 2, (f1 ++ f2).map(Extras5.ManifestEntry(_)),
      Seq("ts" -> q97Ts(2).toString))
    val f3 = slice(2, "files-v3")
    Extras5.q78TryCommitEntries(base, 3,
      (f1 ++ f2 ++ f3).map(Extras5.ManifestEntry(_)),
      Seq("ts" -> q97Ts(4).toString))
    base
  }

  def q97(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.sources.GraftCatalog.install(spark)
    val base = q97Build(spark, dir)
    val name = s"tt_${java.util.UUID.randomUUID().toString.take(8)}"
    graft.sources.GraftCatalog.register(name, base)
    def aggSql(fromClause: String, label: String): DataFrame =
      spark.sql(s"SELECT * FROM graft.$name $fromClause")
        .agg(count(lit(1)).as("n_rows"),
          sum($"price").cast(DoubleType).as("sum_price"))
        .withColumn("read_as", lit(label))
    def atHour(h: Int, label: String): DataFrame =
      aggSql(s"TIMESTAMP AS OF '${tsLiteral(spark, q97Ts(h))}'", label)
    atHour(0, "1_at_commit1")
      .unionByName(atHour(1, "2_between_1_2"))
      .unionByName(atHour(2, "3_at_commit2"))
      .unionByName(aggSql("VERSION AS OF 2", "4_version2"))
      .unionByName(atHour(9, "5_after_last"))
      .select($"read_as", $"n_rows", $"sum_price")
      .orderBy($"read_as")
  }

  private val q97Sql =
    """WITH src AS (
      |  SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(18,2)) AS p
      |  FROM orders),
      |snaps AS (
      |  SELECT '1_at_commit1' AS read_as, p FROM src WHERE k % 3 = 0
      |  UNION ALL SELECT '2_between_1_2', p FROM src WHERE k % 3 = 0
      |  UNION ALL SELECT '3_at_commit2', p FROM src WHERE k % 3 IN (0, 1)
      |  UNION ALL SELECT '4_version2', p FROM src WHERE k % 3 IN (0, 1)
      |  UNION ALL SELECT '5_after_last', p FROM src)
      |SELECT read_as, COUNT(*) AS n_rows, CAST(SUM(p) AS DOUBLE) AS sum_price
      |FROM snaps GROUP BY read_as ORDER BY read_as""".stripMargin

  // ---------------------------------------------------------------------
  // q98: RESTORE — v1 load, v2 append, v3 = restore to v1 (a commit
  // whose entry list is v1's). The result reads v1/v2/v3 plus the
  // LATEST side by side: latest ≡ v1 (the rollback took), and v2 is
  // STILL readable after the restore (nothing was deleted — rolling
  // back is one more manifest, not history surgery). At 100 TB a
  // restore is O(#files) metadata, instant regardless of table size.
  // ---------------------------------------------------------------------

  private[queries] def q98Build(spark: SparkSession, dir: String): String = {
    import spark.implicits._
    val base = graft.Scratch.dir("q98_table")
    val orders = Tables.load(spark, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice".cast(D2).as("price"))
    orders.filter($"o_orderkey" % 3 === 0).write.parquet(s"$base/files-v1")
    val f1 = parts(s"$base/files-v1")
    Extras5.q78Commit(base, 1, f1)
    orders.filter($"o_orderkey" % 3 === 1).write.parquet(s"$base/files-v2")
    Extras5.q78Commit(base, 2, f1 ++ parts(s"$base/files-v2"))
    restoreVersion(base, 1)
    base
  }

  def q98(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.sources.GraftCatalog.install(spark)
    val base = q98Build(spark, dir)
    val name = s"rs_${java.util.UUID.randomUUID().toString.take(8)}"
    graft.sources.GraftCatalog.register(name, base)
    def agg(fromClause: String, label: String): DataFrame =
      spark.sql(s"SELECT * FROM graft.$name $fromClause")
        .agg(count(lit(1)).as("n_rows"),
          sum($"price").cast(DoubleType).as("sum_price"))
        .withColumn("read_as", lit(label))
    agg("VERSION AS OF 1", "1_v1")
      .unionByName(agg("VERSION AS OF 2", "2_v2_appended"))
      .unionByName(agg("VERSION AS OF 3", "3_v3_restored"))
      .unionByName(agg("", "4_latest"))
      .select($"read_as", $"n_rows", $"sum_price")
      .orderBy($"read_as")
  }

  private val q98Sql =
    """WITH src AS (
      |  SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(18,2)) AS p
      |  FROM orders),
      |snaps AS (
      |  SELECT '1_v1' AS read_as, p FROM src WHERE k % 3 = 0
      |  UNION ALL SELECT '2_v2_appended', p FROM src WHERE k % 3 IN (0, 1)
      |  UNION ALL SELECT '3_v3_restored', p FROM src WHERE k % 3 = 0
      |  UNION ALL SELECT '4_latest', p FROM src WHERE k % 3 = 0)
      |SELECT read_as, COUNT(*) AS n_rows, CAST(SUM(p) AS DOUBLE) AS sum_price
      |FROM snaps GROUP BY read_as ORDER BY read_as""".stripMargin

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "q96_delete_dv" -> (q96 _),
    "q97_timestamp_as_of" -> (q97 _),
    "q98_restore_version" -> (q98 _))

  val oracle: ListMap[String, String] = ListMap(
    "q96_delete_dv" -> q96Sql,
    "q97_timestamp_as_of" -> q97Sql,
    "q98_restore_version" -> q98Sql)
}
