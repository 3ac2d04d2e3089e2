package graft.sources

import graft.SparkSpec
import graft.queries.Extras5
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the partition-transform contract (q108) the oracle hash cannot
  * see: one file per partition tuple per job (fan-out under the
  * clustered distribution), partition values in the MANIFEST (no
  * directory coupling), exact partition-pruned file counts through the
  * catalog scan, static and dynamic partition overwrite semantics,
  * days() transforms with range pruning, null-partition soundness, and
  * the evolution refusals on partition columns. */
class GraftPartitionSpec extends SparkSpec {
  import spark.implicits._

  private def opened(sql: String): Option[Int] =
    GraftCatalog.scannedFileCount(spark.sql(sql))

  test("identity partitioning: fan-out one file per tuple, manifest carries values, exact pruning") {
    GraftCatalog.install(spark)
    val base = graft.Scratch.dir("ptspec_id")
    val name = s"pt_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.sql(s"CREATE TABLE graft.$name (o_orderkey BIGINT, " +
      "o_orderstatus STRING, price DECIMAL(18,2)) " +
      s"PARTITIONED BY (o_orderstatus) LOCATION '$base'")
    assert(spark.table(s"graft.$name").queryExecution.analyzed.toString
      != null) // resolves
    graft.Tables.load(spark, sf, "orders")
      .filter($"o_orderkey" % 3 === 0)
      .select($"o_orderkey", $"o_orderstatus",
        $"o_totalprice".cast(DecimalType(18, 2)).as("price"))
      .createOrReplaceTempView(s"src_$name")
    spark.sql(s"INSERT INTO graft.$name SELECT * FROM src_$name")
    val statuses = spark.sql(s"SELECT DISTINCT o_orderstatus FROM src_$name")
      .as[String].collect().toSet
    val entries = Extras5.q78ResolveEntries(base, 2)
    // ONE file per tuple for the whole job, not per task
    assert(entries.size == statuses.size,
      s"expected ${statuses.size} files (one per partition), got " +
        s"${entries.map(_.path)}")
    assert(entries.map(_.partValues).toSet ==
      statuses.map(v => Map("o_orderstatus" -> v)))
    // stats still tracked alongside partition values
    assert(entries.forall(_.stats.isDefined))
    // exact pruning through the catalog scan: = opens 1, IN opens 2,
    // non-partition predicates open everything
    assert(opened(s"SELECT * FROM graft.$name WHERE o_orderstatus = 'F'")
      .contains(1))
    val two = statuses.take(2).map(v => s"'$v'").mkString(", ")
    assert(opened(
      s"SELECT * FROM graft.$name WHERE o_orderstatus IN ($two)")
      .contains(2))
    assert(opened(s"SELECT * FROM graft.$name WHERE price > 0")
      .contains(statuses.size))
    // answers stay exact (pruning is a hint, predicates stay residual)
    assert(spark.sql(s"SELECT COUNT(*) FROM graft.$name " +
      "WHERE o_orderstatus = 'F'").head().getLong(0) ==
      spark.sql(s"SELECT COUNT(*) FROM src_$name " +
        "WHERE o_orderstatus = 'F'").head().getLong(0))
    // evolution refusals: partition columns are immutable
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + msgs(t.getCause)
    Seq(s"ALTER TABLE graft.$name RENAME COLUMN o_orderstatus TO st",
      s"ALTER TABLE graft.$name DROP COLUMN o_orderstatus").foreach { ddl =>
      val e = intercept[Exception] { spark.sql(ddl) }
      assert(msgs(e).contains("partition column"), s"$ddl must refuse")
    }
  }

  test("static PARTITION overwrite replaces one slice; dynamic overwrite replaces written tuples") {
    GraftCatalog.install(spark)
    val base = graft.Scratch.dir("ptspec_ow")
    val name = s"ptow_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.sql(s"CREATE TABLE graft.$name (k BIGINT, s STRING, " +
      s"v BIGINT) PARTITIONED BY (s) LOCATION '$base'")
    spark.sql(s"INSERT INTO graft.$name VALUES " +
      "(1, 'a', 10), (2, 'b', 20), (3, 'c', 30)")
    val v2 = Extras5.q78ResolveEntries(base, 2)
    assert(v2.size == 3)
    // STATIC: INSERT OVERWRITE ... PARTITION (s='a') replaces only a
    spark.sql(s"INSERT OVERWRITE graft.$name PARTITION (s = 'a') " +
      "VALUES (9, 99)")
    val v3 = Extras5.q78ResolveEntries(base, 3)
    assert(v3.size == 3)
    val untouched = v2.filter(_.partValues("s") != "a").map(_.path).toSet
    assert(untouched.subsetOf(v3.map(_.path).toSet),
      "non-matching partitions carry byte-identical")
    assert(spark.sql(s"SELECT k, v FROM graft.$name WHERE s = 'a'")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((9L, 99L)))
    // DYNAMIC: only the tuples the job writes are replaced
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try
      spark.sql(s"INSERT OVERWRITE graft.$name VALUES (7, 'b', 70)")
    finally
      spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    val v4 = Extras5.q78ResolveEntries(base, 4)
    assert(v4.size == 3)
    val rows = spark.sql(s"SELECT s, SUM(v) FROM graft.$name GROUP BY s " +
      "ORDER BY s").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("a", 99L), ("b", 70L), ("c", 30L)),
      s"dynamic overwrite must replace only 'b', got $rows")
    // time travel across the overwrites still serves the old slices
    assert(spark.sql(s"SELECT SUM(v) FROM graft.$name VERSION AS OF 2")
      .head().getLong(0) == 60L)
  }

  test("days() transform: ordinal tuples, range pruning, boundary days kept") {
    GraftCatalog.install(spark)
    val base = graft.Scratch.dir("ptspec_days")
    val name = s"ptd_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.sql(s"CREATE TABLE graft.$name (k BIGINT, d DATE, v BIGINT) " +
      s"PARTITIONED BY (days(d)) LOCATION '$base'")
    spark.sql(s"INSERT INTO graft.$name VALUES " +
      "(1, DATE'2026-01-01', 1), (2, DATE'2026-01-02', 2), " +
      "(3, DATE'2026-01-03', 3), (4, DATE'2026-01-01', 4)")
    val entries = Extras5.q78ResolveEntries(base, 2)
    assert(entries.size == 3, "one file per day")
    assert(entries.forall(_.partValues.keySet == Set("days.d")))
    // range pruning on the source column: two of three days
    assert(opened(s"SELECT * FROM graft.$name WHERE d >= DATE'2026-01-02'")
      .contains(2))
    assert(opened(s"SELECT * FROM graft.$name WHERE d = DATE'2026-01-01'")
      .contains(1))
    assert(spark.sql(s"SELECT SUM(v) FROM graft.$name " +
      "WHERE d >= DATE'2026-01-02'").head().getLong(0) == 5L)
    // null partition values: prunable for literals, still readable
    spark.sql(s"INSERT INTO graft.$name VALUES (5, NULL, 50)")
    assert(opened(s"SELECT * FROM graft.$name WHERE d = DATE'2026-01-01'")
      .contains(1), "a null-day file never matches a literal")
    assert(spark.sql(s"SELECT v FROM graft.$name WHERE d IS NULL")
      .head().getLong(0) == 50L)
  }

  test("dynamic partition pruning: a selective dim join drops fact partitions at runtime") {
    GraftCatalog.install(spark)
    val base = graft.Scratch.dir("ptspec_dpp")
    val name = s"ptdpp_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.sql(s"CREATE TABLE graft.$name (k BIGINT, s STRING, v BIGINT) " +
      s"PARTITIONED BY (s) LOCATION '$base'")
    spark.sql(s"INSERT INTO graft.$name SELECT id, " +
      "CASE CAST(id % 4 AS INT) WHEN 0 THEN 'a' WHEN 1 THEN 'b' " +
      "WHEN 2 THEN 'c' ELSE 'd' END, id FROM range(0, 400)")
    assert(Extras5.q78ResolveEntries(base, 2).size == 4)
    // a dim whose filter selects ONE partition value at runtime
    Seq(("a", 1), ("b", 0), ("c", 0), ("d", 0)).toDF("s", "flag")
      .write.mode("overwrite").parquet(s"$base/dim")
    spark.read.parquet(s"$base/dim").createOrReplaceTempView(s"dim_$name")
    val q = spark.sql(
      s"""SELECT f.k, f.v FROM graft.$name f
         |JOIN dim_$name d ON f.s = d.s WHERE d.flag = 1""".stripMargin)
    val scan = q.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources
          .v2.DataSourceV2ScanRelation => r.scan
    }.collectFirst { case g: GraftScan => g }.get
    assert(scan.activeEntries.size == 4, "static planning keeps all four")
    val rows = q.collect()
    assert(rows.length == 100 && rows.forall(_.getLong(0) % 4 == 0))
    assert(scan.activeEntries.size == 1,
      s"the runtime IN-filter must drop the other partitions, " +
        s"kept ${scan.activeEntries.map(_.partValues)}")
  }

  test("files without tuples (MOR delta appends) are never pruned — sound by construction") {
    GraftCatalog.install(spark)
    val base = graft.Scratch.dir("ptspec_mor")
    val name = s"ptm_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.sql(s"CREATE TABLE graft.$name (k BIGINT, s STRING, " +
      s"v BIGINT) PARTITIONED BY (s) " +
      s"LOCATION '$base' TBLPROPERTIES ('graft.merge.mode' = 'merge-on-read')")
    spark.sql(s"INSERT INTO graft.$name VALUES (1, 'a', 10), (2, 'b', 20)")
    // a MATCHED clause forces the real delta-based (SupportsDelta) MOR
    // path — an insert-only MERGE is optimized to a plain append,
    // which (correctly) fans out WITH tuples
    Seq((1L, "a", 100L), (3L, "a", 30L)).toDF("dk", "ds", "dv")
      .createOrReplaceTempView(s"delta_$name")
    spark.sql(
      s"""MERGE INTO graft.$name t USING delta_$name d ON t.k = d.dk
         |WHEN MATCHED THEN UPDATE SET v = d.dv
         |WHEN NOT MATCHED THEN INSERT (k, s, v) VALUES (dk, ds, dv)"""
        .stripMargin)
    val v3 = Extras5.q78ResolveEntries(base, 3)
    val (tupled, bare) = v3.partition(_.partValues.nonEmpty)
    assert(tupled.size == 2 && bare.size == 1,
      s"MOR delta appends carry no tuple, got ${v3.map(_.partValues)}")
    assert(tupled.exists(_.dv.isDefined), "the matched file is DV'd")
    // the bare delta file is KEPT by a partition predicate (sound, 2 of
    // 3 files opened: the DV'd 'a' file + the tuple-less delta) and
    // every live 'a' row found
    assert(opened(s"SELECT * FROM graft.$name WHERE s = 'a'").contains(2),
      "partition pruning keeps the tuple-less delta file")
    assert(spark.sql(s"SELECT k, v FROM graft.$name WHERE s = 'a' ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 100L), (3L, 30L)))
    // the graft.<t>.files metadata table shows the same picture: two
    // tupled files (the DV'd 'a' base + 'b'), one partition-less delta
    val files = spark.sql(s"SELECT partition, has_dv, size_bytes " +
      s"FROM graft.$name.files ORDER BY partition NULLS LAST").collect()
    assert(files.length == 3)
    assert(files(0).getString(0) == "s=a" && files(0).getBoolean(1))
    assert(files(1).getString(0) == "s=b" && !files(1).getBoolean(1))
    assert(files(2).isNullAt(0) && !files(2).getBoolean(1))
    assert(files.forall(_.getLong(2) > 0L))
  }
}
