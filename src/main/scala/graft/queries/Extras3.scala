package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.ops.PortableSql

/** Third relational batch (round 6): the remaining scale-critical scan
  * and maintenance surfaces — statistics-only scans (parquet aggregate
  * pushdown), time-series gap filling with forward-fill, and SCD2
  * merge (the batch CDC/upsert pattern). Same exactness rules as
  * Relational.scala: decimal casts for money sums, portable window
  * formulations, total ORDER BY everywhere.
  */
object Extras3 {

  private val D2 = DecimalType(18, 2)

  // ---------------------------------------------------------------------
  // q53: parquet AGGREGATE pushdown — the "don't scan at all" path.
  // MIN/MAX/COUNT over an unfiltered parquet table are answered from
  // footer statistics (row-group min/max + row counts), so at 100 TB
  // the query reads ~KB of metadata per file instead of the table. The
  // DSv2 parquet reader performs the rewrite when
  // spark.sql.parquet.aggregatePushdown is on; the scan's
  // PushedAggregation list is asserted in PlanSpec. Pushdown-eligible
  // aggregates only: MIN/MAX on long/int/double columns (timestamps and
  // strings are excluded by Spark because parquet stat semantics for
  // them are unsafe) and COUNT — which is exactly the class of query
  // that is metadata-answerable. Oracle = the same aggregates computed
  // by DuckDB from the data; pushdown must never change results.
  // ---------------------------------------------------------------------
  private[graft] val q53Confs = Seq(
    // the v1 parquet path has no aggregate pushdown; scope the read to
    // DSv2 (where the rewrite lives) for this statistics-only query
    "spark.sql.sources.useV1SourceList" -> "",
    "spark.sql.parquet.aggregatePushdown" -> "true")

  private[graft] def q53Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("l_partkey")).as("n_partkeys"),
        min(col("l_orderkey")).as("min_orderkey"),
        max(col("l_orderkey")).as("max_orderkey"),
        min(col("l_linenumber")).as("min_linenumber"),
        max(col("l_linenumber")).as("max_linenumber"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"))

  def q53(spark: SparkSession, dir: String): DataFrame = {
    // Plans only see confs set at creation time, so materialize inside
    // the scope and restore after (q47's pattern). One row collected.
    val prev = q53Confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    q53Confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = q53Agg(spark, dir)
      spark.createDataFrame(
        spark.sparkContext.parallelize(df.collect().toIndexedSeq, 1),
        df.schema)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private val q53Sql =
    """SELECT COUNT(*) AS n_rows, COUNT(l_partkey) AS n_partkeys,
      |  MIN(l_orderkey) AS min_orderkey, MAX(l_orderkey) AS max_orderkey,
      |  MIN(l_linenumber) AS min_linenumber, MAX(l_linenumber) AS max_linenumber,
      |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
      |FROM lineitem""".stripMargin

  // ---------------------------------------------------------------------
  // q54: time-series GAP FILL + forward fill — the resample operator
  // every monitoring/feature pipeline needs: hourly buckets that have no
  // events must still appear (count 0), and a sampled metric carries the
  // last observed value forward. The hour grid is generated with
  // sequence()+explode from the global [min,max] hour — its size depends
  // on the TIME SPAN, not the data volume, so at 100 TB the grid is
  // still ~1e4 rows/type while the event agg keeps partial-agg + one
  // shuffle. The fill window partitions by event_type over the grid
  // (bounded rows/partition). Forward fill is last(ignoreNulls) on the
  // Spark side; the oracle uses the portable grouped-fill formulation
  // (cumulative COUNT of observations defines fill groups, MAX within
  // group fills) — identical semantics, pure ANSI SQL.
  // ---------------------------------------------------------------------
  def q54(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.load(spark, dir, "events")
      .select($"event_type", date_trunc("hour", $"ts").as("h"), $"value")
    val agg = ev.groupBy($"event_type", $"h")
      .agg(count(lit(1)).as("n"), max($"value").as("mx"))
    val hours = ev.agg(min($"h").as("tmin"), max($"h").as("tmax"))
      .select(explode(sequence($"tmin", $"tmax",
        expr("interval 1 hour"))).as("h"))
    val grid = ev.select($"event_type").distinct().crossJoin(hours)
    val fillW = Window.partitionBy($"event_type").orderBy($"h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(agg, Seq("event_type", "h"), "left")
      .select($"event_type",
        date_format($"h", "yyyy-MM-dd HH:00:00").as("hour_bucket"),
        coalesce($"n", lit(0L)).as("n_events"),
        last($"mx", ignoreNulls = true).over(fillW).as("obs_max"))
      .orderBy($"event_type", $"hour_bucket")
  }

  private val q54Sql =
    """WITH b AS (
      |  SELECT min(date_trunc('hour', ts)) AS tmin,
      |         max(date_trunc('hour', ts)) AS tmax FROM events),
      |hours AS (
      |  SELECT unnest(generate_series(tmin, tmax, INTERVAL 1 HOUR)) AS h
      |  FROM b),
      |grid AS (
      |  SELECT event_type, h
      |  FROM (SELECT DISTINCT event_type FROM events) CROSS JOIN hours),
      |agg AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h,
      |         COUNT(*) AS n, MAX(value) AS mx
      |  FROM events GROUP BY 1, 2),
      |j AS (
      |  SELECT g.event_type, g.h, COALESCE(a.n, 0) AS n_events, a.mx,
      |         COUNT(a.mx) OVER (PARTITION BY g.event_type ORDER BY g.h
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      |  FROM grid g LEFT JOIN agg a
      |    ON g.event_type = a.event_type AND g.h = a.h)
      |SELECT event_type, strftime(h, '%Y-%m-%d %H:00:00') AS hour_bucket,
      |  n_events, MAX(mx) OVER (PARTITION BY event_type, grp) AS obs_max
      |FROM j
      |ORDER BY event_type, hour_bucket""".stripMargin

  // ---------------------------------------------------------------------
  // q55: SCD2 MERGE — the slowly-changing-dimension upsert every
  // warehouse maintains: a delta of changed rows closes the current
  // version (valid_to = effective date) and opens a new one, while
  // untouched rows pass through. Spark-first shape: ONE left join of
  // the dimension against the (much smaller, pre-aggregated) delta —
  // broadcast at real scale — then explode() emits 1 row (untouched)
  // or 2 rows (close + reopen) per input row. No second join, no
  // anti-join branch, single pass over the dimension; this is the
  // MERGE INTO execution shape (Delta/Iceberg) expressed on plain
  // DataFrames. Delta here: customers who ordered in 1995H1 get their
  // balance bumped by their ordered total, effective at their last
  // order date. Oracle spells the same result as 3-branch UNION ALL.
  // ---------------------------------------------------------------------
  def q55(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val baseFrom = lit("1990-01-01").cast(DateType)
    val nullDate = lit(null).cast(DateType)
    val bal = $"c_acctbal".cast(D2)
    val upd = Tables.load(spark, dir, "orders")
      .filter($"o_orderdate" >= lit("1995-01-01").cast(TimestampType) &&
        $"o_orderdate" < lit("1995-07-01").cast(TimestampType))
      .groupBy($"o_custkey")
      .agg(max($"o_orderdate".cast(DateType)).as("eff_date"),
        sum($"o_totalprice".cast(D2)).as("ordered"))
    Tables.load(spark, dir, "customer")
      .join(upd, $"c_custkey" === $"o_custkey", "left")
      .select($"c_custkey", $"c_name",
        explode(when($"o_custkey".isNull,
          array(struct(
            bal.cast(DoubleType).as("acctbal"),
            baseFrom.as("valid_from"),
            nullDate.as("valid_to"),
            lit(true).as("is_current"))))
        .otherwise(array(
          struct(
            bal.cast(DoubleType).as("acctbal"),
            baseFrom.as("valid_from"),
            $"eff_date".as("valid_to"),
            lit(false).as("is_current")),
          struct(
            (bal + $"ordered").cast(DoubleType).as("acctbal"),
            $"eff_date".as("valid_from"),
            nullDate.as("valid_to"),
            lit(true).as("is_current"))))).as("v"))
      .select($"c_custkey", $"c_name", $"v.acctbal",
        // dates as formatted strings: both engines emit identical bytes
        // (q19/q39 convention), and NULL valid_to stays NULL
        date_format($"v.valid_from", "yyyy-MM-dd").as("valid_from"),
        date_format($"v.valid_to", "yyyy-MM-dd").as("valid_to"),
        $"v.is_current")
      .orderBy($"c_custkey", $"valid_from")
  }

  private val q55Sql =
    """WITH upd AS (
      |  SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) AS eff_date,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS ordered
      |  FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      |    AND o_orderdate < TIMESTAMP '1995-07-01'
      |  GROUP BY o_custkey)
      |SELECT c_custkey, c_name,
      |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal,
      |  '1990-01-01' AS valid_from,
      |  strftime(u.eff_date, '%Y-%m-%d') AS valid_to,
      |  FALSE AS is_current
      |FROM customer c JOIN upd u ON c.c_custkey = u.o_custkey
      |UNION ALL
      |SELECT c_custkey, c_name,
      |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) + u.ordered AS DOUBLE),
      |  strftime(u.eff_date, '%Y-%m-%d'), NULL, TRUE
      |FROM customer c JOIN upd u ON c.c_custkey = u.o_custkey
      |UNION ALL
      |SELECT c_custkey, c_name,
      |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE),
      |  '1990-01-01', NULL, TRUE
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.o_custkey = c.c_custkey)
      |ORDER BY c_custkey, valid_from""".stripMargin

  // ---------------------------------------------------------------------
  // q56: selective-aggregate suite — MAX_BY / MIN_BY (argmax/argmin),
  // COUNT_IF, BOOL_OR / BOOL_AND: the "which row won" aggregates users
  // reach for daily. All are single-pass hash aggregates with partial
  // merge (each carries O(1) state), so the shuffle moves one row per
  // group at any scale. The argmax ordering key is the UNIQUE c_custkey
  // so the winner is engine-independent (argmax over a tied key is
  // underdetermined in both engines).
  // ---------------------------------------------------------------------
  def q56(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "customer")
      .groupBy($"c_nationkey")
      .agg(
        max_by($"c_name", $"c_custkey").as("latest_cust"),
        min_by($"c_name", $"c_custkey").as("earliest_cust"),
        count_if($"c_acctbal" < 0).as("n_negative"),
        bool_or($"c_acctbal" < 0).as("any_negative"),
        bool_and($"c_acctbal" > -1000).as("all_above_floor"))
      .orderBy($"c_nationkey")
  }

  private val q56Sql =
    """SELECT c_nationkey,
      |  max_by(c_name, c_custkey) AS latest_cust,
      |  min_by(c_name, c_custkey) AS earliest_cust,
      |  CAST(count_if(c_acctbal < 0) AS BIGINT) AS n_negative,
      |  bool_or(c_acctbal < 0) AS any_negative,
      |  bool_and(c_acctbal > -1000) AS all_above_floor
      |FROM customer
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  // ---------------------------------------------------------------------
  // q57: column profiling — the data-quality pass every ingestion
  // pipeline runs before training on a new source: per column, row
  // count, null count, exact distinct count, min and max. ONE scan of
  // the table computes every metric (the per-column aggregates live in
  // a single agg node; the multiple exact COUNT(DISTINCT)s plan as one
  // Expand + two-phase aggregate, data passes once). Min/max aggregate
  // on the NATIVE type and render to string after (so "min" means
  // numeric/time order, not string order), through the engine-portable
  // renderings used everywhere else (date_format, DECIMAL(18,2)).
  // The `channel` column is a derived nullable (NULLIF) so the null
  // path is exercised on a dataset with no physical nulls. At 100 TB
  // the same single-pass shape holds; swap the exact distincts for
  // approx_count_distinct to drop the Expand (exact kept here because
  // the oracle hash-checks the counts).
  // ---------------------------------------------------------------------
  private case class ProfCol(name: String, value: Column,
      render: Column => Column = _.cast(StringType))

  def q57(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val specs = Seq(
      ProfCol("event_id", $"event_id"),
      ProfCol("user_id", $"user_id"),
      ProfCol("event_type", $"event_type"),
      ProfCol("ts", $"ts", date_format(_, "yyyy-MM-dd HH:mm:ss")),
      ProfCol("value", $"value".cast(D2)),
      ProfCol("channel", expr("nullif(event_type, 'click')")))
    val base = Tables.load(spark, dir, "events")
    val aggs = count(lit(1)).as("n_rows") +: specs.flatMap { s =>
      Seq(count(s.value).as(s"nn_${s.name}"),
        countDistinct(s.value).as(s"nd_${s.name}"),
        s.render(min(s.value)).as(s"mn_${s.name}"),
        s.render(max(s.value)).as(s"mx_${s.name}"))
    }
    val one = base.agg(aggs.head, aggs.tail: _*)
    val rows = specs.map { s =>
      struct(lit(s.name).as("col_name"), col("n_rows"),
        (col("n_rows") - col(s"nn_${s.name}")).as("n_null"),
        col(s"nd_${s.name}").as("n_distinct"),
        col(s"mn_${s.name}").as("min_s"),
        col(s"mx_${s.name}").as("max_s"))
    }
    one.select(explode(array(rows: _*)).as("p")).select($"p.*")
      .orderBy($"col_name")
  }

  private val q57Sql = {
    // (metric SQL per column) mirrored arm-by-arm; min/max aggregate on
    // the native type and render after, like the Spark side
    def arm(name: String, v: String, render: String => String) =
      s"""SELECT '$name' AS col_name, COUNT(*) AS n_rows,
         |  COUNT(*) - COUNT($v) AS n_null,
         |  COUNT(DISTINCT $v) AS n_distinct,
         |  ${render(s"MIN($v)")} AS min_s,
         |  ${render(s"MAX($v)")} AS max_s
         |FROM events""".stripMargin
    def varchar(e: String) = s"CAST($e AS VARCHAR)"
    Seq(
      arm("event_id", "event_id", varchar),
      arm("user_id", "user_id", varchar),
      arm("event_type", "event_type", varchar),
      arm("ts", "ts", e => s"strftime($e, '%Y-%m-%d %H:%M:%S')"),
      arm("value", "CAST(value AS DECIMAL(18,2))", varchar),
      arm("channel", "NULLIF(event_type, 'click')", varchar))
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  // ---------------------------------------------------------------------
  // q58: small-file COMPACTION planner — q48's sibling maintenance op.
  // Input is a file listing (path-ordered sizes per table partition;
  // the documents table stands in: source = partition, doc_id = file,
  // n_chars = bytes). Files are packed first-fit in listing order: a
  // running cumulative size is binned by integer-dividing each file's
  // START offset by the target bin size, so every bin holds
  // consecutive files totalling ~target bytes (the last file may
  // straddle). Output is the rewrite plan: per (partition, bin) the
  // file range and total bytes a compaction job would coalesce into
  // one output file. The planner runs over METADATA (one listing row
  // per file — millions of rows at 100 TB, not data-scale): one window
  // cumsum per partition + one group-by, all integer arithmetic.
  // ---------------------------------------------------------------------
  private val CompactTarget = 4096L

  def q58(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"source").orderBy($"doc_id")
    Tables.load(spark, dir, "documents")
      .select($"source", $"doc_id", $"n_chars")
      .withColumn("cum", sum($"n_chars").over(w))
      .withColumn("bin_id", expr(s"(cum - n_chars) div $CompactTarget"))
      .groupBy($"source", $"bin_id")
      .agg(count(lit(1)).as("n_files"),
        sum($"n_chars").as("total_bytes"),
        min($"doc_id").as("first_file"),
        max($"doc_id").as("last_file"))
      .orderBy($"source", $"bin_id")
  }

  private val q58Sql =
    s"""WITH listed AS (
       |  SELECT source, doc_id, n_chars,
       |    CAST(SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM documents)
       |SELECT source, CAST((cum - n_chars) // $CompactTarget AS BIGINT) AS bin_id,
       |  COUNT(*) AS n_files, CAST(SUM(n_chars) AS BIGINT) AS total_bytes,
       |  MIN(doc_id) AS first_file, MAX(doc_id) AS last_file
       |FROM listed
       |GROUP BY source, bin_id
       |ORDER BY source, bin_id""".stripMargin

  // ---------------------------------------------------------------------
  // q61: SCHEMA EVOLUTION read — the long-lived-table reality at 100 TB:
  // files written before a column existed must read together with files
  // written after. An early generation of the events table (3 columns)
  // and a later one that added `value` land in the same directory; the
  // merged read (`mergeSchema` — schema reconciliation across parquet
  // footers, the scan-level feature) yields the union schema with NULLs
  // for pre-evolution rows. The generations are a deterministic
  // event_id split, so the oracle reproduces the merged table from the
  // source directly (CASE on the split predicate) — evolution must
  // never change data, only fill NULLs. At scale mergeSchema's footer
  // sweep is a one-time listing cost; the data path is unchanged.
  // ---------------------------------------------------------------------
  def q61(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.load(spark, dir, "events")
    val base = graft.Scratch.dir("q61_evolved")
    // generation 1: before the `value` column existed
    ev.filter($"event_id" % 2 === 0)
      .select($"event_id", $"user_id", $"event_type", $"ts")
      .write.parquet(s"$base/gen=1")
    // generation 2: the evolved schema
    ev.filter($"event_id" % 2 === 1)
      .select($"event_id", $"user_id", $"event_type", $"ts", $"value")
      .write.parquet(s"$base/gen=2")
    spark.read.option("mergeSchema", "true").parquet(s"$base/gen=1", s"$base/gen=2")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_rows"),
        count($"value").as("n_with_value"),
        sum($"value".cast(D2)).cast(DoubleType).as("sum_value"),
        min($"event_id").as("min_event_id"),
        max($"event_id").as("max_event_id"))
      .orderBy($"event_type")
  }

  private val q61Sql =
    """SELECT event_type, COUNT(*) AS n_rows,
      |  COUNT(CASE WHEN event_id % 2 = 1 THEN value END) AS n_with_value,
      |  CAST(SUM(CASE WHEN event_id % 2 = 1
      |    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_value,
      |  MIN(event_id) AS min_event_id,
      |  MAX(event_id) AS max_event_id
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q62: JOIN-CARDINALITY estimation from KMV sketches — the planner
  // statistic a 100 TB warehouse computes WITHOUT running the join: how
  // many distinct keys does each side have, and how many overlap? Each
  // side is summarized by its k smallest h60 key hashes (a KMV/bottom-k
  // synopsis: distinct → sort → limit k, so the full key sets are never
  // shuffled together, and partial bottom-k merges map-side); the union
  // sketch's k-th smallest value estimates |A ∪ B| = (k−1)·2⁶⁰/h_(k),
  // the fraction of the union sketch present in BOTH sides estimates
  // Jaccard, and their product estimates the key overlap — the standard
  // KMV intersection estimator (Beyer et al., SIGMOD'07). Exact
  // counts ride along (cheap at oracle scale) so the estimation error
  // is visible; both engines compute identical h60 hashes, so every
  // estimate is bit-equal and hash-verified.
  // ---------------------------------------------------------------------
  private val KmvK = 256

  def q62(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def kmin(keys: DataFrame): DataFrame =
      keys.toDF("k").distinct()
        .select(PortableSql.h60($"k".cast(StringType)).as("h"))
        .orderBy($"h").limit(KmvK)
    val aKeys = Tables.load(spark, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1995-01-01").cast(TimestampType))
      .select($"l_orderkey")
    val bKeys = Tables.load(spark, dir, "orders")
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey")
    val ka = kmin(aKeys).withColumn("in_a", lit(1))
    val kb = kmin(bKeys).withColumn("in_b", lit(1))
    val union = ka.select($"h").unionByName(kb.select($"h"))
      .distinct().orderBy($"h").limit(KmvK)
    val marked = union
      .join(ka, Seq("h"), "left").join(kb, Seq("h"), "left")
    // (k−1)·2⁶⁰ / h_(k): 2⁶⁰ is a power of two, exact as a double
    def est(hk: Column) =
      (lit((KmvK - 1).toDouble) * lit(math.pow(2, 60))) / hk.cast(DoubleType)
    val sketch = marked.agg(
      max($"h").as("hk"),
      sum(coalesce($"in_a", lit(0)) * coalesce($"in_b", lit(0))).as("n_both"))
    val exact = aKeys.toDF("k").intersect(bKeys.toDF("k"))
      .agg(count(lit(1)).as("exact_overlap"))
    val exacts = aKeys.agg(countDistinct($"l_orderkey").as("exact_a"))
      .crossJoin(bKeys.agg(countDistinct($"o_orderkey").as("exact_b")))
      .crossJoin(exact)
    sketch.crossJoin(exacts)
      .select(
        est($"hk").as("est_union"),
        ($"n_both".cast(DoubleType) / lit(KmvK.toDouble)).as("est_jaccard"),
        (est($"hk") * ($"n_both".cast(DoubleType) / lit(KmvK.toDouble)))
          .as("est_overlap"),
        $"exact_a", $"exact_b", $"exact_overlap")
  }

  private val q62Sql =
    s"""WITH ka AS (
       |  SELECT ${PortableSql.h60Sql("CAST(l_orderkey AS VARCHAR)")} AS h
       |  FROM (SELECT DISTINCT l_orderkey FROM lineitem
       |        WHERE l_shipdate >= TIMESTAMP '1995-01-01')
       |  ORDER BY h LIMIT $KmvK),
       |kb AS (
       |  SELECT ${PortableSql.h60Sql("CAST(o_orderkey AS VARCHAR)")} AS h
       |  FROM (SELECT DISTINCT o_orderkey FROM orders
       |        WHERE o_orderpriority = '1-URGENT')
       |  ORDER BY h LIMIT $KmvK),
       |u AS (
       |  SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb)
       |  ORDER BY h LIMIT $KmvK),
       |sketch AS (
       |  SELECT MAX(h) AS hk,
       |    SUM(CASE WHEN h IN (SELECT h FROM ka)
       |      AND h IN (SELECT h FROM kb) THEN 1 ELSE 0 END) AS n_both
       |  FROM u),
       |ex AS (
       |  SELECT
       |    (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem
       |     WHERE l_shipdate >= TIMESTAMP '1995-01-01') AS exact_a,
       |    (SELECT COUNT(DISTINCT o_orderkey) FROM orders
       |     WHERE o_orderpriority = '1-URGENT') AS exact_b,
       |    (SELECT COUNT(*) FROM
       |      (SELECT DISTINCT l_orderkey FROM lineitem
       |       WHERE l_shipdate >= TIMESTAMP '1995-01-01'
       |       INTERSECT
       |       SELECT DISTINCT o_orderkey FROM orders
       |       WHERE o_orderpriority = '1-URGENT')) AS exact_overlap)
       |SELECT
       |  (CAST(${KmvK - 1} AS DOUBLE) * 1152921504606846976.0)
       |    / CAST(hk AS DOUBLE) AS est_union,
       |  CAST(n_both AS DOUBLE) / ${KmvK}.0 AS est_jaccard,
       |  ((CAST(${KmvK - 1} AS DOUBLE) * 1152921504606846976.0)
       |    / CAST(hk AS DOUBLE))
       |    * (CAST(n_both AS DOUBLE) / ${KmvK}.0) AS est_overlap,
       |  exact_a, exact_b, exact_overlap
       |FROM sketch CROSS JOIN ex""".stripMargin

  // ---------------------------------------------------------------------
  // q63: INTERVAL COALESCING — merge overlapping variable-length
  // intervals per key, the interval-scheduling primitive behind uptime/
  // coverage/billing rollups. Each event opens an interval
  // [ts, ts + (1 + event_id % 59) minutes); overlapping intervals per
  // user merge into islands. Unlike q27's sessionize (fixed gap →
  // lag-gap islands), variable durations mean an interval can be
  // swallowed by an EARLIER one that extends past it, so the island
  // boundary needs the RUNNING MAX of interval ends, not a lag diff:
  // new island ⇔ start > max(end) over all preceding rows. One shuffle
  // on user_id; both windows and the rollup reuse that partitioning —
  // the classic one-exchange plan at any scale.
  // ---------------------------------------------------------------------
  def q63(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.load(spark, dir, "events")
      .select($"user_id", $"event_id",
        unix_micros($"ts").as("s"),
        (unix_micros($"ts") +
          (($"event_id" % 59 + 1) * 60L * 1000000L)).as("e"))
    val w = Window.partitionBy($"user_id").orderBy($"s", $"event_id")
    val prevMax = max($"e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    val wRun = w.rowsBetween(Window.unboundedPreceding, 0)
    ev.withColumn("new_i",
        when(prevMax.isNull || $"s" > prevMax, 1).otherwise(0))
      .withColumn("island", sum($"new_i").over(wRun).cast(LongType))
      .groupBy($"user_id", $"island")
      .agg(count(lit(1)).as("n_events"),
        min($"s").as("start_us"), max($"e").as("end_us"))
      .select($"user_id", $"island", $"n_events",
        expr("(end_us - start_us) div 1000000").as("span_seconds"))
      .orderBy($"user_id", $"island")
  }

  private val q63Sql =
    """WITH iv AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS s,
      |    epoch_us(ts) + (1 + event_id % 59) * 60 * 1000000 AS e
      |  FROM events),
      |flagged AS (
      |  SELECT user_id, event_id, s, e,
      |    CASE WHEN s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      OR MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
      |      THEN 1 ELSE 0 END AS new_i
      |  FROM iv),
      |isl AS (
      |  SELECT user_id, s, e,
      |    CAST(SUM(new_i) OVER (PARTITION BY user_id ORDER BY s, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island
      |  FROM flagged)
      |SELECT user_id, island, COUNT(*) AS n_events,
      |  (MAX(e) - MIN(s)) // 1000000 AS span_seconds
      |FROM isl
      |GROUP BY user_id, island
      |ORDER BY user_id, island""".stripMargin

  // ---------------------------------------------------------------------
  // q64: NATIVE top-k per key — the custom whole-operator extension
  // (graft.plans.TopKPerKey: LogicalPlan + SparkStrategy + two-phase
  // SparkPlan) driving a real query: each supplier's 3 highest-value
  // lineitems. Unlike the row_number window the rest of the registry
  // uses (full-width shuffle + full sort per key), the operator keeps a
  // 3-bounded heap per key on the map side, shuffles at most 3 rows per
  // key per partition, and never sorts a partition — the plan shows
  // TopKPerKeyPartial below the exchange and no Window/Sort at all.
  // The ordering is total (extendedprice, orderkey, linenumber), so the
  // result is deterministic and the DuckDB oracle is the plain window
  // formulation — proving operator ≡ window semantics, hash-exactly.
  // ---------------------------------------------------------------------
  def q64(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.load(spark, dir, "lineitem")
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
        $"l_extendedprice".cast(D2).as("price"))
    graft.plans.GraftPlans.topKPerKey(
        li, Seq("l_suppkey"),
        Seq(("price", false), ("l_orderkey", true), ("l_linenumber", true)),
        k = 3)
      .select($"l_suppkey", $"rank", $"l_orderkey", $"l_linenumber",
        $"price".cast(DoubleType).as("price"))
      .orderBy($"l_suppkey", $"rank")
  }

  private val q64Sql =
    """SELECT l_suppkey, CAST(rank AS BIGINT) AS rank, l_orderkey,
      |  l_linenumber, CAST(price AS DOUBLE) AS price
      |FROM (
      |  SELECT l_suppkey, l_orderkey, l_linenumber,
      |    CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
      |    row_number() OVER (PARTITION BY l_suppkey
      |      ORDER BY CAST(l_extendedprice AS DECIMAL(18,2)) DESC,
      |               l_orderkey ASC, l_linenumber ASC) AS rank
      |  FROM lineitem)
      |WHERE rank <= 3
      |ORDER BY l_suppkey, rank""".stripMargin

  // ---------------------------------------------------------------------
  // q67: the q64 semantics written the way a PURE-SQL user writes them —
  // a row_number window under a rank-bound filter through spark.sql —
  // relying on the TopKWindowRewrite optimizer rule to plan the native
  // heap operator (TopKWindowRewriteSpec asserts the plan shape; this
  // row proves the rewritten results hash-match DuckDB's own window).
  // The window order is total (price, orderkey, linenumber), the same
  // determinism contract q64 carries.
  // ---------------------------------------------------------------------
  def q67(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftPlans.install(spark)
    Tables.load(spark, dir, "lineitem")
      .createOrReplaceTempView("q67_lineitem")
    // the rewrite is DEFAULT ON since r12 (the r10 "4-7x slower"
    // measurement was a per-key allocation bug in drain, since fixed —
    // see TopKWindowRewrite). The conf is still pinned "true" here so
    // this registry row keeps demonstrating the rewrite even if a
    // session turned it off. Scope the conf and materialize inside it
    // (the q53 pattern: plans read confs lazily, and a later
    // df.write would re-plan outside the scope). Bounded collect:
    // 3 rows per supplier — a demonstration row, like q53's one-row
    // pushdown collect.
    val key = graft.plans.TopKWindowRewrite.EnabledKey
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val df = spark.sql(
        """SELECT l_suppkey, CAST(rn AS BIGINT) AS rank, l_orderkey,
          |  l_linenumber, CAST(price AS DOUBLE) AS price
          |FROM (
          |  SELECT l_suppkey, l_orderkey, l_linenumber,
          |    CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
          |    row_number() OVER (PARTITION BY l_suppkey
          |      ORDER BY CAST(l_extendedprice AS DECIMAL(18,2)) DESC,
          |               l_orderkey ASC, l_linenumber ASC) AS rn
          |  FROM q67_lineitem)
          |WHERE rn <= 3
          |ORDER BY l_suppkey, rank""".stripMargin)
      require(df.queryExecution.executedPlan.toString.contains("TopKPerKeyFinal"),
        "q67 must plan through the rewrite it demonstrates")
      spark.createDataFrame(
        spark.sparkContext.parallelize(df.collect().toIndexedSeq, 1),
        df.schema)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  // ---------------------------------------------------------------------
  // q65: ORC source/sink round-trip — the second COLUMNAR format beside
  // parquet (Spark ships the ORC DataSource in spark-sql; many lakes
  // land ORC next to parquet, and "a user of the reference could switch"
  // includes their columnar landing zone). Writes a projected `orders`
  // as zlib ORC, reads it back with a selective filter — ORC scans take
  // the same DSv2 pushdown path as parquet (predicate + column pruning
  // reach the stripe reader), so at 100 TB the scan reads only the
  // o_orderstatus stripes the filter admits — and aggregates. The
  // oracle computes the identical aggregate from the parquet table:
  // values survive ORC exactly (long/double/string are lossless), so
  // the row hash must match.
  // ---------------------------------------------------------------------
  def q65(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tmp = graft.Scratch.dir("orders_orc")
    Tables.load(spark, dir, "orders")
      .select($"o_custkey", $"o_orderstatus", $"o_totalprice")
      .write.option("compression", "zlib").orc(tmp)
    spark.read.orc(tmp)
      .filter($"o_orderstatus" =!= "P")
      .groupBy($"o_orderstatus")
      .agg(
        sum($"o_totalprice".cast(D2)).cast(DoubleType).as("sum_price"),
        count(lit(1)).as("n_orders"),
        max($"o_custkey").as("max_custkey"))
      .orderBy($"o_orderstatus")
  }

  private val q65Sql =
    """SELECT o_orderstatus,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  COUNT(*) AS n_orders,
      |  MAX(o_custkey) AS max_custkey
      |FROM orders
      |WHERE o_orderstatus <> 'P'
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------------
  // q66: XML source/sink round-trip — Spark 4's built-in XML DataSource
  // (the spark-xml lineage), the format web-scrape and feed pipelines
  // land in. Writes customer as row-tagged XML, reads it back with an
  // explicit schema (inference would re-scan the corpus — never at
  // 100 TB), and aggregates per market segment; the oracle computes the
  // identical aggregate from the parquet table, so long/double/string
  // values must survive the XML text round-trip exactly (doubles use
  // shortest-round-trip repr, same contract q38 relies on for JSON).
  // Money stays DECIMAL(18,2) before summation, the repo-wide rule.
  // ---------------------------------------------------------------------
  def q66(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tmp = graft.Scratch.dir("customer_xml")
    Tables.load(spark, dir, "customer")
      .select($"c_custkey", $"c_acctbal", $"c_mktsegment")
      .write.option("rowTag", "customer").format("xml").save(tmp)
    val schema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType)))
    spark.read.schema(schema).option("rowTag", "customer")
      .format("xml").load(tmp)
      .groupBy($"c_mktsegment")
      .agg(
        sum($"c_acctbal".cast(D2)).cast(DoubleType).as("sum_acctbal"),
        count(lit(1)).as("n_customers"),
        max($"c_custkey").as("max_custkey"))
      .orderBy($"c_mktsegment")
  }

  private val q66Sql =
    """SELECT c_mktsegment,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal,
      |  COUNT(*) AS n_customers,
      |  MAX(c_custkey) AS max_custkey
      |FROM customer
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------------
  // q68: Avro source/sink round-trip over graft's OWN DataSource V2
  // connector (sources/AvroSource.scala — this environment ships avro
  // core but not spark-avro, so the connector is first-party). Writes a
  // projected `orders` as snappy Avro, reads it back with a selective
  // filter and aggregates; o_orderdate exercises the timestamp-micros
  // logical type (Spark's native micros encoding, so values round-trip
  // bit-exactly) and the oracle computes the identical aggregate from
  // the parquet table. At 100 TB the connector's sync-marker splitting
  // turns each file into maxPartitionBytes-sized parallel reads and the
  // pruned ReadSchema skips conversion of unused fields
  // (AvroSourceSpec asserts both on the physical plan).
  // ---------------------------------------------------------------------
  def q68(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tmp = graft.Scratch.dir("orders_avro")
    Tables.load(spark, dir, "orders")
      .select($"o_custkey", $"o_orderstatus", $"o_totalprice", $"o_orderdate")
      .write.format("gavro").option("compression", "snappy")
      .mode("overwrite").save(tmp)
    spark.read.format("gavro").load(tmp)
      .filter($"o_orderstatus" =!= "P")
      .groupBy($"o_orderstatus")
      .agg(
        sum($"o_totalprice".cast(D2)).cast(DoubleType).as("sum_price"),
        count(lit(1)).as("n_orders"),
        max($"o_custkey").as("max_custkey"),
        max($"o_orderdate").as("max_orderdate"))
      .orderBy($"o_orderstatus")
  }

  private val q68Sql =
    """SELECT o_orderstatus,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  COUNT(*) AS n_orders,
      |  MAX(o_custkey) AS max_custkey,
      |  MAX(o_orderdate) AS max_orderdate
      |FROM orders
      |WHERE o_orderstatus <> 'P'
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------------
  // q71: MANIFEST-BASED FILE SKIPPING — the Iceberg/Delta data-skipping
  // pattern without a table format: the table is laid out
  // range-partitioned on the filter column (each file owns a
  // l_shipdate slice), a one-scan MANIFEST records per-file min/max,
  // and a range query consults the manifest FIRST, handing the reader
  // only files whose [min, max] intersects the predicate — files
  // wholly outside never open. Complements q52 (runtime partition
  // pruning inside one scan) and q53 (stats pushdown): this prunes at
  // the FILE-LISTING level, before any footer is read. At 100 TB the
  // manifest is O(#files) rows — a broadcastable table maintained
  // incrementally on write; the driver-side collect here is that same
  // O(#files) bound (the paths must reach the reader), and
  // `ManifestSkipSpec` asserts the pruned read really opens fewer
  // files AND returns exactly the full-scan answer.
  // ---------------------------------------------------------------------
  private[queries] def q71Layout(spark: SparkSession, dir: String): String = {
    import spark.implicits._
    val path = graft.Scratch.dir("q71_layout")
    Tables.load(spark, dir, "lineitem")
      .select($"l_shipdate", $"l_quantity", $"l_extendedprice", $"l_discount")
      .repartitionByRange(8, $"l_shipdate")
      .write.parquet(path)
    path
  }

  /** The manifest-pruned file list for a [lo, hi] shipdate window:
    * one scan builds per-file min/max, the predicate keeps only
    * intersecting files. */
  private[queries] def q71Prune(spark: SparkSession, path: String,
      lo: String, hi: String): Seq[String] = {
    import spark.implicits._
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min($"l_shipdate").as("f_lo"), max($"l_shipdate").as("f_hi"))
      .filter($"f_hi" >= lit(lo).cast(TimestampType) &&
        $"f_lo" <= lit(hi).cast(TimestampType))
      .select($"file").collect().map(_.getString(0)).toSeq
  }

  def q71(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (lo, hi) = ("1996-01-01", "1996-12-31")
    val path = q71Layout(spark, dir)
    val kept = q71Prune(spark, path, lo, hi)
    spark.read.parquet(kept: _*)
      .filter($"l_shipdate".between(
        lit(lo).cast(TimestampType), lit(hi).cast(TimestampType)))
      .groupBy(date_format($"l_shipdate", "yyyy-MM").as("ship_month"))
      .agg(
        sum($"l_quantity".cast(D2)).cast(DoubleType).as("sum_qty"),
        sum(($"l_extendedprice".cast(D2) *
          (lit(1).cast(D2) - $"l_discount".cast(D2)))
          .cast(DecimalType(18, 4))).cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"ship_month")
  }

  private val q71Sql =
    """SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
      |  AND TIMESTAMP '1996-12-31 00:00:00'
      |GROUP BY ship_month
      |ORDER BY ship_month""".stripMargin

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "q53_agg_pushdown" -> (q53 _),
    "q54_gapfill_ffill" -> (q54 _),
    "q55_scd2_merge" -> (q55 _),
    "q56_argminmax" -> (q56 _),
    "q57_profile" -> (q57 _),
    "q58_compaction" -> (q58 _),
    "q61_schema_evolution" -> (q61 _),
    "q62_kmv_cardinality" -> (q62 _),
    "q63_interval_coalesce" -> (q63 _),
    "q64_native_topk" -> (q64 _),
    "q65_orc_roundtrip" -> (q65 _),
    "q66_xml_roundtrip" -> (q66 _),
    "q67_topk_sql_rewrite" -> (q67 _),
    "q68_avro_roundtrip" -> (q68 _),
    "q71_manifest_skip" -> (q71 _))

  val oracle: ListMap[String, String] = ListMap(
    "q53_agg_pushdown" -> q53Sql,
    "q54_gapfill_ffill" -> q54Sql,
    "q55_scd2_merge" -> q55Sql,
    "q56_argminmax" -> q56Sql,
    "q57_profile" -> q57Sql,
    "q58_compaction" -> q58Sql,
    "q61_schema_evolution" -> q61Sql,
    "q62_kmv_cardinality" -> q62Sql,
    "q63_interval_coalesce" -> q63Sql,
    "q64_native_topk" -> q64Sql,
    "q65_orc_roundtrip" -> q65Sql,
    "q66_xml_roundtrip" -> q66Sql,
    "q67_topk_sql_rewrite" -> q64Sql, // same contract as q64, SQL route
    "q68_avro_roundtrip" -> q68Sql,
    "q71_manifest_skip" -> q71Sql)
}
