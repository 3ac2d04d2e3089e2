package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Pins the optimistic-concurrency commit protocol (q78TryCommit CAS +
  * cowMergeCommitOcc rebase loop) — the multi-writer behavior the
  * oracle hash cannot see:
  *  - the CAS primitive: exactly one of two commits to the same version
  *    wins; the loser is TOLD (false), never silently shadowed;
  *  - disjoint interleave: a writer that loses the race to a commit
  *    touching OTHER files rebases by re-deriving the carried list only
  *    — its rewrite output is salvaged (one rewrite, one lost CAS) —
  *    and BOTH deltas land in the final version;
  *  - true conflict: a writer that loses to a commit rewriting the SAME
  *    files re-runs the merge against the winner's table (two
  *    rewrites), and the final table composes both deltas with the
  *    loser applied second.
  */
class OccCommitSpec extends SparkSpec {
  import spark.implicits._

  private val D2 = DecimalType(18, 2)

  /** A CDC-shaped delta updating the given keys to a fixed status tag
    * (price bumped by `bump` so composition is visible in values). */
  private def updDelta(keys: Seq[Long], tag: String, bump: Int): DataFrame = {
    val base = Extras5Access.ordersSlice(spark, sf)
    base.filter($"o_orderkey".isin(keys: _*))
      .select($"o_orderkey".as("d_key"), lit("U").as("d_op"),
        lit(tag).as("d_status"), ($"price" + bump).cast(D2).as("d_price"))
  }

  test("q78TryCommit: exactly one writer wins a version; loser is told") {
    val base = graft.Scratch.dir("occ_cas")
    assert(Extras5.q78TryCommit(base, 1, Seq("/a.parquet")))
    assert(!Extras5.q78TryCommit(base, 1, Seq("/b.parquet")))
    // the winner's manifest is intact — the loser did not clobber it
    assert(Extras5.q78Resolve(base, 1) == Seq("/a.parquet"))
    assert(Extras5.q78Latest(base) == 1)
    // the single-writer wrapper refuses instead of overwriting
    intercept[IllegalStateException] {
      Extras5.q78Commit(base, 1, Seq("/c.parquet"))
    }
  }

  /** Two keys guaranteed to live in DIFFERENT range files of cdcBase's
    * 16-file key-range layout: the global min and max keys of the
    * table. */
  private def extremeKeys(files: Seq[String]): (Long, Long) = {
    val r = spark.read.parquet(files: _*)
      .agg(min($"o_orderkey"), max($"o_orderkey")).head()
    (r.getLong(0), r.getLong(1))
  }

  test("OCC disjoint interleave: loser rebases without re-rewriting; both deltas land") {
    val base = Extras6.cdcBase(spark, sf)
    val v1 = Extras5.q78Resolve(base, 1)
    val (loKey, hiKey) = extremeKeys(v1)
    val deltaA = updDelta(Seq(loKey), "A", 1)
    val deltaB = updDelta(Seq(hiKey), "B", 2)
    // writer B commits INSIDE writer A's read→CAS window (the seam
    // models a real race deterministically)
    var fired = false
    val out = Extras6.cowMergeCommitOcc(spark, base, deltaA, raceHook = from =>
      if (!fired) { fired = true; Extras6.cowMergeCommit(spark, base, from, deltaB) })
    assert(out.version == 3, "loser lands on top of the winner's v2")
    assert(out.casLost == 1)
    assert(out.rewrites == 1, "disjoint loss must salvage the rewrite")
    // both deltas are in v3; v2 holds only B's
    val v3 = spark.read.parquet(Extras5.q78Resolve(base, 3): _*)
    assert(v3.filter($"o_orderkey" === loKey && $"o_orderstatus" === "A").count() == 1)
    assert(v3.filter($"o_orderkey" === hiKey && $"o_orderstatus" === "B").count() == 1)
    assert(v3.count() == spark.read.parquet(v1: _*).count())
    val v2 = spark.read.parquet(Extras5.q78Resolve(base, 2): _*)
    assert(v2.filter($"o_orderstatus" === "A").count() == 0)
    assert(v2.filter($"o_orderstatus" === "B").count() == 1)
  }

  test("OCC true conflict: loser re-runs the merge against the winner's table") {
    val base = Extras6.cdcBase(spark, sf)
    val v1 = Extras5.q78Resolve(base, 1)
    val (loKey, _) = extremeKeys(v1)
    // SAME key on both sides: the winner rewrites the loser's touched
    // file, so the loser's staged output is built on stale rows
    val deltaA = updDelta(Seq(loKey), "A", 10)
    val deltaB = updDelta(Seq(loKey), "B", 200)
    var fired = false
    val out = Extras6.cowMergeCommitOcc(spark, base, deltaA, raceHook = from =>
      if (!fired) { fired = true; Extras6.cowMergeCommit(spark, base, from, deltaB) })
    assert(out.version == 3)
    assert(out.casLost == 1)
    assert(out.rewrites == 2, "overlapping loss must re-run the rewrite")
    assert(out.conflicting.nonEmpty, "the conflicting files are reported")
    // last-writer-wins composition: A (applied second) sets the value
    val v3row = spark.read.parquet(Extras5.q78Resolve(base, 3): _*)
      .filter($"o_orderkey" === loKey).head()
    assert(v3row.getAs[String]("o_orderstatus") == "A")
    // A's delta was built from the BASE row (price+10 over v1, not over
    // B's +200): re-running against the winner's table replays A's
    // values verbatim — upsert semantics, not increment semantics
    val baseRow = spark.read.parquet(v1: _*)
      .filter($"o_orderkey" === loKey).head()
    assert(v3row.getAs[java.math.BigDecimal]("price") ==
      baseRow.getAs[java.math.BigDecimal]("price").add(java.math.BigDecimal.TEN))
  }
}

/** Exposes the q88-shaped orders slice for delta construction. */
private[queries] object Extras5Access {
  def ordersSlice(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.load(spark, dir, "orders")
      .filter($"o_orderkey" % 3 === 0)
      .select($"o_orderkey", $"o_orderstatus",
        $"o_totalprice".cast(DecimalType(18, 2)).as("price"))
  }
}
