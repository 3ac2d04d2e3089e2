package graft.queries

import graft.SparkSpec

/** Property guards for the two file/bin-pruning rewrites: each claims
  * "the pruned computation equals the direct one" — a claim with sharp
  * edge cases (bin-boundary timestamps, boxes straddling tile edges)
  * that a single corpus draw can miss. Checked against brute force over
  * seeded randomized inputs plus the exact boundary lattice.
  */
class BinCoverPropertySpec extends SparkSpec {

  test("q76's 3-bin expansion covers exactly the |Δt| <= 1h band (property)") {
    // the rewrite's soundness reduces to pure arithmetic on epoch
    // seconds: a pair within 3600s must meet in one of the purchase's
    // 3 covering hour-bins — checked on 20k random pairs AND the exact
    // ±3600/±3601/bin-edge lattice where off-by-ones live
    val rnd = new scala.util.Random(11)
    def check(p: Long, e: Long): Unit = {
      val direct = math.abs(p - e) <= 3600L
      val meets = math.abs(p / 3600 - e / 3600) <= 1
      assert(!direct || meets, s"covering broken at p=$p e=$e")
    }
    (1 to 20000).foreach { _ =>
      val p = rnd.nextLong(10L * 24 * 3600)
      val e = p + rnd.nextLong(8000) - 4000
      check(p, math.max(0, e))
    }
    for (base <- Seq(0L, 3599L, 3600L, 7199L, 7200L, 86400L);
         d <- Seq(-3601L, -3600L, -3599L, -1L, 0L, 1L, 3599L, 3600L, 3601L)) {
      check(base, math.max(0, base + d))
    }
  }

  test("q80's tile manifest never prunes a box row (property, in-engine)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a fixed small keyspace, randomized probe boxes: pruned read must
    // equal the direct filter on every box, including tile-straddlers
    val partBits = 11
    val zkey = ((0 until partBits).map(i =>
        shiftleft(shiftright($"pk", i).bitwiseAND(1), 2 * i)) ++
      (0 until 7).map(i =>
        shiftleft(shiftright($"sk", i).bitwiseAND(1), 2 * i + 1)))
      .reduce(_ + _)
    val data = spark.range(4000)
      .select(($"id" * 37 % 2048).as("pk"), ($"id" * 53 % 128).as("sk"))
      .withColumn("tile", shiftright(zkey, 10))
      .cache()
    val manifest = data.groupBy($"tile")
      .agg(min($"pk").as("pk_lo"), max($"pk").as("pk_hi"),
        min($"sk").as("sk_lo"), max($"sk").as("sk_hi"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val rnd = new scala.util.Random(7)
    (1 to 12).foreach { _ =>
      val (p1, p2) = (rnd.nextInt(2048).toLong, rnd.nextInt(2048).toLong)
      val (s1, s2) = (rnd.nextInt(128).toLong, rnd.nextInt(128).toLong)
      val (pkLo, pkHi) = (math.min(p1, p2), math.max(p1, p2))
      val (skLo, skHi) = (math.min(s1, s2), math.max(s1, s2))
      val kept = manifest.filter { case (_, plo, phi, slo, shi) =>
        phi >= pkLo && plo <= pkHi && shi >= skLo && slo <= skHi
      }.map(_._1)
      val box = $"pk" >= pkLo && $"pk" <= pkHi && $"sk" >= skLo && $"sk" <= skHi
      val pruned = data.filter($"tile".isin(kept: _*)).filter(box).count()
      val direct = data.filter(box).count()
      assert(pruned == direct,
        s"pruning lost rows for box pk[$pkLo,$pkHi] sk[$skLo,$skHi]: $pruned != $direct")
    }
  }
}
