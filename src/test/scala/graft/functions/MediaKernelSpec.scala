package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** AHashSig kernel: the 60-bit block-mean signature m04 builds over
  * media payloads. Pins the bit semantics (exact integer
  * cross-multiplied mean comparison), the null convention, the
  * codegen/interpreted identity, and the property the hash exists for:
  * scale invariance — the same block structure at a different payload
  * length produces the same signature.
  */
class MediaKernelSpec extends SparkSpec {

  private def sig(bytes: Array[Byte]): Option[Long] =
    Option(AHash.signature(bytes)).map(_.longValue())

  test("uniform payload sets every (non-empty) block bit") {
    // every block mean equals the global mean -> `>=` sets the bit
    val s = sig(Array.fill(120)(42.toByte)).get
    assert(s == (1L << 60) - 1)
  }

  test("step payload: exactly the high half's bits set") {
    // blocks 0..29 hold value 10, blocks 30..59 hold 50; only the high
    // half reaches the global mean of 30
    val bytes = Array.tabulate(120)(i => if (i < 60) 10.toByte else 50.toByte)
    val s = sig(bytes).get
    assert(s == (((1L << 60) - 1) ^ ((1L << 30) - 1)), f"got ${s}%015x")
  }

  test("empty payload is null; zero-length blocks contribute 0 bits") {
    assert(sig(Array.empty).isEmpty)
    // n=30 < 60 blocks: half the blocks are empty -> their bits are 0
    val s = sig(Array.fill(30)(7.toByte)).get
    assert(java.lang.Long.bitCount(s) == 30)
  }

  test("scale invariance: same block structure at different lengths") {
    def stepped(n: Int): Array[Byte] =
      Array.tabulate(n)(i => ((i * 60 / n) % 2 * 40 + 10).toByte)
    assert(sig(stepped(600)) == sig(stepped(960)))
  }

  test("SQL route matches the kernel and codegen compiles it") {
    import spark.implicits._
    AHash.register(spark)
    val df = Seq((1L, Array.fill(120)(42.toByte)),
        (2L, Array.tabulate(120)(i => if (i < 60) 10.toByte else 50.toByte)))
      .toDF("id", "media")
    val got = df.select($"id", expr("ahash_sig(media)").as("s"))
      .orderBy($"id").collect().map(r => r.getLong(1))
    assert(got(0) == (1L << 60) - 1)
    assert(got(1) == (((1L << 60) - 1) ^ ((1L << 30) - 1)))
    // interpreted eval agrees with the codegen'd path row by row
    val interp = df.orderBy($"id").collect()
      .map(r => sig(r.getAs[Array[Byte]]("media")).get)
    assert(got.sameElements(interp))
  }

  test("payload kernel is byte-identical to the SQL HOF route") {
    import spark.implicits._
    M04Synth.register(spark)
    // every (group, length, noise-phase) residue class in 0..839
    val df = spark.range(0, 840).toDF("doc_id")
    val mismatches = df.select(
        expr("m04_payload(doc_id)").as("kernel"),
        expr(graft.ops.Multimodal.m04PayloadSpark).as("hof"))
      .filter(not($"kernel" === $"hof")).count()
    assert(mismatches == 0, s"$mismatches payloads diverge from the HOF spec")
  }

  test("m04 finds exactly the planted same-group pairs") {
    import spark.implicits._
    val pairs = graft.ops.Multimodal.m04(spark, sf)
    // expected = per visual group (doc_id % 120) of the ACTUAL ids,
    // all intra-group pairs
    val expected = graft.Tables.load(spark, sf, "documents")
      .groupBy(($"doc_id" % 120).as("g")).agg(count(lit(1)).as("s"))
      .agg(sum($"s" * ($"s" - 1) / 2)).collect()(0).getDouble(0).toLong
    assert(pairs.count() == expected, s"expected $expected planted pairs")
    assert(pairs.filter(col("hamming") > 2).isEmpty,
      "cross-group collision leaked through the bands")
  }
}
