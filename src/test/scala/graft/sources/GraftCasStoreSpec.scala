package graft.sources

import graft.SparkSpec
import graft.queries.Extras5

/** In-memory conditional-PUT store: what an S3 If-None-Match (or GCS
  * generation-match) implementation looks like behind the `CasStore`
  * SPI — a single atomic putIfAbsent against a shared map. The
  * companion counters let the spec prove commits actually routed
  * through the override rather than the rename path. */
class GraftMemCasStore extends GraftFs.CasStore {
  override def putIfAbsent(path: String, bytes: Array[Byte]): Boolean = {
    GraftMemCasStore.calls.incrementAndGet()
    val won =
      GraftMemCasStore.objects.putIfAbsent(path, bytes.clone()) == null
    // mirror the winning object to the backing (local-mock) store so
    // every OTHER GraftFs operation (read/list/length) sees it — the
    // real S3 CasStore would simply be writing the real object
    if (won) GraftFs.writeBytes(path, bytes)
    won
  }
}

object GraftMemCasStore {
  val objects =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
  val calls = new java.util.concurrent.atomic.AtomicLong()
}

/** Pins the pluggable conditional-PUT boundary (r17 — the r16 verdict's
  * gap 4): a scheme registered under `graft.cas.<scheme>.impl` routes
  * EVERY protocol CAS publish through the store's conditional PUT
  * (never the staged rename), racing publishes have exactly one
  * winner, and a full catalog lifecycle runs on top — making `s3a://`
  * a configuration change, not a code change. */
class GraftCasStoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val armed: Unit = {
    val c = spark.sparkContext.hadoopConfiguration
    c.set("fs.graftmem.impl", classOf[GraftMockFileSystem2].getName)
    c.set("fs.AbstractFileSystem.graftmem.impl",
      classOf[GraftMockAbstractFs2].getName)
    c.set("graft.cas.graftmem.impl", classOf[GraftMemCasStore].getName)
  }

  private def memDir(tag: String): String = {
    armed
    s"graftmem:${graft.Scratch.dir(tag)}"
  }

  test("racing publishes through the conditional PUT have exactly one winner") {
    val dir = memDir("cas_race")
    GraftFs.mkdirs(dir)
    val target = s"$dir/v1.txt"
    val before = GraftMemCasStore.calls.get()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val results = (1 to 16).map { i =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          override def call(): Boolean =
            GraftFs.putIfAbsent(target, s"writer-$i".getBytes("UTF-8"))
        })
      }.map(_.get())
      assert(results.count(identity) == 1, "exactly one winner")
    } finally pool.shutdown()
    assert(GraftMemCasStore.calls.get() - before == 16L,
      "every publish must route through the conditional PUT")
    // the winner's bytes are what readers see
    val content = GraftFs.readString(target)
    assert(content.startsWith("writer-"))
    assert(java.util.Arrays.equals(
      GraftMemCasStore.objects.get(target), content.getBytes("UTF-8")))
  }

  test("a catalog table lifecycle rides the conditional-PUT publishes end-to-end") {
    GraftCatalog.install(spark)
    val base = memDir("cas_table")
    GraftFs.mkdirs(base)
    val before = GraftMemCasStore.calls.get()
    val name = s"mem_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.sql(s"CREATE TABLE graft.$name (k BIGINT, v BIGINT) " +
      s"LOCATION '$base'")
    spark.sql(s"INSERT INTO graft.$name SELECT id, id * 2 FROM range(0, 100)")
    spark.sql(s"DELETE FROM graft.$name WHERE k % 10 = 0")
    assert(spark.sql(s"SELECT COUNT(*) FROM graft.$name")
      .head().getLong(0) == 90L)
    assert(spark.sql(s"SELECT COUNT(*) FROM graft.$name VERSION AS OF 2")
      .head().getLong(0) == 100L)
    // three commits (create, insert, delete) = three CAS publishes,
    // all through the store
    assert(GraftMemCasStore.calls.get() - before >= 3L)
    assert(Extras5.q78Latest(base) == 3)
  }
}

/** Local-backed FS under the `graftmem://` scheme (distinct from
  * GraftMockFsSpec's `graftmock://` so the two suites can't interfere
  * through Hadoop's FileSystem cache). */
class GraftMockFileSystem2 extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftmem"
  override def getUri: java.net.URI = java.net.URI.create("graftmem:///")
}

class GraftMockAbstractFs2(uri: java.net.URI,
    conf: org.apache.hadoop.conf.Configuration)
    extends org.apache.hadoop.fs.DelegateToFileSystem(
      uri, new GraftMockFileSystem2, conf, "graftmem", false)
