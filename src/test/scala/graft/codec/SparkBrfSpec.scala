package graft.codec

import java.io.{File, FileOutputStream}
import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.compress.SplittableCompressionCodec
import org.apache.hadoop.mapreduce.TaskAttemptID
import org.apache.hadoop.mapreduce.lib.input.{FileSplit, LineRecordReader}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl

import graft.SparkSpec

/** The splittable `.brf` codec: frame round-trip, and — the actual
  * contract — that Hadoop's real `LineRecordReader` over arbitrary
  * split points reproduces every line exactly once. The split-point
  * sweep is the gold test: any ownership/position bug shows up as a
  * duplicated or lost line at some boundary. */
class SparkBrfSpec extends SparkSpec {

  private def hadoopConf(): Configuration = {
    val conf = new Configuration()
    conf.set("io.compression.codecs", BroWriter.FramedCodecClass)
    conf
  }

  /** Write lines as one `.brf` file with the given frame size. */
  private def writeBrf(lines: Seq[String], frameSize: Int): File = {
    val f = Files.createTempFile("brf_", ".brf").toFile
    val out = new BroFramedOutputStream(new FileOutputStream(f), 6, frameSize)
    lines.foreach { l => out.write((l + "\n").getBytes("UTF-8")) }
    out.finish()
    out.close()
    f
  }

  /** Read all lines of one split through Hadoop's LineRecordReader. */
  private def readSplit(f: File, start: Long, len: Long): Seq[String] = {
    val split = new FileSplit(new Path(f.toURI), start, len, null)
    val rr = new LineRecordReader()
    rr.initialize(split, new TaskAttemptContextImpl(hadoopConf(), new TaskAttemptID()))
    val out = Seq.newBuilder[String]
    while (rr.nextKeyValue()) out += rr.getCurrentValue.toString
    rr.close()
    out.result()
  }

  private val lines: Seq[String] =
    (0 until 2000).map(i => f"line-$i%05d-" + ("x" * (17 + i % 23)))

  test("random payloads round-trip at random frame sizes (property grid)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 12) {
      val n = rnd.nextInt(200000)
      val data = new Array[Byte](n)
      // mixed-entropy payload: runs of text-like bytes and random noise
      var i = 0
      while (i < n) {
        val run = math.min(n - i, 1 + rnd.nextInt(999))
        if (rnd.nextBoolean()) {
          val b = (97 + rnd.nextInt(26)).toByte
          java.util.Arrays.fill(data, i, i + run, b)
        } else {
          val noise = new Array[Byte](run)
          rnd.nextBytes(noise)
          System.arraycopy(noise, 0, data, i, run)
        }
        i += run
      }
      val frameSize = 1 << (10 + rnd.nextInt(8)) // 1 KiB .. 128 KiB
      val bos = new java.io.ByteArrayOutputStream()
      val out = new BroFramedOutputStream(bos, 1 + rnd.nextInt(9), frameSize)
      // write through a random chunking, including single-byte writes
      var off = 0
      while (off < n) {
        if (rnd.nextInt(10) == 0) { out.write(data(off) & 0xff); off += 1 }
        else {
          val k = math.min(n - off, 1 + rnd.nextInt(70000))
          out.write(data, off, k); off += k
        }
      }
      out.finish(); out.close()
      val enc = bos.toByteArray
      assert((n == 0) == (enc.length == 0))
      val in = new BroFramedInputStream(
        new java.io.ByteArrayInputStream(enc), 0L, Long.MaxValue)
      val back = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var r = in.read(buf, 0, buf.length)
      while (r >= 0) { back.write(buf, 0, r); r = in.read(buf, 0, buf.length) }
      assert(java.util.Arrays.equals(back.toByteArray, data),
        s"round-trip mismatch at n=$n frameSize=$frameSize")
    }
  }

  test("whole-file read reproduces all lines; empty input is a valid file") {
    val f = writeBrf(lines, frameSize = 1000)
    assert(readSplit(f, 0, f.length()) == lines)
    val empty = writeBrf(Seq.empty, frameSize = 1000)
    assert(empty.length() == 0 && readSplit(empty, 0, 0) == Seq.empty)
  }

  /** Exact frame-start offsets, walked from the headers themselves. */
  private def frameStarts(f: java.io.File): Seq[Long] = {
    import graft.codec.BroFramed
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    val starts = scala.collection.mutable.ArrayBuffer[Long]()
    var off = 0L
    while (off < bytes.length) {
      starts += off
      val compLen = BroFramed.readInt(bytes.slice(off.toInt, off.toInt + BroFramed.HeaderLen), 8)
      off += BroFramed.HeaderLen + compLen
    }
    starts.toSeq
  }

  test("two-way split sweep: every boundary yields each line exactly once") {
    val f = writeBrf(lines, frameSize = 1000) // many small frames
    val len = f.length()
    assert(len > 10000, "fixture should span many frames")
    // sweep boundaries at a stride coprime-ish to the frame size, PLUS
    // every exact frame start and its ±1 neighbors — the trickiest
    // ownership cases (cut exactly at a header: the previous split must
    // emit exactly one extra record, the next must skip exactly one)
    val aligned = frameStarts(f).filter(s => s > 0 && s < len)
    assert(aligned.size >= 5, "fixture should have many interior frames")
    val boundaries =
      (257L until len by 509L) ++ Seq(1L, 16L, len - 1, len / 2) ++
        aligned ++ aligned.map(_ - 1) ++ aligned.map(_ + 1)
    boundaries.foreach { cut =>
      val got = readSplit(f, 0, cut) ++ readSplit(f, cut, len - cut)
      assert(got == lines, s"split at $cut lost or duplicated lines " +
        s"(got ${got.size} of ${lines.size})")
    }
  }

  test("three-way split at frame-aligned and unaligned cuts") {
    val f = writeBrf(lines, frameSize = 1000)
    val len = f.length()
    for ((a, b) <- Seq((len / 3, 2 * len / 3), (1013L, 1013L + 4096),
        (16L, len - 17))) {
      val got = readSplit(f, 0, a) ++ readSplit(f, a, b - a) ++ readSplit(f, b, len - b)
      assert(got == lines, s"3-way split at ($a,$b) mismatch (${got.size})")
    }
  }

  test("lines longer than a frame span frames and survive splitting") {
    val big = (0 until 50).map(i => f"big-$i%03d-" + ("y" * 3000)) // 3 KB lines, 1 KB frames
    val f = writeBrf(big, frameSize = 1000)
    val len = f.length()
    (1000L until len by 1777L).foreach { cut =>
      val got = readSplit(f, 0, cut) ++ readSplit(f, cut, len - cut)
      assert(got == big, s"split at $cut on multi-frame lines (${got.size})")
    }
  }

  test("spark reads one .brf file with MULTIPLE tasks and exact content") {
    import spark.implicits._
    BroWriter.register(spark)
    val codec = new org.apache.hadoop.io.compress.CompressionCodecFactory(
      spark.sparkContext.hadoopConfiguration)
      .getCodec(new Path("/x/y.brf"))
    assert(codec.isInstanceOf[SplittableCompressionCodec])

    val dir = Files.createTempDirectory("brf_spark_").toString + "/t"
    // post-session spark.hadoop.* conf does not propagate; set the task
    // Hadoop conf directly (local mode shares the object)
    spark.sparkContext.hadoopConfiguration.setInt(BroFramed.FrameSizeKey, 4 * 1024)
    try {
      val df = graft.Tables.load(spark, sf, "lineitem")
        .select($"l_orderkey", $"l_partkey", $"l_quantity")
      // ONE file so the parallelism can only come from splitting
      df.coalesce(1).write.option("compression", BroWriter.FramedCodecClass).csv(dir)
      val files = new File(dir).listFiles.filter(_.getName.endsWith(".brf"))
      assert(files.length == 1, "expected a single .brf output file")
      // openCostInBytes floors the split size — drop both for small files
      spark.conf.set("spark.sql.files.maxPartitionBytes", (4 * 1024).toString)
      spark.conf.set("spark.sql.files.openCostInBytes", "1024")
      val back = spark.read
        .schema("l_orderkey LONG, l_partkey LONG, l_quantity DOUBLE")
        .csv(dir)
      assert(back.rdd.getNumPartitions > 1,
        s"one .brf file should split into multiple tasks, " +
          s"got ${back.rdd.getNumPartitions} (file ${files.head.length()} B)")
      assert(back.count() == df.count())
      val a = df.orderBy($"l_orderkey", $"l_partkey", $"l_quantity")
        .collect().map(_.toString)
      val b = back.orderBy($"l_orderkey", $"l_partkey", $"l_quantity")
        .collect().map(_.toString)
      assert(a.sameElements(b))
    } finally {
      spark.conf.unset("spark.sql.files.maxPartitionBytes")
      spark.conf.unset("spark.sql.files.openCostInBytes")
      spark.sparkContext.hadoopConfiguration.unset(BroFramed.FrameSizeKey)
    }
  }
}
