package graft

import graft.brotli.Brotli

/** Dev utility: codec-only timing without a SparkSession — the
  * codecBench payload recipe (documents text dump) from a flat file.
  * Usage: runMain graft.CodecTime <payloadFile> <quality>[,<quality>...]
  * [reps]. Prints MB/s + ratio per quality and verifies the roundtrip.
  */
object CodecTime {
  def main(args: Array[String]): Unit = {
    if (args.length >= 2 && args(0) == "dec") { // dec <in.bro> — stats mode
      val enc = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(1)))
      val dec = Brotli.decompress(enc)
      graft.brotli.DecoderStats.report(args(1))
      println(s"decoded ${dec.length} bytes from ${enc.length}")
      return
    }
    if (args.length >= 3 && args(0) == "enc") { // enc <in> <out> [q]
      val data = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(1)))
      val q = if (args.length > 3) args(3).toInt else 11
      java.nio.file.Files.write(java.nio.file.Paths.get(args(2)),
        Brotli.compress(data, q))
      return
    }
    val payload = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(0)))
    val qs = args(1).split(",").map(_.toInt)
    val reps = if (args.length > 2) args(2).toInt else 3
    val mb = payload.length / 1e6
    // warm-up: the default path plus each requested tier once
    Brotli.decompress(Brotli.compress(payload, 6))
    qs.foreach { q =>
      Brotli.compress(java.util.Arrays.copyOf(payload, 1 << 18), q)
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val enc = Brotli.compress(payload, q)
        ((System.nanoTime() - t0) / 1e9, enc)
      }
      val enc = runs.head._2
      require(java.util.Arrays.equals(Brotli.decompress(enc), payload),
        s"roundtrip mismatch at q=$q")
      val t = runs.map(_._1).sorted.apply(reps / 2)
      println(f"[codectime] q=$q%-2d ${mb / t}%8.3f MB/s  ratio=${payload.length.toDouble / enc.length}%.4f  t=$t%.3fs  runs=${runs.map(r => f"${r._1}%.3f").mkString(",")}")
    }
  }
}
