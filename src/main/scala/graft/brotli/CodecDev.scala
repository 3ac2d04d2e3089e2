package graft.brotli

/** Dev-only codec timing harness (no Spark): builds a text-like corpus
  * from a testdata parquet's raw bytes substitute — here just a file of
  * concatenated document text passed as arg — and times encode/decode
  * per quality with proper JIT warm-up. Usage:
  *   runMain graft.brotli.CodecDev <textfile> [reps]
  */
object CodecDev {
  def main(args: Array[String]): Unit = {
    val base = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(0)))
    val reps = if (args.length > 1) args(1).toInt else math.max(1, (32 << 20) / base.length)
    val data = new Array[Byte](base.length * reps)
    var i = 0
    while (i < reps) { System.arraycopy(base, 0, data, i * base.length, base.length); i += 1 }
    val mb = data.length / 1e6
    println(f"input: $mb%.1f MB")
    for (q <- Seq(1, 2, 6, 9)) {
      // warm-up then best-of-3
      var enc: Array[Byte] = null
      var tE = Double.MaxValue
      var tD = Double.MaxValue
      for (_ <- 0 until 3) {
        val t0 = System.nanoTime()
        enc = Brotli.compress(data, q)
        tE = math.min(tE, (System.nanoTime() - t0) / 1e9)
      }
      for (_ <- 0 until 3) {
        val t1 = System.nanoTime()
        val dec = Brotli.decompress(enc)
        tD = math.min(tD, (System.nanoTime() - t1) / 1e9)
        require(java.util.Arrays.equals(dec, data), s"round-trip mismatch q$q")
      }
      println(f"q$q%-2d enc ${mb / tE}%7.1f MB/s  ratio ${data.length.toDouble / enc.length}%6.2f  dec ${mb / tD}%7.1f MB/s")
    }
  }
}
