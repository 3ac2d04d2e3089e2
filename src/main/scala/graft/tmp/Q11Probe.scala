package graft.tmp
import graft.brotli.Brotli
object Q11Probe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("text").limit(2000)
      .collect().map(_.getString(0)).mkString("\n").getBytes("UTF-8")
    spark.stop()
    val target = 4 << 20
    val reps = math.max(1, target / base.length)
    val data = new Array[Byte](base.length * reps)
    (0 until reps).foreach(i => System.arraycopy(base, 0, data, i*base.length, base.length))
    println(f"input ${data.length/1e6}%.1f MB")
    for (q <- Seq(1, 5, 6, 11)) {
      Brotli.compress(data.take(1<<20), q) // warm
      val t0 = System.nanoTime()
      val enc = Brotli.compress(data, q)
      val t = (System.nanoTime()-t0)/1e9
      val rt = Brotli.decompress(enc)
      require(java.util.Arrays.equals(rt, data))
      println(f"q$q%-2d enc ${data.length/1e6/t}%8.1f MB/s ratio ${data.length.toDouble/enc.length}%6.2f")
    }
    // native for comparison
    for (q <- Seq(1, 5, 11)) {
      val pb = new ProcessBuilder("tools/brotli_cli", "c", q.toString, "22")
      val p = pb.start()
      val out = new java.io.ByteArrayOutputStream()
      val feeder = new Thread(() => { p.getOutputStream.write(data); p.getOutputStream.close() })
      val t0 = System.nanoTime()
      feeder.start(); p.getInputStream.transferTo(out); p.waitFor()
      val t = (System.nanoTime()-t0)/1e9
      println(f"native q$q%-2d enc ${data.length/1e6/t}%8.1f MB/s ratio ${data.length.toDouble/out.size}%6.2f")
    }
  }
}
