package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-round timing of the incremental BPE trainer (t24) — run with
  * `runMain graft.tools.BpeProf [nMerges] [sfDir]`. */
object BpeProf {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 30
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master(sys.env.getOrElse("BPE_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("BPE_SHUF", "1"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, dir, "documents")
    val instr = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val t0 = System.nanoTime()
    var lastT = t0
    val hook = new scala.collection.mutable.ArrayBuffer[(Long, Long)]() {
      override def addOne(e: (Long, Long)) = {
        val now = System.nanoTime()
        println(f"[bpe] round ${size + 1}%3d affected=${e._1}%6d " +
          f"vocab=${e._2}%6d dt=${(now - lastT) / 1e9}%6.2f s")
        lastT = now
        super.addOne(e)
      }
    }
    val (_, merges) = graft.ops.TextOps.t24Train(spark, docs, n, Some(hook))
    merges.collect().foreach { r =>
      println(s"[bpe-merge] rank ${r.getLong(0)} |lhs|=${r.getString(1).length} " +
        s"|rhs|=${r.getString(2).length} count=${r.getLong(3)}")
    }
    println(f"[bpe] total ${(System.nanoTime() - t0) / 1e9}%.1f s for $n merges")
    spark.stop()
  }
}
