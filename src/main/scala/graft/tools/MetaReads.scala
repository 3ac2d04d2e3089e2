package graft.tools

import org.apache.spark.sql.SparkSession

/** r18 metadata-read audit: run registry queries once with the GraftFs
  * read tally armed (GRAFT_FS_COUNT=1) and print, per query, how many
  * manifest/schema/propset reads the catalog performed — each one is a
  * GET on an object store at production scale. */
object MetaReads {
  def main(args: Array[String]): Unit = {
    require(sys.env.contains("GRAFT_FS_COUNT"),
      "arm the tally: GRAFT_FS_COUNT=1")
    val dir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-meta-reads")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import scala.jdk.CollectionConverters._
    names.foreach { name =>
      graft.sources.GraftFs.readCounts.clear()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val counts = graft.sources.GraftFs.readCounts.asScala
        .map { case (k, v) => s"$k=${v.sum()}" }.toSeq.sorted.mkString(" ")
      println(s"[metareads] $name $counts")
    }
    spark.stop()
  }
}
