package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Structural cost counter: run a registry query once and print how
  * many Spark jobs, stages and tasks it scheduled. Wall-clock on this
  * host swings 2×+ by the half-hour (the bench ledger's parked-window
  * doctrine), so for scheduling-bound iterative operators (t24, d06,
  * g01) the job/stage/task count is the window-immune before/after
  * evidence — fewer barriers is the claim the optimization makes.
  *
  * Run:
  *   SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.JobCount \
  *     /root/testdata/sf0.1 t24_bpe_train'
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: JobCount <dataDir> <name,name,...>")
    val dir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-job-count")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicLong(0L)
    val trace = sys.env.contains("GRAFT_JOB_TRACE")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (trace) println(s"[jobtrace] job=${j.jobId} " +
          s"stages=${j.stageInfos.size} " +
          s"site=${j.stageInfos.headOption.map(_.details.linesIterator
            .take(1).mkString).getOrElse("?")} " +
          s"desc=${Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("-")}")
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks.toLong)
      }
    })
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown registry query: $name"))
      // warm-up run so codegen/source-listing costs don't count once,
      // then a measured run from zero
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      Thread.sleep(500) // let listener events drain
      jobs.set(0); stages.set(0); tasks.set(0L)
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"[jobcount] $name jobs=${jobs.get()} stages=${stages.get()} " +
        f"tasks=${tasks.get()} sec=$sec%.2f")
    }
    spark.stop()
  }
}
