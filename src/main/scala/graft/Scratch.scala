package graft

import java.nio.file.{Files, Path}
import java.util.concurrent.atomic.AtomicInteger

/** Per-JVM scratch space for queries that must materialize `.bro` files
  * (q22/q38/q41/st06). One temp root per JVM, a fresh subdirectory per
  * request, and a shutdown hook that reaps the whole tree — long-lived
  * sessions no longer leak a directory per query invocation.
  */
object Scratch {
  private val counter = new AtomicInteger()

  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft_scratch_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(r)))
    r
  }

  /** A fresh, unique scratch directory path (not yet created — Spark
    * writers create it). */
  def dir(name: String): String =
    root.resolve(s"$name-${counter.incrementAndGet()}").toString

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(deleteRecursively(_)) finally s.close()
    }
    try Files.deleteIfExists(p) catch { case _: Exception => () }
  }
}
