package graft.brotli

import java.util.concurrent.{Executors, TimeUnit}

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Spark runs the codec from 32 concurrent tasks sharing the encoder/
  * decoder pools — pooled-state leakage (a reset() slip, a shared
  * buffer) would surface as cross-thread corruption that single-thread
  * suites can never see. Hammer the one-shot API from many threads at
  * mixed qualities and assert (a) every round-trip is exact and (b)
  * every thread's output is byte-identical to a single-thread reference
  * encode of the same payload (the pool must be semantically invisible). */
class PoolConcurrencySpec extends AnyFunSuite {

  private def payload(seed: Int): Array[Byte] = {
    val rnd = new Random(seed)
    val words = Array("shared", "pool", "state", "must", "not", "leak",
      "between", "threads", "ever")
    val sb = new StringBuilder
    while (sb.length < 40000 + (seed % 7) * 1000) {
      sb.append(words(rnd.nextInt(words.length))).append(' ')
      if (rnd.nextInt(19) == 0) sb.append(rnd.nextInt(1000))
    }
    sb.toString.getBytes
  }

  test("pooled coders are semantically invisible under 16-way concurrency") {
    val qualities = Seq(1, 5, 6, 11)
    // single-thread reference bytes per (seed, q), computed first so the
    // pool already holds warm instances when the hammer starts
    val ref = (for { s <- 0 until 4; q <- qualities }
      yield (s, q) -> Brotli.compress(payload(s), q)).toMap
    val pool = Executors.newFixedThreadPool(16)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val tasks = for { t <- 0 until 16; it <- 0 until 3 } yield {
      pool.submit(new Runnable {
        def run(): Unit = try {
          val s = (t + it) % 4
          val q = qualities((t * 3 + it) % qualities.length)
          val data = payload(s)
          val enc = Brotli.compress(data, q)
          if (!java.util.Arrays.equals(enc, ref((s, q))))
            failures.add(s"thread=$t it=$it q=$q: bytes differ from reference")
          if (!java.util.Arrays.equals(Brotli.decompress(enc), data))
            failures.add(s"thread=$t it=$it q=$q: round-trip mismatch")
        } catch {
          case e: Throwable => failures.add(s"thread=$t it=$it: ${e.getMessage}")
        }
      })
    }
    tasks.foreach(_.get())
    pool.shutdown()
    pool.awaitTermination(60, TimeUnit.SECONDS)
    assert(failures.isEmpty,
      s"${failures.size} failures:\n${java.util.Arrays.toString(failures.toArray)}")
  }
}
