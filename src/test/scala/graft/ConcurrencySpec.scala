package graft

import java.util.concurrent.Executors

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

import org.scalatest.funsuite.AnyFunSuite

/**
 * Concurrent use of one SparkSession — the deployment reality of a shared
 * analytics service (the reference serves concurrent HTTP readers the
 * same way: one log, many readers). Each query's result under an 8-way
 * concurrent storm must equal its serial result.
 */
class ConcurrencySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("8 concurrent relational queries return serial-identical results") {
    val names = Seq("q_agg", "q_join3", "q_window", "q_topk",
                    "q_filter", "q_rollup", "q_quantile", "q_exists")
    val serial = names.map { n =>
      n -> SparkEntry.queries(n)(spark, dir).collect().map(_.toString).sorted.toSeq
    }.toMap
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = (1 to 2).flatMap { _ =>
        names.map { n =>
          Future(n -> SparkEntry.queries(n)(spark, dir).collect().map(_.toString).sorted.toSeq)
        }
      }
      val results = Await.result(Future.sequence(futures), Duration("300s"))
      results.foreach { case (n, rows) =>
        assert(rows === serial(n), s"$n diverged under concurrency")
      }
    } finally pool.shutdown()
  }

  test("one writer + concurrent readers: range/read invariants never tear") {
    // the reference's deployment shape: the collector goroutine appends
    // while HTTP readers poll range/point/page concurrently
    val log = new graft.streaming.OffsetLog(0, 500)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val readers = (1 to 4).map { _ =>
      new Thread(() => {
        while (!stop.get()) {
          val r = log.range
          if (!r.isEmpty) {
            if (r.earliest > r.latest) failures.add(s"inverted range $r")
            // a read inside the observed range may race retention (purged
            // → OutOfRange is legal) but must NEVER report FutureOffset
            log.read(r.latest) match {
              case Left(graft.operators.EventLog.FutureOffset) =>
                failures.add(s"future error inside observed range $r")
              case _ => ()
            }
            val snap = log.snapshot.map(_._1)
            if (snap.nonEmpty && snap != (snap.head to snap.last)) {
              failures.add(s"snapshot offsets not dense: ${snap.take(5)}...")
            }
          }
        }
      })
    }
    readers.foreach(_.start())
    (0 until 2000).foreach(i => log.write(i.toString.getBytes("UTF-8")))
    stop.set(true)
    readers.foreach(_.join())
    assert(failures.isEmpty, s"invariant violations: ${failures.toArray.take(3).mkString("; ")}")
    assert(log.range.latest === 1999L)
  }
}
