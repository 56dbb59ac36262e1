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
}
