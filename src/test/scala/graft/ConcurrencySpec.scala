package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** Concurrent-query isolation: the engine must not couple queries
  * through session state (the r5/r6 verdict concern class: a
  * session-conf write in one operator leaking into a concurrently
  * planned query). Every conf-sensitive operator family runs
  * interleaved against ONE shared session and must reproduce its
  * single-threaded results exactly.
  */
class ConcurrencySpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.001"

  test("interleaved conf-sensitive queries reproduce single-thread results") {
    implicit val ec: ExecutionContext = ExecutionContext.global
    // the families that historically tempted session-conf writes:
    // nanos events reads, the CC loop width, windowed ops, sampling
    val names = Seq("pl_dedup_clusters", "pl_asof_join", "pl_sessionize",
      "q1_agg", "pl_shuffle_shard", "pl_sample_temperature")
    def run(n: String): Seq[String] =
      SparkEntry.queries(n)(spark, dir).collect().map(_.toString).sorted.toSeq
    val expected = names.map(n => n -> run(n)).toMap
    val futs = (1 to 2).flatMap(_ => names.map(n => Future(n -> run(n))))
    val got = Await.result(Future.sequence(futs), 10.minutes)
    for ((n, rows) <- got)
      assert(rows == expected(n), s"$n diverged under concurrency")
  }
}
