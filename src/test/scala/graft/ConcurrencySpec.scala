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

  test("mixed register/DML/vars/filters on ONE session: 8 threads isolated (r13)") {
    // the 100 TB story implies concurrent statements against one
    // GraftSession — its registry, session vars, and named filters are
    // shared state (concurrent TrieMaps). Eight threads each drive a
    // full lifecycle under THREAD-SCOPED names (one session = one
    // namespace, so distinct names are the documented isolation
    // contract) plus shared reads; every thread must see exactly its
    // own data at every step.
    implicit val ec: ExecutionContext = ExecutionContext.global
    val gs = new graft.engine.GraftSession(spark)
    gs.registerLazy("nation", () => graft.Tables(spark, dir, "nation"))
    def rows(n: String, sql: String): Seq[Seq[Any]] =
      gs.sql(sql).collect().toSeq.map(r =>
        (0 until r.length).map(i => if (r.isNullAt(i)) null else r.get(i)))
    val futs = (0 until 8).map { i => Future {
      val t = s"ct_$i"
      // register via CTAS off the shared source
      gs.sql(s"CREATE TABLE $t AS SELECT n_nationkey AS k, n_regionkey AS r FROM nation WHERE n_nationkey < ${5 + i}")
      gs.sql(s"INSERT INTO $t (k, r) VALUES (${100 + i}, ${i})")
      gs.sql(s"UPDATE $t SET r = ${1000 + i} WHERE k = ${100 + i}")
      // session var + named filter, thread-scoped names
      gs.sql(s"SET @bar_$i = ${100 + i}")
      gs.addFilter(s"flt_$i", s"FILTER k >= @bar_$i")
      val got = rows(s"q$i",
        s"SELECT k, r FROM $t WHERE INCLUDE flt_$i ORDER BY k")
      assert(got == Seq(Seq(100L + i, 1000L + i)), s"thread $i: $got")
      // correlated subquery over the shared source stays correct
      val n = rows(s"s$i",
        s"SELECT count(*) AS c FROM $t WHERE r IN (SELECT n_regionkey FROM nation)").head.head
      assert(n == (5 + i).toLong, s"thread $i shared-read: $n")
      gs.sql(s"DELETE FROM $t WHERE k = ${100 + i}")
      val left = rows(s"d$i", s"SELECT count(*) AS c FROM $t").head.head
      assert(left == (5 + i).toLong, s"thread $i post-delete: $left")
      gs.sql(s"DROP TABLE $t")
      i
    }}
    val done = Await.result(Future.sequence(futs), 10.minutes)
    assert(done == (0 until 8))
    // the shared source is untouched and the registry holds no leftovers
    assert(gs.sql("SELECT count(*) AS c FROM nation").collect()(0).getLong(0) == 25L)
    (0 until 8).foreach { i =>
      intercept[Exception](gs.sql(s"SELECT * FROM ct_$i").collect())
    }
  }
}
