package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan quality gates: these are the properties that decide
  * whether a query survives a 100 TB scale-up — filters reaching the
  * parquet scan, column pruning, broadcast joins for dims, partial
  * aggregation, top-k instead of full sort.
  */
class PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("filters push down to the parquet scan") {
    val p = plan("q2_filter_proj")
    assert(p.contains("PushedFilters: [IsNotNull"), p)
    assert(p.contains("GreaterThan"), p) // value filters reach the scan
  }

  test("projection prunes the scan schema") {
    val p = plan("q2_filter_proj")
    // only the needed columns are read — the 16-column lineitem scan
    // must not appear
    assert(!p.contains("l_returnflag"), "unpruned column in scan:\n" + p)
    assert(p.contains("l_extendedprice"), p)
  }

  test("star join broadcasts the dimension tables") {
    val p = plan("q5_star_join")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("aggregation is partial+final hash agg inside codegen") {
    val p = SparkEntry.queries("q1_agg")(spark, dir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial_sum"), p)
    // codegen'd stages carry the *(n) marker — visible in the FINAL
    // adaptive plan, so execute first
    val df = SparkEntry.queries("q1_agg")(spark, dir)
    df.collect() // count() would build a different plan instance
    val fin = df.queryExecution.executedPlan.toString
    assert(fin.contains("*("), fin)
  }

  test("order-by + limit compiles to top-k, not a full sort") {
    val p = plan("q9_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("semi and anti joins use join operators, not subquery loops") {
    assert(plan("q4_semi_join").contains("LeftSemi"), plan("q4_semi_join"))
    assert(plan("q11_anti_join").contains("LeftAnti"), plan("q11_anti_join"))
  }

  test("engine-dialect queries get the same pushdown treatment") {
    val p = plan("ql_select_where")
    assert(p.contains("PushedFilters: [IsNotNull"), p)
    assert(p.contains("GreaterThan(l_quantity") || p.contains("EqualTo(l_returnflag"), p)
  }
}
