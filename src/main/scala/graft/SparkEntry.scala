package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{CoreQueries, EngineQueries, PipelineQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator's named query;
  * `oracleSql` carries the DuckDB-equivalent SQL for the driver's
  * correctness gate. Column names are aliased identically on both sides
  * (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star join with broadcast dims + hash agg — the canonical shape this
    * engine is optimized for. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.all("q5_star_join").fn(spark, "/root/testdata/sf0.001")

  private def groups: Seq[Map[String, CoreQueries.Q]] = Seq(
    CoreQueries.all,
    EngineQueries.all,
    PipelineQueries.all,
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.flatten.map { case (k, q) => k -> q.fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    groups.flatten.collect { case (k, q) if q.oracle.isDefined => k -> q.oracle.get }.toMap
}
