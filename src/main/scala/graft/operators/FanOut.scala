package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive compute fan-out (optimization guide §2.5 "input
  * skew": one huge unsplittable file → repartition immediately after
  * the read).
  *
  * The gram-hashing operators (winnowing, repeated-span dedup,
  * boilerplate screens) run an md5 per overlapping k-gram — hundreds
  * of hash calls per document — as part of the SCAN stage. On the
  * bench fixtures each table is ONE small parquet file, so that scan
  * is a single task and the whole hashing pass serializes on one core
  * (measured at sf0.1: pl_dedup_substring 4-7 core-s of task time on a
  * 12-task query, wall ≈ task time). At production scale the same scan
  * has thousands of row-group splits and needs no help.
  *
  * `byKey` repartitions the (still-narrow) document frame by the doc
  * id ONLY when the frame's physical partitioning underuses the
  * cluster (fewer than half of `defaultParallelism` partitions) — a
  * data-layout decision, not a constant: at 100 TB the condition is
  * false and the call is a no-op, so no extra exchange of corpus bytes
  * is ever added on a real cluster. When it does fire, the exchange
  * carries raw doc rows — cheaper than the exploded gram rows the
  * downstream shuffle would otherwise carry — and hash-partitioning by
  * the doc id lets per-document windows downstream reuse the
  * partitioning instead of re-exchanging.
  *
  * Results are partitioning-independent at every call site (keyed
  * aggregations / joins / per-doc windows over integer and string
  * domains — no cross-partition float accumulation), so the decision
  * may differ between the verify (8-core) and bench (32-core) runs
  * without observable effect.
  *
  * Safe on any frame: exchange-bearing plans (joins, aggregations,
  * windows, sorts, set ops) are left untouched — both because
  * `rdd.getNumPartitions` on such a plan would eagerly materialize its
  * query stages under AQE, and because their partitioning is already a
  * shuffle's output (cluster-wide). The fan-out only ever fires on
  * narrow scan-rooted frames.
  */
object FanOut {
  import org.apache.spark.sql.catalyst.plans.logical._

  /** True when the optimized plan is narrow (leaf + per-row ops only)
    * so physical partitioning equals the scan's and `.rdd` builds no
    * query stages. */
  private def narrow(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case _: Join | _: Aggregate | _: Window | _: Sort | _: Distinct |
           _: RepartitionOperation | _: SetOperation | _: GlobalLimit |
           _: Union => ()
    }.isEmpty

  def byKey(df: DataFrame, key: Column): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (!narrow(df)) return df
    // NonFatal only (ADVICE r16): a Throwable catch would swallow
    // OutOfMemoryError/InterruptedException into a silent no-op decision
    val n = try df.rdd.getNumPartitions
      catch { case scala.util.control.NonFatal(_) => p }
    // explicit partition count: AQE's coalescing targets an advisory
    // BYTE size (64 MB) and would immediately coalesce a ~2 MB text
    // frame back to one partition — but these stages are compute-dense
    // (hundreds of md5 calls per row), where bytes mispredict cost by
    // orders of magnitude. defaultParallelism is cluster-adaptive, and
    // the n*2<=p guard keeps the exchange out of plans whose scan is
    // already parallel.
    if (n * 2 <= p) df.repartition(p, key) else df
  }
}
