/*
 * Lives in `org.apache.spark.sql` (the standard extension-point pattern
 * for Spark libraries) to reach two `private[sql]` helpers. Single
 * purpose: PLAN FLATTENING for cacheable pipeline results.
 *
 * Why: caching a multi-stage result with `persist` keys the cache entry
 * by the result's FULL logical plan, which nests every upstream stage's
 * plan. Unpersisting any of those upstream stages later makes the
 * CacheManager re-cache (= clear the buffers of) the dependent entry,
 * throwing away an already-materialized result and forcing the next
 * consumer to recompute the whole chain — measured live at sf1 as
 * identical same-JVM executions costing 10 s or 75 s depending on who
 * won the race (operators/Dedup.scala `viaPersisted` for the story).
 *
 * `flatten` rebuilds the result as a scan over its own execution RDD:
 * the LOGICAL plan becomes one flat LogicalRDD (so no upstream
 * unpersist can ever invalidate it) while the RDD lineage stays intact
 * (so an evicted cache entry still recomputes — unlike
 * `localCheckpoint`, which truncates lineage and makes eviction fatal).
 * This is exactly `Dataset.localCheckpoint` minus the truncation, built
 * from the same `LogicalRDD.fromDataset` helper Spark uses there
 * (preserving output partitioning/ordering, so downstream joins on the
 * flattened frame don't re-shuffle).
 */
package org.apache.spark.sql

import org.apache.spark.sql.execution.LogicalRDD

object GraftSqlShims {
  /** The result's plan, flattened to a single LogicalRDD scan.
    *
    * NOT lazy under AQE (Spark 4 default): `queryExecution.toRdd`
    * calls `executedPlan.execute()`, and on an AdaptiveSparkPlanExec
    * with exchanges that materializes every non-final query stage
    * eagerly — most of the query runs at flatten time, with only the
    * final stage deferred to the first action. Fine for the intended
    * caller (viaPersisted counts the frame immediately anyway); a
    * caller needing a genuinely lazy flatten must disable adaptive
    * execution for the plan being flattened. */
  def flattenPlan(df: DataFrame): DataFrame = {
    val c = df.asInstanceOf[classic.Dataset[Row]]
    val flat = LogicalRDD.fromDataset(
      c.queryExecution.toRdd, c, c.isStreaming)
    classic.Dataset.ofRows(c.sparkSession, flat)
  }

  /** Eager checkpoint that also returns the materialized ROW COUNT —
    * Spark's own `Dataset.checkpoint(eager=true)` counts the RDD to
    * force materialization and throws the number away; iterative
    * fixpoint loops (recursive CTEs) then immediately run a SECOND
    * whole job just to learn whether the frontier was empty. This is
    * the same construction (`toRdd.map(_.copy())` → mark checkpointed
    * → count → wrap in a flat LogicalRDD), surfacing the count: one
    * job per round instead of two. `reliable = true` requires
    * `sc.setCheckpointDir` (caller's responsibility, as with
    * Dataset.checkpoint); false marks a localCheckpoint
    * (MEMORY_AND_DISK cache blocks, lineage truncated at
    * materialization). */
  def checkpointWithCount(df: DataFrame, reliable: Boolean): (DataFrame, Long) = {
    val c = df.asInstanceOf[classic.Dataset[Row]]
    // copy: toRdd yields reused UnsafeRow buffers; persisting without
    // a defensive copy aliases every row in a partition to the last
    val rdd = c.queryExecution.toRdd.map(_.copy())
    if (reliable) rdd.checkpoint() else rdd.localCheckpoint()
    val n = rdd.count()
    val flat = LogicalRDD.fromDataset(rdd, c, c.isStreaming)
    (classic.Dataset.ofRows(c.sparkSession, flat), n)
  }

  /** [[checkpointWithCount]] that additionally folds the EXACT sum of a
    * LongType column into the same forcing job (r17, VERDICT r16 #4):
    * the connected-components loop's convergence probe (the label sum,
    * which strictly decreases while labels change) previously ran as a
    * second aggregate job over the just-checkpointed round — with the
    * fold, one job per round does materialize + count + sum.
    *
    * Retry-safe without accumulator semantics: the fold runs as an
    * ordinary mapPartitions JOB over the checkpoint-marked RDD, so a
    * retried task recomputes its partition and returns its partial sum
    * exactly once through the job's result channel (accumulators, by
    * contrast, can double-count retried tasks). Exactness at corpus
    * scale: per-partition partials accumulate in a Long with two's-
    * complement overflow detection spilling into a BigInteger, and the
    * driver reduces partials as BigInt — id sums past 2^63 stay exact,
    * matching the decimal(38,0) SUM it replaces. Nulls are skipped,
    * like SQL SUM. */
  def checkpointWithCountSum(df: DataFrame, reliable: Boolean,
      sumOrdinal: Int): (DataFrame, Long, BigInt) = {
    val c = df.asInstanceOf[classic.Dataset[Row]]
    require(c.schema(sumOrdinal).dataType ==
      org.apache.spark.sql.types.LongType,
      s"checkpointWithCountSum: column $sumOrdinal must be LongType")
    val rdd = c.queryExecution.toRdd.map(_.copy())
    if (reliable) rdd.checkpoint() else rdd.localCheckpoint()
    // the job runs on a CHILD of `rdd`: RDD.doCheckpoint at job end
    // recurses into dependencies, so the checkpoint materializes
    // exactly as it does under the plain count() above
    val partials = rdd.mapPartitions { it =>
      var n = 0L
      var acc = 0L
      var over = java.math.BigInteger.ZERO
      while (it.hasNext) {
        val r = it.next()
        n += 1
        if (!r.isNullAt(sumOrdinal)) {
          val v = r.getLong(sumOrdinal)
          val s = acc + v
          if (((acc ^ s) & (v ^ s)) < 0) { // signed-overflow spill
            over = over.add(java.math.BigInteger.valueOf(acc)); acc = v
          } else acc = s
        }
      }
      Iterator.single((n, over.add(java.math.BigInteger.valueOf(acc)).toString))
    }.collect()
    val n = partials.iterator.map(_._1).sum
    val s = partials.foldLeft(BigInt(0))((a, p) => a + BigInt(p._2))
    val flat = LogicalRDD.fromDataset(rdd, c, c.isStreaming)
    (classic.Dataset.ofRows(c.sparkSession, flat), n, s)
  }

  /** Column ⇄ Expression bridges (private[sql] in Spark 4): custom
    * expressions whose constructor carries non-Column state (e.g. a
    * Broadcast handle — graft.functions.VectorExpressions
    * .MaxCosineVsMatrix) cannot route through FunctionRegistry's
    * Column-only builders, so operators build them directly. */
  def columnOf(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
  def expressionOf(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
