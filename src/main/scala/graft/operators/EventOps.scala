package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-stream batch operators: as-of joins and gap-based
  * sessionization — composed from sort-within-key windows (preference
  * tier (a): no custom physical operator needed; Spark's window exec
  * sorts once per key-partition and both ops ride that same sort).
  *
  * Scale notes: both shuffle ONCE on the key; the window sort is
  * per-partition with spill. The as-of union trick avoids the
  * O(left × right) range join a naive inequality join would produce —
  * at 100 TB that difference is the whole game.
  */
object EventOps {

  /** Weekly cohort-retention matrix — the classic product-analytics
    * view: users grouped by their first-activity week (the cohort),
    * counted in every subsequent week they return. Row (cohort_week,
    * weeks_since, n_users) = how many of that cohort were active
    * weeks_since weeks later; weeks truncate to Mondays (both engines'
    * date_trunc convention) so the day difference is an exact multiple
    * of 7 and the division is integer-exact.
    *
    * Scale: one distinct over (user, week) — the ONLY shuffle that
    * sees event volume; the per-user cohort min and the matrix
    * aggregate run on user×weeks rows, and the result is bounded by
    * cohorts × horizon, independent of event count. */
  def cohortRetention(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val weeks = df.select(col(userCol).as("__u"),
        date_trunc("week", col(tsCol)).cast("date").as("__wk"))
      .distinct()
    val cohort = weeks.groupBy("__u").agg(min("__wk").as("cohort_week"))
    weeks.join(cohort, Seq("__u"))
      .groupBy(col("cohort_week"),
        expr("datediff(__wk, cohort_week) div 7").as("weeks_since"))
      .agg(countDistinct(col("__u")).as("n_users"))
  }

  /** Ordered-funnel analysis: for each user, the earliest
    * strictly-increasing chain of `steps` event types (classic
    * signup→click→purchase conversion). Emits one row per user with
    * the chain timestamps (`ts1..tsN`, null once the chain breaks) and
    * `steps_completed`.
    *
    * Implementation: ONE shuffle groups each user's events into a
    * sorted array, then the chain is a per-row fold over higher-order
    * array functions (filter + array_min per step) — no self-join per
    * step, which at 100 TB would be |steps| shuffles of the full event
    * log instead of one. Per-user event counts bound the array (the
    * same assumption sessionization makes). */
  def funnel(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // only step-typed events can extend the chain: collect_list drops
    // the nulls from the `when`, shrinking both the shuffle payload and
    // the per-user array to step events while every user (even with
    // zero step events) keeps a group row
    // null-ts step events are excluded outright: sort_array puts null
    // structs/fields first, so a null-ts event would be accepted as
    // step 1 (the size(acc)===0 branch skips the ts comparison) and
    // wedge the chain with a null timestamp
    val grouped = df.groupBy(col(userCol))
      .agg(sort_array(collect_list(
        when(col(typeCol).isin(steps.distinct: _*) && col(tsCol).isNotNull,
          struct(col(tsCol).as("ts"), col(typeCol).as("tp")))))
        .as("__evs"))
    // ONE greedy fold over the time-sorted events builds the whole
    // chain (greedy earliest-match is optimal for ordered subsequence
    // matching): state = timestamps matched so far; an event extends it
    // when its type is the NEXT step and its ts is strictly after the
    // last match. A per-step min-after formulation would nest each
    // step's full expression inside the next — O(steps²) interpreted
    // array scans per row.
    val stepsArr = array(steps.map(lit): _*)
    val chain = aggregate(
      col("__evs"),
      array().cast(org.apache.spark.sql.types.ArrayType(df.schema(tsCol).dataType)),
      (acc, e) => when(size(acc) >= steps.length, acc).otherwise(
        // CaseWhen branches evaluate lazily, keeping every element_at
        // in-bounds under ANSI
        when(e.getField("tp") === element_at(stepsArr, size(acc) + 1) &&
            when(size(acc) === 0, lit(true))
              .otherwise(e.getField("ts") > element_at(acc, size(acc))),
          concat(acc, array(e.getField("ts")))).otherwise(acc)))
    grouped
      .withColumn("__chain", chain)
      .select(
        (col(userCol) +: steps.indices.map(i =>
          when(size(col("__chain")) >= i + 1, element_at(col("__chain"), i + 1))
            .as(s"ts${i + 1}"))) :+
          size(col("__chain")).as("steps_completed"): _*)
  }

  /** As-of join: for each left row, attach `valueCol` from the latest
    * right row with rightTs <= leftTs and equal key. Implemented as a
    * tagged union + last-non-null window — one shuffle on the key, no
    * range-join explosion. Right columns come back null when no prior
    * right row exists (left outer as-of semantics). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, valueCol: String): DataFrame = {
    val l = left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(0))
      .withColumn("__v", lit(null).cast(right.schema(valueCol).dataType))
    val r = right.select(col(key), col(rightTs).as("__ts"), lit(1).as("__side"),
      col(valueCol).as("__v"))
    val unioned = l.select((col(key) +: l.columns.filterNot(_ == key).map(col)): _*)
      .unionByName(r, allowMissingColumns = true)
    // right rows sort BEFORE left rows at the same instant (side desc)
    // so a simultaneous right row is visible to the left row
    val w = Window.partitionBy(key).orderBy(col("__ts").asc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn("__asof", last("__v", ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .drop("__ts", "__side", "__v")
      .withColumnRenamed("__asof", s"asof_$valueCol")
  }

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same user exceeds `gapMinutes`. Returns the
    * input plus a per-user session index (1-based). */
  def gapSessionIds(df: DataFrame, userCol: String, tsCol: String,
      gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol))
    val gapSec = gapMinutes * 60L
    val newSession = when(
      unix_timestamp(col(tsCol)) - unix_timestamp(lag(col(tsCol), 1).over(w)) > gapSec, 1L)
      .otherwise(0L)
    df.withColumn("session_id",
      (sum(coalesce(newSession, lit(0L)))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)) + 1).cast("long"))
  }
}
