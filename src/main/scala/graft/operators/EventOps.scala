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
