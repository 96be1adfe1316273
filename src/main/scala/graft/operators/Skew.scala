package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities. AQE's skew-join handles most cases at
  * runtime; explicit salting remains the tool when one side has a few
  * pathological hot keys and the other side is small enough to
  * replicate (classic power-law key distributions in 100 TB logs).
  */
object Skew {

  /** Salted inner equi-join: the skewed (left) side gets a random salt
    * in [0, saltBuckets); the right side is replicated across all salt
    * values, so each hot key spreads over saltBuckets reducers instead
    * of one. Use when a handful of keys dominate; cost = right side
    * replicated saltBuckets times (keep it the smaller input).
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    val salted = skewed.withColumn("__salt",
      (rand(42) * saltBuckets).cast("int"))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
