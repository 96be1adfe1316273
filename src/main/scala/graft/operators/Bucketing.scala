package graft.operators

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout: the one-time write that amortizes every
  * later join/aggregation on the bucket key. A corpus written
  * `bucketBy(n, key)` reads back hash-clustered, so joins and groupBys
  * on that key satisfy their distribution requirement from the LAYOUT
  * — zero Exchange at any data size. At 100 TB this is the difference
  * between re-shuffling the corpus on every dedup/incremental-append
  * join and never shuffling it again (the same role the reference's
  * siphash-of-filename partitioner plays for its file source,
  * datasource/files/filesource.go:46-51 — but carried by the table
  * format and honored by the optimizer, not hand-routed).
  */
object Bucketing {

  /** Write `df` as a parquet table bucketed (and in-bucket sorted) by
    * `key` into the session catalog. Joins between tables bucketed the
    * same way on the same key compile to exchange-free sort-merge
    * joins — the PlanSpec gate asserts exactly that. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
}
