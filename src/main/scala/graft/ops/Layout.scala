package graft.ops

import org.apache.spark.sql.DataFrame

/** Storage-layout writers for scale (SURVEY §4: the parquet-side analogs of
  * the reference's physical indexes).
  *
  *   - Partitioned layout (status/date dirs) → partition pruning; covered
  *     by LayoutSpec's partitionBy test.
  *   - Bucketed layout → co-located joins: two tables bucketed (and
  *     sorted) on their join key with the same bucket count join with NO
  *     shuffle exchange and no sort — at 100 TB this turns every repeated
  *     fact-fact join on the bucket key (orders⋈lineitem style) into a
  *     zip of pre-shuffled files. Bucket count is fixed at write time:
  *     choose it for the TARGET cluster's reducer count, not today's.
  */
object Layout {

  /** Write `df` as a bucketed+sorted catalog table on `key`. Joins between
    * tables written with the same (key domain, buckets) are exchange-free.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int = 32): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
}
