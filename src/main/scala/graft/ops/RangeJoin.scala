package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join WITHOUT an equi key — the join class a
  * hash join cannot express and a naive formulation turns into a cross
  * product. Bucketized formulation: time is chunked into `bucketSeconds`
  * buckets; each interval explodes into every bucket it overlaps, each
  * point lands in exactly one, and the join becomes an equi-join on the
  * bucket id followed by the exact range predicate.
  *
  * Scale properties: shuffle keys are bucket ids (fixed-width longs);
  * work is proportional to points + intervals × (span/bucket), so the
  * bucket width is the tuning knob — pick it near the median interval
  * span so most intervals explode into ≤2 buckets. This is the same
  * shape Databricks' range-join optimization generates from a hint.
  */
object RangeJoin {

  /** Inner-join `points` rows to every `intervals` row whose CLOSED
    * interval [startCol, endCol] contains the point. Both time columns
    * must be timestamps; bucket ids derive from epoch seconds. The
    * intermediate cast to TIMESTAMP (not straight to long) keeps NTZ
    * columns working — TIMESTAMP_NTZ has no direct numeric cast.
    */
  def pointInInterval(
      points: DataFrame, ptCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketSeconds: Long = 3600L): DataFrame = {
    def secs(c: String) = col(c).cast("timestamp").cast("long")
    val pb = points.withColumn("__b", floor(secs(ptCol) / bucketSeconds))
    val ib = intervals.withColumn("__b", explode(sequence(
      floor(secs(startCol) / bucketSeconds),
      floor(secs(endCol) / bucketSeconds))))
    pb.join(ib, Seq("__b"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__b")
  }
}
