package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark has no built-in for,
  * expressed in its scalable union form rather than a range join:
  *
  *   1. tag left and right rows, union them on (key, time),
  *   2. one window per key, ordered by time, carries the last non-null
  *      right value forward (`last(..., ignoreNulls)` over an unbounded-
  *      preceding frame),
  *   3. keep the left rows.
  *
  * One hash shuffle on the key + one sort — no per-row range scan and no
  * candidate-pair explosion, which is why this shape (not a theta join)
  * is the production formulation for tick-data/feature point-in-time
  * joins at scale.
  *
  * Semantics (mirrors DuckDB `ASOF LEFT JOIN ... ON l.key = r.key AND
  * l.time >= r.time`): each left row gets the right value with the
  * greatest time ≤ its own; at equal times the right row wins (inclusive
  * match) and the greatest `valueCol` breaks exact (key, time) ties;
  * left rows before any right row get null.
  */
object AsOf {

  /** `left` keeps all its columns plus `valueCol` from `right`; both
    * inputs must already share the `key` and `time` column names.
    */
  def joinAsOf(
      left: DataFrame, right: DataFrame,
      key: String, time: String, valueCol: String): DataFrame = {
    val vType = right.schema(valueCol).dataType
    val l = left
      .withColumn(valueCol, lit(null).cast(vType))
      .withColumn("__is_right", lit(0))
    val r = right.select(col(key), col(time), col(valueCol))
      .withColumn("__is_right", lit(1))
    val carry = Window.partitionBy(col(key))
      .orderBy(col(time).asc, col("__is_right").desc, col(valueCol).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(valueCol, last(col(valueCol), ignoreNulls = true).over(carry))
      .filter(col("__is_right") === 0)
      .drop("__is_right")
  }
}
