package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window shapes (SURVEY §2.5). */
object Windows {

  /** Top-1 per group (W1, `/root/reference/src/routes/chat.ts:43-46`:
    * latest message per conversation, `orderBy createdAt desc, take 1`).
    *
    * The order MUST contain a unique tie-break column (SURVEY §7.4) — the
    * reference inherits Postgres's unstable tie order; we define one so the
    * result is deterministic and oracle-comparable.
    *
    * Scale shape: a single hash shuffle on the group key, then a per-group
    * sort — no global sort. Skewed groups are bounded by AQE; for a strict
    * latest-row-only need, `max_by` is the cheaper agg formulation but loses
    * the full-row "top N" generality.
    */
  def topPerGroup(df: DataFrame, partition: Seq[Column], order: Seq[Column], n: Int = 1): DataFrame =
    df.withColumn("__rn", row_number().over(Window.partitionBy(partition: _*).orderBy(order: _*)))
      .filter(col("__rn") <= n)
      .drop("__rn")

  /** Rank-within-group kept as a column (used by top-k-per-group queries). */
  def withRank(df: DataFrame, partition: Seq[Column], order: Seq[Column], as: String): DataFrame =
    df.withColumn(as, row_number().over(Window.partitionBy(partition: _*).orderBy(order: _*)))
}
