package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join shapes of the reference (SURVEY §2.3).
  *
  * Prisma `include` relation loads (`/root/reference/src/routes/ads.ts:140-153`)
  * become real joins here: to-one dims are broadcast-joined, `_count`
  * relations become a grouped count left-joined back (J3/J4).
  */
object Joins {

  /** `_count.<relation>` (J3/J4, `ads.ts:150-153`, `admin.ts:25-29`):
    * per-key counts of a fact table, left-joined with 0 default.
    *
    * Scale shape: when `prune` is set, the fact side is first left-semi
    * pruned to the keys actually present on `left` — at 100 TB the grouped
    * count then shuffles only the matching slice, not the whole fact table,
    * and AQE turns the final left join into a broadcast join because the
    * pruned aggregate is small.
    */
  def withCount(
      left: DataFrame,
      leftKey: String,
      fact: DataFrame,
      factKey: String,
      as: String,
      prune: Boolean = true): DataFrame = {
    val pruned =
      if (prune)
        fact.join(left.select(col(leftKey)), col(factKey) === col(leftKey), "left_semi")
      else fact
    val counts = pruned.groupBy(col(factKey)).agg(count(lit(1)).as(as))
    left
      .join(counts, left(leftKey) === counts(factKey), "left")
      .drop(counts(factKey))
      .withColumn(as, coalesce(col(as), lit(0L)))
  }

  /** Existence semi-join as a boolean scalar (J8, `favorites.ts:109-118`:
    * `!!favorite`). One row, one boolean column.
    */
  def existsAs(df: DataFrame, pred: Column, as: String): DataFrame =
    df.filter(pred).agg((count(lit(1)) > 0).as(as))
}
