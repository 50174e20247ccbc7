package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dynamic WHERE assembly (reference `/root/reference/src/routes/ads.ts:100-123`:
  * the Prisma `where` object built field-by-field from optional query params).
  *
  * In Spark the same shape is a fold of `Option[Column]` predicates into
  * `filter` calls; Catalyst merges consecutive Filters and pushes them to the
  * parquet scan, so assembly order is irrelevant to the physical plan.
  */
object Predicates {
  def applyAll(df: DataFrame, preds: Option[Column]*): DataFrame =
    preds.flatten.foldLeft(df)(_ filter _)

  /** Case-insensitive literal substring match — Prisma `contains` with
    * `mode: 'insensitive'` (`ads.ts:104-109,121-123`). Literal semantics:
    * no `%`/`_` wildcard interpretation (unlike raw ILIKE), so the oracle
    * twin must use `strpos(lower(col), lower(term)) > 0`, not ILIKE.
    */
  def icontains(c: Column, term: String): Column =
    lower(c).contains(term.toLowerCase(java.util.Locale.ROOT))

  /** Optional inclusive range (`ads.ts:115-119`), each bound independent. */
  def range(c: Column, min: Option[Double], max: Option[Double]): Seq[Option[Column]] =
    Seq(min.map(c >= _), max.map(c <= _))
}
