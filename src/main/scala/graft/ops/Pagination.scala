package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** OFFSET/LIMIT pagination semantics of the reference
  * (`/root/reference/src/routes/ads.ts:97,138-139`: `skip=(page-1)*limit`,
  * `take=limit`, default limit 20).
  *
  * Spark-native formulation: total-order sort (caller MUST include a unique
  * tie-break column — the reference inherits Postgres's unstable tie order;
  * we define a deterministic one) then `offset`/`limit`, which Catalyst
  * plans as GlobalLimit(skip+take)+drop-skip without materializing the full
  * sorted relation.
  *
  * 100 TB caveat: any OFFSET pagination is a global top-(skip+take) per
  * page; fine for UI-depth pages (the reference's use), degenerate for deep
  * scans. `keysetAfter` is the scalable variant: a predicate on the last-seen
  * sort key turns page N into an indexed/zone-map-prunable range scan with no
  * global ordering state.
  */
object Pagination {
  def page(df: DataFrame, order: Seq[Column], pageNum: Int, limit: Int): DataFrame = {
    val skip = math.max(0, (pageNum - 1)) * limit
    df.orderBy(order: _*).offset(skip).limit(limit)
  }

  /** Keyset ("seek") pagination: rows strictly after `afterPred` in the sort
    * order. At scale this pushes down to the scan instead of sorting the
    * world; the caller supplies the composite (key, id) comparison.
    */
  def keysetAfter(df: DataFrame, order: Seq[Column], afterPred: Column, limit: Int): DataFrame =
    df.filter(afterPred).orderBy(order: _*).limit(limit)
}
