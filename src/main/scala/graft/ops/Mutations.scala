package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-side semantics of the reference (SURVEY §2.9) as batch dataflow.
  *
  * Parquet is immutable, so OLTP-shaped point mutations become (a) upsert =
  * anti-join + union, (b) delete = anti-join, (c) update = join + coalesce
  * merge, (d) a change-log + latest-wins view for soft state. These are the
  * standard lakehouse merge-on-read shapes: at 100 TB each is a single
  * key-partitioned shuffle (or broadcast when the mutation batch is small —
  * the usual case, which AQE detects), never a rewrite of the base table.
  */
object Mutations {

  /** Idempotent upsert with `update: {}` — create-if-missing (M5/M6,
    * `/root/reference/src/routes/setup.ts:34-68`, `chat.ts:21-74`
    * find-or-create): rows of `incoming` whose key is absent from `target`
    * are appended; existing rows win unchanged (J9 anti-join pattern,
    * `favorites.ts:23-34`).
    */
  def upsert(target: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame = {
    val joinCond = keys.map(k => target(k) === incoming(k)).reduce(_ && _)
    target.unionByName(incoming.join(target, joinCond, "left_anti"))
  }

  /** Hard delete + FK cascade (M4, `admin.ts:112-116` + `migration.sql:124`):
    * parent rows matching `deletePred` disappear; child rows referencing
    * them disappear too (anti-join on the FK).
    */
  def deleteCascade(
      parent: DataFrame,
      deletePred: Column,
      child: DataFrame,
      childFk: String,
      parentKey: String): (DataFrame, DataFrame) = {
    val deletedKeys = parent.filter(deletePred).select(col(parentKey))
    val survivingParent = parent.filter(!deletePred)
    val survivingChild =
      child.join(deletedKeys, child(childFk) === deletedKeys(parentKey), "left_anti")
    (survivingParent, survivingChild)
  }

  /** Conditional partial update (M2, `auth.ts:142-157`: `...(name && {name})`
    * — only provided fields change). `patch` carries the key plus nullable
    * new values; null means "keep the old value".
    */
  def patchUpdate(target: DataFrame, patch: DataFrame, key: String): DataFrame = {
    val patchCols = patch.columns.filterNot(_ == key).toSeq
    val renamed = patch.select(
      (col(key).as("__pk") +: patchCols.map(c => col(c).as(s"__p_$c"))): _*)
    val joined = target.join(broadcast(renamed), target(key) === col("__pk"), "left")
    val merged = patchCols.foldLeft(joined) { (df, c) =>
      df.withColumn(c, coalesce(col(s"__p_$c"), col(c)))
    }
    merged.select(target.columns.map(col).toSeq: _*)
  }

  /** Merge-on-read latest-wins view (M3, soft delete / touch semantics:
    * `ads.ts:259-262`, `chat.ts:205-208`): the newest change-log row per key
    * is the current state. `order` must end in a unique tie-break.
    */
  def latestWins(changeLog: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame =
    Windows.topPerGroup(changeLog, keys, order)
}
