package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.Mutations

/** The reference's write-side semantics (SURVEY §2.9) verified as
  * snapshot queries: each mutation is applied to the base tables in-plan and
  * the resulting state (or an aggregate of it) is the query output, so the
  * DuckDB oracle can check the merge logic itself.
  */
object Maintenance {

  /** M5 idempotent seed upsert (`setup.ts:34-68`): one conflicting row
    * (NATION_1 exists → existing row wins) + two new categories appended.
    */
  def upsertSeed(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val incoming = Seq(
      (1, "NATION_1", 1),      // conflict on unique name -> dropped
      (900, "ZENITHIA", 0),    // new -> appended
      (901, "AVALORIA", 2))    // new -> appended
      .toDF("n_nationkey", "n_name", "n_regionkey")
    Mutations.upsert(Tables.nation(spark, sfDir), incoming, Seq("n_name"))
      .orderBy(col("n_nationkey").asc)
  }

  /** M4 hard delete + FK cascade (`admin.ts:112-116`): deleting all
    * 'deleted'-status ads cascades into favorites; output is the surviving
    * row counts on both sides.
    */
  def cascadeDelete(spark: SparkSession, sfDir: String): DataFrame = {
    val (ads, favs) = Mutations.deleteCascade(
      Tables.orders(spark, sfDir), col("o_orderstatus") === "F",
      Tables.lineitem(spark, sfDir), "l_orderkey", "o_orderkey")
    ads.agg(count(lit(1)).as("surviving_ads"))
      .crossJoin(favs.agg(count(lit(1)).as("surviving_favorites")))
  }

  /** M2 conditional partial update (`auth.ts:142-157`): a patch batch where
    * null means keep-old; a patch row with no matching key is a no-op.
    * Output: the patched neighborhood (keys 1..3), key 2 untouched.
    */
  def patchUpdate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val patch = Seq(
      (1L, Option("UPDATED_NAME_1"), Option.empty[String]),
      (3L, Option.empty[String], Option("PATCHED")),
      (999999L, Option("GHOST"), Option("GHOST"))) // absent key -> no-op
      .toDF("c_custkey", "c_name", "c_mktsegment")
    Mutations.patchUpdate(Tables.customer(spark, sfDir), patch, "c_custkey")
      .filter(col("c_custkey").isin(1L, 2L, 3L))
      .orderBy(col("c_custkey").asc)
  }

  /** M3 merge-on-read latest-wins view (`ads.ts:259-262` soft state): the
    * events stream read as a change log; current state = newest row per key.
    */
  def currentState(spark: SparkSession, sfDir: String): DataFrame =
    Mutations.latestWins(
      Tables.events(spark, sfDir),
      keys = Seq(col("user_id")),
      order = Seq(col("ts").desc, col("event_id").desc))
      .select(
        col("user_id"), col("event_id").as("last_event_id"),
        col("ts").as("last_ts"), col("value").as("last_value"))
      .orderBy(col("user_id").asc)

  /** Time-travel snapshot: [[currentState]] AS OF a past instant — the
    * change log filtered to rows at-or-before the cutoff, then the same
    * latest-wins view. On parquet change logs the cutoff filter pushes to
    * the scan (row-group ts min/max prune), so a snapshot query reads only
    * history up to its version — the core of every table-format time
    * travel, expressed as a query shape. Keys whose first change is after
    * the cutoff are absent, exactly as they were then.
    */
  def stateAsOf(spark: SparkSession, sfDir: String, cutoff: String): DataFrame =
    Mutations.latestWins(
      Tables.events(spark, sfDir).filter(col("ts") <= lit(cutoff).cast("timestamp")),
      keys = Seq(col("user_id")),
      order = Seq(col("ts").desc, col("event_id").desc))
      .select(
        col("user_id"), col("event_id").as("last_event_id"),
        col("ts").as("last_ts"), col("value").as("last_value"))
      .orderBy(col("user_id").asc)

  /** SCD-type-2 history view: the change log turned into per-key validity
    * intervals — each event's value holds from its own timestamp until the
    * key's next change (open-ended for the current row). The standard
    * warehouse answer to "what was this row at time T" for ANY T, where
    * [[stateAsOf]] answers one T; the two compose (as-of = interval
    * containing T). One window pass, shuffles once on the key — linear at
    * any log size.
    */
  def scd2History(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("valid_from").asc, col("event_id").asc)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        col("ts").as("valid_from"), col("value"))
      .withColumn("__next", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current", col("__next").isNull)
      // open-ended rows carry an SCD2 end-of-time sentinel: keeps the column
      // non-null (driver compare trips on NaT-vs-NaT) and makes "interval
      // containing T" predicates sentinel-free downstream. 2262-01-01, not
      // 9999-12-31: the sentinel must stay within pandas datetime64[ns]
      // range (max 2262-04-11) or the driver-side compare overflows.
      .withColumn("valid_to",
        coalesce(col("__next"), lit("2262-01-01 00:00:00").cast("timestamp")))
      .drop("__next")
      .orderBy(col("user_id").asc, col("valid_from").asc, col("event_id").asc)
  }
}
