package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Remaining scalar/ingest operator rows of SURVEY §2.1/§2.8 exercised as
  * verified queries: JSON body parse (S3/F8), least/greatest pair
  * normalization (F5), ceil-based pagination math (F9/A4), regex format
  * validation (F10).
  */
object Ingest {

  /** S3/F8: the `express.json()` body-parse analog — extract a field from
    * the `events.props` JSON string column and aggregate it. At scale this
    * is the standard semi-structured ingest shape: extraction happens in
    * the scan stage (codegen'd JSON path), only typed values shuffle.
    */
  def propsExtract(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        count(col("k")).as("n_with_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        sum(col("k")).as("sum_k"))
      .orderBy(col("event_type").asc)

  /** Semi-structured SCHEMA CENSUS over the JSON `props` column — the
    * profiling pass a pipeline runs before trusting an upstream event
    * contract: every key that actually occurs, how often, how many
    * distinct values, and whether/what it looks like numerically. No
    * declared schema anywhere — keys come from the data
    * (`json_object_keys`), so a producer silently adding or breaking a
    * field shows up as a new/changed census row.
    *
    * Scale shape: one events scan, key explosion bounded by real key
    * counts per row, then a hash-agg on (key) — map-side combinable.
    * Numeric detection is gated on an explicit integer regex BEFORE the
    * cast — bare TRY-cast semantics differ cross-engine on non-integer
    * numeric strings (Spark's non-ANSI cast truncates '12.5'→12 and
    * rejects '1e3'; DuckDB's TRY_CAST rounds '12.5'→13 and accepts
    * '1e3'), so the gate is the portable definition of "integer-valued".
    */
  def propsSchema(spark: SparkSession, sfDir: String): DataFrame =
    propsSchemaOf(Tables.events(spark, sfDir))

  /** Frame-parameterized core of [[propsSchema]] so the numeric-gate edge
    * cases ('12.5', '1e3', '007', "42\n") can be pinned against literal
    * frames the fixture happens not to contain.
    */
  def propsSchemaOf(events: DataFrame): DataFrame =
    events
      .select(col("event_id"), col("props"),
        explode(json_object_keys(col("props"))).as("key"))
      // the Scala get_json_object wrapper demands a literal path; the SQL
      // form accepts the per-row key expression
      .withColumn("__v",
        expr("get_json_object(props, concat('$.', key))"))
      // \A..\z anchors, not ^..$: Java's $ also matches before a final
      // newline while RE2's does not, so "42\n" would count as numeric
      // here but not in the twin
      .withColumn("__n",
        when(col("__v").rlike("\\A-?[0-9]+\\z"), col("__v").cast("long")))
      .groupBy(col("key"))
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("__v")).as("n_distinct"),
        count(col("__n")).as("n_numeric"),
        min(col("__n")).as("min_num"),
        max(col("__n")).as("max_num"))
      .orderBy(col("key").asc)

  /** F5: order-independent pair normalization (`chat.ts:18`:
    * `[a,b].sort()` so the conversation key is unique per pair).
    */
  def conversationPairs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(
        least(col("l_orderkey"), col("l_suppkey")).as("user1"),
        greatest(col("l_orderkey"), col("l_suppkey")).as("user2"))
      .distinct()
      .orderBy(col("user1").asc, col("user2").asc)
      .limit(50)

  /** F9/A4: the pagination arithmetic of the flagship response
    * (`ads.ts:158-166`): total + ceil(total/limit) as totalPages.
    */
  def adsPagination(spark: SparkSession, sfDir: String, limit: Int = 20): DataFrame =
    Tables.part(spark, sfDir)
      .filter(lower(col("p_name")).contains("widget"))
      .agg(count(lit(1)).as("total"))
      .withColumn("total_pages",
        ceil(col("total").cast("double") / limit).cast("long"))

  /** F10: regex format validation (the multer filename/mime gate,
    * `ads.ts:30-32`) over `documents.source`.
    */
  def sourceValidation(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(col("source").rlike("^src[0-9]+$").as("valid_format"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("valid_format").asc)
}
