package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Non-parquet source/sink shapes of SURVEY §2.1 (S3/S4: the
  * `express.json()` request-body source and `res.json(...)` response sink)
  * as batch ingest/egress operators.
  *
  * Scale rules baked in:
  *   - JSONL reads take a DECLARED schema — schema inference is a full
  *     extra pass over the data and produces drifting types across runs;
  *     at 100 TB both are unacceptable.
  *   - Malformed lines land in a `_corrupt_record` column (PERMISSIVE mode)
  *     instead of failing the job — the batch analog of the reference's
  *     per-frame error path (`websocket.ts:85-91`).
  */
object Sources {

  /** Batch JSONL ingest with declared schema; corrupt lines preserved in
    * `_corrupt_record` for a dead-letter sink.
    */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** S4 egress: one JSON document per row from all columns (the
    * `res.json(...)` shape). Narrow projection — codegen'd `to_json`,
    * safe at any scale.
    */
  def toJsonLines(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col).toSeq: _*)).as("value"))

  /** Batch CSV ingest, same contract as [[jsonl]]: declared schema (no
    * inference pass), malformed lines quarantined in `_corrupt_record`.
    * Header handling is explicit — at scale a header row per FILE is the
    * default export shape, and silently treating it as data corrupts the
    * first row of every shard.
    */
  def csv(
      spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  /** F3/F4 write-path defaults (`@default(uuid())` / `@default(now())` +
    * `@updatedAt`, `schema.prisma:12,20-21`): stamp generated id and audit
    * timestamps on an insert batch. Nondeterministic by design — verified
    * queries exclude these columns (SURVEY §7.4); tests assert shape and
    * uniqueness, not values.
    */
  def withInsertDefaults(df: DataFrame): DataFrame =
    df.withColumn("id", expr("uuid()"))
      .withColumn("createdAt", current_timestamp())
      .withColumn("updatedAt", col("createdAt"))
}
