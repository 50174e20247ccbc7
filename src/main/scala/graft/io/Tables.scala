package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet readers for the driver-generated test tables (TESTDATA.md).
  *
  * Schemas are fixed and carried by the parquet footers; we deliberately do
  * NOT re-declare them here so Catalyst's vectorized parquet reader can prune
  * columns straight from the file metadata. At cluster scale these would be
  * catalog tables (possibly bucketed); the `sfDir` parameter stands in for
  * the warehouse location.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's TimestampType
    * (micros) cannot represent natively — with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set in every session
    * builder) it arrives as a LongType of ns since epoch and is converted
    * here (exact: the generator's values are µs-grained). At cluster scale
    * this is the standard ns-parquet ingestion shape: convert once at the
    * scan boundary, keep TimestampType everywhere downstream.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
