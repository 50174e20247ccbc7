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
  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some fixture
    * generations, which Spark's TimestampType (micros) cannot represent
    * natively — with `spark.sql.legacy.parquet.nanosAsLong=true` (set in
    * every session builder) it arrives as a LongType of ns since epoch and
    * is converted here (exact: the generator's values are µs-grained).
    * Current fixtures write TIMESTAMP(MICROS) without the UTC flag, which
    * passes through as TIMESTAMP_NTZ — downstream session/range ops use
    * NTZ-safe arithmetic (interval comparison, TIMESTAMP-intermediate
    * casts) so both generations work. At cluster scale this is the
    * standard ingestion shape: normalize once at the scan boundary.
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

  /** Exact row count from parquet footers — a driver-only metadata read, no
    * Spark job. For size GUARDS (e.g. refusing an n² plan above a cap) this
    * replaces a full `count()` action: at 100 TB a count() schedules a
    * cluster-wide scan just to validate a precondition, while footers are a
    * few KB per file. Not for query results — footer counts ignore any
    * filters.
    */
  def parquetRowCount(spark: SparkSession, sfDir: String, name: String): Long = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(s"$sfDir/$name.parquet")
    val fs = root.getFileSystem(conf)
    val files: Seq[Path] =
      if (fs.getFileStatus(root).isDirectory)
        fs.listStatus(root).toSeq
          .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
          .map(_.getPath)
      else Seq(root)
    files.map { p =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try reader.getRecordCount finally reader.close()
    }.sum
  }
}
