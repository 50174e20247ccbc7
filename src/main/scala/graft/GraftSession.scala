package graft

import org.apache.spark.sql.SparkSession

/** The blessed session configuration for this library — one place for the
  * settings every entry point (Verify/Bench/Explain, library users) must
  * share:
  *
  *   - `shuffle.partitions` sized to the executor count (the harness runs
  *     local[$cpus]; a cluster deployment sets this to its reducer budget
  *     instead of Spark's default 200),
  *   - UTC session timezone (timestamp determinism vs the DuckDB oracle),
  *   - ICU case mappings OFF: the first `lower()` otherwise pays an ~80s
  *     one-time CollationAwareUTF8String static init in this environment,
  *   - nanos-as-long parquet reads (the `events.ts` column is
  *     TIMESTAMP(NANOS); see graft.io.Tables.events for the conversion).
  *
  * AQE (adaptive execution) and parquet filter pushdown are Spark defaults
  * and intentionally not overridden.
  */
object GraftSession {
  def build(master: String, shufflePartitions: Int): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    // Reliable-checkpoint root for frames too big for the driver but whose
    // loop lineage must be severed (graft.ext.Dedup.connectedComponents).
    // Local mode: a tmp dir. Cluster deployment: point this at shared
    // storage (HDFS/S3) so checkpointed blocks survive executor loss —
    // unlike localCheckpoint, which pins them to unreplicated executors.
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-ckpt-").toString
      spark.sparkContext.setCheckpointDir(dir)
    }
    spark
  }

  /** Harness form: local[cpus] with one shuffle partition per core. */
  def local(cpus: Int): SparkSession = build(s"local[$cpus]", cpus)
}
