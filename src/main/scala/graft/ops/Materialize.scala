package graft.ops

import org.apache.spark.sql.DataFrame

/** Driver-side materialization for SMALL result frames whose plans hang off
  * call-scoped caches (persisted signature/token frames that must be
  * unpersisted before the call returns).
  *
  * Why not `localCheckpoint`: it stores the result in UNREPLICATED executor
  * block storage and truncates lineage — any executor lost after the call
  * returns makes the frame unrecoverable instead of recomputed — and the
  * block write+read round trip double-materializes results that are a few
  * kilobytes. Collecting to the driver and rebuilding a local relation
  * costs one pass, keeps the frame immune to executor loss (the rows ARE
  * the data), and leaves the CacheManager empty.
  *
  * Use ONLY for frames bounded by construction (verified near-dup pair
  * lists, top-k results). Corpus-sized frames must keep their distributed
  * lineage — at that size, write to storage instead.
  */
object Materialize {

  /** Collect `df` and rebuild it as a local DataFrame with the same
    * schema. `maxRows` guards against misuse on unbounded frames — the
    * transfer is capped BEFORE collect, so a mistake fails fast instead of
    * filling the driver heap.
    */
  def smallLocal(df: DataFrame, maxRows: Int = 500_000): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"Materialize.smallLocal: frame exceeded $maxRows rows — not a small " +
        "frame; keep distributed lineage or write to storage instead")
    df.sparkSession.createDataFrame(rows.toSeq.asJava, df.schema)
  }

  /** [[smallLocal]] for frames that are USUALLY bounded but can
    * legitimately flood (a heavy-duplication corpus multiplying candidate
    * pairs): under `maxRows` the frame lands on the driver exactly as
    * [[smallLocal]]; past it, the frame SPILLS to a temp parquet dir and
    * is read back — distributed, lineage severed from the caller's
    * call-scoped caches, bounded only by storage. This is the "write to
    * storage instead" arm of [[smallLocal]]'s contract, taken
    * automatically: twin-flooded corpora keep WORKING (at spill cost)
    * instead of refusing.
    *
    * The probe collect below the cap is not wasted in the spill case: the
    * spill write re-executes the plan once, same as any storage-backed
    * materialization, and the flood case is the rare one by construction.
    */
  def localOrSpill(df: DataFrame, maxRows: Int = 500_000): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = df.limit(maxRows + 1).collect()
    if (rows.length <= maxRows)
      df.sparkSession.createDataFrame(rows.toSeq.asJava, df.schema)
    else {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_spill").toString
      df.write.mode("overwrite").parquet(dir)
      df.sparkSession.read.parquet(dir)
    }
  }

  /** Probe-collect a typed frame for a size-adaptive driver fast path:
    * `Some(rows)` when it fits `cap` (the probe IS the collect —
    * `limit(cap+1)`, one scheduled job, no separate count), `None` past
    * it, where the caller takes its distributed branch. The
    * [[graft.ext.Graph]] family's discipline, hoisted here so every
    * report with a driver-sized intermediate shares one helper. Past the
    * cap the single wasted pass costs what a `count()` probe would have.
    */
  def collectIfDriverSized[T](
      ds: org.apache.spark.sql.Dataset[T], cap: Int): Option[Array[T]] = {
    val rows = ds.limit(cap + 1).collect()
    if (rows.length <= cap) Some(rows) else None
  }
}
