package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Streaming last-touch attribution: per-user latest-view state answers
  * each purchase at arrival — cross-batch state carry, lookback
  * staleness, inclusive same-timestamp matching, and the forward-only
  * state contract.
  */
class AttributionSpec extends SparkSpec {

  test("attributionMonitor: state carry, lookback gate, same-ts inclusivity") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(min: Long) = new Timestamp(
      Timestamp.valueOf("2024-01-01 00:00:00").getTime + min * 60000L)
    val input = MemoryStream[(Long, Timestamp, String, Long)]
    val events = input.toDF().toDF("user_id", "ts", "event_type", "event_id")
    val q = Attribution.attributionMonitor(events, lookbackMinutes = 360)
      .writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    try {
      // batch 1: u1 attributed in-batch (and the LATER of two views wins);
      // u2 has no view at all; u3 only views (state seeds for batch 2);
      // u4 view+purchase share a timestamp (inclusive, max view id wins)
      input.addData(
        (1L, t(0), "view", 10L), (1L, t(5), "view", 11L),
        (1L, t(15), "purchase", 12L),
        (2L, t(0), "purchase", 20L),
        (3L, t(0), "view", 30L),
        (4L, t(0), "view", 40L), (4L, t(0), "view", 41L),
        (4L, t(0), "purchase", 42L))
      q.processAllAvailable()
      // batch 2: u1's state survives the batch boundary; u3's view is
      // 7h old by its purchase — past the 6h lookback → -1
      input.addData(
        (1L, t(30), "purchase", 13L),
        (3L, t(420), "purchase", 31L))
      q.processAllAvailable()
      val got = spark.table("attr").collect()
        .map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(got === Map(
        12L -> 11L, // latest in-batch view
        20L -> -1L, // no view ever
        42L -> 41L, // same-ts inclusive, max view id
        13L -> 11L, // state carried across batches
        31L -> -1L  // stale beyond the lookback
      ))
    } finally q.stop()
  }
}
