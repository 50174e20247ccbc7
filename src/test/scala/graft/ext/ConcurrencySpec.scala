package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Differential pins for the r8 interval/session additions: each query is
  * oracle-checked at sf0.01 by the driver; here the SEMANTICS are pinned
  * against brute-force Scala references on the sf0.001 fixture (and, for
  * the native session_window boundary rule, on crafted exact-gap rows —
  * the case the fixture may never contain).
  */
class ConcurrencySpec extends SparkSpec {

  private val GapUs = 30L * 60 * 1000000

  /** Epoch MICROseconds — the events fixture carries sub-millisecond
    * precision, so ms-level getTime arithmetic would corrupt boundaries;
    * TIMESTAMP_NTZ columns surface as LocalDateTime, TIMESTAMP as
    * java.sql.Timestamp.
    */
  private def micros(v: Any): Long = v match {
    case t: Timestamp =>
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    case d: java.time.LocalDateTime =>
      d.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + d.getNano / 1000L
    case other => sys.error(s"not a timestamp: $other")
  }

  /** (user_id, ts-millis, event_type, event_id) of the fixture, time-sorted
    * per user with event_id tie-break — the reference input for all three
    * brute-force models.
    */
  private lazy val fixtureEvents: Seq[(Long, Long, String, Long)] =
    spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), micros(r.get(1)),
        r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2, t._4)).toSeq

  /** Gaps-and-islands sessions: split when the gap EXCEEDS GapUs (`>`) —
    * the rule BOTH the manual withSessionIds pass and Spark's native
    * session_window use (verified by the boundary test below: an event at
    * exactly prev+gap merges). Returns (user, start, end, events).
    */
  private def bruteSessions(): Seq[(Long, Long, Long, Seq[(Long, String)])] =
    fixtureEvents.groupBy(_._1).toSeq.flatMap { case (user, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._4))
      val out = scala.collection.mutable.ArrayBuffer
        .empty[scala.collection.mutable.ArrayBuffer[(Long, String)]]
      var prev = Long.MinValue
      sorted.foreach { case (_, ts, tpe, _) =>
        val fresh = out.isEmpty || ts - prev > GapUs
        if (fresh) out += scala.collection.mutable.ArrayBuffer((ts, tpe))
        else out.last += ((ts, tpe))
        prev = ts
      }
      out.map(s => (user, s.head._1, s.last._1, s.toSeq))
    }

  test("peak_concurrency matches a brute-force sweep over fixture sessions") {
    // model: sessions inclusive [start, end]; concurrency(t) =
    // #starts<=t − #ends<t; peak per hour over boundary events only
    val sessions = bruteSessions()
    val bounds = sessions.flatMap { case (_, st, en, _) =>
      Seq((st, 1L), (en, -1L)) }
      .sortBy { case (ts, d) => (ts, -d) }
    var run = 0L
    val perHour = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
    bounds.foreach { case (ts, d) =>
      run += d
      val hour = ts - ts % 3600000000L
      val (pk, ns, ne) = perHour.getOrElse(hour, (Long.MinValue, 0L, 0L))
      perHour(hour) = (math.max(pk, run),
        ns + (if (d == 1) 1 else 0), ne + (if (d == -1) 1 else 0))
    }
    val got = EventAnalytics.peakConcurrency(spark, sf).collect()
      .map(r => micros(r.get(0)) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet === perHour.keySet)
    perHour.foreach { case (h, exp) =>
      assert(got(h) === exp, s"hour=$h")
    }
    // conservation: every session opens and closes exactly once
    assert(got.values.map(_._2).sum === sessions.size.toLong)
    assert(got.values.map(_._3).sum === sessions.size.toLong)
  }

  test("session_windows matches brute-force gaps-and-islands") {
    val exp = bruteSessions().map {
      case (user, st, en, evs) =>
        (user, st, en + GapUs, evs.size.toLong,
          evs.count(_._2 == "error").toLong)
    }.sortBy(t => (t._1, t._2))
    val got = EventAnalytics.sessionWindowsNative(spark, sf).collect().map(r =>
      (r.getLong(0), micros(r.get(1)), micros(r.get(2)),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === exp)
  }

  test("native session_window MERGES at exactly prev+gap, splits past it") {
    import scala.jdk.CollectionConverters._
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = new Timestamp(t0.getTime + GapUs / 1000 + 1)  // 1ms past: SPLIT
    val t2 = new Timestamp(t0.getTime + GapUs / 1000)      // == boundary: MERGE
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType)))
    val df = spark.createDataFrame(Seq(
      Row(1L, t0, "view"), Row(1L, t1, "view"),
      Row(2L, t0, "view"), Row(2L, t2, "view")).asJava, schema)
    val n = EventAnalytics.sessionWindowsOf(df, 30)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n(1L) === 2L, "event 1ms past prev+gap must start a new session")
    assert(n(2L) === 1L, "event at exactly prev+gap must merge (same rule " +
      "as the manual sessionize pass)")
  }

  test("purchase_attribution matches per-purchase brute force with lookback") {
    val tolUs = 360L * 60 * 1000000L
    val viewsByUser = fixtureEvents.filter(_._3 == "view")
      .groupBy(_._1)
    val exp = fixtureEvents.filter(_._3 == "purchase").map {
      case (user, ts, _, eid) =>
        // most recent view ≤ ts; same-ts views collapse to max event_id
        val best = viewsByUser.getOrElse(user, Seq.empty)
          .filter(_._2 <= ts)
          .sortBy(v => (v._2, v._4)).lastOption
        val key = best match {
          case Some((_, vts, _, vid)) if vts >= ts - tolUs => vid
          case _ => -1L
        }
        eid -> key
    }.toMap
    val got = EventAnalytics.purchaseAttribution(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === exp)
    // the fixture must exercise all three outcomes, or the query (and its
    // oracle) silently degenerates
    assert(exp.values.exists(_ != -1L), "no attributed purchase on fixture")
    assert(exp.values.exists(_ == -1L), "no unattributed purchase on fixture")
  }
}
