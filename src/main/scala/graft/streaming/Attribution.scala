package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming LAST-TOUCH ATTRIBUTION — the streaming face of the batch
  * `purchase_attribution` as-of join
  * ([[graft.ext.EventAnalytics.purchaseAttribution]]): each purchase is
  * attributed to the same user's most recent view within the lookback
  * window, or −1.
  *
  * The batch form is a merge-based as-of (union + carry window); the
  * streaming form keeps ONE tiny state record per user — the latest view
  * (event-time µs, event id) — in the state store, updated and consulted
  * as each micro-batch's group iterator is folded in event-time order.
  * That is the standard streaming as-of design: O(users) state, no
  * event-history buffering, each purchase answered at arrival.
  *
  * Ordering contract (documented, spec'd): within a micro-batch the
  * group's events are sorted by (ts, event_id) before the fold, so
  * intra-batch disorder is corrected exactly; ACROSS batches the state
  * only moves forward — a view arriving in a later batch than a purchase
  * it precedes in event time cannot retro-attribute that purchase (the
  * at-arrival semantics every online attribution system has; the batch
  * query remains the retrospective truth). Same-timestamp view+purchase
  * attributes (inclusive), matching the batch twin; among same-timestamp
  * views the max event_id wins, matching the batch collapse convention.
  */
object Attribution {

  /** Latest view per user: event-time micros + view event id. */
  final case class LastView(tsUs: Long, viewId: Long)

  def attributionMonitor(
      events: DataFrame, lookbackMinutes: Int = 360): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val lookbackUs = lookbackMinutes.toLong * 60L * 1000000L
    events
      .select(col("user_id").cast("long"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        col("event_type").cast("string"), col("event_id").cast("long"))
      .as[(Long, Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[LastView, (Long, Long, Long, Long)](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) { (user, rows, state) =>
        var last = state.getOption.getOrElse(LastView(Long.MinValue, -1L))
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Long, Long)]
        // event-time fold: views advance the state (same-ts: max id via
        // the sort order), purchases read it through the lookback gate
        rows.toSeq.sortBy(r => (r._2, r._4)).foreach {
          case (_, ts, "view", id) =>
            if (ts > last.tsUs || (ts == last.tsUs && id > last.viewId))
              last = LastView(ts, id)
          case (_, ts, "purchase", id) =>
            val attributed =
              if (last.viewId >= 0L && last.tsUs <= ts &&
                last.tsUs >= ts - lookbackUs) last.viewId
              else -1L
            out += ((id, user, ts, attributed))
          case _ => ()
        }
        if (last.viewId >= 0L) state.update(last)
        out.iterator
      }
      .toDF("event_id", "user_id", "ts_us", "attributed_view")
  }
}
