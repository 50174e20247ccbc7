package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("pointInInterval matches closed bounds across bucket boundaries") {
    val points = Seq((1L, ts(100)), (2L, ts(3600)), (3L, ts(7300)), (4L, ts(50)))
      .toDF("pid", "t")
    val intervals = Seq(
      (10L, ts(90), ts(3700)),   // spans two 3600s buckets; catches p1, p2
      (20L, ts(7300), ts(7300)), // zero-length: catches exactly p3
      (30L, ts(200), ts(300))    // catches nothing
    ).toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(points, "t", intervals, "s", "e")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L), (2L, 10L), (3L, 20L)))
    // equivalence with the naive range predicate on the same data
    val naive = points.crossJoin(intervals)
      .filter(col("t") >= col("s") && col("t") <= col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === naive)
  }
}

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("joinAsOf: latest at-or-before wins, equal-time inclusive, max on exact ties") {
    val left = Seq(
      (1L, 10L, ts(50)),  // after both orders of user 10 → latest (ts 40)
      (2L, 10L, ts(40)),  // exactly at an order time → inclusive match
      (3L, 10L, ts(5)),   // before any order → null
      (4L, 20L, ts(100)), // user with two orders at the SAME ts → max key
      (5L, 30L, ts(10))   // user with no orders at all → null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts(20), 100L),
      (10L, ts(40), 200L),
      (20L, ts(90), 300L),
      (20L, ts(90), 400L)
    ).toDF("user_id", "ts", "order_key")
    val out = AsOf.joinAsOf(left, right, "user_id", "ts", "order_key")
      .select("event_id", "order_key").as[(Long, Option[Long])]
      .collect().toMap
    assert(out === Map(
      1L -> Some(200L), 2L -> Some(200L), 3L -> None,
      4L -> Some(400L), 5L -> None))
  }
}
