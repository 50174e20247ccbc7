package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SURVEY §2.10 T1-T6 and §5.5: MemoryStream-driven micro-batch tests of
  * the chat pipeline and the watermarked event windows.
  */
class ChatStreamSpec extends SparkSpec {

  private def frame(
      conv: String, sender: String, recv: String, content: String, ts: Long): String =
    s"""{"type":"chat_message","conversationId":"$conv","senderId":"$sender",""" +
      s""""receiverId":"$recv","content":"$content","ts":"${new Timestamp(ts)}"}"""

  private def users = {
    import spark.implicits._
    Seq(
      ("u1", "Alice", false),
      ("u2", "Bob", false),
      ("u3", "Mallory", true)) // blocked
      .toDF("id", "name", "isBlocked")
  }

  test("parse drops non-chat and malformed frames (T2/T5)") {
    import spark.implicits._
    val raw = Seq(
      frame("c1", "u1", "u2", "hello", 1000L),
      """{"type":"ping"}""",
      "not json at all").toDF("value")
    val parsed = ChatStream.parseFrames(raw)
    assert(parsed.count() === 1)
    assert(parsed.select("content").as[String].head() === "hello")
  }

  test("enrich joins sender profile and gates blocked users (T1/T3)") {
    import spark.implicits._
    val raw = Seq(
      frame("c1", "u1", "u2", "hi", 1000L),
      frame("c1", "u3", "u2", "spam", 2000L), // blocked sender
      frame("c1", "ux", "u2", "ghost", 3000L) // unknown sender
    ).toDF("value")
    val out = ChatStream.enrich(ChatStream.parseFrames(raw), users)
    val got = out.select("content", "senderName").as[(String, String)].collect().toSet
    assert(got === Set(("hi", "Alice"), ("ghost", null)))
  }

  test("persistPipeline appends batches and maintains the latest view (T3)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_stream").toString
    val input = MemoryStream[String]
    val q = ChatStream.persistPipeline(
      input.toDF().select(col("value")),
      users,
      s"$dir/messages", s"$dir/latest", s"$dir/ckpt")
    try {
      input.addData(
        frame("c1", "u1", "u2", "m1", 1000L),
        frame("c2", "u2", "u1", "m2", 2000L))
      q.processAllAvailable()
      input.addData(frame("c1", "u2", "u1", "m3", 5000L))
      q.processAllAvailable()
      val msgs = spark.read.parquet(s"$dir/messages")
      assert(msgs.count() === 3)
      val latest = spark.read.parquet(s"$dir/latest")
        .select("conversationId", "content").as[(String, String)].collect().toMap
      assert(latest === Map("c1" -> "m3", "c2" -> "m2"))
    } finally q.stop()
  }

  test("persistPipeline restores a crash-stranded latest-view backup") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_stream_swap").toString
    // simulate a crash between the two swap renames: the view exists ONLY
    // under __backup (schema as latestPerConversation emits: the enriched
    // message columns)
    Seq(("u1", "chat_message", "c0", "u2", "mOld",
        new java.sql.Timestamp(500L), "Alice"))
      .toDF("senderId", "type", "conversationId", "receiverId", "content",
        "ts", "senderName")
      .write.parquet(s"$dir/latest__backup")
    val input = MemoryStream[String]
    val q = ChatStream.persistPipeline(
      input.toDF().select(col("value")),
      users,
      s"$dir/messages", s"$dir/latest", s"$dir/ckpt")
    try {
      input.addData(frame("c1", "u1", "u2", "mNew", 1000L))
      q.processAllAvailable()
      val latest = spark.read.parquet(s"$dir/latest")
        .select("conversationId", "content").as[(String, String)].collect().toMap
      assert(latest === Map("c0" -> "mOld", "c1" -> "mNew"),
        "restored backup rows must survive the next batch's merge")
      assert(!new java.io.File(s"$dir/latest__backup").exists(),
        "swap must clean its backup after a successful batch")
    } finally q.stop()
  }

  test("sessionTracker accumulates per-sender state across micro-batches (T6)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val tracked = ChatStream.sessionTracker(
      ChatStream.parseFrames(input.toDF().select(col("value"))))
    val q = tracked.writeStream.format("memory").queryName("sessions")
      .outputMode("update").start()
    try {
      input.addData(
        frame("c1", "u1", "u2", "a", 1000L),
        frame("c1", "u1", "u2", "b", 2000L),
        frame("c2", "u2", "u1", "c", 3000L))
      q.processAllAvailable()
      input.addData(frame("c1", "u1", "u2", "d", 4000L))
      q.processAllAvailable()
      val state = spark.table("sessions")
        .groupBy("senderId").agg(max("n_messages").as("n"))
        .as[(String, Long)].collect().toMap
      assert(state === Map("u1" -> 3L, "u2" -> 1L))
    } finally q.stop()
  }

  test("dedupStream drops duplicate frames within the watermark horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val deduped = ChatStream.dedupStream(
      ChatStream.parseFrames(input.toDF().select(col("value"))))
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      input.addData(
        frame("c1", "u1", "u2", "hello", 1000L),
        frame("c1", "u1", "u2", "hello", 1000L), // in-batch duplicate
        frame("c1", "u1", "u2", "bye", 2000L))
      q.processAllAvailable()
      input.addData(frame("c1", "u1", "u2", "hello", 3000L)) // cross-batch dup
      q.processAllAvailable()
      val contents = spark.table("dedup_stream")
        .select("content").as[String].collect().sorted.toSeq
      assert(contents === Seq("bye", "hello"))
    } finally q.stop()
  }

  test("ackJoin matches acks to messages within the event-time bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val msgIn = MemoryStream[String]
    val ackIn = MemoryStream[(String, String, Timestamp)]
    val acks = ackIn.toDF().toDF("conversationId", "readerId", "ack_ts")
    val joined = ChatStream.ackJoin(
      ChatStream.parseFrames(msgIn.toDF().select(col("value"))), acks)
    val q = joined.writeStream.format("memory").queryName("acked")
      .outputMode("append").start()
    try {
      val base = 1700000000000L
      msgIn.addData(
        frame("c1", "u1", "u2", "m1", base),
        frame("c2", "u2", "u1", "m2", base))
      ackIn.addData(
        ("c1", "u2", new Timestamp(base + 60000L)),          // 1 min later: match
        ("c2", "u1", new Timestamp(base + 3600000L)))        // 1 h later: out of bound
      q.processAllAvailable()
      val got = spark.table("acked")
        .select("content", "readerId").as[(String, String)].collect().toSet
      assert(got === Set(("m1", "u2")))
    } finally q.stop()
  }

  test("windowedEventCounts aggregates event-time windows under a watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val events = input.toDF().toDF("ts", "event_type")
    val agg = ChatStream.windowedEventCounts(events, "10 minutes", "1 hour")
    val q = agg.writeStream.format("memory").queryName("wincounts")
      .outputMode("complete").start()
    try {
      def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      input.addData((t(10, 5), "click"), (t(10, 40), "click"), (t(11, 2), "view"))
      q.processAllAvailable()
      val rows = spark.table("wincounts")
        .select("hour", "event_type", "n_events")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(rows === Set(
        (t(10, 0), "click", 2L),
        (t(11, 0), "view", 1L)))
    } finally q.stop()
  }

  test("sessionWindows merges gap-close events and splits across long gaps") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val events = input.toDF().toDF("ts", "user_id")
    val agg = ChatStream.sessionWindows(events, "10 minutes", "30 minutes")
    val q = agg.writeStream.format("memory").queryName("sesswin")
      .outputMode("complete").start()
    try {
      def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      // user 1: 10:00, 10:20, 10:45 chain into ONE session (each gap < 30m);
      // 12:00 is a separate session. user 2: single event.
      input.addData((t(10, 0), 1L), (t(10, 20), 1L), (t(10, 45), 1L),
        (t(12, 0), 1L), (t(11, 0), 2L))
      q.processAllAvailable()
      val rows = spark.table("sesswin")
        .as[(Timestamp, Timestamp, Long, Long)].collect().toSet
      assert(rows === Set(
        (t(10, 0), t(11, 15), 1L, 3L),   // ends 30m after the last event
        (t(12, 0), t(12, 30), 1L, 1L),
        (t(11, 0), t(11, 30), 2L, 1L)))
    } finally q.stop()
  }
}
