package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.Windows

/** The reference's chat/conversation read endpoints (`/root/reference/src/
  * routes/chat.ts`) cast onto the `events` stream table (FIXTURES.md:
  * `events` plays `Message` — ts=createdAt, user_id=senderId) with
  * `customer` as the user dim.
  */
object Social {

  /** `GET /api/chat/conversations` (`chat.ts:84-122`): conversation list
    * with the LATEST message preview per conversation (W1: `orderBy
    * createdAt desc, take 1`, `chat.ts:43-46`), user profile joined,
    * ordered by last activity (O4).
    *
    * Cast: "conversation" = the per-user event stream; preview = latest
    * event. Scale shape: one hash shuffle on user_id for the window, then a
    * broadcast join to the user dim; no global sort until the final top-50.
    */
  def conversationsList(spark: SparkSession, sfDir: String): DataFrame = {
    val latest = Windows.topPerGroup(
      Tables.events(spark, sfDir),
      partition = Seq(col("user_id")),
      order = Seq(col("ts").desc, col("event_id").desc))
    val users = broadcast(Tables.customer(spark, sfDir).select("c_custkey", "c_name"))
    latest
      .join(users, latest("user_id") === users("c_custkey"))
      .select(
        col("user_id"), col("c_name"),
        col("event_type").as("last_event_type"),
        col("ts").as("last_ts"),
        col("value").as("last_value"))
      .orderBy(col("last_ts").desc, col("user_id").asc)
      .limit(50)
  }

  /** `GET /api/chat/conversations/:id/messages` (`chat.ts:128-161`): full
    * message history of one conversation, oldest first (O5), sender profile
    * joined (J7).
    */
  def messages(spark: SparkSession, sfDir: String, userId: Long): DataFrame = {
    val msgs = Tables.events(spark, sfDir).filter(col("user_id") === userId)
    val users = broadcast(Tables.customer(spark, sfDir).select("c_custkey", "c_name"))
    msgs
      .join(users, msgs("user_id") === users("c_custkey"))
      .select(
        col("event_id"), col("ts"), col("event_type"), col("value"),
        col("c_name").as("sender_name"))
      .orderBy(col("ts").asc, col("event_id").asc)
  }
}
