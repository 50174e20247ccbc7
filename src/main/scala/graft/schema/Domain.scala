package graft.schema

import java.sql.Timestamp

/** Typed veneer over the reference's six entities
  * (`/root/reference/prisma/schema.prisma:11-105`; SURVEY §1.2): case
  * classes give Dataset[T] ergonomics and compile-time column safety where
  * helpful; the engine's core remains untyped DataFrames (SURVEY §1.3
  * verdict). Nullable columns are Options; ids stay strings (UUIDs).
  */
final case class User(
    id: String, email: String, password: String, name: String,
    phone: Option[String], profilePic: Option[String],
    isAdmin: Boolean, isBlocked: Boolean,
    createdAt: Timestamp, updatedAt: Timestamp)

final case class Category(id: String, name: String)

final case class Ad(
    id: String, title: String, description: String, price: Double,
    location: String, images: Seq[String], status: String,
    createdAt: Timestamp, updatedAt: Timestamp,
    userId: String, categoryId: String)

final case class Favorite(id: String, createdAt: Timestamp, userId: String, adId: String)

final case class Conversation(
    id: String, createdAt: Timestamp, updatedAt: Timestamp,
    user1Id: String, user2Id: String)

final case class Message(
    id: String, content: String, createdAt: Timestamp,
    senderId: String, receiverId: String, conversationId: String)

/** The reference's seed fixtures (`prisma/seed.ts:9-56`,
  * `src/routes/setup.ts:30-68`) as literal rows.
  */
object Seeds {
  private val t0 = Timestamp.valueOf("2024-11-28 00:00:00")

  val categories: Seq[Category] = Seq(
    "Cars", "Bikes", "Mobiles", "Electronics", "Furniture", "Others")
    .zipWithIndex.map { case (n, i) => Category(s"cat-$i", n) }

  val users: Seq[User] = Seq(
    User("u-admin", "admin@etl.com", "<hash>", "Admin", None, None,
      isAdmin = true, isBlocked = false, t0, t0),
    User("u-test", "test@etl.com", "<hash>", "Test User", Some("1234567890"),
      None, isAdmin = false, isBlocked = false, t0, t0))
}
