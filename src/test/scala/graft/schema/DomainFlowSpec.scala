package graft.schema

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{Joins, Mutations, Pagination, Predicates, Windows}

/** SURVEY §5.4 seed-fixture smoke: the reference's setup-then-query flows
  * (register → login → create ad → search finds it → favorite → chat)
  * executed end-to-end on the typed domain entities through the same ops
  * modules the star-schema queries use.
  */
class DomainFlowSpec extends SparkSpec {
  import spark.implicits._

  private val t = (s: String) => Timestamp.valueOf(s)

  test("register→login→create→search→favorite→chat flow over seed fixtures") {
    // — setup.ts seed (M5 upsert, idempotent)
    val users0 = Seeds.users.toDS().toDF()
    val cats = Seeds.categories.toDS().toDF()
    assert(Mutations.upsert(cats, cats, Seq("name")).count() === 6)

    // — register (auth.ts:21-33): J9 anti-join guard on unique email
    val newUser = Seq(User("u-carol", "carol@etl.com", "<hash>", "Carol",
      None, None, isAdmin = false, isBlocked = false,
      t("2024-11-29 10:00:00"), t("2024-11-29 10:00:00"))).toDS().toDF()
    val users = Mutations.upsert(users0, newUser, Seq("email"))
    assert(users.count() === 3)
    // re-register with the same email is rejected (no-op)
    assert(Mutations.upsert(users, newUser, Seq("email")).count() === 3)

    // — login (auth.ts:74-101): point lookup + blocked gate + password drop (P2)
    val login = users
      .filter(col("email") === "carol@etl.com" && !col("isBlocked"))
      .drop("password")
    assert(login.count() === 1)
    assert(!login.columns.contains("password"))

    // — create ad (ads.ts:44-79, M1 insert-returning-joined)
    val ads = Seq(
      Ad("ad-1", "Blue Widget Deluxe", "a fine widget", 99.5, "Berlin",
        Seq("/uploads/w1.jpg"), "active",
        t("2024-11-29 11:00:00"), t("2024-11-29 11:00:00"), "u-carol", "cat-3"),
      Ad("ad-2", "Old Couch", "worn", 10.0, "Hamburg", Nil, "deleted",
        t("2024-11-29 12:00:00"), t("2024-11-29 12:00:00"), "u-test", "cat-4"))
      .toDS().toDF()

    // — flagship search finds only the active widget (P3+P6+P5, J1/J2)
    val found = Predicates.applyAll(ads,
      Some(Predicates.icontains(col("title"), "widget")),
      Some(col("status") === "active"),
      Some(col("price") >= 50.0), Some(col("price") <= 150.0))
      .join(broadcast(users.select(col("id").as("userId"), col("name").as("seller"))),
        Seq("userId"))
      .join(broadcast(cats.select(col("id").as("categoryId"), col("name").as("category"))),
        Seq("categoryId"))
    assert(found.select("title", "seller", "category").as[(String, String, String)]
      .collect().toSeq === Seq(("Blue Widget Deluxe", "Carol", "Electronics")))

    // — favorite + check (favorites.ts: J9 insert guard, J8 existence)
    val favs0 = Seq.empty[Favorite].toDS().toDF()
    val fav = Seq(Favorite("f-1", t("2024-11-29 13:00:00"), "u-test", "ad-1")).toDS().toDF()
    val favs = Mutations.upsert(favs0, fav, Seq("userId", "adId"))
    assert(Mutations.upsert(favs, fav, Seq("userId", "adId")).count() === 1)
    assert(Joins.existsAs(favs,
      col("userId") === "u-test" && col("adId") === "ad-1", "favorited")
      .as[Boolean].head())

    // — chat (chat.ts: F5 normalized pair key, W1 latest preview)
    val conv = Seq(Conversation("c-1", t("2024-11-29 14:00:00"),
      t("2024-11-29 14:00:00"), "u-carol", "u-test")).toDS().toDF()
      .withColumn("user1n", least(col("user1Id"), col("user2Id")))
      .withColumn("user2n", greatest(col("user1Id"), col("user2Id")))
    assert(conv.select("user1n", "user2n").as[(String, String)].head() ===
      ("u-carol", "u-test"))
    val msgs = Seq(
      Message("m-1", "hi", t("2024-11-29 14:01:00"), "u-test", "u-carol", "c-1"),
      Message("m-2", "is it available?", t("2024-11-29 14:02:00"), "u-test", "u-carol", "c-1"))
      .toDS().toDF()
    val preview = Windows.topPerGroup(msgs,
      Seq(col("conversationId")), Seq(col("createdAt").desc, col("id").desc))
    assert(preview.select("content").as[String].head() === "is it available?")

    // — paginated listing of the user's ads (O1+O6)
    val page = Pagination.page(ads.filter(col("status") =!= "deleted"),
      Seq(col("createdAt").desc, col("id").desc), 1, 20)
    assert(page.count() === 1)
  }
}
