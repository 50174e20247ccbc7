package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class PredicatesSpec extends SparkSpec {
  import spark.implicits._

  test("icontains is literal, case-insensitive, and wildcard-proof (P6)") {
    val df = Seq("Big WIDGET deal", "nothing", "100% _done_", "wid get").toDF("title")
    assert(df.filter(Predicates.icontains(col("title"), "widget")).count() === 1)
    assert(df.filter(Predicates.icontains(col("title"), "WiDgEt")).count() === 1)
    // % and _ must match literally, not as LIKE wildcards (SURVEY §7.4)
    assert(df.filter(Predicates.icontains(col("title"), "100% _d")).count() === 1)
    assert(df.filter(Predicates.icontains(col("title"), "%")).count() === 1)
  }

  test("applyAll folds only present predicates (P8 dynamic WHERE)") {
    val df = Seq((1, 10.0), (2, 20.0), (3, 30.0)).toDF("id", "price")
    val out = Predicates.applyAll(df,
      None, Some(col("price") >= 15.0), None, Some(col("price") <= 25.0))
    assert(out.select("id").as[Int].collect().toSeq === Seq(2))
    assert(Predicates.applyAll(df).count() === 3) // no predicates = identity
  }
}

class PaginationSpec extends SparkSpec {
  import spark.implicits._

  private val df = (1 to 95).map(i => (i.toLong, i % 7)).toDF("id", "grp")
  private val order = Seq(col("grp").asc, col("id").asc)

  test("pages partition the sorted relation: no loss, no dup (O6)") {
    val pages = (1 to 5).flatMap(p =>
      Pagination.page(df, order, p, 20).select("id").as[Long].collect())
    val full = df.orderBy(order: _*).select("id").as[Long].collect()
    assert(pages === full.toSeq)
  }

  test("page past the end is empty, not an error (ads.ts:97 edge)") {
    assert(Pagination.page(df, order, 99, 20).count() === 0)
    assert(Pagination.page(df, order, 0, 20).count() === 20) // clamped skip
  }

  test("keyset pagination equals offset pagination on the same order") {
    val page2 = Pagination.page(df, order, 2, 20).select("id").as[Long].collect()
    val lastOfP1 = Pagination.page(df, order, 1, 20)
      .select("grp", "id").as[(Int, Long)].collect().last
    val keyset = Pagination.keysetAfter(df, order,
      col("grp") > lastOfP1._1 ||
        (col("grp") === lastOfP1._1 && col("id") > lastOfP1._2), 20)
      .select("id").as[Long].collect()
    assert(keyset === page2)
  }
}

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("withCount left-joins grouped counts with 0 default (J3/J4)") {
    val ads = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("ad_id", "title")
    val favs = Seq((1L, 10L), (1L, 11L), (3L, 10L)).toDF("ad", "user")
    val out = Joins.withCount(ads, "ad_id", favs, "ad", "fav_count")
      .orderBy("ad_id").select("ad_id", "fav_count").as[(Long, Long)].collect()
    assert(out.toSeq === Seq((1L, 2L), (2L, 0L), (3L, 1L)))
  }

  test("withCount prune=false matches prune=true (semi-join is transparent)") {
    val ads = Seq((1L, "a"), (2L, "b")).toDF("ad_id", "title")
    val favs = Seq((1L, 1L), (9L, 1L)).toDF("ad", "user") // 9 matches nothing
    val p = Joins.withCount(ads, "ad_id", favs, "ad", "n", prune = true)
      .orderBy("ad_id").collect().toSeq
    val np = Joins.withCount(ads, "ad_id", favs, "ad", "n", prune = false)
      .orderBy("ad_id").collect().toSeq
    assert(p === np)
  }

  test("existsAs returns a single boolean row (J8 favorite check)") {
    val favs = Seq((1L, 2L), (3L, 4L)).toDF("user", "ad")
    def check(u: Long, a: Long): Boolean =
      Joins.existsAs(favs, col("user") === u && col("ad") === a, "found")
        .as[Boolean].head()
    assert(check(1L, 2L))
    assert(!check(1L, 4L))
  }
}

class WindowsSpec extends SparkSpec {
  import spark.implicits._

  test("topPerGroup picks deterministically under ties via tie-break (W1)") {
    // two rows per group with identical ts — id must break the tie
    val df = Seq(
      ("c1", 100L, "m1"), ("c1", 100L, "m2"),
      ("c2", 50L, "m3"), ("c2", 60L, "m4")).toDF("conv", "ts", "id")
    val out = Windows.topPerGroup(df,
      Seq(col("conv")), Seq(col("ts").desc, col("id").desc))
      .orderBy("conv").select("id").as[String].collect()
    assert(out.toSeq === Seq("m2", "m4"))
  }

  test("topPerGroup n>1 keeps n rows per group") {
    val df = (1 to 10).map(i => ("g" + (i % 2), i)).toDF("g", "v")
    val out = Windows.topPerGroup(df, Seq(col("g")), Seq(col("v").desc), n = 3)
    assert(out.count() === 6)
  }
}

class MutationsSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq((1L, "alice"), (2L, "bob")).toDF("id", "name")

  test("upsert appends only missing keys; existing rows win (M5/J9)") {
    val incoming = Seq((2L, "BOB2"), (3L, "carol")).toDF("id", "name")
    val out = Mutations.upsert(base, incoming, Seq("id"))
      .orderBy("id").as[(Long, String)].collect()
    assert(out.toSeq === Seq((1L, "alice"), (2L, "bob"), (3L, "carol")))
  }

  test("upsert is idempotent (find-or-create M6)") {
    val incoming = Seq((3L, "carol")).toDF("id", "name")
    val once = Mutations.upsert(base, incoming, Seq("id"))
    val twice = Mutations.upsert(once, incoming, Seq("id"))
    assert(twice.count() === once.count())
  }

  test("deleteCascade removes parent matches and FK children (M4)") {
    val ads = Seq((1L, "active"), (2L, "deleted"), (3L, "active")).toDF("id", "status")
    val favs = Seq((10L, 1L), (11L, 2L), (12L, 2L), (13L, 3L)).toDF("fid", "ad")
    val (p, c) = Mutations.deleteCascade(ads, col("status") === "deleted", favs, "ad", "id")
    assert(p.select("id").as[Long].collect().sorted.toSeq === Seq(1L, 3L))
    assert(c.select("fid").as[Long].collect().sorted.toSeq === Seq(10L, 13L))
  }

  test("patchUpdate: null keeps old, absent key is a no-op (M2)") {
    val users = Seq((1L, "alice", "a@x"), (2L, "bob", "b@x")).toDF("id", "name", "email")
    val patch = Seq(
      (1L, Option.empty[String], Option("new@x")),
      (9L, Option("ghost"), Option("g@x"))).toDF("id", "name", "email")
    val out = Mutations.patchUpdate(users, patch, "id")
      .orderBy("id").as[(Long, String, String)].collect()
    assert(out.toSeq === Seq((1L, "alice", "new@x"), (2L, "bob", "b@x")))
  }

  test("latestWins returns the newest row per key (M3)") {
    val log = Seq(
      (1L, 10L, "v1"), (1L, 20L, "v2"), (2L, 5L, "w1")).toDF("key", "ts", "v")
    val out = Mutations.latestWins(log, Seq(col("key")),
      Seq(col("ts").desc, col("v").desc))
      .orderBy("key").select("v").as[String].collect()
    assert(out.toSeq === Seq("v2", "w1"))
  }
}
