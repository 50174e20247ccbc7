package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** SURVEY §5.3: property-based invariants (ScalaCheck generators driving
  * Spark plans; `SCTest.check` directly — no scalatest bridge needed).
  * Iteration counts are small because each case runs real Spark jobs.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(12)
  private def holds(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, s"property falsified: ${r.status}")
  }

  private val rowsGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(0, 40)
    rows <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 19L), Gen.choose(0L, 999L)))
  } yield rows.zipWithIndex.map { case ((k, v), i) => (i.toLong, k * 1000 + v) }
  // ids unique per case: pagination/sorting need a total order to be testable

  test("pagination partitions the sorted result set: no loss, no dup, in order") {
    holds(Prop.forAll(rowsGen, Gen.choose(1, 7)) { (rows, limit) =>
      val df = rows.toDF("id", "v")
      val order = Seq(col("v").desc, col("id").asc)
      val full = df.orderBy(order: _*).select("id").as[Long].collect().toSeq
      val nPages = (rows.size + limit - 1) / limit + 1 // +1 page past the end
      val paged = (1 to math.max(nPages, 1)).flatMap { p =>
        Pagination.page(df, order, p, limit).select("id").as[Long].collect()
      }
      paged == full
    })
  }

  test("upsert is idempotent and never loses existing rows") {
    val incomingGen = Gen.listOf(Gen.zip(Gen.choose(0L, 9L), Gen.choose(0L, 99L)))
    holds(Prop.forAll(incomingGen, incomingGen) { (baseRows, incRows) =>
      val base = baseRows.distinctBy(_._1).toDF("k", "v")
      val inc = incRows.distinctBy(_._1).toDF("k", "v")
      val once = Mutations.upsert(base, inc, Seq("k"))
        .as[(Long, Long)].collect().sorted.toSeq
      val twice = Mutations.upsert(Mutations.upsert(base, inc, Seq("k")), inc, Seq("k"))
        .as[(Long, Long)].collect().sorted.toSeq
      val baseSet = base.as[(Long, Long)].collect().toSet
      once == twice && baseSet.subsetOf(once.toSet) &&
        once.map(_._1).distinct.size == once.size
    })
  }

  test("pair normalization is symmetric: (a,b) and (b,a) yield one key") {
    holds(Prop.forAll(Gen.listOf(Gen.zip(Gen.choose(0L, 50L), Gen.choose(0L, 50L)))) { pairs =>
      val df = (pairs ++ pairs.map(_.swap)).toDF("a", "b")
        .select(least(col("a"), col("b")).as("u1"), greatest(col("a"), col("b")).as("u2"))
        .distinct()
      val expected = pairs.map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
      df.as[(Long, Long)].collect().toSet == expected
    })
  }

  test("P9 pushdown equivalence: filter before the join == filter after") {
    val factGen = Gen.listOf(Gen.zip(Gen.choose(0L, 9L), Gen.choose(0L, 999L)))
    holds(Prop.forAll(factGen) { facts =>
      val fact = facts.zipWithIndex
        .map { case ((k, v), i) => (i.toLong, k, v) }.toDF("id", "k", "v")
      val dim = (0L to 9L).map(k => (k, if (k % 3 == 0) "deleted" else "active"))
        .toDF("dk", "status")
      val post = fact.join(dim, col("k") === col("dk"))
        .filter(col("status") =!= "deleted")
        .select("id").as[Long].collect().toSet
      val pre = fact.join(dim.filter(col("status") =!= "deleted"), col("k") === col("dk"))
        .select("id").as[Long].collect().toSet
      post == pre
    })
  }
}
