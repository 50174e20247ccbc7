package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The Misra–Gries aggregate's ε-guarantee, checked against the exact
  * census under REAL two-phase aggregation (partial buffers per partition,
  * serialized, merged) — the path a 100 TB run exercises.
  */
class MisraGriesSpec extends SparkSpec {

  private def summarize(
      tokens: Seq[String], k: Int, parts: Int): Map[String, Long] = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = tokens.toDF("tok").repartition(parts)
    val out = df.agg(expr(s"graft_heavy_hitters(tok, $k)").as("hh"))
      .collect().head.getSeq[Row](0)
    out.map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("estimates undercount by at most n/(k+1); every true heavy survives") {
    val rnd = new scala.util.Random(42)
    // skewed stream: a few hot tokens + a zipf-ish tail
    val hot = Seq.fill(400)("alpha") ++ Seq.fill(300)("beta") ++
      Seq.fill(150)("gamma")
    val tail = Seq.fill(600)(s"t${rnd.nextInt(200)}")
    val tokens = rnd.shuffle(hot ++ tail)
    val n = tokens.size.toLong
    val exact = tokens.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (k <- Seq(8, 32); parts <- Seq(1, 7)) {
      val est = summarize(tokens, k, parts)
      val eps = n / (k + 1).toLong
      assert(est.size <= k)
      est.foreach { case (item, e) =>
        val f = exact(item)
        assert(e <= f, s"$item overcounted: $e > $f (k=$k parts=$parts)")
        assert(e >= f - eps, s"$item undercounted past n/(k+1): $e < $f - $eps")
      }
      // every item with true frequency > n/(k+1) must be in the summary
      exact.filter(_._2 > eps).keys.foreach { heavy =>
        assert(est.contains(heavy), s"true heavy $heavy missing (k=$k parts=$parts)")
      }
    }
  }

  test("order: counters desc, item asc; capacity bound holds at capacity 1") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = (Seq.fill(10)("x") ++ Seq.fill(5)("y")).toDF("tok")
    val rows = df.agg(expr("graft_heavy_hitters(tok, 4)").as("hh"))
      .collect().head.getSeq[Row](0)
    val counts = rows.map(_.getLong(1))
    assert(counts === counts.sortBy(-_))
    assert(rows.map(_.getString(0)).distinct.length === rows.length)
    // capacity 1: the majority element (Boyer–Moore special case) survives
    val one = df.agg(expr("graft_heavy_hitters(tok, 1)").as("hh"))
      .collect().head.getSeq[Row](0)
    assert(one.map(_.getString(0)) === Seq("x"))
  }

  test("non-literal capacity fails at analysis with a named error") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq("a").toDF("tok")
    val e = intercept[Exception] {
      df.selectExpr("graft_heavy_hitters(tok, length(tok))").collect()
    }
    assert(e.getMessage.contains("graft_heavy_hitters"))
  }

  test("wrong input types fail at ANALYSIS, not mid-job in the aggregate") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // non-string item: previously a ClassCastException inside update()
    val nums = Seq(1L, 2L, 2L).toDF("v")
    val e1 = intercept[Exception] {
      nums.selectExpr("graft_heavy_hitters(v, 4)").collect()
    }
    assert(e1.getMessage.contains("STRING item"), e1.getMessage)
    // non-integral weight on the weighted form
    val weighted = Seq(("a", "x")).toDF("tok", "w")
    val e2 = intercept[Exception] {
      weighted.selectExpr("graft_heavy_hitters_w(tok, w, 4)").collect()
    }
    assert(e2.getMessage.contains("integral weight"), e2.getMessage)
    // integral non-long weights keep working (int column)
    val ints = Seq(("a", 3), ("b", 1), ("a", 2)).toDF("tok", "w")
    val hh = ints.selectExpr("graft_heavy_hitters_w(tok, w, 4) AS hh")
      .collect().head.getSeq[Row](0)
    assert(hh.map(r => (r.getString(0), r.getLong(1))) === Seq(("a", 5L), ("b", 1L)))
  }
}
