package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Ranks]] must agree BIT-FOR-BIT with the single-partition
  * `row_number`/`ntile` it replaces — on skewed, heavily tied, and
  * degenerate inputs — because the DuckDB twins of the queries built on it
  * (`winsorized_stats`, `length_band`, `lm_score`, `ppl_buckets`) hash the
  * results exactly.
  */
class RanksSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish skew: many ties at small values, a long tail, string tie-break
  private lazy val skewed = {
    val rows = (1 to 5000).map { i =>
      val v = if (i % 2 == 0) 1L else (i % 97).toLong // half the rows tie at 1
      val part = s"p${i % 3}"
      (part, v, f"id$i%05d")
    }
    rows.toDF("part", "v", "id")
  }

  test("withExactRank matches the single-partition row_number (partitioned)") {
    val got = Ranks.withExactRank(
      skewed, Seq("part"), Seq(col("v"), col("id")), "rk", Some("n"),
      buckets = 8, sampleMod = 4L)
    val want = skewed
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("part")).orderBy(col("v").asc, col("id").asc))
        .cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("part"))))
    assert(got.select("part", "v", "id", "rk", "n")
      .except(want.select("part", "v", "id", "rk", "n")).isEmpty)
    assert(want.select("part", "v", "id", "rk", "n")
      .except(got.select("part", "v", "id", "rk", "n")).isEmpty)
  }

  test("withExactRank matches globally (no partition, negated-desc key)") {
    val got = Ranks.withExactRank(
      skewed, Nil, Seq(col("v") * lit(-1L), col("id")), "rk",
      buckets = 16, sampleMod = 8L)
    val want = skewed.withColumn("rk", row_number().over(
      Window.orderBy(col("v").desc, col("id").asc)).cast("long"))
    assert(got.select("v", "id", "rk").except(want.select("v", "id", "rk")).isEmpty)
    assert(want.select("v", "id", "rk").except(got.select("v", "id", "rk")).isEmpty)
  }

  test("withExactRankDense matches on a dense integer first key") {
    val got = Ranks.withExactRankDense(
      skewed, Seq("part"), Seq(col("v"), col("id")), "rk", Some("n"))
    val want = skewed
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("part")).orderBy(col("v").asc, col("id").asc))
        .cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("part"))))
    assert(got.select("part", "v", "id", "rk", "n")
      .except(want.select("part", "v", "id", "rk", "n")).isEmpty)
    assert(want.select("part", "v", "id", "rk", "n")
      .except(got.select("part", "v", "id", "rk", "n")).isEmpty)
  }

  test("degenerate inputs: all-equal keys, tiny frames, empty sample") {
    // all rows identical key → every boundary equal → one bucket; ranks
    // still total via the tie column
    val flat = (1 to 100).map(i => (7L, f"id$i%03d")).toDF("v", "id")
    val got = Ranks.withExactRank(flat, Nil, Seq(col("v"), col("id")), "rk",
      sampleMod = 1L, buckets = 8)
    assert(got.agg(min("rk"), max("rk"), countDistinct("rk")).as[(Long, Long, Long)]
      .head() === ((1L, 100L, 100L)))
    // sampleMod larger than the frame → empty sample → single bucket, exact
    val tiny = Seq((3L, "a"), (1L, "b"), (2L, "c")).toDF("v", "id")
    val r = Ranks.withExactRank(tiny, Nil, Seq(col("v")), "rk",
      sampleMod = 1000000L)
      .orderBy("rk").select("id").as[String].collect()
    assert(r.toSeq === Seq("b", "c", "a"))
    // empty frame
    assert(Ranks.withExactRank(tiny.filter(lit(false)), Nil, Seq(col("v")),
      "rk").isEmpty)
  }

  test("ntileFromRank reproduces ntile() for ragged bucket sizes") {
    for (b <- Seq(3, 4, 7); nRows <- Seq(1, 2, 10, 97)) {
      val df = (1 to nRows).map(i => (i.toLong, nRows.toLong))
        .toDF("rk", "n")
      val got = df.withColumn("t", Ranks.ntileFromRank("rk", "n", b))
        .orderBy("rk").select("t").as[Int].collect().toSeq
      val want = (1 to nRows).toDF("x")
        .withColumn("t", ntile(b).over(Window.orderBy(col("x").asc)))
        .orderBy("x").select("t").as[Int].collect().toSeq
      assert(got === want, s"b=$b nRows=$nRows")
    }
  }

  test("selectOrderStatistic picks the exact ceil(pct·n)-th value per group") {
    for (pct <- Seq(0.5, 0.9, 0.99)) {
      val got = Ranks.selectOrderStatistic(
        skewed, Seq("part"), col("v"), pct, "sel", buckets = 8, sampleMod = 4L)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = skewed
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("part")).orderBy(col("v").asc)).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("part"))))
        .filter(col("rk") === ceil(col("n") * lit(pct)).cast("long"))
        .collect().map(r => r.getAs[String]("part") -> r.getAs[Long]("v")).toMap
      assert(got === want, s"pct=$pct")
    }
    // unpartitioned + all-ties degenerate
    val flat = (1 to 100).map(i => (7L, i)).toDF("v", "i")
    val sel = Ranks.selectOrderStatistic(flat, Nil, col("v"), 0.99, "sel")
      .collect().map(_.getLong(0)).toSeq
    assert(sel === Seq(7L))
  }

  test("the only unpartitioned window runs over the bucket histogram") {
    // physical-plan shape: every WindowExec with an EMPTY partition spec
    // must sit above a HashAggregate (the tiny histogram), and at least one
    // corpus-touching window must partition on the synthetic bucket column
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Ranks.withExactRank(
        skewed, Nil, Seq(col("v"), col("id")), "rk", Some("n"))
      val plan = df.queryExecution.executedPlan
      val windows = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.nonEmpty)
      windows.foreach { w =>
        val overBucket = w.partitionSpec.exists(
          _.toString.contains("__graft_rk_bkt"))
        val aboveAgg = w.child.exists {
          case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
          case _ => false
        }
        assert(overBucket || aboveAgg,
          s"window neither bucket-partitioned nor over an aggregate:\n$w")
      }
      assert(windows.exists(_.partitionSpec.exists(
        _.toString.contains("__graft_rk_bkt"))))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
