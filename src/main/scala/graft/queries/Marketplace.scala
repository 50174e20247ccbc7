package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.{Joins, Pagination, Predicates}

/** The reference's marketplace read endpoints (`/root/reference/src/routes/
  * {ads,favorites,admin}.ts`) re-expressed on the driver's star schema
  * (FIXTURES.md casting):
  *
  *   - `part` plays `Ad` for catalog search (title=p_name, price=p_retailprice)
  *   - `orders` plays `Ad` for user-centric listings (userId=o_custkey,
  *     status=o_orderstatus with 'O'=active / 'F'=deleted, createdAt=o_orderdate)
  *   - `customer` plays `User`, `nation`/`region` play `Category`
  *   - `lineitem` rows play `Favorite` pairs ((l_orderkey,l_partkey) ~
  *     (adId,userId)); lineitem-count-per-key plays `_count.favorites`
  */
object Marketplace {

  /** Query-param struct of `GET /api/ads` (`ads.ts:84-95`). */
  final case class AdsSearchParams(
      search: Option[String] = None,     // OR-of-ILIKE over title/descr (ads.ts:104-109)
      category: Option[String] = None,   // categoryId equality (ads.ts:111-113)
      location: Option[String] = None,   // location icontains (ads.ts:121-123)
      minPrice: Option[Double] = None,   // price range (ads.ts:115-119)
      maxPrice: Option[Double] = None,
      sortBy: String = "newest",         // newest | price_low | price_high (ads.ts:126-132)
      page: Int = 1,
      limit: Int = 20)

  /** Filter stage shared by the list query and its count twin — the reference
    * reuses one `where` object for both (`ads.ts:134-156`, Promise.all of
    * findMany+count). `category` is equality on p_type (the categoryId
    * equality of ads.ts:111-113); `location` is a second case-insensitive
    * contains over p_brand (ads.ts:121-123).
    */
  private def adsFiltered(spark: SparkSession, sfDir: String, p: AdsSearchParams): DataFrame =
    Predicates.applyAll(
      Tables.part(spark, sfDir),
      p.search.map(s => Predicates.icontains(col("p_name"), s)),
      p.category.map(col("p_type") === _),
      p.location.map(s => Predicates.icontains(col("p_brand"), s)),
      p.minPrice.map(col("p_retailprice") >= _),
      p.maxPrice.map(col("p_retailprice") <= _))

  /** Flagship `GET /api/ads` (`ads.ts:84-166`): dynamic WHERE → favorite-count
    * left join (`_count.favorites`, `ads.ts:150-153`) → param-driven sort →
    * OFFSET/LIMIT page.
    *
    * Scale shape: the listing side is pruned FIRST, then the favorite-count
    * aggregation runs over a semi-join-pruned fact table, so the count
    * shuffle is proportional to the candidate set, not all of `lineitem`.
    */
  def adsSearch(spark: SparkSession, sfDir: String, p: AdsSearchParams): DataFrame = {
    val filtered = adsFiltered(spark, sfDir, p)
      .select("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    val withFav = Joins.withCount(
      filtered, "p_partkey", Tables.lineitem(spark, sfDir), "l_partkey", "fav_count")
    Pagination.page(withFav, sortOrder(p.sortBy), p.page, p.limit)
  }

  /** Keyset ("seek") variant of the flagship search: the page after a
    * (price, partkey) cursor under the price_low sort. The scale replacement
    * for `ads.ts:97`'s OFFSET pagination — the composite-cursor predicate
    * pushes into the scan (zone-map prunable) instead of globally sorting
    * skip+take rows per page.
    */
  def adsSearchAfter(
      spark: SparkSession, sfDir: String, p: AdsSearchParams,
      afterPrice: Double, afterKey: Long): DataFrame = {
    val filtered = adsFiltered(spark, sfDir, p)
      .select("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    val withFav = Joins.withCount(
      filtered, "p_partkey", Tables.lineitem(spark, sfDir), "l_partkey", "fav_count")
    Pagination.keysetAfter(
      withFav,
      Seq(col("p_retailprice").asc, col("p_partkey").asc),
      col("p_retailprice") > afterPrice ||
        (col("p_retailprice") === afterPrice && col("p_partkey") > afterKey),
      p.limit)
  }

  /** Sort selection (`ads.ts:126-132`) with deterministic id tie-break. */
  private def sortOrder(sortBy: String): Seq[Column] = sortBy match {
    case "price_low"  => Seq(col("p_retailprice").asc, col("p_partkey").asc)
    case "price_high" => Seq(col("p_retailprice").desc, col("p_partkey").asc)
    case _            => Seq(col("p_partkey").desc) // "newest": creation-key desc
  }

  /** The pagination-count twin (`ads.ts:155`): same WHERE, scalar count. */
  def adsCount(spark: SparkSession, sfDir: String, p: AdsSearchParams): DataFrame =
    adsFiltered(spark, sfDir, p).agg(count(lit(1)).as("total"))

  /** `GET /api/ads/my/listings` (`ads.ts:211-231`): the caller's ads, any
    * status except deleted (P4), newest first (O1), with favorite counts.
    */
  def myAds(spark: SparkSession, sfDir: String, custkey: Long): DataFrame = {
    val mine = Tables.orders(spark, sfDir)
      .filter(col("o_custkey") === custkey && col("o_orderstatus") =!= "F")
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    val withFav = Joins.withCount(
      mine, "o_orderkey", Tables.lineitem(spark, sfDir), "l_orderkey", "fav_count")
    withFav.orderBy(col("o_orderdate").desc, col("o_orderkey").desc).limit(20)
  }

  /** `GET /api/ads/:id` (`ads.ts:176-208`): point lookup (J10) + seller join
    * (J1) + category join (J2) + favorite count (J3).
    *
    * Scale shape: the single-key filter prunes to ≤1 row before any join, so
    * the dims broadcast trivially; and because the key is a plan-time
    * literal, the favorite count pushes `l_orderkey = k` into the lineitem
    * scan itself (parquet row-group min/max pruning) instead of routing
    * through the generic semi-join helper — a point lookup must never scan
    * the fact table.
    */
  def adById(spark: SparkSession, sfDir: String, orderkey: Long): DataFrame = {
    val ad = Tables.orders(spark, sfDir).filter(col("o_orderkey") === orderkey)
    val seller = broadcast(Tables.customer(spark, sfDir)
      .select("c_custkey", "c_name", "c_mktsegment", "c_nationkey"))
    val cat = broadcast(Tables.nation(spark, sfDir).select("n_nationkey", "n_name"))
    val joined = ad
      .join(seller, ad("o_custkey") === seller("c_custkey"))
      .join(cat, seller("c_nationkey") === cat("n_nationkey"))
      .select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"), col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("n_name").as("category_name"))
    val favCount = Tables.lineitem(spark, sfDir)
      .filter(col("l_orderkey") === orderkey)
      .agg(count(lit(1)).as("fav_count"))
    joined.crossJoin(favCount)
  }

  /** `GET /api/ads/categories/all` (`ads.ts:270-281`): full dim list, name
    * asc (O3). Category dim = nation ⋈ region chain.
    */
  def categories(spark: SparkSession, sfDir: String): DataFrame =
    Tables.nation(spark, sfDir)
      .join(broadcast(Tables.region(spark, sfDir)), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
      .orderBy(col("n_name").asc, col("n_nationkey").asc)

  /** `GET /api/favorites` (`favorites.ts:69-99`): J5 three-level include
    * (favorite → ad → seller → category), with the reference's post-fetch
    * deleted-ad filter (P9, `favorites.ts:95`) kept IN-plan so it pushes
    * down to the scan instead of running client-side.
    */
  def favoritesList(spark: SparkSession, sfDir: String, partkey: Long): DataFrame = {
    val favs = Tables.lineitem(spark, sfDir)
      .filter(col("l_partkey") === partkey)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_shipdate")
    val ads = Tables.orders(spark, sfDir).filter(col("o_orderstatus") =!= "F")
    val seller = broadcast(Tables.customer(spark, sfDir)
      .select("c_custkey", "c_name", "c_nationkey"))
    val cat = broadcast(Tables.nation(spark, sfDir).select("n_nationkey", "n_name"))
    favs
      .join(ads, favs("l_orderkey") === ads("o_orderkey"))
      .join(seller, ads("o_custkey") === seller("c_custkey"))
      .join(cat, seller("c_nationkey") === cat("n_nationkey"))
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
        col("o_totalprice"), col("o_orderstatus"), col("c_name"),
        col("n_name").as("category_name"))
      .orderBy(col("l_shipdate").desc, col("l_orderkey").desc, col("l_linenumber").asc)
      .limit(20)
  }

  /** `GET /api/favorites/check/:adId` (`favorites.ts:105-121`): J8 existence
    * as a boolean (`!!favorite`).
    */
  def favoriteCheck(spark: SparkSession, sfDir: String, orderkey: Long, partkey: Long): DataFrame =
    Joins.existsAs(
      Tables.lineitem(spark, sfDir),
      col("l_orderkey") === orderkey && col("l_partkey") === partkey,
      "favorited")

  /** The J6 shape (`chat.ts:28-42`: Conversation joins the SAME User dim
    * twice under two aliases): each trade joins `nation` twice — once via
    * the buyer, once via the supplier. Also the widest join chain we bench
    * (5 joins, 2 of them to the same dim).
    *
    * Scale shape: nation/customer/supplier are broadcast; the only shuffle
    * is lineitem⋈orders on orderkey — and the final top-50 is a
    * TakeOrdered, not a global sort.
    */
  def trades(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val ords = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_orderdate")
    val cust = broadcast(Tables.customer(spark, sfDir).select("c_custkey", "c_name", "c_nationkey"))
    val supp = broadcast(Tables.supplier(spark, sfDir).select("s_suppkey", "s_name", "s_nationkey"))
    val buyerNation = broadcast(Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("bn_key"), col("n_name").as("buyer_nation")))
    val suppNation = broadcast(Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supplier_nation")))
    li.join(ords, li("l_orderkey") === ords("o_orderkey"))
      .join(cust, ords("o_custkey") === cust("c_custkey"))
      .join(buyerNation, cust("c_nationkey") === col("bn_key"))
      .join(supp, li("l_suppkey") === supp("s_suppkey"))
      .join(suppNation, supp("s_nationkey") === col("sn_key"))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        col("c_name"), col("buyer_nation"), col("s_name"), col("supplier_nation"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(50)
  }

  /** `GET /api/admin/users` (`admin.ts:14-37`): every user with their ad
    * count (J4), newest-key first, first page.
    */
  def adminUsers(spark: SparkSession, sfDir: String): DataFrame = {
    val users = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
    // prune=false: this is a full-dim listing — every order group survives,
    // so a semi-join prepass would only add a pass over the fact table.
    val withAds = Joins.withCount(
      users, "c_custkey", Tables.orders(spark, sfDir), "o_custkey", "ad_count", prune = false)
    Pagination.page(withAds, Seq(col("c_custkey").desc), 1, 50)
  }

  /** `GET /api/admin/ads` (`admin.ts:74-100`): all ads regardless of status,
    * seller joined, newest first, page 2 (exercises the offset path O6).
    */
  def adminAds(spark: SparkSession, sfDir: String): DataFrame = {
    val ords = Tables.orders(spark, sfDir)
    val cust = broadcast(Tables.customer(spark, sfDir).select("c_custkey", "c_name"))
    val joined = ords.join(cust, ords("o_custkey") === cust("c_custkey"))
      .select(
        col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"),
        col("o_orderdate"), col("c_name"))
    Pagination.page(joined, Seq(col("o_orderdate").desc, col("o_orderkey").desc), 2, 50)
  }

  /** Keyset ("seek") variant of the admin listing — the 100 TB replacement
    * for [[adminAds]]'s OFFSET page: the page strictly after a
    * (orderdate, orderkey) cursor under the newest-first sort. The cursor
    * predicate pushes into the fact scan (zone-map/row-group prunable on
    * o_orderdate), so page N costs a pruned scan + top-50 instead of a
    * global sort of skip+take rows — the same trade [[adsSearchAfter]]
    * makes for the flagship search.
    */
  def adminAdsAfter(
      spark: SparkSession, sfDir: String,
      afterDate: String, afterKey: Long): DataFrame = {
    val ords = Tables.orders(spark, sfDir)
    val cust = broadcast(Tables.customer(spark, sfDir).select("c_custkey", "c_name"))
    val joined = ords.join(cust, ords("o_custkey") === cust("c_custkey"))
      .select(
        col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"),
        col("o_orderdate"), col("c_name"))
    Pagination.keysetAfter(
      joined,
      Seq(col("o_orderdate").desc, col("o_orderkey").desc),
      col("o_orderdate") < lit(afterDate).cast("date") ||
        (col("o_orderdate") === lit(afterDate).cast("date") &&
          col("o_orderkey") < afterKey),
      50)
  }

  /** `GET /api/admin/stats` (`admin.ts:129-153`): four global counts (A2).
    * The reference fires 4 parallel queries; one Spark job computes the two
    * order counts in a single scan (`count_if`) and cross-joins the two
    * tiny dim counts — 3 scans instead of 4, single row out.
    */
  def adminStats(spark: SparkSession, sfDir: String): DataFrame = {
    val orderStats = Tables.orders(spark, sfDir).agg(
      count(lit(1)).as("total_ads"),
      count_if(col("o_orderstatus") === "O").as("active_ads"))
    val userCount = Tables.customer(spark, sfDir).agg(count(lit(1)).as("total_users"))
    val catCount = Tables.nation(spark, sfDir).agg(count(lit(1)).as("total_categories"))
    userCount.crossJoin(orderStats).crossJoin(catCount)
  }

  /** Market-basket co-occurrence: part pairs appearing in the same order,
    * ranked by how many orders contain both — the "bought together"
    * recommendation seed.
    *
    * Scale shape: reads the graph family's shared co-purchase edge
    * artifact ([[graft.ext.Graph.coPurchaseEdges]] — built once per sfDir:
    * the order-keyed self-join co-partitions both sides on one shuffle,
    * pair production per order is C(parts-in-order, 2), bounded by the
    * artifact's `MaxBasket` guard — orders wider than
    * [[graft.ext.Graph.MaxBasket]] distinct parts are excluded, so a
    * pathological mega-order can never emit quadratic pair rows). Here
    * the `<` filter keeps one orientation of the symmetric table and the
    * top-k is a TakeOrdered — no global sort.
    */
  def copurchasePairs(
      spark: SparkSession, sfDir: String, topK: Int = 25): DataFrame =
    graft.ext.Graph.coPurchaseEdges(spark, sfDir)
      .filter(col("src") < col("dst"))
      .select(col("src").as("part_a"), col("dst").as("part_b"),
        col("w").as("n_orders"))
      .orderBy(col("n_orders").desc, col("part_a").asc, col("part_b").asc)
      .limit(topK)

  /** TPC-H Q3-shaped shipping-priority report: revenue still unshipped as
    * of the cutoff, for one market segment — the classic selective
    * 3-way join (dim filter → fact join → grouped agg → top-k).
    *
    * Revenue is summed as DECIMAL(18,6) of the per-line double product
    * (rounded at 6dp first): the product is IEEE-identical in any
    * engine, and decimal addition is associative, so the sum
    * hash-matches cross-engine where a double sum would depend on
    * reduction order (the [[graft.ext.EventAnalytics.winsorizedStats]]
    * convention).
    *
    * Scale shape: the segment filter prunes customer BEFORE the join and
    * the date predicates push into both parquet scans; customer
    * broadcasts (dim-sized), orders⋈lineitem co-partitions on orderkey;
    * the aggregate is map-side combinable on (orderkey, date, priority);
    * the top-10 is a TakeOrdered, never a global sort.
    */
  def shippingPriority(
      spark: SparkSession, sfDir: String,
      segment: String = "BUILDING", cutoff: String = "1998-07-01",
      topK: Int = 10): DataFrame = {
    val cut = lit(cutoff).cast("timestamp")
    val cust = broadcast(Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === segment)
      .select("c_custkey"))
    // facts come off the co-bucketed order-key layout: the orders⋈lineitem
    // join needs no exchange, and the date predicates still push into the
    // bucketed parquet scans
    val ords = graft.ops.Layout.ordersByOrderkey(spark, sfDir)
      .filter(col("o_orderdate") < cut)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = graft.ops.Layout.lineitemByOrderkey(spark, sfDir)
      .filter(col("l_shipdate") > cut)
      .select(col("l_orderkey"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .cast("decimal(18,6)").as("rev"))
    ords.join(cust, ords("o_custkey") === cust("c_custkey"))
      .join(li, ords("o_orderkey") === li("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(col("rev")).as("__rev"))
      // exact decimal sum → one deterministic double rendering for output
      // (the winsorizedStats convention: decimals add associatively, the
      // final round(·,6) maps both engines' identical decimal to one double)
      .withColumn("revenue", round(col("__rev").cast("double"), 6))
      .drop("__rev")
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(topK)
  }

  /** TPC-H Q1-shaped pricing summary: the canonical scan-heavy aggregate —
    * one pass over lineitem, grouped by the two status flags, producing
    * the sum/avg/count battery. The classic whole-stage-codegen
    * benchmark query: no join, no window; throughput is the parquet scan
    * plus a map-side-combinable hash-agg with 4 distinct groups.
    *
    * All sums accumulate as DECIMAL(18,6) of 6dp-rounded doubles
    * (associative → engine-exact, the [[shippingPriority]] convention);
    * averages derive from the exact sums and the count, so they too are
    * one deterministic double each. Output columns are rounded doubles.
    */
  def pricingSummary(
      spark: SparkSession, sfDir: String,
      cutoff: String = "2001-06-01"): DataFrame = {
    def dec(c: Column) = round(c, 6).cast("decimal(18,6)")
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit(cutoff).cast("timestamp"))
      .select(col("l_returnflag"), col("l_linestatus"),
        dec(col("l_quantity")).as("qty"),
        dec(col("l_extendedprice")).as("price"),
        dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("disc_price"),
        dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))).as("charge"),
        dec(col("l_discount")).as("disc"))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("qty")).as("__sq"), sum(col("price")).as("__sp"),
        sum(col("disc_price")).as("__sdp"), sum(col("charge")).as("__sc"),
        sum(col("disc")).as("__sd"), count(lit(1)).as("count_order"))
      .select(
        col("l_returnflag"), col("l_linestatus"),
        round(col("__sq").cast("double"), 6).as("sum_qty"),
        round(col("__sp").cast("double"), 6).as("sum_base_price"),
        round(col("__sdp").cast("double"), 6).as("sum_disc_price"),
        round(col("__sc").cast("double"), 6).as("sum_charge"),
        round((col("__sq").cast("double") / col("count_order").cast("double")), 6)
          .as("avg_qty"),
        round((col("__sp").cast("double") / col("count_order").cast("double")), 6)
          .as("avg_price"),
        round((col("__sd").cast("double") / col("count_order").cast("double")), 6)
          .as("avg_disc"),
        col("count_order"))
      .orderBy(col("l_returnflag").asc, col("l_linestatus").asc)
  }

  /** TPC-H Q5-shaped local-supplier volume: revenue per nation from
    * orders where the customer and the line's supplier share that nation,
    * restricted to one region and one order-date year. The deepest join
    * chain in the registry (lineitem ⋈ orders ⋈ customer ⋈ supplier ⋈
    * nation ⋈ region) — the query that exercises Catalyst's join
    * planning the way a warehouse workload does.
    *
    * Scale decisions, explicitly: nation⋈region (≤ 25 rows) broadcasts to
    * both sides; the date predicate lands on the orders SCAN (pushed
    * filter, partition-prunable on a date-partitioned layout); the only
    * big-big join is lineitem ⋈ orders on the order key; customer and
    * supplier are left to AQE — broadcast at this SF, shuffle-join at
    * warehouse scale where neither fits an executor. Revenue uses the
    * pricing_summary decimal-sum convention (terms rounded to 6dp,
    * DECIMAL(18,6) exact sums, presented as rounded double), so the
    * result — including the revenue-desc ORDER — is bit-identical
    * cross-engine.
    */
  def localSupplierVolume(
      spark: SparkSession, sfDir: String, region: String = "ASIA",
      from: String = "1996-01-01", until: String = "1997-01-01"): DataFrame = {
    def dec(c: Column) = round(c, 6).cast("decimal(18,6)")
    val nations = Tables.nation(spark, sfDir)
      .join(Tables.region(spark, sfDir).filter(col("r_name") === region),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = Tables.customer(spark, sfDir)
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"))
    val supp = Tables.supplier(spark, sfDir)
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    // co-bucketed fact layout: the lineitem⋈orders leg is exchange-free
    val ord = graft.ops.Layout.ordersByOrderkey(spark, sfDir)
      .filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
        col("o_orderdate") < lit(until).cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    graft.ops.Layout.lineitemByOrderkey(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"),
        dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("rev"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("rev")).as("__rev"), count(lit(1)).as("n_items"))
      .select(col("n_name"),
        round(col("__rev").cast("double"), 6).as("revenue"),
        col("n_items"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }

  /** TPC-H Q17-shaped small-quantity revenue: per brand, the revenue
    * carried by line items whose quantity sits below 20% of that PART's
    * average quantity (divided by 7 — the "yearly loss to small orders"
    * presentation). The correlated-scalar-aggregate pattern: in SQL this
    * is a correlated subquery per row; here (and in Catalyst's own
    * decorrelation) it is one hash-agg building the per-part threshold
    * frame joined back to the stream — the shape that scales, because
    * the threshold frame is |parts| rows, co-partitioned with the join
    * key the stream already shuffles on.
    *
    * Determinism: the threshold is `0.2 · (Σqty / n)` in exactly that
    * association — quantities are integer-valued doubles, so Σ is exact,
    * the division correctly rounded, and both engines evaluate the same
    * two IEEE ops; revenue uses the decimal-sum convention.
    */
  def smallQuantityRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    def dec(c: Column) = round(c, 6).cast("decimal(18,6)")
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_quantity"),
        dec(col("l_extendedprice")).as("price"))
    val thresh = li.groupBy(col("l_partkey"))
      .agg((lit(0.2) * (sum(col("l_quantity")) / count(lit(1)))).as("t"))
    li.join(thresh, Seq("l_partkey"))
      .where(col("l_quantity") < col("t"))
      .join(Tables.part(spark, sfDir)
        .select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum(col("price")).as("__r"), count(lit(1)).as("n_items"))
      .select(col("p_brand"),
        round(col("__r").cast("double") / lit(7.0), 6).as("avg_yearly"),
        col("n_items"))
      .orderBy(col("p_brand").asc)
  }

  /** TPC-H Q15-shaped top supplier: the supplier(s) whose shipped revenue
    * over one quarter is the global maximum — Q15's CREATE VIEW +
    * `total_revenue = (SELECT max(...))` correlated-max, decorrelated the
    * way it scales: the revenue frame is |suppliers| rows, the max is a
    * 1-row aggregate broadcast back as a join (never a global sort of the
    * frame, never a window over one unbounded partition).
    *
    * Ties are real rows here (Q15 keeps all maximal suppliers), and the
    * revenue is the decimal-exact [[pricingSummary]] convention, so "is
    * equal to the max" is a well-defined cross-engine predicate — no
    * epsilon.
    */
  def topSupplierRevenue(
      spark: SparkSession, sfDir: String,
      from: String = "1996-01-01", until: String = "1996-04-01"): DataFrame = {
    val rev = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
        .cast("decimal(18,6)")).as("__rev"))
    val top = rev.agg(max(col("__rev")).as("__max"))
    rev.join(broadcast(top), rev("__rev") === top("__max"))
      .join(Tables.supplier(spark, sfDir),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        round(col("__rev").cast("double"), 6).as("total_revenue"))
      .orderBy(col("s_suppkey").asc)
  }

  /** TPC-H Q21-shaped sole-blame supplier report: for each supplier, how
    * many multi-supplier orders exist where THIS supplier is the only one
    * whose line came back flagged 'R' — Q21's exists/not-exists pair over
    * lineitem siblings (adapted to this schema's returnflag; there is no
    * receipt/commit date).
    *
    * Decorrelated as one aggregate instead of two correlated self-joins:
    * per order, `n_supp = countDistinct(supplier)` and `n_r_supp =
    * countDistinct(supplier having an 'R' line)`; the Q21 predicate pair
    * is exactly `n_supp > 1 AND n_r_supp = 1`, testable on a frame of
    * |orders| rows. At 100 TB that is one map-side-combinable hash-agg
    * co-partitioned with the join back to the candidate lines — the
    * classic win over EXISTS-shaped double scans of the fact table.
    */
  def soleReturnSupplier(
      spark: SparkSession, sfDir: String, topK: Int = 25): DataFrame = {
    // ONE (orderkey, suppkey)-level pre-aggregate serves both sides:
    // per-order supplier/R-supplier counts AND the candidate pair set —
    // no countDistinct Expand (×3 row multiplication), no second
    // distinct pass over lineitem, one scan total. At 100 TB the first
    // agg is map-side combinable on the join key everything downstream
    // shares.
    val perOrderSupp = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0))
        .as("has_r"))
    // n_r_supp = 1 means the blamed supplier is UNIQUE per qualifying
    // order, so it can ride the same per-order aggregate as
    // max(when(has_r, suppkey)) — one chained agg instead of re-deriving
    // perOrderSupp (it was unpersisted: a second full scan + (order,
    // supp) aggregation) and joining it back (r13)
    perOrderSupp.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supp"), sum(col("has_r")).as("n_r_supp"),
        max(when(col("has_r") === 1, col("l_suppkey"))).as("l_suppkey"))
      .where(col("n_supp") > 1 && col("n_r_supp") === 1)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(Tables.supplier(spark, sfDir),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(topK)
  }

  /** Fused per-supplier operational scorecard — the supply-side dual of
    * the corpus source_scorecard: ONE lineitem⋈orders pass computes
    * revenue (decimal-exact), order reach, return rate, and the exact
    * average ship delay per supplier, top `topK` by revenue. One scan,
    * one co-partitioned join, one hash-agg — never one pass per metric.
    *
    * Exactness: revenue via the decimal-sum convention; return rate and
    * avg delay from exact integer counts/day-sums, each a single IEEE
    * division rendered at 6dp.
    */
  def supplierScorecard(
      spark: SparkSession, sfDir: String, topK: Int = 25): DataFrame = {
    // co-bucketed fact layout: the one lineitem⋈orders pass is
    // exchange-free, and the groupBy shuffles only the slim agg rows
    val li = graft.ops.Layout.lineitemByOrderkey(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"),
        col("l_shipdate"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .cast("decimal(18,6)").as("rev"))
    li.join(graft.ops.Layout.ordersByOrderkey(spark, sfDir)
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_suppkey"))
      .agg(
        sum(col("rev")).as("__rev"),
        count(lit(1)).as("n_items"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("__nr"),
        sum(datediff(col("l_shipdate"), col("o_orderdate")).cast("long"))
          .as("__delay"))
      .join(Tables.supplier(spark, sfDir),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        round(col("__rev").cast("double"), 6).as("revenue"),
        col("n_orders"), col("n_items"),
        round(col("__nr").cast("double") / col("n_items").cast("double"), 6)
          .as("return_rate"),
        round(col("__delay").cast("double") / col("n_items").cast("double"),
          6).as("avg_ship_delay_days"))
      .orderBy(col("revenue").desc, col("s_suppkey").asc)
      .limit(topK)
  }

  /** Association-rule metrics over co-purchased part pairs — market-basket
    * support/confidence/lift: for the strongest pairs, how often they
    * co-occur (support), how predictive each side is of the other
    * (confidence, reported for the a→b direction with a < b), and the
    * independence ratio (lift > 1 = genuinely associated, not just two
    * popular parts). The inputs are exact integer counts over the order
    * baskets; the three ratios are fixed IEEE expressions stated
    * identically in the twin.
    *
    * Scale shape: pair counts come off the graph family's shared
    * co-purchase edge artifact ([[graft.ext.Graph.coPurchaseEdges]] —
    * one bucketed scan, the basket self-join never re-runs here), which
    * carries the `MaxBasket` guard: orders wider than
    * [[graft.ext.Graph.MaxBasket]] distinct parts are excluded from the
    * whole analysis (pairs AND denominators — a mega-basket co-occurs
    * with everything, pure noise for association rules, and C(basket,2)
    * pair rows from one hot order is the unbounded-marketplace failure
    * mode). The denominators — per-part basket counts and the basket
    * total — come off the maintained [[graft.ext.Graph.basketCensus]]
    * artifact (|parts|+1 rows, same MaxBasket universe and refresh
    * contract as the edges), NOT a per-call distinct+groupBy over the
    * raw fact table: at tier-J scale the raw-fact denominators were 95%
    * of this query's cost. The k winners are selected BEFORE the
    * denominator joins (TakeOrdered over the bucketed edge scan — the
    * ranking key is edge-local and the census joins are 1:1), so the
    * census attaches to k rows by broadcast, never to the pair frame.
    */
  def partAffinity(
      spark: SparkSession, sfDir: String, topK: Int = 25): DataFrame =
    affinityOf(graft.ext.Graph.basketCensus(spark, sfDir),
      graft.ext.Graph.coPurchaseEdges(spark, sfDir), topK)

  /** [[partAffinity]]'s ranking+ratio kernel over explicit census and
    * edge frames — factored out so the STREAMED basket index
    * ([[graft.streaming.CorpusIngest.readCensusIndex]] /
    * `readEdgeIndex`) can serve the same query, and the spec can pin
    * streamed-index results equal to the batch artifacts row-for-row.
    */
  private[graft] def affinityOf(
      census: DataFrame, edges: DataFrame, topK: Int = 25): DataFrame = {
    val nBaskets = census.filter(col("l_partkey") === -1L)
      .select(col("pc").as("__n"))
    val partCounts = census.filter(col("l_partkey") =!= -1L)
      .select(col("l_partkey"), col("pc").as("__pc"))
    val pairs = edges
      .filter(col("src") < col("dst"))
      .select(col("src").as("pa"), col("dst").as("pb"),
        col("w").cast("long").as("n_both"))
    // top-k FIRST: the ranking key (n_both, pa, pb) is fully determined
    // by the edge row, and the census joins below are 1:1 and
    // non-filtering (every part in a bounded-basket pair has a census
    // row), so selecting the k winners before attaching denominators is
    // row-identical — and turns two full-pair-frame shuffle joins (the
    // tier-J 100× cost: 120M pairs × 20M parts, twice) into one
    // TakeOrdered over the bucketed edge scan plus two broadcast probes
    // of the k-row frame against the bucketed census scan
    val top = pairs
      .orderBy(col("n_both").desc, col("pa").asc, col("pb").asc)
      .limit(topK)
    partCounts.select(col("l_partkey").as("pb"), col("__pc").as("__cb"))
      .join(broadcast(
        partCounts.select(col("l_partkey").as("pa"), col("__pc").as("__ca"))
          .join(broadcast(top), Seq("pa"))), Seq("pb"))
      .join(broadcast(nBaskets))
      .select(col("pa").as("part_a"), col("pb").as("part_b"),
        col("n_both"),
        round(col("n_both").cast("double") / col("__n").cast("double"), 6)
          .as("support"),
        round(col("n_both").cast("double") / col("__ca").cast("double"), 6)
          .as("confidence"),
        round((col("n_both").cast("double") * col("__n").cast("double"))
          / (col("__ca").cast("double") * col("__cb").cast("double")), 6)
          .as("lift"))
      .orderBy(col("n_both").desc, col("part_a").asc, col("part_b").asc)
      .limit(topK)
  }

  /** TPC-H Q19-shaped disjunctive revenue: total discounted revenue from
    * lineitems matching an OR of three (brand, size band, quantity band)
    * conjunctions — the classic OR-of-ANDs predicate-pushdown test.
    * Catalyst extracts the common `p_size`/`l_quantity` bounds from the
    * disjunction and pushes them into BOTH scans (the plan guard asserts
    * the quantity range reaches the lineitem scan), so at 100 TB the
    * join builds only over candidate rows; the residual OR evaluates
    * post-join in codegen.
    */
  def disjunctiveRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_quantity"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .cast("decimal(18,6)").as("rev"))
    val part = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val arm1 = col("p_brand") === "Brand#1" &&
      col("p_size").between(1, 5) && col("l_quantity").between(1, 11)
    val arm2 = col("p_brand") === "Brand#2" &&
      col("p_size").between(1, 10) && col("l_quantity").between(10, 20)
    val arm3 = col("p_brand") === "Brand#3" &&
      col("p_size").between(1, 15) && col("l_quantity").between(20, 30)
    li.join(part, col("l_partkey") === col("p_partkey"))
      .where(arm1 || arm2 || arm3)
      .agg(
        sum(col("rev")).as("__rev"),
        count(lit(1)).as("n_items"))
      .select(round(col("__rev").cast("double"), 6).as("revenue"),
        col("n_items"))
  }

  /** TPC-H Q10-shaped returned-item loss report: per customer, the
    * revenue on 'R'-flagged lines of their orders in one quarter —
    * top `topK` by lost revenue. The all-big-table variant of the Q3
    * shape (customer is the GROUPING key, not a pruned filter): the
    * returnflag + date predicates land on the scans, the grouped frame
    * is |customers|, and the top-k is a TakeOrdered — no global sort.
    */
  def returnedItemLoss(
      spark: SparkSession, sfDir: String,
      from: String = "1996-01-01", until: String = "1996-04-01",
      topK: Int = 20): DataFrame = {
    // co-bucketed fact layout: the lineitem⋈orders leg is exchange-free
    val ords = graft.ops.Layout.ordersByOrderkey(spark, sfDir)
      .filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
        col("o_orderdate") < lit(until).cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = graft.ops.Layout.lineitemByOrderkey(spark, sfDir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .cast("decimal(18,6)").as("rev"))
    li.join(ords, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("rev")).as("__rev"), count(lit(1)).as("n_items"))
      .join(Tables.customer(spark, sfDir)
          .select(col("c_custkey"), col("c_name"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, sfDir)
          .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        round(col("__rev").cast("double"), 6).as("revenue"),
        col("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(topK)
  }

  /** TPC-H Q4-shaped priority pipeline check: per order priority, how many
    * orders placed in one quarter had AT LEAST ONE line shipped more than
    * `lateDays` after the order date — Q4's correlated EXISTS, expressed
    * as the LEFT SEMI join it decorrelates to: the probe side is the
    * date-pruned orders slice, the build side only (orderkey, shipdate)
    * pairs, and the semi join deduplicates matches for free (no DISTINCT
    * pass, no row explosion for orders with many late lines).
    */
  def priorityPipeline(
      spark: SparkSession, sfDir: String,
      from: String = "1996-01-01", until: String = "1996-04-01",
      lateDays: Int = 90): DataFrame = {
    val ords = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
        col("o_orderdate") < lit(until).cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_shipdate"))
    ords.join(li,
        ords("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") >
            ords("o_orderdate") + expr(s"INTERVAL '$lateDays' DAY"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_late_orders"))
      .orderBy(col("o_orderpriority").asc)
  }

  /** TPC-H Q12-shaped shipping-delay bands: per (order→ship lag band),
    * how many lines belong to critical-priority orders vs the rest —
    * Q12's CASE-sum severity split over a derived dimension. The band is
    * computed from the joined pair (a date_diff the scan cannot push, but
    * the join is the SAME orderkey co-partitioned join every Q*-shape
    * uses); counts are exact integers, the twin states the identical
    * CASE arithmetic.
    */
  def shippingDelayBands(
      spark: SparkSession, sfDir: String): DataFrame = {
    val lag = datediff(col("l_shipdate"), col("o_orderdate"))
    val band = when(lag <= 30, "0-30")
      .when(lag <= 90, "31-90")
      .otherwise("90+")
    val critical = col("o_orderpriority") === "1-URGENT" ||
      col("o_orderpriority") === "2-HIGH"
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(band.as("delay_band"))
      .agg(
        sum(when(critical, 1L).otherwise(0L)).as("n_critical"),
        sum(when(critical, 0L).otherwise(1L)).as("n_regular"))
      .orderBy(col("delay_band").asc)
  }

  /** TPC-H Q8-shaped market share: per order year, the fraction of
    * ASIA-customer revenue supplied by ONE nation's suppliers — the
    * conditional-aggregate RATIO pattern (`sum(CASE WHEN ...)/sum(...)`):
    * one pass computes both decimal sums per year, the share is a single
    * IEEE division of their double renderings — never two scans, never a
    * self-join of aggregates.
    */
  def nationMarketShare(
      spark: SparkSession, sfDir: String, region: String = "ASIA",
      supplierNation: String = "NATION_3"): DataFrame = {
    def dec(c: Column) = round(c, 6).cast("decimal(18,6)")
    val custNations = Tables.nation(spark, sfDir)
      .join(Tables.region(spark, sfDir).filter(col("r_name") === region),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val cust = Tables.customer(spark, sfDir)
      .join(broadcast(custNations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val supp = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)
          .select(col("n_nationkey"), col("n_name").as("s_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nation"))
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"),
        dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .join(Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("order_year"))
      .agg(
        sum(when(col("s_nation") === supplierNation, col("rev"))
          .otherwise(lit(0).cast("decimal(18,6)"))).as("__nat"),
        sum(col("rev")).as("__tot"))
      .select(col("order_year"),
        round(col("__nat").cast("double"), 6).as("nation_revenue"),
        round(col("__tot").cast("double"), 6).as("total_revenue"),
        round(col("__nat").cast("double") / col("__tot").cast("double"), 6)
          .as("market_share"))
      .orderBy(col("order_year").asc)
  }

  /** TPC-H Q11-shaped important parts: each part's lineitem value through
    * ONE nation's suppliers, kept only when it exceeds a fraction of that
    * nation's total — Q11's `HAVING sum(...) > (SELECT sum(...) * f)`
    * global-scalar comparison. The scalar attaches as a broadcast 1-row
    * frame (the accepted scalar-attach pattern) — at 100 TB the per-part
    * frame shuffles once on partkey and the total is a second pass over
    * the SAME pre-aggregated frame, never a rescan of lineitem.
    *
    * Exactness: per-part values are DECIMAL(18,6) sums of 6dp-rounded
    * prices; the threshold is one IEEE multiply of the total's double
    * rendering — both engines evaluate the identical two doubles.
    */
  def importantParts(
      spark: SparkSession, sfDir: String, nationName: String = "NATION_3",
      fraction: Double = 0.002): DataFrame = {
    val supp = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)
          .filter(col("n_name") === nationName)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val perPart = Tables.lineitem(spark, sfDir)
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(round(col("l_extendedprice"), 6).cast("decimal(18,6)"))
        .as("__val"))
    val total = perPart
      .agg(sum(col("__val")).as("__tot"))
      .select((col("__tot").cast("double") * lit(fraction)).as("__thresh"))
    perPart.join(broadcast(total),
        perPart("__val").cast("double") > total("__thresh"))
      .select(col("l_partkey").as("p_partkey"),
        round(col("__val").cast("double"), 6).as("part_value"))
      .orderBy(col("part_value").desc, col("p_partkey").asc)
  }

  /** TPC-H Q22-shaped dormant high-balance customers: per nation, the
    * count and total balance of customers whose balance beats the global
    * positive-balance average but who placed NO order since `cutoff` —
    * Q22's two correlated subqueries (scalar avg + NOT EXISTS), shaped
    * for scale: the avg is a 1-row broadcast, the NOT EXISTS a LEFT ANTI
    * join against the date-pruned orders scan (the predicate pushes into
    * the scan, so the anti join's build side is only the recent slice).
    */
  def dormantCustomers(
      spark: SparkSession, sfDir: String,
      cutoff: String = "1999-01-01"): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg((sum(round(col("c_acctbal"), 6).cast("decimal(18,6)"))
        .cast("double") / count(lit(1)).cast("double")).as("__avg"))
    val recent = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit(cutoff).cast("timestamp"))
      .select(col("o_custkey"))
    cust.join(broadcast(avgBal), col("c_acctbal") > col("__avg"))
      .join(recent, cust("c_custkey") === recent("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(spark, sfDir)
          .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        sum(round(col("c_acctbal"), 6).cast("decimal(18,6)")).as("__bal"))
      .select(col("n_name"), col("n_customers"),
        round(col("__bal").cast("double"), 6).as("total_balance"))
      .orderBy(col("n_name").asc)
  }

  /** TPC-H Q2-shaped minimum-cost supplier: for each qualifying part, the
    * cheapest supplier in one region — Q2's correlated `ps_supplycost =
    * (SELECT min(...))` re-expressed without a partsupp table: the
    * supply-cost relation is derived from lineitem as the minimum
    * observed unit price per (part, supplier).
    *
    * The per-part winner is `min(struct(cost, suppkey))` — a MERGEABLE
    * aggregate (map-side combinable, no window sort, deterministic
    * lowest-suppkey tie-break baked into the struct ordering). Unit cost
    * is one IEEE division rounded to 6dp then DECIMAL — bit-identical
    * cross-engine. Region pruning broadcasts (≤25-row nation⋈region) into
    * the supplier dim BEFORE the cost frame joins it, so non-region
    * suppliers never reach the agg; part-size pruning broadcast-semi-joins
    * the qualifying partkeys into the cost frame before the two groupBys,
    * so non-qualifying parts never reach them either (the winner is
    * per-partkey and independent of part attributes — row-identical).
    */
  def minCostSupplier(
      spark: SparkSession, sfDir: String, region: String = "EUROPE",
      sizeMax: Int = 15, topK: Int = 100): DataFrame = {
    val nations = Tables.nation(spark, sfDir)
      .join(Tables.region(spark, sfDir).filter(col("r_name") === region),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val supp = Tables.supplier(spark, sfDir)
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    // qualifying parts are joined at the END for their attributes, but
    // their KEYS prune the cost aggregate's input up front: the per-part
    // winner is independent of part attributes, so a broadcast semi-join
    // of the size-filtered partkeys cuts the (part, supplier) aggregate
    // by the size selectivity with identical results (tier-J r11: this
    // row was the heaviest TPC-H shape at 100× before the prune)
    val qualParts = Tables.part(spark, sfDir).where(col("p_size") <= sizeMax)
      .select(col("p_partkey"), col("p_name"), col("p_size"))
    val cost = Tables.lineitem(spark, sfDir)
      .where(col("l_quantity") > 0)
      .select(col("l_partkey"), col("l_suppkey"),
        round(col("l_extendedprice") / col("l_quantity"), 6)
          .cast("decimal(18,6)").as("unit_cost"))
      .join(broadcast(qualParts.select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("unit_cost")).as("cost"))
    val winner = cost
      .groupBy(col("l_partkey"))
      .agg(min(struct(col("cost"), col("l_suppkey"))).as("w"))
      .select(col("l_partkey"), col("w.cost").as("supply_cost"),
        col("w.l_suppkey").as("win_suppkey"))
    winner
      .join(qualParts, col("l_partkey") === col("p_partkey"))
      .join(supp, col("win_suppkey") === col("s_suppkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"),
        round(col("supply_cost").cast("double"), 6).as("supply_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name").asc,
        col("s_name").asc, col("p_partkey").asc)
      .limit(topK)
  }

  /** TPC-H Q6-shaped forecast revenue change: one filtered scan, one
    * global aggregate — the canonical predicate-pushdown benchmark (all
    * three predicates reach the parquet scan as PushedFilters; no join,
    * no shuffle beyond the single-row final agg). Revenue =
    * Σ price·discount under the decimal-sum convention.
    */
  def forecastRevenue(
      spark: SparkSession, sfDir: String,
      from: String = "1996-01-01", until: String = "1997-01-01",
      discLo: Double = 0.05, discHi: Double = 0.07,
      qtyMax: Double = 24.0): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp") &&
        col("l_discount").between(discLo, discHi) &&
        col("l_quantity") < qtyMax)
      .agg(
        sum(round(col("l_extendedprice") * col("l_discount"), 6)
          .cast("decimal(18,6)")).as("__rev"),
        count(lit(1)).as("n_items"))
      .select(round(col("__rev").cast("double"), 6).as("revenue"),
        col("n_items"))

  /** TPC-H Q7-shaped volume shipping: revenue between one nation PAIR,
    * both directions, by ship year. The facts ride the co-bucketed
    * order-key layout (lineitem⋈orders exchange-free); supplier and
    * customer nations attach via broadcast dims; the pair disjunction
    * evaluates post-join in codegen over dim-sized columns.
    */
  def volumeShipping(
      spark: SparkSession, sfDir: String,
      nationA: String = "NATION_1", nationB: String = "NATION_2",
      from: String = "1996-01-01", until: String = "1998-01-01"): DataFrame = {
    val nat = Tables.nation(spark, sfDir).select("n_nationkey", "n_name")
    val supp = broadcast(Tables.supplier(spark, sfDir)
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name").isin(nationA, nationB))
      .select(col("s_suppkey"), col("n_name").as("supp_nation")))
    val cust = broadcast(Tables.customer(spark, sfDir)
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .filter(col("n_name").isin(nationA, nationB))
      .select(col("c_custkey"), col("n_name").as("cust_nation")))
    graft.ops.Layout.lineitemByOrderkey(spark, sfDir)
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).as("l_year"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .cast("decimal(18,6)").as("rev"))
      .join(graft.ops.Layout.ordersByOrderkey(spark, sfDir)
          .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(sum(col("rev")).as("__rev"), count(lit(1)).as("n_items"))
      .select(col("supp_nation"), col("cust_nation"), col("l_year"),
        round(col("__rev").cast("double"), 6).as("revenue"), col("n_items"))
      .orderBy(col("supp_nation").asc, col("cust_nation").asc,
        col("l_year").asc)
  }

  /** TPC-H Q9-shaped product-type profit, ADAPTED: the fixture schema
    * carries no partsupp table (reference src has no supply-cost
    * analog), so profit is the revenue of the name-filtered part family
    * per (supplier nation, order year) — the same 5-table join tree and
    * agg spine as Q9 minus the supplycost term. Part filter broadcasts
    * as a semi-join into the fact scan; lineitem⋈orders rides the
    * co-bucketed layout.
    */
  def productTypeProfit(
      spark: SparkSession, sfDir: String, namePart: String = "plate"): DataFrame = {
    val parts = broadcast(Tables.part(spark, sfDir)
      .filter(col("p_name").contains(namePart))
      .select("p_partkey"))
    val supp = broadcast(Tables.supplier(spark, sfDir)
      .join(Tables.nation(spark, sfDir),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation")))
    graft.ops.Layout.lineitemByOrderkey(spark, sfDir)
      .join(parts, col("l_partkey") === col("p_partkey"), "left_semi")
      .select(col("l_orderkey"), col("l_suppkey"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .cast("decimal(18,6)").as("rev"))
      .join(graft.ops.Layout.ordersByOrderkey(spark, sfDir)
          .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("nation"), col("o_year"))
      .agg(sum(col("rev")).as("__rev"), count(lit(1)).as("n_items"))
      .select(col("nation"), col("o_year"),
        round(col("__rev").cast("double"), 6).as("profit"), col("n_items"))
      .orderBy(col("nation").asc, col("o_year").desc)
  }

  /** TPC-H Q13-shaped customer order-count distribution: per-customer
    * order counts INCLUDING zero-order customers (the left join that
    * makes Q13 interesting), orders filtered to a priority class, then
    * the count-of-counts histogram. ADAPTED filter: the fixture has no
    * o_comment, so the excluded class is URGENT priority.
    *
    * Scale shape: one custkey-keyed left join + two hash-aggs, the
    * second over the tiny (c_count) domain.
    */
  def customerOrderCounts(
      spark: SparkSession, sfDir: String,
      excludePriority: String = "URGENT"): DataFrame = {
    val ords = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") =!= excludePriority)
      .select("o_custkey")
    Tables.customer(spark, sfDir).select("c_custkey")
      .join(ords, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_custkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q14-shaped promotion revenue share: the percentage of one
    * month's revenue carried by PROMO-type parts — conditional aggregate
    * over one fact⋈dim join, the part side broadcast. Both sums are
    * exact decimals; the share is ONE IEEE division of their doubles
    * stated identically in the twin.
    */
  def promoRevenue(
      spark: SparkSession, sfDir: String,
      from: String = "1996-03-01", until: String = "1996-04-01"): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .select(col("l_partkey"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .cast("decimal(18,6)").as("rev"))
      .join(broadcast(Tables.part(spark, sfDir)
          .select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", col("rev"))
          .otherwise(lit(0).cast("decimal(18,6)"))).as("__promo"),
        sum(col("rev")).as("__total"))
      .select(
        round(lit(100.0) * col("__promo").cast("double")
          / col("__total").cast("double"), 6).as("promo_share_pct"),
        round(col("__promo").cast("double"), 6).as("promo_revenue"),
        round(col("__total").cast("double"), 6).as("total_revenue"))

  /** TPC-H Q16-shaped supplier-per-part census, ADAPTED: the fixture has
    * no partsupp, so the part↔supplier relation is the DISTINCT
    * (l_partkey, l_suppkey) pairs observed in lineitem; the excluded-
    * supplier predicate is s_acctbal < 0 (no s_comment column). Per
    * (brand, type, size) outside one excluded brand/type: how many
    * distinct suppliers serve it.
    *
    * Scale shape: the pair-distinct is one hash-agg on the join key the
    * part join reuses; the supplier exclusion is a broadcast anti-join;
    * countDistinct rides the grouped agg.
    */
  def supplierPartCensus(
      spark: SparkSession, sfDir: String,
      excludeBrand: String = "Brand#1", excludeType: String = "PROMO",
      topK: Int = 50): DataFrame = {
    val badSupp = broadcast(Tables.supplier(spark, sfDir)
      .filter(col("s_acctbal") < 0).select("s_suppkey"))
    // no pair-distinct before the joins (r13): countDistinct dedups per
    // group anyway (partial_ map-side), so the upfront distinct was a
    // full extra exchange of the fact projection ahead of two joins that
    // are broadcast either way — one shuffle instead of two, same rows
    Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey")
      .join(badSupp, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(Tables.part(spark, sfDir)
          .filter(col("p_brand") =!= excludeBrand &&
            col("p_type") =!= excludeType)
          .select("p_partkey", "p_brand", "p_type", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand").asc,
        col("p_type").asc, col("p_size").asc)
      .limit(topK)
  }

  /** TPC-H Q18-shaped large-volume customers: orders whose total line
    * quantity exceeds `qtyMin`, with their customer and value. BOTH the
    * per-order quantity rollup and the orders join ride the co-bucketed
    * order-key layout — the rollup needs no exchange (grouping key =
    * bucket key) and neither does the join; only the broadcast customer
    * attach and the top-k remain.
    */
  def largeVolumeCustomers(
      spark: SparkSession, sfDir: String, qtyMin: Double = 200.0,
      topK: Int = 20): DataFrame = {
    val qty = graft.ops.Layout.lineitemByOrderkey(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("__q"))
      .filter(col("__q") > qtyMin)
    qty
      .join(graft.ops.Layout.ordersByOrderkey(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, sfDir)
          .select("c_custkey", "c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"),
        // stored value, no arithmetic — rendered at 6dp for the twin
        round(col("o_totalprice"), 6).as("o_totalprice"),
        col("__q").cast("long").as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(topK)
  }

  /** TPC-H Q20-shaped excess-stock suppliers, ADAPTED (no partsupp
    * availqty): suppliers whose shipments of the name-filtered part
    * family CONCENTRATE in one year — year-window quantity > half of
    * their all-time quantity for those parts. Keeps Q20's correlated
    * fraction-of-available shape as one conditional aggregate per
    * supplier (the decorrelated plan): one fact pass, part filter as a
    * broadcast semi-join, integer-exact quantity sums. The bar is
    * window > total/`frac` (frac=4 ⇒ >25% of all-time volume in one
    * year — the fixture's ship dates span 7 years, so a uniform
    * supplier sits near 14% and only genuine concentration qualifies).
    */
  def excessSuppliers(
      spark: SparkSession, sfDir: String, namePrefix: String = "red",
      from: String = "1996-01-01", until: String = "1997-01-01",
      frac: Int = 4): DataFrame = {
    val parts = broadcast(Tables.part(spark, sfDir)
      .filter(col("p_name").startsWith(namePrefix))
      .select("p_partkey"))
    val inWin = col("l_shipdate") >= lit(from).cast("timestamp") &&
      col("l_shipdate") < lit(until).cast("timestamp")
    Tables.lineitem(spark, sfDir)
      .join(parts, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_suppkey"))
      .agg(
        // round before the long cast: Spark's double→long cast truncates
        // while DuckDB's rounds half-up, so a fractional quantity sum
        // would silently diverge between the engines. round() is
        // HALF_UP in both for the positive sums seen here.
        round(sum(when(inWin, col("l_quantity")).otherwise(lit(0.0))), 0)
          .cast("long").as("window_qty"),
        round(sum(col("l_quantity")), 0).cast("long").as("total_qty"))
      .filter(col("window_qty") * frac > col("total_qty"))
      .join(broadcast(Tables.supplier(spark, sfDir)
          .select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("window_qty"),
        col("total_qty"))
      .orderBy(col("s_suppkey").asc)
  }
}
