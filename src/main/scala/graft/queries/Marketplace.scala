package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.{Pagination, Predicates}

/** The reference's flagship listing queries (`/root/reference/src/routes/ads.ts`)
  * re-expressed on the driver's star schema (FIXTURES.md casting: `part` plays
  * `Ad` — title=p_name, price=p_retailprice, category=p_type; `lineitem`
  * occurrences per part play per-ad favorite counts).
  */
object Marketplace {

  /** Query-param struct of `GET /api/ads` (`ads.ts:84-95`). */
  final case class AdsSearchParams(
      search: Option[String] = None,     // OR-of-ILIKE over title/descr (ads.ts:104-109)
      category: Option[String] = None,   // categoryId equality (ads.ts:111-113)
      minPrice: Option[Double] = None,   // price range (ads.ts:115-119)
      maxPrice: Option[Double] = None,
      sortBy: String = "newest",         // newest | price_low | price_high (ads.ts:126-132)
      page: Int = 1,
      limit: Int = 20)

  /** Filter stage shared by the list query and its count twin — the reference
    * reuses one `where` object for both (`ads.ts:134-156`, Promise.all of
    * findMany+count).
    */
  private def adsFiltered(spark: SparkSession, sfDir: String, p: AdsSearchParams): DataFrame =
    Predicates.applyAll(
      Tables.part(spark, sfDir),
      p.search.map(s => Predicates.icontains(col("p_name"), s)),
      p.category.map(col("p_type") === _),
      p.minPrice.map(col("p_retailprice") >= _),
      p.maxPrice.map(col("p_retailprice") <= _))

  /** Flagship `GET /api/ads` (`ads.ts:84-166`): dynamic WHERE → favorite-count
    * left join (`_count.favorites`, `ads.ts:150-153`) → param-driven sort →
    * OFFSET/LIMIT page.
    *
    * Scale shape: the filtered listing side is pruned FIRST, then the
    * favorite-count aggregation runs over a semi-join-pruned fact table, so
    * the shuffle for the count is proportional to the page's candidate set,
    * not all of `lineitem`. The final left join is broadcast-able (AQE picks
    * it up from the pruned size).
    */
  def adsSearch(spark: SparkSession, sfDir: String, p: AdsSearchParams): DataFrame = {
    val filtered = adsFiltered(spark, sfDir, p)
    val favCounts = Tables.lineitem(spark, sfDir)
      .join(filtered.select("p_partkey"),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("fav_count"))
    val joined = filtered
      .join(favCounts, filtered("p_partkey") === favCounts("l_partkey"), "left")
      .select(
        filtered("p_partkey"), col("p_name"), col("p_brand"), col("p_type"),
        col("p_size"), col("p_retailprice"),
        coalesce(col("fav_count"), lit(0L)).as("fav_count"))
    Pagination.page(joined, sortOrder(p.sortBy), p.page, p.limit)
  }

  /** Sort selection (`ads.ts:126-132`) with deterministic id tie-break
    * (SURVEY §7.4: the reference inherits Postgres's unstable tie order; we
    * define one so pagination is stable and oracle-comparable).
    */
  private def sortOrder(sortBy: String): Seq[Column] = sortBy match {
    case "price_low"  => Seq(col("p_retailprice").asc, col("p_partkey").asc)
    case "price_high" => Seq(col("p_retailprice").desc, col("p_partkey").asc)
    case _            => Seq(col("p_partkey").desc) // "newest": creation-key desc
  }

  /** The pagination-count twin (`ads.ts:155`): same WHERE, scalar count. */
  def adsCount(spark: SparkSession, sfDir: String, p: AdsSearchParams): DataFrame =
    adsFiltered(spark, sfDir, p).agg(count(lit(1)).as("total"))
}
