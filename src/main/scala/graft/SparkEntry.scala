package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.Marketplace
import graft.queries.Marketplace.AdsSearchParams

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] has a DuckDB-oracle ANSI-SQL twin in
  * [[oracleSql]] (same column NAMES — the driver's compare sorts columns by
  * name before hashing) unless the operator is not SQL-expressible, in which
  * case the driver records a rows-only check.
  */
object SparkEntry {

  /** Fixed parameters of the flagship search used for verification/bench:
    * page 2 of ECONOMY-agnostic "widget" listings at 905..960, cheapest
    * first. Chosen to be non-empty at every provided scale factor.
    */
  private val flagshipParams = AdsSearchParams(
    search = Some("widget"), minPrice = Some(905.0), maxPrice = Some(960.0),
    sortBy = "price_low", page = 2, limit = 20)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * (No price bound: sf0.001 has prices only in [900, 919.9] — the bounded
    * verify variant would page past the end there.)
    */
  def entry(spark: SparkSession): DataFrame =
    Marketplace.adsSearch(spark, "/root/testdata/sf0.001",
      AdsSearchParams(search = Some("widget"), sortBy = "price_low", page = 1, limit = 20))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ads_search" -> ((s, dir) => Marketplace.adsSearch(s, dir, flagshipParams)),
    "ads_count"  -> ((s, dir) => Marketplace.adsCount(s, dir, flagshipParams)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * Substring search uses strpos(lower(..)) — literal semantics mirroring
    * Prisma `contains` (no %/_ wildcards), not ILIKE (SURVEY §7.4).
    */
  def oracleSql: Map[String, String] = Map(
    "ads_search" ->
      """WITH filtered AS (
        |  SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
        |  FROM part
        |  WHERE strpos(lower(p_name), 'widget') > 0
        |    AND p_retailprice >= 905.0 AND p_retailprice <= 960.0
        |), fav AS (
        |  SELECT l_partkey, count(*) AS fav_count FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM filtered)
        |  GROUP BY l_partkey
        |)
        |SELECT f.p_partkey, f.p_name, f.p_brand, f.p_type, f.p_size,
        |       f.p_retailprice, COALESCE(v.fav_count, 0) AS fav_count
        |FROM filtered f LEFT JOIN fav v ON f.p_partkey = v.l_partkey
        |ORDER BY f.p_retailprice ASC, f.p_partkey ASC
        |LIMIT 20 OFFSET 20""".stripMargin,
    "ads_count" ->
      """SELECT count(*) AS total FROM part
        |WHERE strpos(lower(p_name), 'widget') > 0
        |  AND p_retailprice >= 905.0 AND p_retailprice <= 960.0""".stripMargin,
  )
}
