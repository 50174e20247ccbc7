package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // Heavily skewed fact: 90% of rows share key 1.
  private def skewed = (1 to 1000).map { i =>
    (if (i <= 900) 1L else (i % 50).toLong, i.toLong)
  }.toDF("key", "row_id")

  test("saltedJoin equals the plain join on a skewed key") {
    val dim = (0L to 60L).map(k => (k, s"name$k")).toDF("k", "name")
    val plain = skewed.join(dim, col("key") === col("k"))
      .select("row_id", "name").as[(Long, String)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(skewed, dim, "key", "k", col("row_id"))
      .select("row_id", "name").as[(Long, String)].collect().sorted.toSeq
    assert(salted === plain)
  }

  test("saltedDistinctCount equals exact countDistinct") {
    val df = skewed.withColumn("v", pmod(col("row_id"), lit(37)))
    val exact = df.groupBy("key").agg(countDistinct("v").as("n"))
      .as[(Long, Long)].collect().toMap
    val salted = Skew.saltedDistinctCount(
      df, col("key"), col("row_id"), col("v"), "n")
      .as[(Long, Int)].collect().map { case (k, n) => k -> n.toLong }.toMap
    assert(salted === exact)
  }
}

/** Storage-layout shapes for scale: partitioned writes must prune at read
  * time (the parquet analog of the reference's status index,
  * `schema.prisma:54-56` — SURVEY §4).
  */
class LayoutSpec extends SparkSpec {

  test("bucketed co-located tables join with no shuffle exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force a shuffle-capable join so exchange-absence is meaningful
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Layout.writeBucketed(
        spark.read.parquet(s"$sf/orders.parquet"), "orders_b", "o_orderkey", buckets = 8)
      Layout.writeBucketed(
        spark.read.parquet(s"$sf/lineitem.parquet"), "lineitem_b", "l_orderkey", buckets = 8)
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      val expected = spark.read.parquet(s"$sf/lineitem.parquet")
        .join(spark.read.parquet(s"$sf/orders.parquet"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("partitionBy(status) write prunes partitions on a status filter") {
    val dir = Files.createTempDirectory("graft_layout").toString
    spark.read.parquet(s"$sf/orders.parquet")
      .write.partitionBy("o_orderstatus").mode("overwrite")
      .parquet(s"$dir/orders_by_status")
    val read = spark.read.parquet(s"$dir/orders_by_status")
      .filter(col("o_orderstatus") === "O")
    // Row-count parity with the unpartitioned filter…
    val expected = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderstatus") === "O").count()
    assert(read.count() === expected)
    // …and the plan must prune: the partition filter appears as a
    // PartitionFilters entry, not a post-scan Filter.
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderstatus"),
      s"partition pruning missing from plan:\n$plan")
  }
}
