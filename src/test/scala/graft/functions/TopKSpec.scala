package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.EventAnalytics

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("graft_topk equals the window top-k row for row") {
    val win = EventAnalytics.topPartsPerBrand(spark, sf).collect().toSeq
    val agg = EventAnalytics.topPartsPerBrandAgg(spark, sf).collect().toSeq
    assert(agg === win)
  }

  test("graft_topk is merge-order independent across partitionings") {
    GraftFunctions.register(spark)
    val base = spark.read.parquet(s"$sf/part.parquet")
    def run(df: org.apache.spark.sql.DataFrame) = df
      .groupBy($"p_brand")
      .agg(expr("graft_topk(p_retailprice, p_partkey, 3)").as("top"))
      .orderBy($"p_brand")
      .collect().toSeq
    assert(run(base.repartition(1)) === run(base.repartition(17, $"p_size")))
  }

  test("graft_topk plan: partial ObjectHashAggregate, no window sort") {
    GraftFunctions.register(spark)
    val df = spark.read.parquet(s"$sf/part.parquet")
      .groupBy($"p_brand")
      .agg(expr("graft_topk(p_retailprice, p_partkey, 3)").as("top"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(800))
    assert(plan.contains("partial_graft_topk"),
      "map-side partial aggregation must run before the exchange")
    assert(!plan.contains("Window"), "no window operator in the agg plan")
  }

  test("graft_topk skips nulls and NaN, breaks score ties by id asc") {
    GraftFunctions.register(spark)
    val rows = Seq[(String, java.lang.Double, java.lang.Long)](
      ("g", 5.0, 10L), ("g", 5.0, 3L), ("g", Double.NaN, 1L),
      ("g", null, 2L), ("g", 7.0, null), ("g", 6.0, 4L), ("g", 1.0, 9L))
      .toDF("grp", "s", "i")
    val out = rows.groupBy($"grp")
      .agg(expr("graft_topk(s, i, 3)").as("top"))
      .select(explode($"top").as("e"))
      .select($"e.score", $"e.id").collect()
      .map(r => (r.getDouble(0), r.getLong(1))).toSeq
    // NaN, null score, and null id rows are all ignored; the 5.0 tie
    // resolves to the smaller id first
    assert(out === Seq((6.0, 4L), (5.0, 3L), (5.0, 10L)))
  }

  test("graft_topk k must be a positive literal") {
    GraftFunctions.register(spark)
    val df = spark.read.parquet(s"$sf/part.parquet")
    intercept[Exception] {
      df.groupBy($"p_brand")
        .agg(expr("graft_topk(p_retailprice, p_partkey, p_size)"))
        .collect()
    }
    intercept[Exception] {
      df.groupBy($"p_brand")
        .agg(expr("graft_topk(p_retailprice, p_partkey, 0)"))
        .collect()
    }
  }
}
