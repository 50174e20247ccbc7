package graft.ops

import graft.SparkSpec
import graft.io.Tables

class MaterializeSpec extends SparkSpec {

  test("smallLocal refuses frames past the row cap, loud and pre-transfer") {
    // one row past the default cap: the limit(cap+1) probe must trip the
    // refusal instead of hauling the frame onto the driver
    val big = spark.range(500_001).toDF("id")
    val e = intercept[IllegalArgumentException] {
      Materialize.smallLocal(big)
    }
    assert(e.getMessage.contains("not a small"))
  }

  test("smallLocal round-trips schema and rows for genuinely small frames") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val local = Materialize.smallLocal(df)
    assert(local.schema === df.schema)
    assert(local.orderBy("k").collect().map(_.getString(1)).toSeq === Seq("a", "b"))
  }

  test("parquetRowCount (footer metadata) equals a full count() action") {
    for (name <- Seq("documents", "embeddings", "lineitem")) {
      val expected = Tables.table(spark, sf, name).count()
      assert(Tables.parquetRowCount(spark, sf, name) === expected, name)
    }
  }
}
