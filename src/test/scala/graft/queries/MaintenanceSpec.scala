package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MaintenanceSpec extends SparkSpec {

  test("stateAsOf at end-of-history equals currentState") {
    val now = Maintenance.currentState(spark, sf).collect().toSeq
    val asOf = Maintenance.stateAsOf(spark, sf, "2099-01-01 00:00:00")
      .collect().toSeq
    assert(asOf === now)
  }

  test("stateAsOf shows only history at-or-before the cutoff") {
    val cutoff = "2024-01-04 00:00:00"
    val snap = Maintenance.stateAsOf(spark, sf, cutoff)
    assert(snap.filter(col("last_ts") > lit(cutoff).cast("timestamp")).count() === 0)
    // users are a subset of (or equal to) the full-history key set
    val nowUsers = Maintenance.currentState(spark, sf)
      .select("user_id").collect().map(_.getLong(0)).toSet
    val snapUsers = snap.select("user_id").collect().map(_.getLong(0)).toSet
    assert(snapUsers.subsetOf(nowUsers))
    assert(snapUsers.nonEmpty)
  }
}
