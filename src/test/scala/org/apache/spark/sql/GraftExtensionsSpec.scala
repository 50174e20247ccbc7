package org.apache.spark.sql

import graft.SparkSpec

/** The `spark.sql.extensions` entry point must inject working functions.
  * A second SparkContext can't exist in this suite JVM, so the spec sits
  * in the sql package to drive the same `private[sql]` registration hook
  * `SparkSession` invokes at build time, against the live registry.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects graft_dot/graft_isect usable from SQL") {
    val ext = new SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    ext.registerFunctions(spark.sessionState.functionRegistry)
    val dot = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .head().getDouble(0)
    assert(dot === 11.0)
    val isect = spark.sql(
      "SELECT graft_isect(array(1L, 2L, 3L), array(2L, 3L, 9L))")
      .head().getInt(0)
    assert(isect === 2)
  }
}
