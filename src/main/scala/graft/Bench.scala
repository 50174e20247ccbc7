package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: absorbs one-time session-state + codegen-framework
    // init (SharedState, Janino, parquet reader classes) so per-query times
    // measure the queries, not JVM bring-up.
    spark.range(100).selectExpr("count(*)").collect()
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => () }
    // Three timed runs per query, min reported: this box shows intermittent
    // multi-minute CPU-steal bursts (observed: a 1.4s query measuring 38s
    // with BOTH runs of a min-of-2 inside one burst); min-of-3 triples the
    // chance of catching a clean window at ~1 min extra wall time.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        // failures must be VISIBLE: a throwing query would otherwise "bench"
        // as near-zero and silently flatter the total
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      // Drop this query's persisted frames: cache entries accumulate across
      // queries and every later plan pays a CacheManager canonicalize-and-
      // compare against each of them (measured 10× slowdown on trivial
      // queries once the 64-aggregate dedup plans were cached).
      spark.catalog.clearCache()
      name -> times.min
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
