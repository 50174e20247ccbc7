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
    // Interleaved rounds, per-query min: this box shows intermittent
    // multi-minute CPU-steal bursts (observed: a 1.4s query measuring 38s).
    // Back-to-back repeats of ONE query put all its samples inside a single
    // burst — r4's driver and judge runs disagreed up to 4.8× per query in
    // both directions while totals agreed within 2%. Running the whole
    // query list once per round and repeating the list spreads each query's
    // samples minutes apart, so a burst can poison at most one of them.
    // optional args = query-name filter, for single-query iteration;
    // no args (the driver's invocation) benches the full registry
    val wanted = args.toSet
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => wanted.isEmpty || wanted(q._1))
    val rounds = 4
    val best = scala.collection.mutable.Map.empty[String, Double]
    val failed = scala.collection.mutable.Set.empty[String]
    for (_ <- 1 to rounds; (name, fn) <- names) {
      val t0 = System.nanoTime()
      // failures must be VISIBLE: a throwing query would otherwise "bench"
      // as near-zero and silently flatter the total — record it in the
      // emitted JSON too, not just on stderr
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          failed += name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      val t = (System.nanoTime() - t0) / 1e9
      // Drop this query's persisted frames: cache entries accumulate across
      // queries and every later plan pays a CacheManager canonicalize-and-
      // compare against each of them (measured 10× slowdown on trivial
      // queries once the 64-aggregate dedup plans were cached).
      spark.catalog.clearCache()
      best.updateWith(name) {
        case Some(prev) => Some(math.min(prev, t))
        case None       => Some(t)
      }
    }
    val results = best.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val fails = failed.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":${failed.size},"failed_queries":$fails,"queries":$qs,"sf":"$sfDir"}""")
    // The driver captures only the TAIL of the output: the per-query map
    // above can push the headline total past the capture window, so emit a
    // short trailing duplicate that always survives truncation.
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":${failed.size},"n_queries":${results.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
