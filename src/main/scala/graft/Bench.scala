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
    // Separate one-time artifact materialization from query time: with a
    // warm warehouse this reads 0 builds / 0.0 sec, so the headline total
    // can't silently lean on pre-built artifacts — the cold build cost is
    // its own line in the emitted JSON.
    graft.ops.Layout.resetBuildStats()
    val rounds = 4
    val best = scala.collection.mutable.Map.empty[String, Double]
    val failed = scala.collection.mutable.Set.empty[String]
    // Host-load sentinel: a fixed pure-CPU job (no I/O, no warehouse, no
    // data dependence) timed once per round like any query. Its quiet-host
    // time is a constant of this binary+box, so cross-round totals can be
    // normalized mechanically — total × (ref_sentinel / sentinel_sec) —
    // instead of inferring "afternoon load" from unrelated query drift.
    // Reference value recorded in BASELINE.md.
    var sentinel = Double.MaxValue
    def runSentinel(): Unit = {
      val t0 = System.nanoTime()
      spark.range(0L, 64000000L, 1L, cpus)
        .selectExpr("max(xxhash64(id))").collect()
      sentinel = math.min(sentinel, (System.nanoTime() - t0) / 1e9)
    }
    for (r <- 1 to rounds) {
      runSentinel()
      for ((name, fn) <- names) {
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
    }
    val results = best.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val fails = failed.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val buildSec = graft.ops.Layout.buildNanos.get() / 1e9
    val builds = graft.ops.Layout.buildCount.get()
    val refreshes = graft.ops.Layout.refreshCount.get()
    val sentinelSec = if (sentinel == Double.MaxValue) 0.0 else sentinel
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","failed":${failed.size},"failed_queries":$fails,"artifact_build_sec":$buildSec,"artifact_builds":$builds,"artifact_refreshes":$refreshes,"sentinel_sec":$sentinelSec,"queries":$qs,"sf":"$sfDir"}"""
    println(full)
    // A machine-readable copy as a FILE: sbt's [info] stdout prefix and
    // the driver's tail-capture have broken the stdout JSON parse two
    // rounds running — the artifact on disk is decoration-proof.
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_LAST.json"),
      (full + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] BENCH_LAST.json write failed: ${e.getMessage}") }
    // The driver captures only the TAIL of the output: the per-query map
    // above can push the headline total past the capture window, so emit a
    // short trailing duplicate that always survives truncation.
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":${failed.size},"artifact_build_sec":$buildSec,"sentinel_sec":$sentinelSec,"n_queries":${results.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
