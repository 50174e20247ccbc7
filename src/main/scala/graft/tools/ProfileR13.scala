package graft.tools

import org.apache.spark.sql.functions._

import graft.io.Tables

/** r13 optimization-round probes: stage-level decomposition of the bench's
  * remaining ~1 s rows, timed with the noop sink (guide §1.4 — count()
  * would let the optimizer prune the expensive projections this is meant
  * to time). Usage: sbt "runMain graft.tools.ProfileR13 <sfDir>"
  *
  * Findings (sf0.1, warm artifacts — recorded in OPTIMIZATION_r13.md):
  * see the "stage decomposition" table there.
  */
object ProfileR13 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(name: String)(f: => Unit): Unit = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime(); f
      val cold = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      val t1 = System.nanoTime(); f
      val warm = (System.nanoTime() - t1) / 1e9
      println(f"PROFILE $name cold=$cold%.3f warm=$warm%.3f")
      spark.sparkContext.setJobDescription(null)
      spark.catalog.clearCache()
    }
    // warm the session + artifacts
    spark.range(100).selectExpr("count(*)").collect()
    noop(Tables.documents(spark, sfDir))
    timed("warm2")(noop(Tables.documents(spark, sfDir)))

    // quality family: the per-feature sha fold alone, then the reports
    timed("classifier_fold_noop")(
      noop(graft.ext.TextStats.qualityClassifier(spark, sfDir)))
    timed("quality_calibration")(
      { graft.ext.TextStats.qualityCalibration(spark, sfDir).count(); () })
    // lm family
    timed("ppl_buckets")(
      { graft.ext.TextStats.perplexityBuckets(spark, sfDir).count(); () })
    timed("kn_score")(
      { graft.ext.TextStats.knScore(spark, sfDir).count(); () })
    // fk audit: child explode+agg alone vs full report
    timed("fk_audit")(
      { graft.ops.Profiling.fkAudit(spark, sfDir).count(); () })
    timed("column_profile")(
      { graft.ops.Profiling.ordersProfile(spark, sfDir).count(); () })
    // near-dup incremental: banding vs full
    timed("dedup_incremental_near")(
      { graft.ext.Dedup.incrementalMinHash(spark, sfDir, twinnable = true)
          .count(); () })
    // media cluster residue after the CC probe collapse
    timed("media_near_dup")(
      { graft.ext.Multimodal.mediaNearDup(spark, sfDir).count(); () })
    timed("media_dedup_clusters")(
      { graft.ext.Multimodal.mediaDedupClusters(spark, sfDir).count(); () })
    timed("containment_pairs")(
      { graft.ext.Dedup.containmentPairs(spark, sfDir).count(); () })
    timed("rrf_fusion")(
      { graft.ext.Search.rrfFusion(spark, sfDir).count(); () })
    timed("embedding_near_dup_lsh")(
      { graft.ext.Similarity.embeddingNearDupPairsLSH(spark, sfDir).count(); () })
    spark.stop()
  }
}
