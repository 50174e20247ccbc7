package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: per-phase timing probes for the streaming ingest FACES —
  * which part of a face's fixed cost actually dominates? (The r12 knob
  * hypothesis — shuffle-partition task overhead — moved the edge face 2×
  * but left the vector/media faces flat, so this tool decomposes them.)
  * Usage: sbt "runMain graft.tools.ProfileIngest <sfDir>"
  */
object ProfileIngest {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $name sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      r
    }
    // warm up parquet reader + codegen
    spark.read.parquet(s"$sfDir/region.parquet").count()

    // ---- vector face decomposition ----
    val emb = graft.io.Tables.embeddings(spark, sfDir)
    val seeds = emb.orderBy(col("vec_id").asc).limit(16)
      .select("vec_id", "embedding")
    timed("vec_seeds_collect")(seeds.collect())
    val quarter = emb.filter(pmod(col("vec_id"), lit(8L)) === 0L)
      .select("vec_id", "embedding", "label")
    timed("vec_quarter_count")(quarter.count())
    timed("vec_derive_count")(
      graft.ext.Similarity.deriveIndexRows(spark, quarter, seeds).count())
    // plan-overhead probe: same giant expression tree over 10 rows —
    // if this costs what the quarter costs, the face is compile-bound
    timed("vec_derive_10rows")(
      graft.ext.Similarity.deriveIndexRows(
        spark, quarter.limit(10), seeds).count())
    timed("vec_derive_10rows_again")(
      graft.ext.Similarity.deriveIndexRows(
        spark, quarter.limit(10), seeds).count())
    val scratch = spark.conf.get("spark.sql.warehouse.dir") + "/__profile_vec"
    timed("vec_derive_write")(
      graft.ext.Similarity.deriveIndexRows(spark, quarter, seeds)
        .write.mode("overwrite").parquet(scratch))
    timed("vec_face_total")(
      graft.streaming.CorpusIngest.vectorIngestFace(spark, sfDir).count())

    // ---- media face decomposition ----
    val media = graft.ext.Multimodal.mediaTable(spark, sfDir)
      .filter(pmod(col("media_id"), lit(4L)) === 0L)
    timed("media_quarter_count")(media.count())
    timed("media_sigs_count")(
      graft.ext.Multimodal.mediaSignaturesOf(media).count())
    val scratch2 = spark.conf.get("spark.sql.warehouse.dir") + "/__profile_media"
    timed("media_sigs_write")(
      graft.ext.Multimodal.mediaSignaturesOf(media)
        .write.mode("overwrite").parquet(scratch2))
    timed("media_face_total")(
      graft.streaming.CorpusIngest.mediaIngestFace(spark, sfDir).count())

    // ---- micro-batch partition A/B (same session, so host drift between
    // separate bench invocations can't fake a winner) ----
    for (mb <- Seq("4", "32", "4", "32")) {
      spark.conf.set("graft.microBatchPartitions", mb)
      timed(s"edge_face_mb$mb")(
        graft.streaming.CorpusIngest.edgeIngestFace(spark, sfDir).count())
      timed(s"vec_face_mb$mb")(
        graft.streaming.CorpusIngest.vectorIngestFace(spark, sfDir).count())
      timed(s"post_face_mb$mb")(
        graft.streaming.CorpusIngest.postingsIngestFace(spark, sfDir).count())
      timed(s"media_face_mb$mb")(
        graft.streaming.CorpusIngest.mediaIngestFace(spark, sfDir).count())
    }
    spark.stop()
  }
}
