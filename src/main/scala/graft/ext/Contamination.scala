package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Benchmark decontamination — flag training documents that share any
  * word-n-gram with a held-out evaluation set. This is the standard
  * contamination check run before LLM training (the reference backend has
  * no analogue; extension capability per SURVEY §7.5).
  *
  * The evaluation set is carved deterministically from `documents`
  * (`doc_id % evalMod == 0`) so the whole check is oracle-expressible; in
  * production the eval side would be a separate (much smaller) table of
  * benchmark texts — the plan shape is identical.
  *
  * Scale shape: tokenize once, assemble n-grams with window `lead`s (one
  * doc_id-partitioned shuffle, codegen'd), distinct per (doc, gram), then
  * one hash join train-grams ⋈ eval-grams followed by a per-doc count
  * aggregation. The eval gram set is the small side — at 100 TB it is the
  * benchmark suite (MBs), so Spark broadcasts it and the whole check is a
  * single map-side pass over the training grams. Here both sides derive
  * from one table so it stays a shuffle join; the oracle joins on the gram
  * STRING for portability — at scale join on `xxhash64(gram)` so shuffle
  * rows stay fixed-width.
  */
object Contamination {

  private val toksExpr = """filter(split(lower(text), '\\s+'), t -> t <> '')"""

  /** Distinct (doc_id, gram) rows of full word-`n`-grams. Docs with fewer
    * than `n` tokens yield no rows (nothing meaningful to match on).
    */
  private def gramRows(spark: SparkSession, sfDir: String, n: Int): DataFrame = {
    // r13 measured dead-end, do not redo: assembling these 5-grams off a
    // CARRIED token array (posexplode keeping the array in scope,
    // element_at neighbour reads — the form that WON for the n ≤ 3 gram
    // sites in TextStats/Dedup) benched 0.83→0.95 s here at a matched
    // sentinel: at n = 5 the per-row element_at fan-out costs more than
    // the one fixed-width window exchange it removes. The lead window
    // stays — one doc_id-partitioned shuffle, fully codegen'd.
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos").asc)
    val parts = col("tok") +: (1 until n).map(i => lead(col("tok"), i).over(w))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), posexplode(expr(toksExpr)).as(Seq("pos", "tok")))
      .withColumn("__last", lead(col("tok"), n - 1).over(w))
      .withColumn("gram", concat_ws(" ", parts: _*))
      .filter(col("__last").isNotNull)
      .select(col("doc_id"), col("gram"))
      .distinct()
  }

  /** Per-training-doc contamination report: how many of its distinct
    * `n`-grams also occur in any eval doc, and the contaminated flag.
    * Exact — the DuckDB twin reproduces it gram for gram.
    */
  def benchmarkOverlap(
      spark: SparkSession, sfDir: String,
      n: Int = 5, evalMod: Int = 13): DataFrame = {
    val grams = gramRows(spark, sfDir, n)
    val evalGrams = grams
      .filter(col("doc_id") % evalMod === 0)
      .select(col("gram")).distinct()
      .withColumn("__hit", lit(1))
    grams
      .filter(col("doc_id") % evalMod =!= 0)
      .join(evalGrams, Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_grams"),
        count(col("__hit")).as("n_contaminated"))
      .withColumn("contaminated", col("n_contaminated") > 0)
      .orderBy(col("doc_id").asc)
  }

  /** Contamination ATTRIBUTION: for each contaminated training doc, the
    * single eval doc it shares the most `n`-grams with (ties → lowest
    * eval id) — the "which benchmark did this leak from" report that
    * turns [[benchmarkOverlap]]'s flag into an actionable answer.
    *
    * Scale shape: same gram assembly, then train-grams ⋈ eval-grams (the
    * eval side is the benchmark suite — MBs at 100 TB, so a broadcast
    * map-side join), one hash-agg on (train, eval) pairs — output bounded
    * by contaminated-doc × matched-eval-doc pairs, NOT grams — and a
    * top-1-per-group window on that already-reduced frame.
    */
  def attribution(
      spark: SparkSession, sfDir: String,
      n: Int = 5, evalMod: Int = 13): DataFrame = {
    val grams = gramRows(spark, sfDir, n)
    val evalGrams = grams
      .filter(col("doc_id") % evalMod === 0)
      .select(col("doc_id").as("eval_doc_id"), col("gram"))
    grams
      .filter(col("doc_id") % evalMod =!= 0)
      .join(evalGrams, Seq("gram"))
      .groupBy(col("doc_id"), col("eval_doc_id"))
      .agg(count(lit(1)).as("n_shared_grams"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("n_shared_grams").desc, col("eval_doc_id").asc)))
      .filter(col("__rk") === 1)
      .select(col("doc_id"), col("eval_doc_id"), col("n_shared_grams"))
      .orderBy(col("doc_id").asc)
  }
}
