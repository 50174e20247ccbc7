package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Full-text relevance search over `documents` — the retrieval slice of a
  * training-data pipeline (keyword curation queries, quality-weighted
  * sampling, index builds for decontamination lookups).
  *
  * No analog in the reference (its search is a substring ILIKE,
  * `src/routes/ads.ts:104-109` — covered by Marketplace.adsSearch); this is
  * the scale path: tokenize once, score with classic IR statistics, never
  * move raw text through a shuffle.
  *
  * Scale shape: every operator below is (token explode) → hash aggregations
  * keyed on (doc_id) or (term) — fully parallel, map-side-combinable, no
  * driver-side state. Corpus-level scalars (N, avgdl) are one-row aggregates
  * broadcast into the scoring join. Scores are rounded to 6 decimals before
  * any ORDER BY so ranking is stable across engines (ln() may differ in the
  * last ulp between libm implementations).
  */
object Search {

  /** Default curation query: engine-flavored terms present at every sf. */
  val defaultQueryTerms: Seq[String] = Seq("spark", "vector", "stream")

  /** (doc_id, tok) rows; lowercase whitespace tokens, split runs once. */
  private def tokenRows(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(expr("""filter(split(lower(text), '\\s+'), t -> t <> '')"""))
          .as("tok"))

  /** BM25-ranked top-k documents for a bag-of-words query.
    *
    * Standard Okapi BM25 with the Lucene +1 idf smoothing:
    * idf = ln((N - df + 0.5)/(df + 0.5) + 1), k1 = 1.2, b = 0.75.
    *
    * Plan: doc lengths and per-(doc, query-term) tf are two aggregations
    * over the same token rows; term document-frequencies reduce from the tf
    * frame (already one row per (doc, term)); the one-row corpus stats
    * frame cross-joins (broadcast) into the scoring expression. Only docs
    * containing ≥1 query term ever reach the scorer — the term filter runs
    * before any aggregation.
    */
  def bm25(
      spark: SparkSession, sfDir: String,
      terms: Seq[String] = defaultQueryTerms,
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 20): DataFrame = {
    // One tokenize pass: the compact (doc, term, tf) frame feeds doc
    // lengths, corpus stats, and query-term tf — persisted because three
    // branches consume it (unpersisted, each would re-explode the text).
    val perDocTerm = tokenRows(spark, sfDir)
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
      .persist()
    val dl = perDocTerm.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(
      count(lit(1)).cast("double").as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = perDocTerm.filter(col("tok").isin(terms: _*))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val idf = log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val tfNorm = col("tf") * (k1 + 1.0) /
      (col("tf") + (lit(1.0 - b) + col("dl") * b / col("avgdl")) * k1)
    tf.join(dfreq, Seq("tok"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(idf * tfNorm).as("__score"))
      .select(col("doc_id"), col("n_terms"), round(col("__score"), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(topK)
  }

  /** Top-k characteristic terms per document by TF-IDF
    * (idf = ln(N / df), df counted on distinct docs). The whole-corpus
    * keyword profile — used for topic tagging and curation diagnostics.
    *
    * Ranking is per-doc window over the (doc, term) frame; scores rounded
    * before ranking, ties broken alphabetically — deterministic everywhere.
    */
  def tfidfTerms(
      spark: SparkSession, sfDir: String, perDoc: Int = 3): DataFrame = {
    // persisted: consumed by its own df-reduction AND the scoring join.
    val tf = tokenRows(spark, sfDir)
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
      .persist()
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val nDocs = Tables.documents(spark, sfDir)
      .agg(count(lit(1)).cast("double").as("n_docs"))
    val scored = tf.join(dfreq, Seq("tok"))
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("tok").as("term"), col("tf"),
        round(col("tf") * log(col("n_docs") / col("df")), 6).as("tfidf"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    scored
      .withColumn("term_rank", row_number().over(w))
      .filter(col("term_rank") <= perDoc)
      .select("doc_id", "term_rank", "term", "tf", "tfidf")
      .orderBy(col("doc_id").asc, col("term_rank").asc)
  }

  /** Inverted-index build: term → document frequency, total occurrences,
    * and the head of the sorted posting list. The index artifact behind
    * [[bm25]] at scale — materialized once, term-partitioned, then
    * curation queries join against it instead of re-tokenizing the corpus.
    * Posting heads are capped (`postingHead`) so boilerplate terms cannot
    * produce rows wider than a block.
    */
  def invertedIndex(
      spark: SparkSession, sfDir: String, postingHead: Int = 20): DataFrame =
    tokenRows(spark, sfDir)
      .groupBy(col("tok").as("term"))
      .agg(
        count_distinct(col("doc_id")).as("df"),
        count(lit(1)).as("total_occurrences"),
        concat_ws(",",
          slice(array_sort(collect_set(col("doc_id"))), 1, postingHead))
          .as("postings_head"))
      .orderBy(col("term").asc)
}
