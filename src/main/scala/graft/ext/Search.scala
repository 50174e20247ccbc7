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
  * Scale shape: every operator below reads the maintained tok-bucketed
  * [[postingsShared]] artifact (one row per (doc, term) with tf and the
  * doc's length) and reduces it with hash aggregations keyed on (doc_id)
  * or (term) — fully parallel, map-side-combinable, no driver-side state,
  * no per-call corpus re-tokenize. Corpus-level scalars (N, avgdl, df) are
  * one-row aggregates of the artifact inlined into the scoring pass.
  * Scores are rounded to 6 decimals before any ORDER BY so ranking is
  * stable across engines (ln() may differ in the last ulp between libm
  * implementations).
  */
object Search {

  /** Default curation query: engine-flavored terms present at every sf. */
  val defaultQueryTerms: Seq[String] = Seq("spark", "vector", "stream")

  /** The corpus's bag-of-words POSTINGS as a MAINTAINED derived table —
    * one row per (doc_id, tok) with its term frequency `tf` and the
    * doc's denormalized token length `dl`, bucketed on `tok` (the
    * lexical index a retrieval service keeps warm at 100 TB). Every
    * bag-of-words consumer ([[bm25]], [[tfidfTerms]], [[invertedIndex]],
    * [[fuzzySearch]], and [[rrfFusion]] through its lexical leg) reads
    * this instead of re-tokenizing and re-exploding the corpus per call;
    * the tok bucketing makes term-keyed aggregations/windows
    * exchange-free and term-equality filters parquet-prunable.
    *
    * Postings are per-doc deterministic, so the `minhash_sig`
    * append-only contract applies: a landed shard tokenizes ONLY its new
    * docs and unions onto the committed index (old rows win on a
    * repeated id). Corpus-level statistics (N, avgdl, df) are NOT
    * stored — consumers derive them from the artifact at query time, so
    * a refresh never leaves a stale global behind.
    */
  private[graft] def postingsShared(
      spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.Layout.ensureDerived(spark, sfDir, "postings",
      Seq("documents.parquet"), "tok",
      refreshDelta = Some { ctx =>
        postingsOf(spark.read.parquet(ctx.addedFiles: _*))
          .join(ctx.oldArtifact.select(col("doc_id")), Seq("doc_id"),
            "left_anti")
      }) {
      postingsOf(Tables.documents(spark, sfDir))
    }

  /** The postings build/refresh kernel over an arbitrary
    * (doc_id, text, ...) frame: one tokenize+explode pass, one
    * (doc, tok) hash aggregation, dl attached by a doc-partitioned
    * window over the already-aggregated rows (vocab-sized, not
    * occurrence-sized).
    */
  private[graft] def postingsOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        explode(expr("""filter(split(lower(text), '\\s+'), t -> t <> '')"""))
          .as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("dl",
        sum(col("tf")).over(Window.partitionBy(col("doc_id"))))

  /** BM25-ranked top-k documents for a bag-of-words query.
    *
    * Standard Okapi BM25 with the Lucene +1 idf smoothing:
    * idf = ln((N - df + 0.5)/(df + 0.5) + 1), k1 = 1.2, b = 0.75.
    *
    * Plan: both passes read the maintained [[postingsShared]] artifact.
    * Corpus stats (N, avgdl, per-term df) are ONE aggregation over the
    * postings (rows are unique per (doc, term), so a row count IS df and
    * Σtf/N IS avg doc length), collected and inlined as literals; scoring
    * touches only the postings rows whose term is in the query — a
    * parquet-pruned equality filter, never a corpus re-tokenize.
    */
  def bm25(
      spark: SparkSession, sfDir: String,
      terms: Seq[String] = defaultQueryTerms,
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 20): DataFrame = {
    // Duplicate query terms would double-count their score contribution;
    // an empty query has no score at all — return an empty (but correctly
    // shaped) result instead of throwing on the reduce below.
    val qTerms = terms.distinct
    if (qTerms.isEmpty) {
      import org.apache.spark.sql.types._
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        StructType(Seq(
          StructField("doc_id", LongType),
          StructField("n_terms", LongType),
          StructField("bm25", DoubleType))))
    }
    val post = postingsShared(spark, sfDir)
    // ONE corpus-stat pass over the postings artifact, collected and
    // inlined as scoring literals. Rows are unique per (doc, tok), so a
    // conditional row count IS each term's document frequency, and the
    // exact-integer Σtf ÷ exact doc count is bit-identical to the avg(dl)
    // the previous per-doc formulation (and the DuckDB twin) computes —
    // both are one IEEE divide of the same exactly-represented integers.
    val statCols =
      count_distinct(col("doc_id")).cast("double").as("n_docs") +:
        sum(col("tf")).as("total_toks") +:
        qTerms.indices.map(i =>
          sum(when(col("tok") === qTerms(i), 1L).otherwise(0L)).as(s"__df$i"))
    val statsRow = post.agg(statCols.head, statCols.tail: _*).collect()(0)
    // empty corpus (or all-whitespace texts): nothing to score — return
    // the empty shaped frame instead of NPEing on the null sum
    if (statsRow.isNullAt(1)) {
      return post.select(col("doc_id"), lit(0L).as("n_terms"),
        lit(0.0).as("bm25")).limit(0)
    }
    val nDocs = statsRow.getDouble(0)
    val avgdl = statsRow.getLong(1).toDouble / nDocs
    // Same IEEE operation order as the previous in-plan formulation (and
    // the DuckDB twin): ((N - df) + 0.5) / (df + 0.5) + 1, logged.
    def idf(i: Int): Column = {
      val dfi = statsRow.getLong(2 + i).toDouble
      lit(math.log((nDocs - dfi + 0.5) / (dfi + 0.5) + 1.0))
    }
    // Scoring touches only the query terms' postings — a parquet-pruned
    // equality filter over the tok-bucketed artifact, then a hash-agg on
    // the (tiny) matched frame. dl rides on every row (denormalized), so
    // no second corpus pass and nothing to persist.
    val tfCols = qTerms.zipWithIndex.map { case (t, i) =>
      sum(when(col("tok") === t, col("tf")).otherwise(0L)).as(s"__tf$i")
    }
    val perDoc = post
      .filter(col("tok").isin(qTerms: _*))
      .groupBy(col("doc_id"))
      .agg(max(col("dl")).as("dl"), tfCols: _*)
    def tfNorm(i: Int): Column =
      col(s"__tf$i") * (k1 + 1.0) /
        (col(s"__tf$i") + (lit(1.0 - b) + col("dl") * b / avgdl) * k1)
    val score = qTerms.indices
      .map(i => when(col(s"__tf$i") > 0, idf(i) * tfNorm(i)).otherwise(lit(0.0)))
      .reduce(_ + _)
    val nTerms = qTerms.indices
      .map(i => when(col(s"__tf$i") > 0, 1L).otherwise(0L)).reduce(_ + _)
    graft.ops.Materialize.smallLocal(
      perDoc
        .select(col("doc_id"), nTerms.as("n_terms"), round(score, 6).as("bm25"))
        .filter(col("n_terms") > 0)
        .orderBy(col("bm25").desc, col("doc_id").asc)
        .limit(topK))
  }

  /** Hybrid retrieval by reciprocal-rank fusion — the standard way a
    * RAG/curation stack combines a lexical index with a dense one
    * (Cormack et al.'s RRF: score = Σ 1/(K + rank), K = 60). The lexical
    * list is [[bm25]]'s top-k for the query terms; the dense list is the
    * cosine top-k around the top lexical hit's embedding (query-by-
    * example — the standard trick when the query has no embedding of its
    * own); a document missing from a list contributes 0. Rank fusion is
    * deliberately score-scale-free: BM25 logs and cosines never mix, so
    * no per-modality calibration is needed.
    *
    * Cross-engine exactness: each contribution is one exactly-rounded
    * divide of small integers (1/(K+rank)); the fused score is a single
    * add in fixed operand order; ranks come from already-twin-matched
    * orderings (rounded BM25 / exact cosine chains, doc-id tie-breaks).
    *
    * Scale shape: one pruned read of the postings artifact (BM25) + one
    * corpus embedding scan with a broadcast 1-row probe ending in a
    * distributed TakeOrdered top-k; the fusion join runs on two ≤k-row
    * lists.
    */
  def rrfFusion(
      spark: SparkSession, sfDir: String,
      terms: Seq[String] = defaultQueryTerms,
      topK: Int = 20, denseK: Int = 20, rrfK: Int = 60): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val lex = bm25(spark, sfDir, terms, topK = topK)
      // bounded list (≤ topK rows, already driver-local): the global
      // window is a rank stamp on a tiny frame, not a corpus sort
      .withColumn("lex_rank", row_number().over(
        Window.orderBy(col("bm25").desc, col("doc_id").asc)))
      .select(col("doc_id"), col("lex_rank"))
    val lexRows = lex.collect() // bounded by topK
    val shaped = lex.select(
      col("doc_id"), col("lex_rank"), col("lex_rank").as("dense_rank"),
      col("lex_rank").cast("double").as("rrf_score"))
    if (lexRows.isEmpty) return shaped.limit(0)
    val anchorId = lexRows.find(_.getInt(1) == 1).get.getLong(0)
    val emb = Tables.embeddings(spark, sfDir)
    def norm = sqrt(expr("graft_dot(embedding, embedding)"))
    val probe = broadcast(emb.filter(col("vec_id") === anchorId)
      .select(col("embedding").as("q_vec"), norm.as("q_norm")))
    val dense = emb
      .select(col("vec_id").as("doc_id"), col("embedding").as("c_vec"),
        norm.as("c_norm"))
      .filter(col("doc_id") =!= anchorId)
      .crossJoin(probe)
      .withColumn("sim",
        expr("graft_dot(q_vec, c_vec)") / (col("q_norm") * col("c_norm")))
      .orderBy(col("sim").desc, col("doc_id").asc).limit(denseK)
      // rank stamp over the ≤ denseK survivors of the distributed top-k
      .withColumn("dense_rank", row_number().over(
        Window.orderBy(col("sim").desc, col("doc_id").asc)))
      .select(col("doc_id"), col("dense_rank"))
    graft.ops.Materialize.smallLocal(lex
      .join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("lex_rank"), lit(0)).as("lex_rank"),
        coalesce(col("dense_rank"), lit(0)).as("dense_rank"),
        round(
          coalesce(lit(1.0) / (lit(rrfK) + col("lex_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(rrfK) + col("dense_rank")), lit(0.0)),
          6).as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("doc_id").asc))
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
    // Cache-free single plan off the maintained postings artifact:
    // document frequency comes from a count over a term-partitioned
    // WINDOW (one row per (doc, term) ⇒ the partition row count IS df) —
    // and the artifact's tok bucketing satisfies that window's required
    // distribution, so the only exchange left is the final doc-keyed
    // ranking window. No self-join, no tokenize pass, nothing to persist.
    val tf = postingsShared(spark, sfDir)
      .select(col("doc_id"), col("tok"), col("tf"))
    val nDocs = Tables.documents(spark, sfDir)
      .agg(count(lit(1)).cast("double").as("n_docs"))
    val scored = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("tok"))))
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

  /** Topic labels for embedding clusters: per seed-quantizer cell, the
    * top `perCell` characteristic terms by cluster-level TF-IDF (each
    * cell treated as one super-document: tf = Σ member tf, df = number
    * of CELLS containing the term, idf = ln(n_cells/df)). The report a
    * curator reads to know what each semantic cluster IS — the textual
    * face of `kmeans_cells`.
    *
    * Scale shape: the heavy side (postings) joins the vocabulary-of-cells
    * assignment on doc_id, then collapses to a (cells × vocab)-bounded
    * frame before any window runs; cell-df is a window row count over
    * that small frame (the tfidfTerms trick), never a self-join. The
    * assignment comes off the maintained ivf_cells artifact, the tokens
    * off the maintained postings artifact — no corpus re-scan at all.
    */
  def clusterKeywords(
      spark: SparkSession, sfDir: String, perCell: Int = 5): DataFrame = {
    val cells = Similarity.kmeansSeedAssign(spark, sfDir)
      .select(col("vec_id").as("doc_id"), col("cell_id"))
    val ctf = postingsShared(spark, sfDir)
      .select(col("doc_id"), col("tok"), col("tf"))
      .join(cells, Seq("doc_id"))
      .groupBy(col("cell_id"), col("tok"))
      .agg(sum(col("tf")).as("tf"))
    val nCells = ctf
      .agg(countDistinct(col("cell_id")).cast("double").as("n_cells"))
    val scored = ctf
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("tok"))))
      .crossJoin(broadcast(nCells))
      .select(col("cell_id"), col("tok").as("term"), col("tf"),
        round(col("tf") * log(col("n_cells") / col("df")), 6).as("tfidf"))
    val w = Window.partitionBy(col("cell_id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    scored
      .withColumn("term_rank", row_number().over(w))
      .filter(col("term_rank") <= perCell)
      .select("cell_id", "term_rank", "term", "tf", "tfidf")
      .orderBy(col("cell_id").asc, col("term_rank").asc)
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
    // postings rows are unique per (doc, term): the row count IS df and
    // Σtf the occurrence total — and the artifact's tok bucketing makes
    // this whole aggregation exchange-free.
    postingsShared(spark, sfDir)
      .groupBy(col("tok").as("term"))
      .agg(
        count(lit(1)).as("df"),
        sum(col("tf")).as("total_occurrences"),
        concat_ws(",",
          slice(array_sort(collect_set(col("doc_id"))), 1, postingHead))
          .as("postings_head"))
      .orderBy(col("term").asc)

  /** Typo-tolerant term search: expand `term` to every corpus-vocabulary
    * token within `maxDist` edits (Levenshtein), then rank documents by
    * matched occurrences. The fuzzy half of a search engine — the user
    * typed "spak", the corpus says "spark".
    *
    * Scale shape: the edit-distance scan runs over the DISTINCT vocabulary
    * (tiny vs the corpus — Heaps' law), never per token occurrence; the
    * matched-term set broadcasts, so scoring is a map-side semi-join over
    * the token stream plus one doc_id hash-agg, and the top-k is
    * TakeOrdered. At 100 TB the vocabulary pass is still minutes of one
    * executor; everything corpus-sized stays narrow.
    */
  def fuzzySearch(
      spark: SparkSession, sfDir: String,
      term: String = "spak", maxDist: Int = 1, topK: Int = 20): DataFrame = {
    // vocabulary comes straight off the tok-bucketed postings artifact
    // (partial-aggregated distinct, no exchange); scoring is a broadcast
    // semi-join back onto the postings with Σtf as the occurrence count
    val post = postingsShared(spark, sfDir)
    val matched = post.select(col("tok")).distinct()
      .withColumn("edit_dist", levenshtein(col("tok"), lit(term)))
      .filter(col("edit_dist") <= maxDist)
    post.join(broadcast(matched), Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).as("n_hits"),
        min(col("edit_dist")).as("best_dist"),
        countDistinct(col("tok")).as("n_matched_terms"))
      .orderBy(col("n_hits").desc, col("doc_id").asc)
      .limit(topK)
  }
}
