package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Distributed BPE merge training (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units") — the tokenizer-training
  * step of an LLM data pipeline, Spark-first:
  *
  * The corpus collapses to its WORD-FREQUENCY table once (the classic BPE
  * trick — merge statistics depend only on (word, count), so the
  * corpus-sized pass is a single hash aggregation and every training round
  * runs over the vocabulary, which is Heaps'-law sublinear). Each round:
  * adjacent-symbol pair counts weighted by word frequency (explode + hash
  * agg with map-side partials), a driver-side argmax of ONE row (count
  * desc, pair asc — deterministic), and a vocabulary-wide left-to-right
  * merge application via a fold over the symbol arrays. Rounds persist
  * their symbol table and drop the previous one, so lineage stays one
  * round deep (the CC-loop pattern from [[Dedup.connectedComponents]]).
  *
  * All merge arithmetic is integer and order-fixed, so the trainer is
  * deterministic on any cluster; no SQL oracle exists (per-round argmax +
  * list rebuild is iterative), so the registered query is rows-only and
  * correctness is pinned by a brute-force reference implementation in the
  * spec.
  */
object BpeTrainer {

  /** Left-to-right greedy merge of adjacent (a, b) → ab in a symbol
    * array, as one fold: append, then collapse if the tail matches. The
    * merged symbol immediately participates again ("aaaa" under (a,a) →
    * [aa, aa]), which is exactly BPE's application order. Column-DSL
    * lambdas, not `expr` strings — pair symbols come from DATA and must
    * never pass through the SQL parser.
    */
  private def applyMerge(sym: Column, a: String, b: String): Column =
    aggregate(sym,
      array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 &&
          element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** UTF-8 byte-order string comparison — matches Spark's UTF8_BINARY
    * collation, so the driver fast path breaks argmax ties identically to
    * the distributed loop. (Scala's default String ordering compares
    * UTF-16 code units, which sorts supplementary-plane symbols BEFORE
    * U+E000..U+FFFF; UTF-8 bytes sort by code point, like Spark/DuckDB.)
    */
  private def utf8Compare(x: String, y: String): Int = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = java.lang.Integer.compare(a(i) & 0xFF, b(i) & 0xFF)
      if (c != 0) return c
      i += 1
    }
    java.lang.Integer.compare(a.length, b.length)
  }

  /** Argmax order of the merge candidates: count desc, then (left, right)
    * ascending in UTF-8 byte order — the exact order the distributed
    * loop's `orderBy(c desc, l asc, r asc)` produces under UTF8_BINARY.
    */
  private val candidateOrd: Ordering[((String, String), Long)] =
    new Ordering[((String, String), Long)] {
      override def compare(
          p: ((String, String), Long), q: ((String, String), Long)): Int = {
        val c = java.lang.Long.compare(q._2, p._2) // count desc
        if (c != 0) c
        else {
          val cl = utf8Compare(p._1._1, q._1._1)
          if (cl != 0) cl else utf8Compare(p._1._2, q._1._2)
        }
      }
    }

  /** Driver-side training loop over an in-memory word-frequency table —
    * the fast path once the vocabulary fits (which is how production
    * tokenizer trainers run too: merge statistics live on the freq table,
    * not the corpus). Identical argmax and application order to the
    * distributed loop.
    */
  private def trainDriver(
      words0: Map[List[String], Long], nMerges: Int): Seq[(Int, String, String, String, Long)] = {
    var words = words0
    def applyM(sym: List[String], a: String, b: String): List[String] =
      sym.foldLeft(List.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
        else acc :+ x
      }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var round = 1
    var done = false
    while (round <= nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (sym, wf) =>
        sym.zip(sym.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + wf)
      }
      (if (counts.isEmpty) None else Some(counts.min(candidateOrd))) match {
        case Some(((l, r), c)) if c >= 2 =>
          out += ((round, l, r, l + r, c))
          words = words.toSeq
            .map { case (sym, wf) => applyM(sym, l, r) -> wf }
            .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
          round += 1
        case _ => done = true
      }
    }
    out.toSeq
  }

  /** The learned merge table: (merge_rank, left, right, merged,
    * pair_count), rank 1 = first merge learned. `nMerges` bounds the
    * rounds; training stops early when no adjacent pair repeats.
    *
    * Size-adaptive like [[Dedup.connectedComponents]]: the corpus-sized
    * work is ONE distributed word-frequency aggregation; when the
    * resulting vocabulary fits the driver (`driverVocabLimit` words —
    * Heaps'-law sublinear, so this covers all but extreme corpora) the
    * merge rounds run in memory, avoiding `2·nMerges` tiny cluster jobs.
    * Past the limit, the distributed per-round loop below takes over;
    * both produce the identical merge sequence (spec-pinned).
    */
  def train(spark: SparkSession, sfDir: String, nMerges: Int = 16,
      driverVocabLimit: Long = 1_000_000L): DataFrame = {
    import spark.implicits._
    // persisted BEFORE the size probe: the corpus-wide tokenize+aggregate
    // is the expensive pass and must run once — the count, the driver
    // collect, and round 1 of the distributed loop all read the cache
    val words = Tables.documents(spark, sfDir)
      .select(explode(expr(
        """filter(split(lower(text), '\\s+'), t -> t <> '')""")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wf"))
      .select(split(col("w"), "").as("sym"), col("wf"))
      .persist()
    if (words.count() <= driverVocabLimit) {
      try {
        val local = words.collect()
          .map(r => r.getSeq[String](0).toList -> r.getLong(1)).toMap
        return trainDriver(local, nMerges)
          .toDF("merge_rank", "left", "right", "merged", "pair_count")
          .orderBy(col("merge_rank").asc)
      } finally words.unpersist()
    }
    var vocab = words
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    try {
      var round = 1
      var exhausted = false
      while (round <= nMerges && !exhausted) {
        val top = vocab
          .select(col("wf"), explode(arrays_zip(
            slice(col("sym"), lit(1), size(col("sym")) - 1),
            slice(col("sym"), lit(2), size(col("sym")) - 1))).as("p"))
          .select(col("p.0").as("l"), col("p.1").as("r"), col("wf"))
          .groupBy(col("l"), col("r")).agg(sum(col("wf")).as("c"))
          .orderBy(col("c").desc, col("l").asc, col("r").asc)
          .limit(1).collect()
        if (top.isEmpty || top.head.getLong(2) < 2) exhausted = true
        else {
          val (a, b, c) = (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
          merges += ((round, a, b, a + b, c))
          val next = vocab
            .select(applyMerge(col("sym"), a, b).as("sym"), col("wf"))
            .persist()
          next.count() // materialize before dropping the parent cache
          vocab.unpersist()
          vocab = next
          round += 1
        }
      }
    } finally vocab.unpersist()
    merges.toSeq.toDF("merge_rank", "left", "right", "merged", "pair_count")
      .orderBy(col("merge_rank").asc)
  }

  /** Corpus-wide tokenization under a given merge table — the APPLICATION
    * half of BPE, which is the corpus-scale cost in production (training
    * touches only the word-frequency table; every document ever ingested
    * pays application).
    *
    * Scale shape: merges are applied to the DISTINCT-WORD table (vocab —
    * Heaps'-law sublinear), then the corpus joins against the resulting
    * (word → token count) mapping: one hash join on the word key, one
    * per-doc aggregation. The merge fold itself runs as CHAINED
    * non-overlapping string `replace` calls over a double-delimiter
    * symbol encoding ("␟␟a␟␟b␟␟" + replace("␟a␟␟b␟" → "␟ab␟")) — exactly
    * the greedy left-to-right fold (property-proven in BpeTrainerSpec:
    * replace continues scanning AFTER each replacement, so a merged
    * symbol participates as the LEFT of the next pair, like the fold),
    * but in codegen'd string expressions both Spark and the DuckDB twin
    * evaluate identically.
    *
    * `merges` must be applied in learned order; symbols must not contain
    * the U+001F delimiter (true for any text tokenizer).
    */
  def applyMerges(
      spark: SparkSession, sfDir: String,
      merges: Seq[(String, String)]): DataFrame = {
    val D = "\u001f"
    val docWords = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(expr(
        """filter(split(lower(text), '\\s+'), t -> t <> '')""")).as("w"))
    val vocab0 = docWords.select("w").distinct()
      // encode chars as ␟␟-separated symbols with ␟␟ sentinels
      .withColumn("sym",
        concat(lit(D + D), regexp_replace(col("w"), "(.)", "$1" + D + D)))
    val folded = merges.foldLeft(vocab0) { case (df, (a, b)) =>
      df.withColumn("sym", call_function("replace", col("sym"),
        lit(D + a + D + D + b + D), lit(D + a + b + D)))
    }
    val mapping = folded
      .select(col("w"), (size(split(col("sym"), D + D)) - 2).as("n_toks"))
    docWords.join(mapping, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_toks")).as("n_bpe_tokens"))
      .join(Tables.documents(spark, sfDir).select("doc_id"), Seq("doc_id"), "right")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
      .orderBy(col("doc_id").asc)
  }

  /** The fixed merge table the registered `bpe_apply` query uses: common
    * English pair merges, applied in this order. Fixed (not trained) so
    * the DuckDB twin can replay the application chain verbatim — the
    * TRAINED merge sequence is iterative and stays pinned by
    * [[train]]'s differential spec instead.
    */
  val FixedMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("a", "t"))

  /** Round-1 weighted adjacent-pair counts — the distributed aggregation
    * that feeds every argmax round of [[train]], registered standalone:
    * unlike the iterative trainer it is plain SQL, so the oracle
    * hash-checks the statistics the merge loop consumes (top `topN` under
    * the trainer's exact count-desc, pair-asc UTF8-binary order).
    */
  def pairCounts(spark: SparkSession, sfDir: String, topN: Int = 50): DataFrame =
    Tables.documents(spark, sfDir)
      .select(explode(expr(
        """filter(split(lower(text), '\\s+'), t -> t <> '')""")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wf"))
      .select(split(col("w"), "").as("sym"), col("wf"))
      .select(col("wf"), explode(arrays_zip(
        slice(col("sym"), lit(1), size(col("sym")) - 1),
        slice(col("sym"), lit(2), size(col("sym")) - 1))).as("p"))
      .select(col("p.0").as("sym_left"), col("p.1").as("sym_right"), col("wf"))
      .groupBy(col("sym_left"), col("sym_right"))
      .agg(sum(col("wf")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("sym_left").asc, col("sym_right").asc)
      .limit(topN)

  /** Per-language tokenizer fertility (BPE tokens per word) under a fixed
    * merge table — the metric that decides whether a tokenizer needs more
    * merges for a language before training on it (high fertility = the
    * language pays more sequence length per word).
    *
    * Exactness: integer sums ([[applyMerges]]'s per-doc counts) and ONE
    * double division rounded to 6dp, identical expression in the twin.
    * Scale shape: [[applyMerges]]'s vocab-table fold + word join, then a
    * |langs|-row hash-agg — nothing beyond the apply pass itself.
    */
  def fertility(spark: SparkSession, sfDir: String): DataFrame =
    applyMerges(spark, sfDir, FixedMerges)
      .join(Tables.documents(spark, sfDir).select("doc_id", "lang"), Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("total_words"),
        sum(col("n_bpe_tokens")).as("total_bpe_tokens"))
      .select(col("lang"), col("n_docs"), col("total_words"),
        col("total_bpe_tokens"),
        round(col("total_bpe_tokens").cast("double") /
          col("total_words").cast("double"), 6).as("fertility"))
      .orderBy(col("lang").asc)
}
