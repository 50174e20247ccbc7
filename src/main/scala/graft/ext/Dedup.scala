package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Deduplication operators for LLM-training-data pipelines (north star in
  * /root/repo/BASELINE.json; no analog in the reference — new capability).
  *
  * All variants are deterministic (seeded xxhash64) and built from
  * codegen-friendly primitives. Spark's higher-order lambda functions
  * (transform/aggregate) are interpreted, not codegen'd — so the per-token
  * signature math is deliberately expressed as EXPLODE → hash-aggregate
  * with k parallel aggregate expressions, which whole-stage-codegen
  * compiles, instead of nested array lambdas. That is also the 100 TB
  * shape: map-side partial aggregation collapses the exploded tokens
  * before any shuffle, and only fixed-width (id, signature) rows move.
  *
  *   - exact: hash-groupBy on a 256-bit content fingerprint.
  *   - MinHash-LSH: shingle → 64-slot minhash signature → 16 bands of 4 →
  *     bucket join; oversized buckets (degenerate content) are capped to
  *     bound skew; candidates dedup as bare id pairs before the heavy
  *     shingle sets are re-attached for exact Jaccard verification.
  *   - SimHash: 64-bit signature from per-bit vote sums, banded into
  *     4×16-bit chunks for candidates, hamming ≤ 3 via bit_count(xor).
  */
object Dedup {

  /** Tokenized, lowercased words; docs shorter than the 3-word shingle
    * width fall back to a single whole-text shingle.
    */
  private val toksExpr = """filter(split(lower(text), '\\s+'), t -> t <> '')"""

  private val shingleExpr =
    """CASE WHEN size(__toks) >= 3 THEN
      |  transform(sequence(0, size(__toks) - 3),
      |            i -> concat_ws(' ', slice(__toks, i + 1, 3)))
      |ELSE array(concat_ws(' ', __toks)) END""".stripMargin

  /** (doc_id, __shingle_set) with distinct word-3-gram shingles. */
  private def shingleSets(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("__toks", expr(toksExpr))
      .withColumn("__shingle_set", array_distinct(expr(shingleExpr)))
      .select(col("doc_id"), col("__shingle_set"))

  /** Exact dedup summary: total vs distinct texts by 256-bit fingerprint.
    * Grouping on sha2 (not raw text) keeps the shuffle rows fixed-width —
    * at 100 TB the text never moves, only (fingerprint, id).
    */
  def exactSummary(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(sha2(col("text"), 256).as("fp"), col("doc_id"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("copies"))
      .agg(
        sum(col("copies")).as("total_docs"),
        count(lit(1)).as("distinct_texts"),
        (sum(col("copies")) - count(lit(1))).as("dup_docs_removed"))

  /** Exact dedup keeper view: one surviving doc_id (the smallest) per
    * duplicated text, plus how many copies it absorbed.
    */
  def exactKeepers(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(sha2(col("text"), 256).as("fp"), col("doc_id"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keeper_doc_id"), count(lit(1)).as("copies"))
      .filter(col("copies") > 1)
      .select("fp", "keeper_doc_id", "copies")
      .orderBy(col("keeper_doc_id").asc)

  /** 64-slot minhash signature columns __m0..__m63 via explode + 64
    * codegen'd min-aggregates (slot j = min over shingles of
    * xxhash64(shingle, j)).
    */
  private def minhashSignature(shingled: DataFrame): DataFrame = {
    val exploded = shingled
      .select(col("doc_id"), explode(col("__shingle_set")).as("__s"))
    val slots: Seq[Column] =
      (0 until 64).map(j => min(xxhash64(col("__s"), lit(j))).as(s"__m$j"))
    exploded.groupBy(col("doc_id")).agg(slots.head, slots.tail: _*)
  }

  /** MinHash+LSH near-dup pairs with exact Jaccard verification.
    * Deterministic; rows-only check (no xxhash64 in DuckDB) —
    * property-tested in DedupSpec instead.
    */
  def minHashPairs(
      spark: SparkSession, sfDir: String,
      threshold: Double = 0.5, maxBucket: Int = 64): DataFrame = {
    val docs = shingleSets(spark, sfDir)
    val sig = minhashSignature(docs)
    // 16 bands of 4 slots; the band hash is a plain 4-ary xxhash64 —
    // no array construction, stays inside whole-stage codegen.
    val bandCols = (0 until 16).map { bnd =>
      struct(lit(bnd).as("idx"),
        xxhash64((bnd * 4 until bnd * 4 + 4).map(j => col(s"__m$j")): _*).as("h"))
    }
    val banded = sig
      .select(col("doc_id"), explode(array(bandCols: _*)).as("band"))
      .select(col("doc_id"),
        col("band.idx").as("band_idx"), col("band.h").as("band_hash"))
    // Skew guard: degenerate buckets (boilerplate content) are capped.
    val bucketSizes = banded.groupBy("band_idx", "band_hash")
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") > 1 && col("bsz") <= maxBucket)
    val inBuckets = banded.join(bucketSizes, Seq("band_idx", "band_hash"), "left_semi")
    val a = inBuckets.select(
      col("band_idx"), col("band_hash"), col("doc_id").as("doc_a"))
    val b = inBuckets.select(
      col("band_idx"), col("band_hash"), col("doc_id").as("doc_b"))
    // Dedup candidates as bare id pairs BEFORE re-attaching shingle sets.
    val pairs = a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val setsA = docs.select(col("doc_id").as("doc_a"), col("__shingle_set").as("set_a"))
    val setsB = docs.select(col("doc_id").as("doc_b"), col("__shingle_set").as("set_b"))
    pairs.join(setsA, Seq("doc_a")).join(setsB, Seq("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("set_a"), col("set_b"))).cast("double") /
          size(array_union(col("set_a"), col("set_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy(col("doc_a").asc, col("doc_b").asc)
  }

  /** 64-bit SimHash per doc: explode tokens, 64 codegen'd vote sums
    * (+1/-1 per bit of the token hash), then a closed-form 64-term bit
    * assembly — no interpreted lambdas anywhere.
    */
  def simHashSignatures(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .withColumn("__toks", expr(toksExpr))
      .filter(size(col("__toks")) > 0)
      .select(col("doc_id"), explode(col("__toks")).as("__t"))
      .withColumn("__h", xxhash64(col("__t")))
    val votes: Seq[Column] = (0 until 64).map { j =>
      sum(when(shiftright(col("__h"), j).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"__v$j")
    }
    val voted = toks.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
    val bits: Column = (0 until 64).map { j =>
      when(col(s"__v$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce(_ + _)
    voted.select(col("doc_id"), bits.as("simhash"))
  }

  /** SimHash near-dup pairs (hamming ≤ maxHamming), candidates from
    * 4×16-bit chunk collisions. Rows-only check.
    */
  def simHashPairs(
      spark: SparkSession, sfDir: String, maxHamming: Int = 3): DataFrame = {
    val sim = simHashSignatures(spark, sfDir)
    val chunkCols = (0 until 4).map { c =>
      struct(lit(c).as("idx"),
        shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL)).as("v"))
    }
    val chunked = sim
      .select(col("doc_id"), col("simhash"), explode(array(chunkCols: _*)).as("chunk"))
      .select(col("doc_id"), col("simhash"),
        col("chunk.idx").as("chunk_idx"), col("chunk.v").as("chunk_val"))
    val a = chunked.select(col("chunk_idx"), col("chunk_val"),
      col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
    val b = chunked.select(col("chunk_idx"), col("chunk_val"),
      col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("chunk_idx", "chunk_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sh_a", "sh_b").distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .orderBy(col("doc_a").asc, col("doc_b").asc)
  }

  /** Exact n-gram Jaccard within cheap blocks (same lang + length bucket):
    * the brute-force-within-block baseline the LSH variants approximate.
    * Rows-only (list-set semantics diverge across engines).
    */
  def ngramJaccardPairs(
      spark: SparkSession, sfDir: String, threshold: Double = 0.3): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .withColumn("__toks", expr(toksExpr))
      .withColumn("__shingle_set", array_distinct(expr(shingleExpr)))
      .select(col("doc_id"), col("lang"),
        (col("n_chars") / 256).cast("int").as("len_bucket"), col("__shingle_set"))
    val a = docs.select(col("lang"), col("len_bucket"),
      col("doc_id").as("doc_a"), col("__shingle_set").as("set_a"))
    val b = docs.select(col("lang"), col("len_bucket"),
      col("doc_id").as("doc_b"), col("__shingle_set").as("set_b"))
    a.join(b, Seq("lang", "len_bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("set_a"), col("set_b"))).cast("double") /
          size(array_union(col("set_a"), col("set_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "lang", "jaccard")
      .orderBy(col("doc_a").asc, col("doc_b").asc)
  }
}
