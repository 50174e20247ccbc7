package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Deduplication operators for LLM-training-data pipelines (north star in
  * /root/repo/BASELINE.json; no analog in the reference — new capability).
  *
  * All variants are deterministic (seeded xxhash64) and built from
  * codegen-friendly primitives. Two Spark pitfalls shape the design:
  *
  *   1. Higher-order lambda functions (transform/aggregate/filter) are
  *      interpreted, not codegen'd.
  *   2. Catalyst inlines a projected expression into EVERY downstream
  *      reference, so an array-typed "token" column used inside three
  *      lambdas re-runs the regex split per reference (measured 100×
  *      slowdown at sf0.1).
  *
  * Therefore: tokens are EXPLODED once through a generator (evaluated a
  * single time per row), shingles are assembled from token rows with
  * window `lead`s (codegen'd), signatures are hash-aggregations over those
  * rows (codegen'd), and shingle SETS are collect_set of 64-bit hashes —
  * fixed-width longs, never strings, so set-intersection and shuffles stay
  * cheap. That is also the 100 TB shape: the only wide ops are hash
  * shuffles on (doc_id) or (band_hash), all over fixed-width rows.
  */
object Dedup {

  private val toksExpr = """filter(split(lower(text), '\\s+'), t -> t <> '')"""

  /** CC spill roots live until JVM exit (the final round's files back
    * returned frames); ONE shutdown hook sweeps them all — per-round
    * dirs are deleted eagerly inside the loop.
    */
  private val ccSpillRoots =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  // roots of connectedComponents calls still EXECUTING: registered here
  // at entry, moved to ccSpillRoots only when the call exits — so
  // releaseClusterFrames can never delete files a concurrent clustering
  // is still writing/reading mid-loop
  private val ccInFlight =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }

  /** Explicit release handle for [[connectedComponents]]' per-call spill
    * roots (scaladoc there): deletes every accumulated final-mapping dir
    * NOW instead of at JVM exit. Caller contract: no frame returned by a
    * prior `connectedComponents`/`clusters` call may be consumed again
    * after this — their backing files are gone (reads throw, they do not
    * corrupt). Calls in flight on other threads are safe: their roots
    * sit in a separate in-flight registry until the call exits, so this
    * sweep cannot touch them.
    */
  def releaseClusterFrames(): Unit = {
    var r = ccSpillRoots.poll()
    while (r != null) { deleteRecursively(new java.io.File(r)); r = ccSpillRoots.poll() }
  }
  private lazy val ccSpillHookInit: Unit = {
    sys.addShutdownHook {
      ccSpillRoots.forEach(r => deleteRecursively(new java.io.File(r)))
      ccInFlight.forEach(r => deleteRecursively(new java.io.File(r)))
    }
    ()
  }

  /** Modulus of the twinnable Carter–Wegman permutation family (2³¹−1,
    * prime): with 28-bit base hashes and 31-bit constants the products
    * stay under 2⁵⁹, so neither engine's ANSI arithmetic can overflow.
    */
  private[graft] val MinHashP = 2147483647L

  private def sha7(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString.substring(0, 7), 16)

  /** Deterministic sha-256 bucket of a key (first 8 hex digits mod
    * `mod`) — THE engine-portable sampling predicate. One definition so
    * every sampling site and every hand-mirrored DuckDB twin
    * (`('0x' || substr(sha256(k::VARCHAR), 1, 8))::BIGINT % mod`)
    * tracks the same recipe; used by [[lshRecallSampled]]'s doc slice
    * and [[graft.ext.Graph.partTriangles]]' vertex sample.
    */
  private[graft] def shaBucket(c: Column, mod: Long): Column =
    pmod(conv(substring(sha2(c.cast("string"), 256), 1, 8), 16, 10)
      .cast("long"), lit(mod))

  /** j-th permutation constants — derived from sha-256 of a fixed tag, so
    * the generated DuckDB twin embeds the SAME literals (SparkEntry calls
    * these while assembling its SQL string).
    */
  private[graft] def permA(j: Int): Long = (sha7(s"permA$j") % (MinHashP - 1)) + 1
  private[graft] def permB(j: Int): Long = sha7(s"permB$j") % MinHashP

  /** (doc_id, pos, tok) token rows — the split runs once per doc. */
  private def tokenRowsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(expr(toksExpr)).as(Seq("pos", "tok")))

  private def tokenRows(spark: SparkSession, sfDir: String): DataFrame =
    tokenRowsOf(Tables.documents(spark, sfDir))

  /** (doc_id, shingle_hash) rows: hashes of word-3-gram shingles (tail
    * positions yield 2/1-gram shingles so short docs still have one).
    * Assembled off the carried token array — narrow, fully codegen'd, no
    * shuffle. `twinnable = false`: 64-bit xxhash64 (throughput path);
    * `twinnable = true`: 60-bit sha-256 hex prefix, which the DuckDB
    * oracle recomputes from the shingle STRING — set Jaccard over either
    * hash family equals string-set Jaccard absent collisions.
    */
  private def shingleRowsOf(docs: DataFrame, twinnable: Boolean): DataFrame = {
    // Shingle text assembled off the CARRIED token array (r13, guide
    // §2.4): posexplode keeps the array in scope, element_at reads the
    // two neighbours under CaseWhen boundary guards, and concat_ws skips
    // the null tails — so tail positions still yield 2/1-gram shingles,
    // exactly like the lead-window form this replaces, WITHOUT hash-
    // partitioning and sorting the corpus-sized token stream by doc_id
    // first. The one corpus Exchange this drops also leaves the streaming
    // micro-batch kernels (4–8 partition foreachBatch bodies) one stage
    // shorter per epoch.
    // r13 measured dead-end, do not redo: hash-repartitioning the raw doc
    // rows by doc_id before the explode instead — the bare
    // repartition(col) form benched NET SLOWER (dedup_simhash 0.76→0.85,
    // ngram_jaccard 0.81→1.15): AQE sizes that exchange by its tiny
    // pre-explode text BYTES and coalesces it to ~1 partition,
    // serializing the downstream explode+window+sha.
    def nxt(i: Int): Column =
      when(col("pos") + 1 + i <= size(col("__toks")),
        element_at(col("__toks"), col("pos") + 1 + i))
    val withShingle = docs
      .withColumn("__toks", expr(toksExpr))
      .select(col("doc_id"), col("__toks"),
        posexplode(col("__toks")).as(Seq("pos", "tok")))
      .withColumn("shingle", concat_ws(" ", col("tok"), nxt(1), nxt(2)))
    val hash =
      if (twinnable)
        conv(substring(sha2(col("shingle"), 256), 1, 15), 16, 10).cast("long")
      else xxhash64(col("shingle"))
    withShingle.select(col("doc_id"), hash.as("sh"))
  }

  private def shingleRows(
      spark: SparkSession, sfDir: String, twinnable: Boolean = false): DataFrame =
    shingleRowsOf(Tables.documents(spark, sfDir), twinnable)

  /** Jaccard over the sorted distinct-hash arrays: intersection via the
    * native merge-count [[graft.functions.SortedIntersectCount]] (no hash
    * set or output array per pair — the pair count is the quadratic term in
    * every caller), union derived as |a|+|b|−|a∩b|. Callers must have
    * [[graft.functions.GraftFunctions.register]]ed the session.
    */
  private def jaccard(a: Column, b: Column): Column = {
    val inter = call_function("graft_isect", a, b).cast("double")
    inter / (size(a).cast("double") + size(b).cast("double") - inter)
  }

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

  /** doc_ids surviving exact dedup — the smallest id per identical text:
    * the survivor-set form of [[exactKeepers]], shared with the curation
    * pipeline so the fingerprint normalization (sha-256 of the raw text)
    * lives in one place.
    */
  def exactSurvivorIds(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), sha2(col("text"), 256).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")

  /** Incremental (delta-vs-index) exact dedup: check a NEW batch of
    * documents against the existing corpus without re-deduping the corpus.
    * This is the shape that matters at 100 TB — the corpus fingerprint
    * index (fixed-width sha-256 → keeper id) is maintained once; each
    * arriving batch joins against it, and only the delta's fingerprints
    * move. When the delta is small Spark broadcasts it and the check is a
    * map-side pass over the index; here both sides are table slices so it
    * stays a fingerprint-keyed shuffle join.
    *
    * The "new batch" is carved deterministically (`doc_id % deltaMod ==
    * deltaRem`) so the report is oracle-checkable; `dup_of` is the keeper
    * (smallest corpus doc_id with identical text), `-1` when the new doc
    * is clean.
    */
  def incrementalExact(
      spark: SparkSession, sfDir: String,
      deltaMod: Int = 10, deltaRem: Int = 9): DataFrame = {
    val hashed = Tables.documents(spark, sfDir)
      .select(col("doc_id"), sha2(col("text"), 256).as("fp"))
    val index = hashed
      .filter(col("doc_id") % deltaMod =!= deltaRem)
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("__keeper"))
    hashed
      .filter(col("doc_id") % deltaMod === deltaRem)
      .join(index, Seq("fp"), "left")
      .select(
        col("doc_id").as("new_doc_id"),
        coalesce(col("__keeper"), lit(-1L)).as("dup_of"),
        col("__keeper").isNotNull.as("is_dup"))
      .orderBy(col("new_doc_id").asc)
  }

  /** Incremental (delta-vs-index) NEAR-dup — the minhash counterpart of
    * [[incrementalExact]], and the shape a 100 TB ingest actually runs:
    * the corpus maintains its banded SIGNATURE index once; each arriving
    * batch computes signatures only for itself, probes the index on band
    * keys, and verifies exact Jaccard on the candidates. The corpus is
    * never re-paired against itself — per batch, work is proportional to
    * the delta's bucket collisions.
    *
    * The "new batch" is carved deterministically (`doc_id % deltaMod ==
    * deltaRem`) so the report is oracle-checkable (with `twinnable` the
    * DuckDB twin rebuilds both sides' Carter–Wegman signatures, the band
    * probe, the corpus-side bucket cap, and the Jaccard verify).
    * Index-side buckets larger than `maxBucket` (boilerplate chrome) are
    * skipped, bounding skew. One row per delta doc: `dup_of` = the
    * best-matching corpus doc (highest Jaccard, smallest id on ties),
    * `-1` when nothing clears `threshold`.
    */
  def incrementalMinHash(
      spark: SparkSession, sfDir: String,
      deltaMod: Int = 10, deltaRem: Int = 9,
      threshold: Double = 0.5, maxBucket: Int = 64,
      twinnable: Boolean = false): DataFrame = {
    // the jaccard verify needs graft_isect even when signatures come from
    // the artifact (whose build — the usual registration site — is skipped)
    graft.functions.GraftFunctions.register(spark)
    // Canonical signatures come from the maintained per-sfDir index
    // artifact — a bucketed parquet scan each consumer re-reads, so the
    // whole report keeps DISTRIBUTED lineage end-to-end: one row per
    // delta doc scales with the ingest batch, which at 100 TB must never
    // transit the driver (the old smallLocal pin capped it at 500k). The
    // non-twinnable (xxhash throughput) form derives signatures inline
    // and reliable-checkpoints them instead — distributed, lineage
    // severed from the 64-slot aggregation its three consumers share.
    val perDoc = if (twinnable) minHashSignaturesShared(spark, sfDir)
      else minHashPerDoc(spark, sfDir, twinnable).checkpoint()
    val best = {
      val isDelta = col("doc_id") % deltaMod === deltaRem
      val banded = bandRows(perDoc)
      val corpusB = banded.filter(!isDelta)
      val deltaB = banded.filter(isDelta)
      // index-side cap only: a single corpus doc in a bucket is already a
      // meaningful candidate here (unlike the pair producer's bsz > 1)
      val okBuckets = corpusB.groupBy(bandKey.map(col): _*)
        .agg(count(lit(1)).as("bsz"))
        .filter(col("bsz") <= maxBucket)
      val cands = deltaB
        .select(col("band_idx"), col("k1"), col("k2"), col("k3"), col("k4"),
          col("doc_id").as("new_doc_id"))
        .join(corpusB.join(okBuckets, bandKey, "left_semi")
          .withColumnRenamed("doc_id", "corpus_doc_id"), bandKey)
        .select("new_doc_id", "corpus_doc_id").distinct()
      val sets = perDoc.select(col("doc_id"), col("shset"))
      cands
        .join(sets.select(col("doc_id").as("new_doc_id"), col("shset").as("set_a")),
          Seq("new_doc_id"))
        .join(sets.select(col("doc_id").as("corpus_doc_id"), col("shset").as("set_b")),
          Seq("corpus_doc_id"))
        .withColumn("jaccard", jaccard(col("set_a"), col("set_b")))
        .filter(col("jaccard") >= threshold)
        .withColumn("__rk", row_number().over(
          Window.partitionBy(col("new_doc_id"))
            .orderBy(col("jaccard").desc, col("corpus_doc_id").asc)))
        .filter(col("__rk") === 1)
        .select(col("new_doc_id"), col("corpus_doc_id"), col("jaccard"))
    }
    Tables.documents(spark, sfDir)
      .filter(col("doc_id") % deltaMod === deltaRem)
      .select(col("doc_id").as("new_doc_id"))
      .join(best, Seq("new_doc_id"), "left")
      .select(
        col("new_doc_id"),
        coalesce(col("corpus_doc_id"), lit(-1L)).as("dup_of"),
        coalesce(round(col("jaccard"), 6), lit(0.0)).as("best_jaccard"),
        col("corpus_doc_id").isNotNull.as("is_dup"))
      .orderBy(col("new_doc_id").asc)
  }

  /** Near-dup one (micro-)batch of documents against a persistent
    * SIGNATURE index — the batch kernel of the streaming near-dup ingest
    * ([[graft.streaming.CorpusIngest.ingestNearDedup]]), mirroring
    * [[graft.streaming.CorpusIngest.dedupBatch]]'s contract for exact
    * dedup. `batchSig`/`index` are [[minHashSignaturesOf]] frames
    * (doc_id, shset, __m0..__m63).
    *
    * Candidates: the batch's band rows probe the UNION of index and batch
    * bands (bucket sizes capped at `maxBucket` over the union — the
    * boilerplate guard); an index doc matches at any id, a batch-mate
    * only at a smaller id (each in-batch pair resolves once, toward the
    * smaller id — the keeper convention). Exact Jaccard verifies every
    * candidate.
    *
    * Replay-idempotent like the exact kernel: a batch keeper already
    * appended to the index matches itself only at its own id (excluded),
    * reports as a keeper again, and is anti-joined out of `newEntries` —
    * a crash between the index append and the stream commit reproduces
    * the same report with no duplicate index rows.
    *
    * Returns (report: one row per batch doc — new_doc_id, dup_of,
    * best_jaccard, is_dup; newEntries: signature rows of the batch's
    * keepers not yet indexed).
    */
  def nearDupBatch(
      batchSig: DataFrame, index: DataFrame,
      threshold: Double = 0.5, maxBucket: Int = 64): (DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(batchSig.sparkSession)
    val batchBands = bandRows(batchSig).withColumn("__idx", lit(false))
    val indexBands = bandRows(index).withColumn("__idx", lit(true))
    val all = indexBands.unionByName(batchBands)
    // census over DISTINCT (bucket, doc): a replayed keeper's band rows
    // sit in both the index and the batch side of the union, and raw-row
    // counting would inflate its buckets past the cap on replay —
    // flipping a boundary bucket's candidates between the first run and
    // the retry (the replay-idempotence contract below)
    val okBuckets = all.dropDuplicates(bandKey :+ "doc_id")
      .groupBy(bandKey.map(col): _*)
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBucket)
    val cands = batchBands
      .select(col("band_idx"), col("k1"), col("k2"), col("k3"), col("k4"),
        col("doc_id").as("new_doc_id"))
      .join(all.join(okBuckets, bandKey, "left_semi")
        .withColumnRenamed("doc_id", "cand_id"), bandKey)
      .filter(col("cand_id") =!= col("new_doc_id") &&
        (col("__idx") || col("cand_id") < col("new_doc_id")))
      .select("new_doc_id", "cand_id").distinct()
    // verify sets come from both sides; a replayed keeper appears in both,
    // so collapse on doc_id before attaching
    val sets = index.select(col("doc_id"), col("shset"))
      .unionByName(batchSig.select(col("doc_id"), col("shset")))
      .dropDuplicates("doc_id")
    val best = cands
      .join(sets.select(col("doc_id").as("new_doc_id"), col("shset").as("set_a")),
        Seq("new_doc_id"))
      .join(sets.select(col("doc_id").as("cand_id"), col("shset").as("set_b")),
        Seq("cand_id"))
      .withColumn("jaccard", jaccard(col("set_a"), col("set_b")))
      .filter(col("jaccard") >= threshold)
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("new_doc_id"))
          .orderBy(col("jaccard").desc, col("cand_id").asc)))
      .filter(col("__rk") === 1)
      .select(col("new_doc_id"), col("cand_id"), col("jaccard"))
    val report = batchSig.select(col("doc_id").as("new_doc_id"))
      .join(best, Seq("new_doc_id"), "left")
      .select(
        col("new_doc_id"),
        coalesce(col("cand_id"), lit(-1L)).as("dup_of"),
        coalesce(round(col("jaccard"), 6), lit(0.0)).as("best_jaccard"),
        col("cand_id").isNotNull.as("is_dup"))
    val newEntries = batchSig
      .join(report.filter(!col("is_dup"))
        .select(col("new_doc_id").as("doc_id")), Seq("doc_id"), "left_semi")
      .join(index.select(col("doc_id")), Seq("doc_id"), "left_anti")
    (report, newEntries)
  }

  /** MinHash+LSH near-dup pairs with exact Jaccard verification.
    * Deterministic; rows-only check (no xxhash64 in DuckDB) —
    * property-tested in DedupSpec instead.
    *
    * Shape: ONE aggregation pass per doc computes both the hashed shingle
    * set and the 64 codegen'd min-slots (the signature), persisted — the
    * per-doc frame is consumed three times (banding + both sides of the
    * verify join) and would otherwise re-run the tokenize+window shuffle
    * each time. 16 bands of 4 slots bucket candidates (multi-arg xxhash64,
    * no arrays); oversized buckets (boilerplate) are capped to bound skew;
    * candidate pairs dedup as bare id pairs BEFORE the shingle sets
    * re-attach. At 100 TB the persisted per-doc frame is the classic
    * "signature table" materialization — fixed-width, ~1e-3 the corpus
    * bytes, spillable.
    */
  def minHashPairs(
      spark: SparkSession, sfDir: String,
      threshold: Double = 0.5, maxBucket: Int = 64,
      twinnable: Boolean = false): DataFrame =
    minHashPairsUnsorted(spark, sfDir, threshold, maxBucket, twinnable)
      .orderBy(col("doc_a").asc, col("doc_b").asc)

  /** [[minHashPairs]] for corpus-scale consumers: the verified pair list
    * stays DISTRIBUTED — reliable-checkpointed to sever its lineage off
    * the call-scoped signature cache — instead of driver-materialized.
    * Pair counts grow with dup density (a 100-way-duplicated corpus emits
    * ~n·dups/2 pairs), so past [[graft.ops.Materialize.smallLocal]]'s cap
    * they must never transit the driver; this is the variant the 100×
    * stress tier and any heavy-dup 100 TB run feeds into
    * [[connectedComponents]].
    */
  def minHashPairsDistributed(
      spark: SparkSession, sfDir: String,
      threshold: Double = 0.5, maxBucket: Int = 64,
      twinnable: Boolean = false): DataFrame =
    minHashPairsUnsorted(spark, sfDir, threshold, maxBucket, twinnable,
      materialize = false)

  /** [[minHashPairs]] without the presentation sort — consumers that
    * reshuffle anyway (clustering) skip the global sort.
    *
    * Two permutation families, same signature structure:
    * `twinnable = false` — Kirsch–Mitzenmacher-shaped mixing of TWO
    * xxhash64 values (XOR ⊕ rotate ⊕ per-j constant, because ANSI mode
    * raises on deliberate mod-2⁶⁴ add/multiply wrap; bitwise ops cannot
    * overflow) — ~32× less hashing in the hot aggregation than 64
    * independent hash calls. `twinnable = true` — classic Carter–Wegman
    * `(Aⱼ·h + Bⱼ) mod P` over a 28-bit slice of the sha-256 shingle hash
    * with constants from [[permA]]/[[permB]]: overflow-free in both
    * engines, so the DuckDB twin rebuilds the exact signatures.
    */
  /** Per-doc signature + shingle-set frame shared by the pair producers
    * and the incremental delta check: (doc_id, shset, __m0..__m63). One
    * aggregation pass — the "signature table" every LSH consumer reads.
    *
    * Deliberately a SINGLE combined aggregate: collect_set does force the
    * whole 65-buffer aggregate onto ObjectHashAggregateExec (the 64
    * min-slot updates evaluate interpreted), but the measured alternative
    * — persisting the shingle rows and running slot/set aggregations
    * separately with a doc_id join — was NET SLOWER at sf0.1 (r5 bench:
    * dedup_minhash 2.25→2.58 s, dedup_clusters 3.69→4.44 s): the extra
    * materialization job, second aggregate, and join overhead exceed the
    * interpreted-update cost. Revisit only if a corpus has ≫55 shingle
    * rows per doc, where the per-row interpreted cost dominates.
    */
  private def minHashPerDoc(
      spark: SparkSession, sfDir: String, twinnable: Boolean): DataFrame =
    minHashSignaturesOf(Tables.documents(spark, sfDir), twinnable)

  /** Public form of the signature table over an arbitrary document frame
    * (doc_id, text, ...) — what the STREAMING near-dup ingest computes
    * per micro-batch and persists as its index rows.
    */
  def minHashSignaturesOf(
      docs: DataFrame, twinnable: Boolean = false): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    def rotl(c: Column, j: Int): Column =
      if (j == 0) c else shiftleft(c, j).bitwiseOR(shiftrightunsigned(c, 64 - j))
    val slots: Seq[Column] =
      if (twinnable)
        (0 until 64).map { j =>
          min(pmod(lit(permA(j)) * col("__h") + lit(permB(j)), lit(MinHashP)))
            .as(s"__m$j")
        }
      else
        (0 until 64).map { j =>
          min(col("__h1")
            .bitwiseXOR(rotl(col("__h2"), j))
            .bitwiseXOR(lit(j * 0x9E3779B9L))).as(s"__m$j")
        }
    val hashed = shingleRowsOf(docs, twinnable)
    val based =
      if (twinnable) hashed.withColumn("__h", shiftrightunsigned(col("sh"), 32))
      else hashed
        .withColumn("__h1", xxhash64(col("sh")))
        .withColumn("__h2", xxhash64(col("sh"), lit(1)))
    based
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_set(col("sh"))).as("shset"), slots: _*)
  }

  /** Band key = the 4 raw slot values (multi-column shuffle key) — no
    * compaction hash between the signature and the bucket, so the
    * twinnable path needs nothing DuckDB can't recompute.
    */
  private val bandKey = Seq("band_idx", "k1", "k2", "k3", "k4")

  /** Explode a [[minHashPerDoc]] frame into its 16 band rows. */
  private def bandRows(perDoc: DataFrame): DataFrame = {
    val bandCols = (0 until 16).map { bnd =>
      struct(lit(bnd).as("idx"),
        col(s"__m${bnd * 4}").as("k1"), col(s"__m${bnd * 4 + 1}").as("k2"),
        col(s"__m${bnd * 4 + 2}").as("k3"), col(s"__m${bnd * 4 + 3}").as("k4"))
    }
    perDoc
      .select(col("doc_id"), explode(array(bandCols: _*)).as("band"))
      .select(col("doc_id"), col("band.idx").as("band_idx"),
        col("band.k1").as("k1"), col("band.k2").as("k2"),
        col("band.k3").as("k3"), col("band.k4").as("k4"))
  }

  private def minHashPairsUnsorted(
      spark: SparkSession, sfDir: String,
      threshold: Double = 0.5, maxBucket: Int = 64,
      twinnable: Boolean = false, materialize: Boolean = true): DataFrame =
    if (threshold == 0.5 && maxBucket == 64 && twinnable && materialize)
      minHashPairsShared(spark, sfDir)
    else
      minHashPairsUnsortedOf(Tables.documents(spark, sfDir), threshold,
        maxBucket, twinnable, materialize)

  /** The verified near-dup pair list at the CANONICAL parameters
    * (threshold 0.5, 16×4 banding with maxBucket 64, twinnable sha
    * permutations) as a per-sfDir DERIVED TABLE
    * ([[graft.ops.Layout.ensureDerived]]): `dedup_minhash`,
    * `dedup_clusters`, `cluster_split` and `training_set` all consume
    * exactly this list, and each previously re-derived the full
    * signature + banding + verification pipeline from the corpus. A
    * production curation stack maintains precisely this artifact as its
    * persistent signature/pair index (the streaming ingest already does,
    * incrementally — [[graft.streaming.CorpusIngest.ingestNearDedup]]);
    * here it is built once per (sfDir, source census) and every consumer
    * reads the bucketed copy. Values round-trip parquet bit-exactly, so
    * the oracle twins are untouched.
    *
    * Non-canonical parameters (stress tiers' maxBucket=128, the
    * distributed heavy-dup path, throughput-mode xxhash signatures)
    * bypass the artifact and derive directly — the driver-side build
    * would refuse heavy-dup pair volumes anyway
    * ([[graft.ops.Materialize.smallLocal]]'s cap).
    */
  private[graft] def minHashPairsShared(
      spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.Layout.ensureDerived(spark, sfDir, "minhash_pairs",
      Seq("documents.parquet"), "doc_a") {
      // derive FROM the signature index artifact: the one-time pair build
      // reads maintained signatures instead of re-hashing the corpus.
      // Deliberately NO incremental refresh kernel here: pair deltas are
      // not compositional under the band-bucket cap (an appended doc can
      // push an old bucket past maxBucket, which a full derivation would
      // DROP old candidates from), so an append re-derives pairs from the
      // incrementally-refreshed signature index — the expensive per-doc
      // hashing stays delta-cost, the band join re-runs over fixed-width
      // signature rows.
      minHashPairsFromSigs(minHashSignaturesShared(spark, sfDir),
        threshold = 0.5, maxBucket = 64, materialize = true)
    }

  /** The CANONICAL (twinnable) per-doc signature frame as a per-sfDir
    * derived table — the persistent SIGNATURE INDEX itself: doc_id,
    * exact shingle set, 64 Carter–Wegman slots, bucketed on doc_id.
    * [[incrementalMinHash]] probes this instead of re-hashing the whole
    * corpus per delta — at 100 TB the index is what the warehouse
    * MAINTAINS (the streaming ingest appends to exactly this schema),
    * never something a batch recomputes. Longs round-trip parquet
    * bit-exactly, so twins are untouched.
    */
  private[graft] def minHashSignaturesShared(
      spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.Layout.ensureDerived(spark, sfDir, "minhash_sig",
      Seq("documents.parquet"), "doc_id",
      // APPEND-ONLY REFRESH: one shard landing on the corpus hashes ONLY
      // the new docs (the batch kernel the streaming ingest already runs,
      // nearDupBatch-style) and unions onto the committed index — never
      // re-shingling the old corpus, which is the whole point of
      // maintaining a signature index at 100 TB. Docs are identified by
      // doc_id; if an appended file ever repeats an indexed id the OLD
      // signature wins (anti-join), matching the ingest keeper convention.
      // partition-level append (tier-J finding): new signatures land as
      // additional bucket files, the committed rows are hardlinked, never
      // rewritten — refresh cost is delta-proportional
      refreshDelta = Some { ctx =>
        minHashSignaturesOf(
          spark.read.parquet(ctx.addedFiles: _*), twinnable = true)
          .join(ctx.oldArtifact.select(col("doc_id")), Seq("doc_id"),
            "left_anti")
      }) {
      minHashPerDoc(spark, sfDir, twinnable = true)
    }

  /** [[minHashPairs]] over an arbitrary (doc_id, text, ...) frame — the
    * building block behind the sfDir entry points and the hash-sampled
    * recall audit ([[lshRecallSampled]]).
    */
  private def minHashPairsUnsortedOf(
      docs: DataFrame,
      threshold: Double, maxBucket: Int,
      twinnable: Boolean, materialize: Boolean): DataFrame =
    minHashPairsFromSigs(
      minHashSignaturesOf(docs, twinnable), threshold, maxBucket, materialize)

  /** The band → bucket-cap → verify pipeline over an existing signature
    * frame — shared by the from-docs path above and the per-sfDir pair
    * artifact's build (which reuses the maintained signature index
    * instead of re-hashing the corpus).
    */
  private def minHashPairsFromSigs(
      sigs: DataFrame,
      threshold: Double, maxBucket: Int, materialize: Boolean): DataFrame = {
    graft.functions.GraftFunctions.register(sigs.sparkSession)
    val perDoc = sigs.persist()
    try {
      val sets = perDoc.select(col("doc_id"), col("shset"))
      val banded = bandRows(perDoc)
      val bucketSizes = banded.groupBy(bandKey.map(col): _*)
        .agg(count(lit(1)).as("bsz"))
        .filter(col("bsz") > 1 && col("bsz") <= maxBucket)
      val inBuckets = banded.join(bucketSizes, bandKey, "left_semi")
      val pairs = inBuckets
        .withColumnRenamed("doc_id", "doc_a")
        .join(inBuckets.withColumnRenamed("doc_id", "doc_b"), bandKey)
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      val verified = pairs
        .join(sets.select(col("doc_id").as("doc_a"), col("shset").as("set_a")), Seq("doc_a"))
        .join(sets.select(col("doc_id").as("doc_b"), col("shset").as("set_b")), Seq("doc_b"))
        .withColumn("jaccard", jaccard(col("set_a"), col("set_b")))
        .filter(col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
      // Either way the result is pinned EAGERLY so the signature cache
      // cannot outlive this call (CacheManager entries accumulate across
      // queries and every later plan pays canonicalize-and-compare against
      // each 64-aggregate cached plan). Normal corpora: the verified pair
      // list is tiny (ids + one double) — driver-side materialization, no
      // unreplicated block to lose with an executor, no write+read round
      // trip. Heavy-dup corpora (materialize = false): pair counts scale
      // with dup density, so the list reliable-checkpoints instead and
      // stays distributed.
      if (materialize) graft.ops.Materialize.smallLocal(verified)
      else verified.checkpoint()
    } finally perDoc.unpersist()
  }

  /** Threshold-sensitivity curve for near-dup dedup: at each candidate
    * Jaccard threshold, how many verified pairs survive and how many
    * documents they touch — the tuning report that decides the
    * PRODUCTION threshold (too low over-merges distinct docs into one
    * keeper cluster; too high leaves templated spam in the corpus).
    *
    * Reads the maintained `minhash_pairs` artifact (already verified at
    * the floor 0.5), so the whole report is |pairs|×|thresholds| rows —
    * corpus-size-independent. Jaccard values are the identical double
    * expression in both engines, so `>= t` is a well-defined predicate
    * at every step; thresholds with zero pairs still appear (left join
    * against the threshold frame).
    */
  def dedupSensitivity(
      spark: SparkSession, sfDir: String,
      thresholds: Seq[Double] = Seq(0.5, 0.6, 0.7, 0.8, 0.9)): DataFrame = {
    import spark.implicits._
    // the pair artifact is VERIFIED at the 0.5 floor — a sweep point
    // below it would silently undercount (pairs in [t, 0.5) were never
    // materialized); fail loudly instead (review r12)
    require(thresholds.forall(_ >= 0.5),
      s"dedupSensitivity: thresholds below the pair artifact's 0.5 " +
        s"verify floor would undercount: ${thresholds.filter(_ < 0.5)}")
    val pairs = minHashPairsShared(spark, sfDir)
    val ths = thresholds.toDF("threshold")
    val surviving = pairs.select(col("doc_a"), col("doc_b"), col("jaccard"),
        explode(array(thresholds.map(lit): _*)).as("threshold"))
      .where(col("jaccard") >= col("threshold"))
    val nPairs = surviving.groupBy(col("threshold"))
      .agg(count(lit(1)).as("__np"))
    val nDocs = surviving
      .select(col("threshold"),
        explode(array(col("doc_a"), col("doc_b"))).as("d"))
      .groupBy(col("threshold"))
      .agg(countDistinct(col("d")).as("__nd"))
    ths.join(nPairs, Seq("threshold"), "left")
      .join(nDocs, Seq("threshold"), "left")
      .select(col("threshold"),
        coalesce(col("__np"), lit(0L)).as("n_pairs"),
        coalesce(col("__nd"), lit(0L)).as("n_docs"))
      .orderBy(col("threshold").asc)
  }

  /** SimHash per doc: token rows → codegen'd vote sums (+1/-1 per bit of
    * the token hash) → closed-form bit assembly. `twinnable = false`
    * (default): 64-bit xxhash64 token hashes — the throughput path.
    * `twinnable = true`: 60-bit token hashes from the first 15 hex digits
    * of sha2-256 — the same signature structure, reproducible in the
    * DuckDB oracle bit-for-bit (15 hex digits because 16 would overflow a
    * signed BIGINT in both engines' ANSI casts).
    */
  def simHashSignatures(
      spark: SparkSession, sfDir: String, twinnable: Boolean = false): DataFrame =
    simHashSignaturesOf(Tables.documents(spark, sfDir), twinnable)

  /** The per-doc SimHash signature index as a MAINTAINED derived table
    * (twinnable sha hash family, doc_id-bucketed) with the
    * `minhash_sig` append-only contract: signatures are per-doc
    * deterministic, so one appended shard hashes ONLY its new docs and
    * unions onto the committed index (old signature wins on a repeated
    * id). The registered `dedup_simhash` reads this instead of
    * re-running the 60-vote aggregation over the corpus per call.
    */
  private[graft] def simHashSignaturesShared(
      spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.Layout.ensureDerived(spark, sfDir, "simhash_sig",
      Seq("documents.parquet"), "doc_id",
      refreshDelta = Some { ctx =>
        simHashSignaturesOf(
          spark.read.parquet(ctx.addedFiles: _*), twinnable = true)
          .join(ctx.oldArtifact.select(col("doc_id")), Seq("doc_id"),
            "left_anti")
      }) {
      simHashSignaturesOf(Tables.documents(spark, sfDir), twinnable = true)
    }

  /** [[simHashSignatures]] over an arbitrary (doc_id, text, ...) frame —
    * the build/refresh kernel of [[simHashSignaturesShared]].
    */
  private def simHashSignaturesOf(
      docs: DataFrame, twinnable: Boolean): DataFrame = {
    val nBits = if (twinnable) 60 else 64
    val tokHash =
      if (twinnable)
        conv(substring(sha2(col("tok"), 256), 1, 15), 16, 10).cast("long")
      else xxhash64(col("tok"))
    val toks = tokenRowsOf(docs).withColumn("__h", tokHash)
    val votes: Seq[Column] = (0 until nBits).map { j =>
      sum(when(shiftright(col("__h"), j).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"__v$j")
    }
    val voted = toks.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
    val bits: Column = (0 until nBits).map { j =>
      when(col(s"__v$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce(_ + _)
    voted.select(col("doc_id"), bits.as("simhash"))
  }

  /** SimHash near-dup pairs (hamming ≤ maxHamming), candidates from
    * 4-chunk collisions (16 bits per chunk on the xxhash64 path, 15 on
    * the twinnable sha2 path — see [[simHashSignatures]]).
    */
  def simHashPairs(
      spark: SparkSession, sfDir: String, maxHamming: Int = 3,
      twinnable: Boolean = false, maxChunkDocs: Long = 256L): DataFrame = {
    // twinnable path: signatures come off the maintained simhash_sig
    // artifact (disk-backed — both chunk-join sides read the bucketed
    // table, nothing to cache). xxhash64 throughput path: computed live
    // and persisted call-scoped so the 64-vote aggregation over token
    // rows doesn't run twice.
    val sim =
      if (twinnable) simHashSignaturesShared(spark, sfDir)
      else simHashSignatures(spark, sfDir, twinnable).persist()
    try
      simHashPairsFromSigs(sim, maxHamming,
        (if (twinnable) 60 else 64) / 4, maxChunkDocs)
    finally { if (!twinnable) sim.unpersist(); () }
  }

  /** The chunk-band → bucket-cap → Hamming-verify pipeline over an
    * existing signature frame — shared by the corpus entry point and the
    * slice-scoped recall audit. `maxChunkDocs` is THE boilerplate guard
    * every other pair producer in this file already carries (the
    * `maxBucket`/`maxDocsPerSpan` analog, added by the r12 review): a
    * chunk value shared by a mass-duplicated template would otherwise
    * emit ~N² candidate rows on one skewed join key before the Hamming
    * filter ever runs. Chunks above the cap are excluded from candidate
    * generation — the identical recall caveat as the siblings (a pair
    * whose EVERY chunk is mass-duplicated boilerplate is missed), and
    * the cap is mirrored in the DuckDB twins.
    */
  private def simHashPairsFromSigs(
      sim: DataFrame, maxHamming: Int, chunkBits: Int,
      maxChunkDocs: Long): DataFrame = {
    val chunkMask = (1L << chunkBits) - 1
    val chunkCols = (0 until 4).map { c =>
      struct(lit(c).as("idx"),
        shiftright(col("simhash"), c * chunkBits)
          .bitwiseAND(lit(chunkMask)).as("v"))
    }
    val chunked = sim
      .select(col("doc_id"), col("simhash"), explode(array(chunkCols: _*)).as("chunk"))
      .select(col("doc_id"), col("simhash"),
        col("chunk.idx").as("chunk_idx"), col("chunk.v").as("chunk_val"))
    val okChunks = chunked.groupBy(col("chunk_idx"), col("chunk_val"))
      .agg(count(lit(1)).as("csz"))
      .filter(col("csz") <= maxChunkDocs)
      .select("chunk_idx", "chunk_val")
    val bounded = chunked
      .join(okChunks, Seq("chunk_idx", "chunk_val"), "left_semi")
    val a = bounded.select(col("chunk_idx"), col("chunk_val"),
      col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
    val b = bounded.select(col("chunk_idx"), col("chunk_val"),
      col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
    graft.ops.Materialize.smallLocal(
      a.join(b, Seq("chunk_idx", "chunk_val"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b").distinct()
        .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
        .filter(col("hamming") <= maxHamming)
        .select("doc_a", "doc_b", "hamming")
        .orderBy(col("doc_a").asc, col("doc_b").asc))
  }

  /** Set-similarity join via GLOBAL-ORDER PREFIX FILTERING — the
    * AllPairs/PPJoin family (Bayardo et al., WWW'07 "Scaling Up All Pairs
    * Similarity Search"; Xiao et al., WWW'08 "Efficient Similarity Joins
    * for Near Duplicate Detection"): EXACT Jaccard ≥ `threshold` pairs,
    * the third candidate-generation strategy next to LSH banding
    * ([[minHashPairs]] — probabilistic recall) and attribute blocking
    * ([[ngramJaccardPairs]] — needs a blocking key).
    *
    * The filter: under any one global token order, two sets with
    * Jaccard ≥ t must share a token within each side's first
    * |s| − ⌈t·|s|⌉ + 1 tokens. Ordering tokens by ASCENDING corpus
    * document frequency puts each doc's RAREST shingles in its prefix, so
    * the candidate join key distribution is the inverse of the corpus
    * token skew — the hot boilerplate shingles that make a naive
    * token-join quadratic are precisely the ones the prefix join never
    * keys on. Unlike LSH the filter is lossless: every qualifying pair is
    * generated (subject only to the `maxPrefixDf` cap below).
    *
    * Scale shape: df-count and per-doc rank are two fixed-width hash
    * shuffles + one doc-partitioned window over the (doc_id, shingle_hash)
    * rows; the candidate join keys only on prefix entries with
    * df ≤ `maxPrefixDf`, so a token contributes < maxPrefixDf² pairs —
    * the same bound shape as [[minHashPairs]]' `maxBucket`. The cap's
    * recall caveat (a pair whose ENTIRE prefix is capped-out tokens is
    * missed) only bites docs built wholly from mass-duplicated
    * boilerplate, which the span/minhash caps refuse identically. The
    * length filter (t·max ≤ min) is implied by Jaccard ≥ t, so pruning on
    * it drops no true pair.
    *
    * Reference anchor: the flagship search endpoint's fuzzy matching
    * (`/root/reference/src/routes/ads.ts` contains-search) has no
    * similarity join; this is part of the §7.5 LLM-pipeline extension
    * surface.
    */
  /** The corpus's distinct (doc_id, shingle-hash) rows ANNOTATED with the
    * three global statistics every prefix-filter pass needs — shingle
    * document frequency `df`, doc set size `sz`, and the per-doc
    * rarest-first prefix rank `rk` — as a MAINTAINED derived table
    * bucketed on doc_id (the inverted-index side-stats a dedup service
    * keeps warm at 100 TB). Thresholds and df caps are filter-time, so
    * ONE artifact serves every prefix consumer: [[jaccardPrefixPairs]]
    * and [[containmentPairs]] read this instead of re-tokenizing and
    * re-windowing the corpus per call, and the doc_id bucketing makes
    * their per-call set rebuild (collect_set) exchange-free.
    *
    * TWO-LAYER refresh (the r11 verdict's last O(corpus) refresh,
    * removed): df and hence every rank are GLOBAL statistics — one
    * appended doc shifts any shingle's df and reorders the prefixes that
    * contain it — so the STATS layer legitimately recomputes on every
    * census change. But the expensive half of that rebuild — shingling
    * the corpus text — does not: the distinct (doc_id, sh) rows are
    * append-only per doc, exactly the `minhash_sig` contract. The split:
    * [[shingleRowsShared]] holds the rows under `refreshDelta` (an
    * appended shard tokenizes ONLY its new docs; committed rows hardlink
    * forward), and this layer re-WINDOWS those rows — O(artifact) hash
    * shuffles over fixed-width longs, no text scan. A 100 TB corpus
    * append pays delta tokenize + artifact-sized window arithmetic
    * instead of a full re-shingle (tier K measures the decade).
    */
  private[graft] def shingleStatsShared(
      spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.Layout.ensureDerived(spark, sfDir, "shingle_stats",
      Seq("documents.parquet"), "doc_id",
      refresh = Some { _ => statsOf(shingleRowsShared(spark, sfDir)) },
      // amortization dial for the one O(artifact) recompute left in the
      // dedup family (the df/sz/rk windows are global, so they cannot be
      // delta-expressed): at K > 1, K−1 consecutive corpus appends SERVE
      // the committed stats (hardlink-forward, no job — bounded
      // staleness, counter visible in the artifact dir's _graft_stale)
      // and the Kth recomputes the windows over the append-only rows
      // layer. Default 1 = always fresh; every registered oracle query
      // runs at the default, so consumer hashes are knob-independent
      // when fresh (LayoutRefreshSpec pins both halves).
      staleEpochs = spark.conf
        .get("graft.shingleStats.staleEpochs", "1").toInt) {
      statsOf(shingleRowsShared(spark, sfDir))
    }

  /** Layer 1 of [[shingleStatsShared]]: the corpus's distinct
    * (doc_id, sha-60 shingle-hash) rows as an APPEND-ONLY maintained
    * table, doc_id-bucketed. Rows are per-doc deterministic, so the
    * `minhash_sig` partition-level append contract applies verbatim: a
    * landed shard shingles ONLY its new docs (old rows win on a repeated
    * id) and the committed rows hardlink forward. Everything global
    * (df/sz/rk) lives in layer 2, derived from this table without
    * touching text.
    */
  private[graft] def shingleRowsShared(
      spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.Layout.ensureDerived(spark, sfDir, "shingle_rows",
      Seq("documents.parquet"), "doc_id",
      refreshDelta = Some { ctx =>
        shingleRowsOf(spark.read.parquet(ctx.addedFiles: _*),
          twinnable = true).distinct()
          .join(ctx.oldArtifact.select(col("doc_id")).distinct(),
            Seq("doc_id"), "left_anti")
      }) {
      shingleRows(spark, sfDir, twinnable = true).distinct()
    }

  def jaccardPrefixPairs(
      spark: SparkSession, sfDir: String, threshold: Double = 0.5,
      maxPrefixDf: Long = 256L): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    prefixJaccardFromStats(
      shingleStatsShared(spark, sfDir), threshold, maxPrefixDf)
  }

  /** [[jaccardPrefixPairs]] over an arbitrary (doc_id, text, ...) frame —
    * shared by the sfDir entry point and [[lshRecallSampled]].
    */
  def jaccardPrefixPairsOf(
      docs: DataFrame, threshold: Double = 0.5,
      maxPrefixDf: Long = 256L): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // distinct (doc_id, sha-60 shingle-hash) rows feed FOUR consumers
    // (df counts, doc sizes, the ranked prefix, the verify sets) — one
    // tokenize+window pass, persisted call-scoped like the other dedups.
    val rows = shingleRowsOf(docs, twinnable = true).distinct().persist()
    try {
      prefixJaccardFromStats(statsOf(rows), threshold, maxPrefixDf)
    } finally { rows.unpersist(); () }
  }

  /** df/sz/rk window annotation for a live (not artifact-backed) distinct
    * shingle-row frame — the same three columns [[shingleStatsShared]]
    * persists. Window aggregates, not groupBy+join round-trips: the
    * sh-partitioned count and the doc-partitioned count+rank are two
    * exchanges of the rows table total (the two doc_id windows share one
    * — EnsureRequirements reuses the partitioning, the ordered one just
    * adds a sort), where the join formulation paid four full shuffles.
    */
  private def statsOf(rows: DataFrame): DataFrame = {
    val wSh = Window.partitionBy(col("sh"))
    val wDoc = Window.partitionBy(col("doc_id"))
    val wRank = Window.partitionBy(col("doc_id"))
      .orderBy(col("df").asc, col("sh").asc)
    rows
      .withColumn("df", count(lit(1)).over(wSh))
      .withColumn("sz", count(lit(1)).over(wDoc))
      .withColumn("rk", row_number().over(wRank))
  }

  /** The PPJoin pipeline over a (doc_id, sh, df, sz, rk) stats frame —
    * shared by the artifact-backed sfDir entry point and the live `Of`
    * form (specs, the sampled recall audit's slice).
    */
  private def prefixJaccardFromStats(
      stats: DataFrame, threshold: Double, maxPrefixDf: Long): DataFrame = {
    val prefix = stats
      .filter(col("rk") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
      .filter(col("df") <= maxPrefixDf)
      .select(col("sh"), col("doc_id"), col("sz"))
    val cand = prefix
      .select(col("sh"), col("doc_id").as("doc_a"), col("sz").as("sz_a"))
      .join(prefix
        .select(col("sh"), col("doc_id").as("doc_b"), col("sz").as("sz_b")),
        Seq("sh"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(least(col("sz_a"), col("sz_b")).cast("double") >=
        lit(threshold) * greatest(col("sz_a"), col("sz_b")).cast("double"))
      .select("doc_a", "doc_b").distinct()
    val sets = stats.groupBy(col("doc_id"))
      .agg(array_sort(collect_set(col("sh"))).as("shset"))
    graft.ops.Materialize.smallLocal(cand
      .join(sets.select(col("doc_id").as("doc_a"), col("shset").as("set_a")),
        Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("shset").as("set_b")),
        Seq("doc_b"))
      .withColumn("jaccard", jaccard(col("set_a"), col("set_b")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy(col("doc_a").asc, col("doc_b").asc))
  }

  /** Asymmetric CONTAINMENT dedup — pairs where one document's shingle
    * set is mostly inside the other's: C(A→B) = |A∩B| / |A| ≥ `threshold`
    * in either direction. Catches what symmetric Jaccard structurally
    * misses: a short document quoted/embedded verbatim inside a long one
    * has containment ≈ 1 but Jaccard ≈ |A|/|B| → 0, so neither MinHash
    * banding nor [[jaccardPrefixPairs]] will pair them. This is the
    * subset-duplication pass a curation pipeline runs AFTER Jaccard
    * dedup (boilerplate wrappers, quoted articles, chunk-of-a-book).
    *
    * Candidate generation is the ONE-SIDED prefix filter: if
    * C(A→B) ≥ t, at most ⌊(1−t)·|A|⌋ of A's shingles miss B, so one of
    * A's ⌊(1−t)·|A|⌋+1 rarest shingles (df asc, sh asc — the global-rank
    * prefix) must appear in B. Each doc's short probe prefix joins the
    * FULL shingle table — never prefix×prefix-only as in the symmetric
    * case, because the container's matching shingle can sit anywhere in
    * its set. Fan-out per prefix row is bounded by the df cap
    * (`maxPrefixDf`, the same documented skew guard as
    * [[jaccardPrefixPairs]]); at t = 0.8 the prefix is ~20% of the
    * corpus's shingle rows. Survivor pairs verify EXACTLY on sorted
    * hash sets via the native merge-intersect — both containments are
    * one exact integer-valued-double divide each, twin-identical.
    *
    * Scale shape: two window exchanges over the shingle table (shared
    * shapes with [[jaccardPrefixPairsOf]]), one df-capped probe join,
    * exact verify on the deduplicated candidate pairs only.
    */
  def containmentPairs(
      spark: SparkSession, sfDir: String, threshold: Double = 0.8,
      maxPrefixDf: Long = 256L): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    containmentFromStats(
      shingleStatsShared(spark, sfDir), threshold, maxPrefixDf)
  }

  /** [[containmentPairs]] over an arbitrary (doc_id, text, ...) frame. */
  def containmentPairsOf(
      docs: DataFrame, threshold: Double = 0.8,
      maxPrefixDf: Long = 256L): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val rows = shingleRowsOf(docs, twinnable = true).distinct().persist()
    try {
      containmentFromStats(statsOf(rows), threshold, maxPrefixDf)
    } finally { rows.unpersist(); () }
  }

  /** The one-sided-prefix containment pipeline over a
    * (doc_id, sh, df, sz, rk) stats frame.
    */
  private def containmentFromStats(
      stats: DataFrame, threshold: Double, maxPrefixDf: Long): DataFrame = {
    val prefix = stats
      .filter(col("rk") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
      .filter(col("df") <= maxPrefixDf)
      .select(col("sh"), col("doc_id").as("probe_id"))
    val cand = prefix
      .join(stats.select(col("sh"), col("doc_id").as("other_id")), Seq("sh"))
      .filter(col("probe_id") =!= col("other_id"))
      .select(
        least(col("probe_id"), col("other_id")).as("doc_a"),
        greatest(col("probe_id"), col("other_id")).as("doc_b"))
      .distinct()
    val sets = stats.groupBy(col("doc_id"))
      .agg(array_sort(collect_set(col("sh"))).as("shset"))
    val inter =
      call_function("graft_isect", col("set_a"), col("set_b")).cast("double")
    graft.ops.Materialize.smallLocal(cand
      .join(sets.select(col("doc_id").as("doc_a"), col("shset").as("set_a")),
        Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("shset").as("set_b")),
        Seq("doc_b"))
      .withColumn("c_a", inter / size(col("set_a")).cast("double"))
      .withColumn("c_b", inter / size(col("set_b")).cast("double"))
      .filter(greatest(col("c_a"), col("c_b")) >= threshold)
      .select(col("doc_a"), col("doc_b"),
        round(col("c_a"), 6).as("containment_a"),
        round(col("c_b"), 6).as("containment_b"))
      .orderBy(col("doc_a").asc, col("doc_b").asc))
  }

  /** Recall audit of the MinHash-LSH candidate generation against the
    * LOSSLESS [[jaccardPrefixPairs]] ground truth: one row — how many
    * true Jaccard-≥-threshold pairs exist, how many the banded signature
    * path found, and the recall. Banding is the probabilistic stage (a
    * pair whose signatures agree in no band is never considered;
    * 16 bands × 4 rows gives ~50% capture odds AT the 0.5 threshold,
    * rising steeply above it), so recall < 1 is expected and this report
    * is how a curation run decides whether to add bands or lower the
    * per-band width. Both sides verify exact Jaccard, so LSH pairs are a
    * subset of the truth (modulo each side's skew cap) and precision is
    * structurally 1 — the single interesting number is recall.
    *
    * Spec-pinned, not oracle-registered: the report is the composition of
    * two already-hash-checked producers (`dedup_minhash`,
    * `jaccard_prefix`); re-running both pipelines to oracle one division
    * would double-charge the bench for zero new verified surface.
    *
    * Scale shape: at 100 TB the lossless side is the expensive one — run
    * this audit on a hash-sampled slice (recall is a per-pair Bernoulli
    * property, so a sample estimates it) rather than the full corpus; the
    * full-corpus form here is exact at test scale.
    */
  def lshRecall(
      spark: SparkSession, sfDir: String, threshold: Double = 0.5,
      maxBucket: Int = 64, maxPrefixDf: Long = 256L): DataFrame =
    recallReport(
      jaccardPrefixPairs(spark, sfDir, threshold, maxPrefixDf),
      minHashPairs(spark, sfDir, threshold, maxBucket, twinnable = true))

  /** The SAMPLED form of [[lshRecall]] its scaladoc prescribes for scale,
    * as a registrable (oracle-checkable) query — and sharper than a
    * slice-rerun: it audits the PRODUCTION pair index. The lossless
    * ground truth runs over a deterministic sha-bucket of documents (keep
    * 1/`sampleMod` by doc_id hash — content-independent, so qualifying
    * pairs land inside the slice with probability 1/mod², an unbiased
    * pair sample), while the LSH side is the corpus-wide shared artifact
    * ([[minHashPairsShared]] — the banding actually deployed, bucket caps
    * and all) restricted to pairs with both endpoints in the slice.
    * Recall is a per-pair Bernoulli property, so the sampled report
    * estimates the corpus number at a fraction of the lossless side's
    * cost — the audit a 100 TB curation run can actually afford per
    * banding decision — and measures the REAL index, not a re-banding of
    * the slice (whose smaller buckets would dodge the caps). Exact over
    * the slice it measures, hence hash-checkable against the DuckDB twin.
    *
    * Measured cost note (sf0.1, local[32]): ~1.4 s, of which the data
    * volume explains almost nothing — the slice is 589 docs and the
    * PPJoin machinery finishes its actual work in milliseconds; the rest
    * is the fixed stage-count overhead of the (deliberately unchanged)
    * production pipeline shape. The 1/mod² cost model governs at scale,
    * where per-stage work dwarfs per-stage overhead; shrinking the local
    * number would mean a special small-slice plan, which would defeat
    * the audit's point of exercising the deployed operators.
    */
  def lshRecallSampled(
      spark: SparkSession, sfDir: String, threshold: Double = 0.5,
      sampleMod: Int = 8, maxPrefixDf: Long = 256L): DataFrame = {
    // the LSH side is the 0.5-verified pair artifact: a lower truth
    // threshold would count pairs in [t, 0.5) — which banding may well
    // have FOUND — as misses, blaming the candidate stage for the verify
    // cut; refuse rather than understate recall (review r12)
    require(threshold >= 0.5,
      s"lshRecallSampled: threshold $threshold below the pair artifact's " +
        "0.5 verify floor would understate banding recall")
    def inSlice(c: Column) = shaBucket(c, sampleMod.toLong) === 0L
    recallReport(
      sliceTruthShared(spark, sfDir, threshold, sampleMod, maxPrefixDf),
      minHashPairsShared(spark, sfDir)
        .filter(inSlice(col("doc_a")) && inSlice(col("doc_b"))))
  }

  /** Recall of the SIMHASH candidate stage (4-chunk banding + hamming ≤
    * `maxHamming`) against the same lossless exact-Jaccard truth
    * [[lshRecallSampled]] audits MinHash with — the third leg of the
    * candidate-generation quality triangle (MinHash / SimHash / prefix
    * filter all measured against one truth on one slice, so their recalls
    * are directly comparable).
    *
    * SimHash targets cosine-of-token-distribution, not Jaccard, so its
    * recall at a Jaccard-0.5 truth is EXPECTED to trail MinHash — that gap
    * is the measurement: it is the number that justifies which family a
    * 100 TB dedup pipeline banks on. Signatures restrict to the slice
    * losslessly (a signature depends only on its own document).
    */
  def simhashRecallSampled(
      spark: SparkSession, sfDir: String, threshold: Double = 0.5,
      sampleMod: Int = 8, maxPrefixDf: Long = 256L,
      maxHamming: Int = 3, maxChunkDocs: Long = 256L): DataFrame = {
    def inSlice(c: Column) = shaBucket(c, sampleMod.toLong) === 0L
    // signatures restrict to the slice losslessly (a signature depends
    // only on its own document), and banding runs SLICE-FIRST so the
    // chunk-bucket census is slice-scoped — the same scope the twin's
    // sliced CTEs compute, which matters now that the census feeds the
    // maxChunkDocs cap
    recallReport(
      sliceTruthShared(spark, sfDir, threshold, sampleMod, maxPrefixDf),
      simHashPairsFromSigs(
        simHashSignaturesShared(spark, sfDir).filter(inSlice(col("doc_id"))),
        maxHamming, 15, maxChunkDocs))
      .withColumnRenamed("n_lsh_pairs", "n_simhash_pairs")
  }

  /** EVIDENCE for each verified near-dup pair — the dedup EXPLAIN: the
    * shared-shingle count and both set sizes behind every pair's
    * Jaccard, so a curation reviewer can see WHY two documents were
    * called duplicates (30 shared shingles out of 31/32 reads very
    * differently from 3 out of 5). Pairs come off the maintained pair
    * artifact, evidence sets off the maintained shingle index; the
    * intersection is the native merge-count expression per pair —
    * |pairs|-bounded work, never corpus-quadratic.
    */
  def pairEvidence(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val sets = shingleStatsShared(spark, sfDir).groupBy(col("doc_id"))
      .agg(array_sort(collect_set(col("sh"))).as("shset"))
    minHashPairsShared(spark, sfDir)
      .join(sets.select(col("doc_id").as("doc_a"), col("shset").as("__sa")),
        Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("shset").as("__sb")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        call_function("graft_isect", col("__sa"), col("__sb"))
          .cast("long").as("shared_shingles"),
        size(col("__sa")).cast("long").as("n_a"),
        size(col("__sb")).cast("long").as("n_b"),
        col("jaccard"))
      .orderBy(col("doc_a").asc, col("doc_b").asc)
  }

  /** The sampled exact-Jaccard TRUTH set as a MAINTAINED artifact — the
    * frozen evaluation set a production pipeline keeps so every
    * candidate-generation family (MinHash banding, SimHash chunks,
    * whatever comes next) is scored against the SAME pairs without
    * re-running the lossless PPJoin per audit. No refresh kernel for
    * the same reason as `minhash_pairs`: pair sets are not
    * compositional under the df cap, so an appended shard re-derives
    * from scratch (the slice is 1/sampleMod of the corpus — cheap).
    * The build parameters are FOLDED INTO the artifact family tag —
    * a truth set is only valid for the (threshold, sampleMod,
    * maxPrefixDf) it was built under, so non-default calls get their
    * own artifact instead of silently reusing a mismatched one.
    */
  private def sliceTruthShared(
      spark: SparkSession, sfDir: String, threshold: Double,
      sampleMod: Int, maxPrefixDf: Long): DataFrame =
    graft.ops.Layout.ensureDerived(spark, sfDir,
      s"slice_truth_${(threshold * 1000).round}_${sampleMod}_$maxPrefixDf",
      Seq("documents.parquet"), "doc_a") {
      jaccardPrefixPairsOf(
        Tables.documents(spark, sfDir)
          .filter(shaBucket(col("doc_id"), sampleMod.toLong) === 0L),
        threshold, maxPrefixDf)
    }

  /** One-row recall report from the lossless truth and the LSH pair list
    * (shared by [[lshRecall]] and [[lshRecallSampled]]).
    */
  private def recallReport(exactPairs: DataFrame, lshPairs: DataFrame): DataFrame = {
    val exact = exactPairs.select(col("doc_a"), col("doc_b"), lit(1).as("__e"))
    val lsh = lshPairs.select(col("doc_a"), col("doc_b"), lit(1).as("__l"))
    exact.join(lsh, Seq("doc_a", "doc_b"), "full_outer")
      .agg(
        count_if(col("__e").isNotNull).as("n_true_pairs"),
        count_if(col("__l").isNotNull).as("n_lsh_pairs"),
        count_if(col("__e").isNotNull && col("__l").isNotNull).as("n_found"))
      .select(col("n_true_pairs"), col("n_lsh_pairs"), col("n_found"),
        when(col("n_true_pairs") === 0L, lit(1.0))
          .otherwise(col("n_found").cast("double") /
            col("n_true_pairs").cast("double")).as("recall"))
  }

  /** Near-dup pairs → duplicate CLUSTERS by connected components
    * (iterative min-label propagation): each doc adopts the smallest label
    * among itself and its neighbors until fixpoint. The missing last step
    * of every pair-producing dedup — transitive closure turns A~B, B~C
    * into one cluster {A,B,C} with one keeper (the min id).
    *
    * Scale shape: each iteration is one join + one groupBy on fixed-width
    * (long, long) rows, persisted per round and unpersisted after the next
    * — the classic large-graph CC loop; rounds needed = graph diameter
    * (near-dup graphs are shallow; `maxIter` bounds pathological chains).
    * Returns (doc_id, cluster_id); singletons keep cluster_id = doc_id.
    *
    * RETENTION (ADVICE r12): on the distributed path each call spills its
    * FINAL doc→cluster mapping to a tmp dir that backs the returned frame
    * — superseded per-round dirs are deleted as the loop advances, but
    * the final dir must outlive the call and is swept only at JVM exit.
    * A long-lived driver running many clusterings therefore retains one
    * dup-graph-sized mapping dir per call; call
    * [[releaseClusterFrames]] once every previously returned cluster
    * frame has been fully consumed to reclaim them early.
    */
  def connectedComponents(
      pairs: DataFrame, allDocs: DataFrame, maxIter: Int = 25,
      driverEdgeLimit: Long = 2_000_000L,
      dropSingletons: Boolean = false): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist()
    // Size-adaptive: the dup graph is ~1e-3 of the corpus, so even huge
    // corpora usually produce an edge list that fits on the driver — then
    // union-find in milliseconds beats diameter-many distributed rounds
    // (each a join+agg job). The loop below remains the scale path for
    // graphs past the limit; both produce the identical min-label result.
    //
    // The probe IS the collect (r13): limit(cap+1) in one typed job
    // replaces the former count() + collect() + distinct-src collect()
    // triple — under the cap everything local (roots and distinct
    // endpoints fall out of the collected tuples), past it only one
    // wasted pass, same as the old count(). Typed (Long, Long) tuples,
    // not GenericRows — roughly 3× lighter on the driver at the limit.
    val spark0 = pairs.sparkSession
    val localEdges = {
      import spark0.implicits._
      edges.select(col("src"), col("dst")).as[(Long, Long)]
        .limit(math.min(driverEdgeLimit, Int.MaxValue - 2L).toInt + 1)
        .collect()
    }
    if (localEdges.length <= driverEdgeLimit) {
      val spark = spark0
      import spark.implicits._
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      // symmetric edges: every endpoint occurs as a src
      val srcSeen = scala.collection.mutable.LongMap.empty[Unit]
      localEdges.foreach { case (s, d) =>
        srcSeen(s) = (); srcSeen(d) = ()
        val (a, b) = (find(s), find(d))
        if (a != b) { if (a < b) parent(b) = a else parent(a) = b }
      }
      val nonRoots = parent.keysIterator.toArray // snapshot: find() compresses paths
      val labeled = nonRoots.map(id => (id, find(id))).toSeq ++
        srcSeen.keysIterator.filterNot(parent.contains).map(id => (id, id))
      edges.unpersist()
      val touched = labeled.toDF("doc_id", "cluster_id")
      // dropSingletons (r13): a consumer that filters cluster_size > 1
      // never reads the singleton tail — every multi-member cluster is
      // made of edge endpoints — so skipping the corpus anti-join +
      // union returns a purely LOCAL frame here and saves a table scan
      // per clustering report
      if (dropSingletons) return touched
      val singletons = allDocs.select(col("doc_id"))
        .join(touched.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("doc_id").as("cluster_id"))
      return touched.unionByName(singletons)
    }
    // Only docs that touch an edge can ever change label — iterate over
    // that (much smaller) frame; the untouched majority joins back as
    // singletons after convergence. At 100 TB this is the difference
    // between looping over the dup graph (~1% of docs) and the corpus.
    //
    // GRAPH CONTRACTION, not plain min-label propagation: each round
    // computes one-hop min labels (+2 pointer jumps), COMPOSES them into
    // the running doc→cluster mapping, and REWRITES the edge list through
    // the labels (drop loops, distinct). Adjacent nodes merge every
    // round, so the edge list shrinks geometrically and convergence is
    // O(log diameter) — plain min-label needs diameter rounds, and a
    // length-±2 near-equality CHAIN gives diameters in the thousands
    // (tier H measured: 25 hop+jump rounds still left 300 labels moving;
    // contraction closes the same graph in 6). The loop ends when the
    // contracted graph has NO edges — every component has collapsed onto
    // its min id, which the per-round min-monotone labels preserve.
    //
    // Each round is PINNED TO STORAGE (parquet spill + read-back): the
    // label frame feeds the round several times, so a persist-only loop
    // grows the logical plan exponentially — tier H measured that as a
    // planner OOM long before any executor ran out. Parquet, not RDD
    // checkpoint: a checkpointed LogicalRDD reports UNKNOWN stats
    // (defaultSizeInBytes = Long.MaxValue) and multiplying that through
    // the round's joins overflows the planner's BigInteger size
    // estimate — a FileScan carries real stats, so round plans stay
    // constant-size. Superseded rounds are deleted as the loop advances
    // (only the final mapping's files back the returned frame); the
    // spill root itself is swept by a JVM shutdown hook.
    val sparkCC = pairs.sparkSession
    val spillRoot = java.nio.file.Files.createTempDirectory("graft_cc").toString
    ccSpillHookInit
    // in-flight registry, not the releasable queue: a concurrent
    // releaseClusterFrames() must never delete files this call is still
    // writing/reading; the root becomes releasable when the call exits
    // (on failure too — an aborted run's frames are never consumed)
    ccInFlight.add(spillRoot)
    try {
    var roundN = 0
    // pin returns the frame AND its backing dir so superseded rounds can
    // be deleted as the loop advances — without the per-round GC a
    // long-lived session running repeated clusterings accumulates one
    // dup-graph-sized dir per round per call until the tmp volume fills
    // (review r12); only the FINAL mapping dir must outlive the call
    // (it backs the returned frame; the shutdown hook sweeps it)
    def pinAt(df: DataFrame): (DataFrame, String) = {
      val p = s"$spillRoot/r$roundN"; roundN += 1
      df.write.mode("overwrite").parquet(p)
      (sparkCC.read.parquet(p), p)
    }
    def rmDir(p: String): Unit = deleteRecursively(new java.io.File(p))
    val (m0, m0p) = pinAt(edges.select(col("src").as("doc_id")).distinct()
      .select(col("doc_id"), col("doc_id").as("cluster_id")))
    var mapping = m0
    var mappingDir = m0p
    // symmetric by construction
    val (c0, c0p) = pinAt(edges.select(col("src"), col("dst")))
    var cur = c0
    var curDir = c0p
    var nCur = cur.count()
    var it = 0
    while (nCur > 0 && it < maxIter) {
      // one-hop min label on the CONTRACTED graph (symmetric edges: every
      // current node appears as a src), then two pointer jumps — cheap
      // self-joins on the label frame that pull labels-of-labels through
      val hop = cur.groupBy(col("src").as("node"))
        .agg(min(col("dst")).as("__nmin"))
        .select(col("node"), least(col("node"), col("__nmin")).as("lbl"))
      var lbl = hop
      for (_ <- 1 to 2) {
        val pl = lbl.select(col("node").as("__p"), col("lbl").as("__pl"))
        lbl = lbl.join(pl, lbl("lbl") === pl("__p"), "left")
          .select(col("node"), coalesce(col("__pl"), col("lbl")).as("lbl"))
      }
      val (lblP, lblDir) = pinAt(lbl)
      // compose: every doc whose current cluster id got relabeled follows it
      val (m1, m1p) = pinAt(mapping
        .join(lblP.select(col("node").as("cluster_id"), col("lbl")),
          Seq("cluster_id"), "left")
        .select(col("doc_id"),
          coalesce(col("lbl"), col("cluster_id")).as("cluster_id")))
      // contract: rewrite endpoints through the labels, drop collapsed
      // (loop) edges, dedup — symmetry is preserved because both
      // orientations of every edge are rewritten
      val (c1, c1p) = pinAt(cur
        .join(lblP.select(col("node").as("src"), col("lbl").as("__ls")),
          Seq("src"), "left")
        .join(lblP.select(col("node").as("dst"), col("lbl").as("__ld")),
          Seq("dst"), "left")
        .select(coalesce(col("__ls"), col("src")).as("src"),
          coalesce(col("__ld"), col("dst")).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct())
      // this round's writes have executed — the superseded dirs (old
      // mapping, old cur, this round's consumed labels) are unreferenced
      Seq(mappingDir, curDir, lblDir).foreach(rmDir)
      mapping = m1; mappingDir = m1p
      cur = c1; curDir = c1p
      nCur = cur.count()
      it += 1
    }
    // Non-convergence must be LOUD: returning partial labels would
    // silently mis-cluster long chains, and every oracle twin computes
    // the TRUE closure.
    if (nCur > 0) {
      edges.unpersist()
      rmDir(spillRoot) // nothing from an aborted run is referenced
      throw new IllegalStateException(
        s"connectedComponents: not converged after $maxIter rounds " +
          s"($nCur contracted edges remain) — raise maxIter; the dup " +
          "graph has a longer chain than expected")
    }
    rmDir(curDir) // converged: the empty edge frame is never read again
    val labels = mapping
    // The converged edge-touching labels are already STORAGE-pinned
    // (dup-graph-sized parquet — survives executor loss, unlike
    // localCheckpoint blocks). The corpus-sized singleton majority stays
    // lazy: it is a pure anti-join against the pinned labels, so nothing
    // corpus-sized is ever materialized here.
    val pinned = labels
    edges.unpersist()
    if (dropSingletons) pinned
    else pinned.unionByName(allDocs.select(col("doc_id"))
      .join(pinned.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("cluster_id")))
    } finally { ccInFlight.remove(spillRoot); ccSpillRoots.add(spillRoot); () }
  }

  /** Driver-registered clustering summary: MinHash pairs → components →
    * clusters with >1 member, with keeper and size. With `twinnable` the
    * whole chain (sha-minhash pairs → transitive closure) is
    * oracle-checked against a recursive-CTE min-label twin.
    */
  /** Per-doc cluster membership (doc_id, cluster_id) backing
    * [[minHashClusters]] and the curation pipeline — singletons carry
    * their own id as the label, so `cluster_id = doc_id` ⇔ the doc is a
    * keeper (cluster representative or untouched).
    */
  def minHashMembership(
      spark: SparkSession, sfDir: String, twinnable: Boolean = false,
      maxIter: Int = 25, driverEdgeLimit: Long = 2_000_000L,
      dropSingletons: Boolean = false): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"))
    connectedComponents(
      minHashPairsUnsorted(spark, sfDir, twinnable = twinnable), docs,
      maxIter, driverEdgeLimit, dropSingletons)
  }

  def minHashClusters(
      spark: SparkSession, sfDir: String, twinnable: Boolean = false,
      maxIter: Int = 25, driverEdgeLimit: Long = 2_000_000L): DataFrame = {
    // dropSingletons: the >1 filter below never reads the singleton tail
    val cc = minHashMembership(spark, sfDir, twinnable, maxIter,
      driverEdgeLimit, dropSingletons = true)
    cc.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"), min(col("doc_id")).as("keeper_doc_id"))
      .filter(col("cluster_size") > 1)
      .select("cluster_id", "keeper_doc_id", "cluster_size")
      .orderBy(col("cluster_id").asc)
  }

  /** Candidate pairs within (lang, 64-char length bucket) blocks, with
    * oversized blocks sub-bucketed: a block larger than `maxBlock` splits
    * into ceil(size / maxBlock) hash-assigned sub-blocks and pairs form
    * only WITHIN a sub-block. That bounds the per-key quadratic term —
    * total candidates grow ~size × maxBlock per block instead of size² —
    * so a dominant-language 100 TB corpus cannot turn one block into a
    * cross product. Blocks at or under the cap are unaffected (exact).
    */
  private[ext] def blockedPairs(docs: DataFrame, maxBlock: Int): DataFrame = {
    val blocks = docs.select(col("doc_id"), col("lang"),
      (col("n_chars") / 64).cast("int").as("len_bucket"))
    // block census is tiny (langs × length buckets) — broadcasts back
    val nSub = blocks.groupBy("lang", "len_bucket")
      .agg(ceil(count(lit(1)).cast("double") / maxBlock).cast("int").as("__n_sub"))
    val subbed = blocks
      .join(broadcast(nSub), Seq("lang", "len_bucket"))
      .withColumn("sub",
        pmod(xxhash64(col("doc_id"), lit(17)), col("__n_sub")).cast("int"))
      .select("doc_id", "lang", "len_bucket", "sub")
    subbed.select(col("lang"), col("len_bucket"), col("sub"), col("doc_id").as("doc_a"))
      .join(subbed.select(col("lang"), col("len_bucket"), col("sub"), col("doc_id").as("doc_b")),
        Seq("lang", "len_bucket", "sub"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "lang")
  }

  /** Exact n-gram Jaccard within cheap blocks (same lang + 64-char length
    * bucket): the brute-force-within-block baseline the LSH variants
    * approximate. Pairs are id-only until the hashed shingle sets attach;
    * oversized blocks are sub-bucketed (see [[blockedPairs]] — a no-op at
    * the default cap for every provided scale factor, so the oracle twin
    * models the uncapped join).
    *
    * Oracle-checked: Jaccard over 64-bit-hashed shingle sets equals
    * Jaccard over the shingle STRING sets absent hash collisions
    * (probability ~n²/2⁶⁵ per pair), so the DuckDB twin computes the
    * string-set form directly.
    */
  def ngramJaccardPairs(
      spark: SparkSession, sfDir: String, threshold: Double = 0.3,
      maxBlock: Int = 512): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val pairs = blockedPairs(Tables.documents(spark, sfDir), maxBlock)
    // verify sets come from the maintained shingle_stats artifact (sha
    // hash family) — set Jaccard is hash-family-invariant, and the
    // doc_id-bucketed table makes the collect_set exchange-free with no
    // per-call tokenize pass or cache entry.
    val sets = shingleStatsShared(spark, sfDir).groupBy(col("doc_id"))
      .agg(array_sort(collect_set(col("sh"))).as("shset"))
    graft.ops.Materialize.smallLocal(pairs
      .join(sets.select(col("doc_id").as("doc_a"), col("shset").as("set_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("shset").as("set_b")), Seq("doc_b"))
      .withColumn("jaccard", jaccard(col("set_a"), col("set_b")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "lang", "jaccard")
      .orderBy(col("doc_a").asc, col("doc_b").asc))
  }

  /** Exact-substring near-dup pairs — the ExactSubstr family (Lee et al.
    * 2022, "Deduplicating Training Data Makes Language Models Better")
    * re-expressed relationally: two documents pair iff they share an exact
    * run of `spanTokens` consecutive tokens. EVERY token position starts a
    * span (stride 1 — a strided emission cannot see shared runs that sit
    * at different offsets in the two documents), assembled with window
    * leads like [[shingleRows]] and reduced to a 64-bit hash immediately,
    * so the corpus-sized intermediate is fixed-width (doc_id, span_hash)
    * rows — the suffix-array byte cost of the original, paid as one
    * windowed pass + hash shuffles instead.
    *
    * Boilerplate guard: spans present in more than `maxDocsPerSpan`
    * documents (site chrome, license text) are dropped before pairing —
    * standard practice, and the bound that keeps pair counts linear in
    * corpus size (each surviving span yields < maxDocsPerSpan² pairs).
    * The guard is plain relational algebra, so the DuckDB twin reproduces
    * it exactly, joining on span TEXT — equivalent to the hash join absent
    * 64-bit collisions (~n²/2⁶⁵ per span set, same argument as
    * [[ngramJaccardPairs]]).
    */
  /** Distinct (doc_id, span_h) rows — every `spanTokens`-token run, stride
    * 1, hashed to 64 bits (see [[spanPairs]] for why stride 1 and why the
    * span string never materializes). Shared by the pair producer and the
    * stats/summary views so all three see the identical span relation.
    */
  private def docSpans(
      spark: SparkSession, sfDir: String, spanTokens: Int): DataFrame =
    docSpansOf(Tables.documents(spark, sfDir), spanTokens)

  private def docSpansOf(docs: DataFrame, spanTokens: Int): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos").asc)
    // hash each token ONCE, then combine the 16 lead LONGS — ~100-char
    // span strings never materialize, the window moves fixed-width rows
    val hashLeads = (1 until spanTokens).map(i => lead(col("__th"), i).over(w))
    tokenRowsOf(docs)
      .withColumn("__th", xxhash64(col("tok")))
      .withColumn("span_h", xxhash64((col("__th") +: hashLeads): _*))
      // complete spans only: the last lead exists ⇒ all of them do.
      // (multi-arg xxhash64 SKIPS nulls, so an unfiltered tail window
      // would hash like a genuine short span and false-match.)
      .withColumn("__full", lead(col("__th"), spanTokens - 1).over(w).isNotNull)
      .filter(col("__full"))
      .select(col("doc_id"), col("span_h"))
      .distinct()
  }

  /** The default-width span relation as a MAINTAINED derived table,
    * bucketed on span_h so every consumer's `groupBy(span_h)` census is
    * exchange-free. Spans are per-doc deterministic, so the
    * `minhash_sig` append-only contract applies: a landed shard derives
    * spans for ITS docs only and unions onto the committed relation
    * (old rows win on a repeated id). Three registered queries
    * (`span_dedup`, `span_stats`, `span_doc_summary`) read this instead
    * of re-tokenizing and re-windowing the corpus per call.
    */
  private[graft] def spanRowsShared(
      spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.Layout.ensureDerived(spark, sfDir, "span_rows",
      Seq("documents.parquet"), "span_h",
      // partition-level append: a landed shard's spans are NEW rows only
      // (old rows win on a repeated id), so the committed relation
      // hardlinks forward and only the delta is written — never a
      // corpus-sized rewrite per ingest epoch
      refreshDelta = Some { ctx =>
        docSpansOf(
          spark.read.parquet(ctx.addedFiles: _*), SpanTokensDefault)
          .join(ctx.oldArtifact.select(col("doc_id")), Seq("doc_id"),
            "left_anti")
      }) {
      docSpansOf(Tables.documents(spark, sfDir), SpanTokensDefault)
    }

  private[graft] val SpanTokensDefault = 16

  /** Span relation for a consumer: the shared artifact at the default
    * width, a live derivation for any other width (the width is part of
    * the relation's identity — a non-default ask must not silently read
    * default-width spans).
    */
  private def spansFor(
      spark: SparkSession, sfDir: String, spanTokens: Int): DataFrame =
    if (spanTokens == SpanTokensDefault) spanRowsShared(spark, sfDir)
    else docSpans(spark, sfDir, spanTokens)

  def spanPairs(
      spark: SparkSession, sfDir: String,
      spanTokens: Int = 16, maxDocsPerSpan: Int = 32): DataFrame = {
    val spans = spansFor(spark, sfDir, spanTokens)
    val eligible = spans.groupBy(col("span_h"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > 1 && col("n_docs") <= maxDocsPerSpan)
      .select("span_h")
    val inSpan = spans.join(eligible, Seq("span_h"), "left_semi")
    inSpan.select(col("span_h"), col("doc_id").as("doc_a"))
      .join(inSpan.select(col("span_h"), col("doc_id").as("doc_b")), Seq("span_h"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared_spans"))
      .orderBy(col("doc_a").asc, col("doc_b").asc)
  }

  /** What the [[spanPairs]] boilerplate cap ATE — one summary row so a
    * curation run can see the cliff instead of silently losing pairs: a
    * span shared by `maxDocsPerSpan` docs contributes ~cap²/2 pairs, one
    * shared by cap+1 contributes zero. Candidate pairs are counted in
    * closed form (Σ n·(n−1)/2 over eligible spans) — no pair join runs.
    */
  def spanStats(
      spark: SparkSession, sfDir: String,
      spanTokens: Int = 16, maxDocsPerSpan: Int = 32): DataFrame = {
    val grouped = spansFor(spark, sfDir, spanTokens)
      .groupBy(col("span_h"))
      .agg(count(lit(1)).as("n_docs"))
    val eligible = col("n_docs") > 1 && col("n_docs") <= maxDocsPerSpan
    grouped.agg(
      count(lit(1)).as("n_spans_distinct"),
      sum(when(col("n_docs") > 1, 1L).otherwise(0L)).as("n_spans_shared"),
      sum(when(col("n_docs") > maxDocsPerSpan, 1L).otherwise(0L))
        .as("n_spans_dropped"),
      sum(when(eligible,
        (col("n_docs") * (col("n_docs") - 1) / 2).cast("long"))
        .otherwise(0L)).as("candidate_pairs"))
  }

  /** Per-document dup-span exposure — the corpus-LINEAR view ExactSubstr
    * deployments actually consume (pair lists grow with dup density; this
    * stays one row per doc at any scale): how many of a doc's spans appear
    * in at least one other document, as a fraction. Counts shared spans
    * regardless of the pair-emission cap — the cap bounds the quadratic
    * pair join, not the linear exposure measure.
    */
  def spanDocSummary(
      spark: SparkSession, sfDir: String, spanTokens: Int = 16): DataFrame = {
    val spans = spansFor(spark, sfDir, spanTokens)
    val counts = spans.groupBy(col("span_h"))
      .agg(count(lit(1)).as("__n_docs"))
    val perDoc = spans.join(counts, Seq("span_h"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("__n_docs") > 1, 1L).otherwise(0L)).as("n_dup_spans"))
    // left join from documents: short docs (< spanTokens tokens) have no
    // spans but still belong in the per-doc report
    Tables.documents(spark, sfDir).select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        when(coalesce(col("n_spans"), lit(0L)) === 0L, lit(0.0))
          .otherwise(round(
            col("n_dup_spans").cast("double") / col("n_spans").cast("double"), 6))
          .as("dup_span_frac"))
      .orderBy(col("doc_id").asc)
  }

  /** WINNOWING fingerprint selection (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003 — the MOSS algorithm): hash every word `k`-gram, slide
    * a window of `w` consecutive gram hashes over each document, and
    * select each window's minimum (rightmost occurrence on ties). The
    * guarantee winnowing buys over "sample every Nth hash": EVERY match
    * of at least w + k − 1 tokens between two documents shares at least
    * one SELECTED fingerprint, while storage drops to ~2/(w+1) of the
    * gram count. This is the local-similarity primitive between
    * [[fingerprints]]' one-hash-per-doc sketch and the full span relation
    * ([[spanPairs]]): positional, sampled, and detection-complete above
    * the guarantee threshold.
    *
    * Cross-engine exactness: gram hashes are the twinnable sha-256
    * 15-hex-char prefix; the per-window argmin is ONE lexicographic
    * string min over `hash ‖ zero-padded(MAX_POS − pos)` — fixed width,
    * so smallest hash wins and ties resolve to the LARGEST position
    * (the rightmost rule) in both engines with no struct/argmin
    * builtin needed. Only complete windows (gram index ≥ w−1) select.
    *
    * Scale shape: tokenize → k−1 window leads → one more window min over
    * the same doc-partitioned sort (ONE exchange total — every window
    * shares the (doc_id, pos) ordering) → distinct. Output is the
    * selected-fingerprint relation at winnowing density, ~2/(w+1) of the
    * gram rows.
    */
  private[graft] def winnowSelectedOf(
      docs: DataFrame, k: Int = 4, w: Int = 4): DataFrame = {
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos").asc)
    val gramToks = (1 until k).map(i => lead(col("tok"), i).over(win))
    val grams = tokenRowsOf(docs)
      .withColumn("__last", lead(col("tok"), k - 1).over(win))
      .withColumn("__gram", concat_ws(" ", (col("tok") +: gramToks): _*))
      // complete k-grams only: the last lead exists ⇒ all of them do
      // (concat_ws would silently shorten tail grams otherwise)
      .filter(col("__last").isNotNull)
      .select(col("doc_id"), col("pos"),
        substring(sha2(col("__gram"), 256), 1, 15).as("hh"))
    // grams sit at CONSECUTIVE positions 0..n−k, so "the window ending
    // here spans w grams" is simply pos ≥ w−1 — no row_number needed.
    // The 9-digit complement encoding is total only for pos < 1e9
    // (lpad TRUNCATES beyond its length, which would corrupt the
    // tie-break silently); a billion-token single document is beyond any
    // real corpus row, so reject it loudly instead of mis-selecting.
    val selWin = win.rowsBetween(-(w - 1), 0)
    val compl = when(col("pos") < lit(999999999),
        (lit(999999999) - col("pos")).cast("string"))
      .otherwise(raise_error(
        lit("winnowing: gram position exceeds the 9-digit complement encoding")))
    grams
      .withColumn("__enc", concat(col("hh"), lpad(compl, 9, "0")))
      .withColumn("__sel", min(col("__enc")).over(selWin))
      .filter(col("pos") >= w - 1)
      .select(col("doc_id"),
        (lit(999999999L) - substring(col("__sel"), 16, 9).cast("long"))
          .as("pos"),
        substring(col("__sel"), 1, 15).as("fp"))
      .distinct()
  }

  private[graft] val WinnowK = 4
  private[graft] val WinnowW = 4

  /** The default-parameter winnowed-selection relation as a MAINTAINED
    * derived table, bucketed on fp so [[winnowPairs]]' census and pair
    * join are exchange-free. Selection is per-doc deterministic (each
    * doc's windows see only its own grams), so the `minhash_sig`
    * append-only contract applies: a landed shard winnows ITS docs only
    * and unions onto the committed relation. (k, w) are part of the
    * relation's identity — non-default asks derive live.
    */
  private[graft] def winnowSelShared(
      spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.Layout.ensureDerived(spark, sfDir, "winnow_sel",
      Seq("documents.parquet"), "fp",
      // partition-level append, same contract as span_rows: delta rows
      // only, committed files hardlink forward
      refreshDelta = Some { ctx =>
        winnowSelectedOf(
          spark.read.parquet(ctx.addedFiles: _*), WinnowK, WinnowW)
          .join(ctx.oldArtifact.select(col("doc_id")), Seq("doc_id"),
            "left_anti")
      }) {
      winnowSelectedOf(Tables.documents(spark, sfDir), WinnowK, WinnowW)
    }

  private def winnowFor(
      spark: SparkSession, sfDir: String, k: Int, w: Int): DataFrame =
    if (k == WinnowK && w == WinnowW) winnowSelShared(spark, sfDir)
    else winnowSelectedOf(Tables.documents(spark, sfDir), k, w)

  /** The selected-fingerprint relation over a deterministic 1/`sampleMod`
    * document slice — the registered, oracle-checkable dump (the full
    * relation is corpus-sized; the slice pins the algorithm exactly while
    * [[winnowPairs]] exercises it corpus-wide). Selection is per-doc, so
    * slicing the maintained relation equals winnowing the sliced corpus.
    */
  def winnowFingerprints(
      spark: SparkSession, sfDir: String, k: Int = 4, w: Int = 4,
      sampleMod: Int = 16, sampleRem: Int = 7): DataFrame =
    winnowFor(spark, sfDir, k, w)
      .filter(pmod(col("doc_id"), lit(sampleMod.toLong)) === sampleRem.toLong)
      .orderBy(col("doc_id").asc, col("pos").asc, col("fp").asc)

  /** Document pairs sharing winnowed fingerprints — MOSS-style local
    * plagiarism/copy detection at corpus scale: every verbatim overlap of
    * ≥ w + k − 1 tokens surfaces here (the winnowing guarantee), ranked
    * by how many selected fingerprints the pair shares.
    *
    * Pair production is bounded exactly like [[spanPairs]]: fingerprints
    * shared by more than `maxDocsPerFp` documents are boilerplate (their
    * pair lists grow quadratically and identify nothing) and are dropped
    * from pairing — the df cap documented on every blocked dedup in this
    * family. Pairs below `minShared` shared fingerprints are noise cut.
    */
  def winnowPairs(
      spark: SparkSession, sfDir: String, k: Int = 4, w: Int = 4,
      maxDocsPerFp: Int = 64, minShared: Long = 2L): DataFrame = {
    // selection comes off the maintained fp-bucketed artifact at the
    // default (k, w): the census, both join sides, and the pair groupBy
    // all inherit the fp partitioning
    val sel = winnowFor(spark, sfDir, k, w)
      .select(col("doc_id"), col("fp")).distinct()
    val eligible = sel.groupBy(col("fp"))
      .agg(count(lit(1)).as("__n_docs"))
      .filter(col("__n_docs") > 1 && col("__n_docs") <= maxDocsPerFp)
      .select(col("fp"))
    val hits = sel.join(eligible, Seq("fp"))
    hits.select(col("fp"), col("doc_id").as("doc_a"))
      .join(hits.select(col("fp"), col("doc_id").as("doc_b")), Seq("fp"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy(col("doc_a").asc, col("doc_b").asc)
  }

  /** Connected components over an EXACT, SQL-expressible pair relation —
    * the oracle anchor for the pairs→clusters chain ([[connectedComponents]]
    * is otherwise only reachable through hash-seeded MinHash pairs, which
    * no SQL engine can twin). Pairs: same lang, |n_chars delta| ≤ 2 — a
    * deliberately NON-transitive relation, so components have real
    * multi-hop chains, not just cliques.
    *
    * Scale shape: the near-equality join is banded — n_chars buckets of
    * width 4, the left side probing its two feasible buckets — so the
    * shuffle key is (lang, bucket) and no cross product forms. The DuckDB
    * twin verifies the full chain with a recursive min-label CTE.
    */
  def exactPairClusters(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "lang", "n_chars")
    // each left row probes the (at most 2) buckets a partner within ±2 can
    // occupy; the right side sits in exactly one — every pair matches once
    val probes = docs.select(col("doc_id").as("doc_a"),
        col("lang"), col("n_chars").as("nc_a"),
        explode(array_distinct(array(
          floor((col("n_chars") - 2) / 4), floor((col("n_chars") + 2) / 4))))
          .as("__b"))
    val anchors = docs.select(col("doc_id").as("doc_b"),
      col("lang"), col("n_chars").as("nc_b"),
      floor(col("n_chars") / 4).as("__b"))
    val pairs = probes.join(anchors, Seq("lang", "__b"))
      .filter(abs(col("nc_a") - col("nc_b")) <= 2 && col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
    // dropSingletons: the >1 filter below never reads the singleton tail
    val cc = connectedComponents(pairs, docs.select("doc_id"),
      dropSingletons = true)
    cc.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"), min(col("doc_id")).as("keeper_doc_id"))
      .filter(col("cluster_size") > 1)
      .select("cluster_id", "keeper_doc_id", "cluster_size")
      .orderBy(col("cluster_id").asc)
  }

  /** Top boilerplate n-grams: the word n-grams appearing in the most
    * DISTINCT documents — the ranked strip-list a template-removal pass
    * consumes (nav bars, license footers, cookie banners at web scale).
    * [[spanStats]] reports the aggregate cost of such spans; this emits
    * the actual offenders.
    *
    * Scale shape: the census aggregates on an 8-byte xxhash64 of each
    * gram, NOT the gram string — the (doc, gram)-distinct shuffle moves
    * fixed-width longs, an order of magnitude narrower than ~100-char
    * spans at web scale. Gram TEXT is recovered afterwards by a second
    * scan semi-joined against the topK winning hashes (broadcast, ≤ topK
    * rows) — strings only ever materialize for winners. Ranking ties and
    * the `first_doc_id` witness stay exact because the per-hash agg
    * carries `min(gram)`/`min(doc_id)` alongside the count (a 64-bit
    * collision would need ~4B distinct grams; the min-gram tiebreak keeps
    * even that deterministic).
    */
  def boilerplateNgrams(
      spark: SparkSession, sfDir: String,
      n: Int = 8, minDf: Int = 3, topK: Int = 50): DataFrame = {
    // grams assembled from EXPLODED token rows with window leads. Two r13
    // notes: (1) the projected-array slice form re-ran the split per
    // inlined reference (r12 review — the file-header pitfall); (2) the
    // CARRIED-array element_at form that won for the n ≤ 3 gram sites
    // (shingleRowsOf, pmi/kn bigrams) benched 1.03→1.16 s HERE at a
    // matched sentinel — at n = 8 the per-row element_at fan-out costs
    // more than the one fixed-width window exchange it removes. Rows
    // whose (n−1)-th lead is null are the < n-token tails — excluded,
    // matching the slice() form's exact-n grams.
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos").asc)
    val leads = (1 until n).map(j => lead(col("tok"), j).over(w).as(s"__l$j"))
    def docGramRows = tokenRows(spark, sfDir)
      .select((Seq(col("doc_id"), col("tok")) ++ leads): _*)
      .filter(col(s"__l${n - 1}").isNotNull)
      .select(col("doc_id"), concat_ws(" ",
        (col("tok") +: (1 until n).map(j => col(s"__l$j"))): _*).as("gram"))
    // gram TEXT rides the census (two-level min — min per (gram_h, doc)
    // then min per gram_h — equals the former post-cut min over all gram
    // rows), so the report needs NO second tokenize+window pass: the r13
    // rewrite drops one full corpus scan + doc_id window shuffle + semi
    // join for ~4× wider level-1 aggregation rows (gram strings instead
    // of (doc_id, hash) pairs) — a pass removed for a byte-width bump,
    // guide §2.4 over §2.3. Values are hash-unchanged at both SFs.
    val winners = docGramRows
      .select(col("doc_id"), xxhash64(col("gram")).as("gram_h"), col("gram"))
      .groupBy(col("gram_h"), col("doc_id"))
      .agg(min(col("gram")).as("gram"))
      .groupBy(col("gram_h"))
      .agg(count(lit(1)).as("doc_freq"), min(col("doc_id")).as("first_doc_id"),
        min(col("gram")).as("gram"))
      .filter(col("doc_freq") >= minDf)
      .persist() // call-scoped: the census feeds the cut, the cands, the report
    try {
      // exact candidate cut: everything at or above the topK-th doc_freq —
      // boundary TIES are all kept so the final string-order tiebreak sees
      // every contender (a fixed headroom would silently drop ties). A
      // bounded 1-row action inlined as a literal (the Search.scala stat
      // idiom — a joined scalar here degrades to a nested-loop join).
      val cut = winners.orderBy(col("doc_freq").desc).limit(topK)
        .agg(min(col("doc_freq")).as("cut"))
        .collect().headOption.flatMap(r => Option(r.get(0))) match {
          case Some(v) => v.asInstanceOf[Long]
          case None    => return winners
            .select(lit("").as("gram"), col("doc_freq"), col("first_doc_id"))
            .limit(0)
        }
      val cands = winners.filter(col("doc_freq") >= lit(cut))
      // ≤ topK rows hang off the call-scoped cache — driver-materialize
      // before unpersisting (the smallLocal idiom, not localCheckpoint)
      graft.ops.Materialize.smallLocal(
        cands
          .select(col("gram"), col("doc_freq"), col("first_doc_id"))
          .orderBy(col("doc_freq").desc, col("gram").asc)
          .limit(topK))
    } finally winners.unpersist()
  }
}
