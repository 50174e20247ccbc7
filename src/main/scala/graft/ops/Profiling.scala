package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Data-quality profiling — the schema-level health report an ingest
  * pipeline runs before trusting a new drop of data. The reference's
  * closest analog is its admin dashboard counts
  * (`/root/reference/src/routes/admin.ts:20-45`); this generalizes that
  * to a per-column census of any table.
  */
object Profiling {

  /** Per-column profile: null count and exact distinct count for every
    * column, as one long-format report (column_name, n_nulls,
    * n_distinct). Integer-only output — min/max/mean are omitted on
    * purpose: their string rendering is engine-specific (float and
    * timestamp formatting), while the counts are exact in any engine.
    *
    * Scale shape: ONE aggregate job over the table — Spark plans the
    * multi-column distinct set via a single Expand (one row per distinct
    * column group, here `2 × n_cols`), then a map-side-combinable
    * hash-agg; the result is one row, pivoted to long form on the driver
    * side of the plan by `stack`. At 100 TB swap the exact distincts for
    * approx_count_distinct to drop the Expand to a single HLL pass; exact
    * here for oracle parity.
    */
  def columnProfile(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap { c =>
      Seq(
        count_if(col(c).isNull).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__distinct_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols
      .map(c => s"'$c', `__nulls_$c`, `__distinct_$c`")
      .mkString(", ")
    row
      .select(expr(
        s"stack(${cols.size}, $stacked) AS (column_name, n_nulls, n_distinct)"))
      .orderBy(col("column_name").asc)
  }

  /** [[columnProfile]] over the `orders` table — the registered,
    * oracle-checked instance.
    */
  def ordersProfile(spark: SparkSession, sfDir: String): DataFrame =
    columnProfile(Tables.orders(spark, sfDir))

  /** Per-shard content checksums of the documents table — the
    * anti-entropy primitive: two replicas (clusters, DCs, a pre- and
    * post-migration copy) each run this locally and compare the tiny
    * report; a mismatched shard pinpoints where to run the expensive
    * row-level diff ([[graft.ext.Corpus]]' snapshot diff), so the full
    * corpora never move. Classic Merkle-leaf / Cassandra-repair shape.
    *
    * Shard = sha-derived hash of doc_id mod `nShards` (content-independent
    * placement); per shard, two ORDER-INDEPENDENT digests over the
    * (doc_id, text) content hash: bit_xor of the 60-bit hashes and a sum
    * of their mod-1e9+7 residues (two independent algebras — a collision
    * in one is caught by the other), plus the row count. Everything is
    * sha-256-derived integer arithmetic, so any engine reproduces it.
    *
    * Scale shape: one projection pass (text hashed at the scan, only
    * fixed-width longs shuffle) + a `nShards`-row hash-agg; both digests
    * are map-side combinable — at 100 TB this is scan-bound, exactly one
    * pass per replica, zero data movement between them.
    */
  def shardChecksums(
      spark: SparkSession, sfDir: String, nShards: Int = 8): DataFrame = {
    val contentHash = conv(substring(
      sha2(concat_ws("|", col("doc_id"), col("text")), 256), 1, 15), 16, 10)
      .cast("long")
    val shard = pmod(conv(substring(
      sha2(col("doc_id").cast("string"), 256), 1, 8), 16, 10).cast("long"),
      lit(nShards.toLong))
    Tables.documents(spark, sfDir)
      .select(shard.as("shard"), contentHash.as("__h"))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        bit_xor(col("__h")).as("xor_digest"),
        sum(pmod(col("__h"), lit(1000000007L))).as("mod_digest"))
      .orderBy(col("shard").asc)
  }

  /** Population-stability-index drift report between a REFERENCE corpus
    * slice and a CURRENT slice — the standard ingest-monitoring check
    * that a newly landed shard still looks like the corpus it joins
    * (paired with the append-only artifact refresh: refresh the index,
    * then gate on drift). Documents bucket by length (`n_chars div
    * widthChars`, capped into the top bucket); per bucket the report
    * carries both slices' counts, smoothed fractions, and the PSI term
    * `(p−q)·ln(p/q)`; Σ psi_term ≥ 0.2 is the conventional "investigate"
    * line. Fractions are floored at ε=1e-4 (the standard PSI smoothing —
    * an ε on the FRACTION, not the count, so a bucket empty on both
    * sides contributes exactly 0 regardless of slice-size imbalance),
    * and a generated 0..nBuckets−1 spine fixes the row count so the
    * report is schema-stable even when a bucket is empty on both sides.
    *
    * The slices are carved deterministically (`doc_id % 10`: 9 = current,
    * else reference) so the oracle twin reproduces them; in production
    * the two inputs are the corpus and the candidate shard.
    *
    * Determinism: counts are exact; fractions are single divisions of
    * integers; only ln crosses engines and is rounded to 6dp before the
    * final product, the ln convention.
    * Scale shape: one scan, one tiny groupBy, a broadcast spine join.
    */
  def psiDrift(
      spark: SparkSession, sfDir: String,
      nBuckets: Int = 10, widthChars: Int = 200): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val bucket = least(lit(nBuckets - 1L),
      expr(s"n_chars div $widthChars")).as("len_bucket")
    val counts = docs
      .select(bucket, (col("doc_id") % 10 === 9).as("is_cur"))
      .groupBy(col("len_bucket"))
      .agg(
        count_if(!col("is_cur")).as("n_ref"),
        count_if(col("is_cur")).as("n_cur"))
    val spine = spark.range(nBuckets).select(col("id").as("len_bucket"))
    val totals = counts.agg(
      sum(col("n_ref")).as("__tr"), sum(col("n_cur")).as("__tc"))
    val joined = spine
      .join(counts, Seq("len_bucket"), "left")
      .select(col("len_bucket"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      .crossJoin(broadcast(totals))
    val eps = lit(1e-4)
    // totals floor at 1: an EMPTY slice otherwise divides 0/0 into NaN
    // (all its counts are 0, so the floor changes nothing when rows exist)
    val p = greatest(col("n_ref").cast("double") /
      greatest(col("__tr"), lit(1L)).cast("double"), eps)
    val q = greatest(col("n_cur").cast("double") /
      greatest(col("__tc"), lit(1L)).cast("double"), eps)
    joined.select(
      col("len_bucket"), col("n_ref"), col("n_cur"),
      round(p, 6).as("ref_frac"),
      round(q, 6).as("cur_frac"),
      round((p - q) * round(log(p / q), 6), 6).as("psi_term"))
      .orderBy(col("len_bucket").asc)
  }

  /** Referential-integrity audit across the warehouse's declared
    * foreign keys — the ingest gate that catches a partial drop (orphan
    * children) or an over-filtered extract (unreferenced parents)
    * before a pipeline run trusts the data. One row per FK edge:
    * child row count, orphan child rows (fk value with no parent),
    * parent key count, parents never referenced. All integers.
    *
    * Scale shape (the round-7 fused form): each CHILD table is scanned
    * exactly ONCE even when it declares several FKs — every row explodes
    * into one (edge, key) pair per declared FK and a map-side-combined
    * aggregation collapses each edge to its key domain with per-key row
    * counts (lineitem's three edges previously cost six full scans of
    * the biggest table: one orphan anti-join + one distinct anti-join
    * each). One shuffled FULL-OUTER join of that domain against the
    * tagged parent-key union then yields orphans (parent side null) and
    * unreferenced parents (child side null) in the same pass, and a
    * final per-edge aggregation emits the |edges|-row report. Parent
    * keys are primary keys (unique), so counting matched parent rows
    * equals counting parent rows.
    */
  def fkAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = Seq(
      ("lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
      ("orders", "o_custkey", "customer", "c_custkey"),
      ("customer", "c_nationkey", "nation", "n_nationkey"),
      ("nation", "n_regionkey", "region", "r_regionkey"))
    // integer edge ids through the hot path (an 18M-row shuffle key must
    // not carry a 25-byte string tag); names re-attach on the 6-row report
    val eid = edges.zipWithIndex.toMap
    val childAgg = edges.groupBy(_._1).toSeq.map { case (ct, es) =>
      val pairs = es.map { e =>
        struct(lit(eid(e)).as("edge"), col(e._2).cast("long").as("k"))
      }
      Tables.table(spark, sfDir, ct)
        .select(explode(array(pairs: _*)).as("e"))
        .select(col("e.edge").as("edge"), col("e.k").as("k"))
        .groupBy(col("edge"), col("k"))
        .agg(count(lit(1)).as("cnt"))
    }.reduce(_ unionByName _)
    val parentKeys = edges.map { e =>
      Tables.table(spark, sfDir, e._3)
        .select(lit(eid(e)).as("edge"), col(e._4).cast("long").as("pk"))
    }.reduce(_ unionByName _)
    def nameOf(part: ((String, String, String, String)) => String): Column =
      element_at(array(edges.map(e => lit(part(e))): _*), col("edge") + 1)
    childAgg
      .join(parentKeys,
        childAgg("edge") === parentKeys("edge") &&
          childAgg("k") === parentKeys("pk"), "full_outer")
      .select(
        coalesce(childAgg("edge"), parentKeys("edge")).as("edge"),
        col("cnt"), col("pk"))
      .groupBy(col("edge"))
      .agg(
        coalesce(sum(col("cnt")), lit(0L)).as("n_child_rows"),
        coalesce(sum(when(col("pk").isNull, col("cnt"))), lit(0L))
          .as("n_orphan_child_rows"),
        count(col("pk")).as("n_parent_keys"),
        count(when(col("cnt").isNull && col("pk").isNotNull, lit(1)))
          .as("n_unreferenced_parents"))
      .select(
        nameOf(_._1).as("child_table"), nameOf(_._2).as("fk_column"),
        nameOf(_._3).as("parent_table"),
        col("n_child_rows"), col("n_orphan_child_rows"),
        col("n_parent_keys"), col("n_unreferenced_parents"))
      .orderBy(col("child_table").asc, col("fk_column").asc)
  }
}
