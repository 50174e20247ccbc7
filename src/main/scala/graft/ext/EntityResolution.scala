package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Entity resolution (record linkage) over the `part` catalog: find
  * name variants that refer to the same product ("small ring" vs a
  * one-typo sibling), cluster them, and elect a golden record per
  * entity. The operator family every catalog/CRM-scale pipeline needs;
  * the reference's data model (free-text titles keyed by surrogate ids)
  * is exactly the shape that accumulates such variants.
  *
  * THE scale decision: resolve in the DISTINCT-VALUE space, never the
  * row space. A 100 TB catalog has billions of rows but a
  * vocabulary-bounded set of distinct names (the fixture makes the
  * point brutally: 2 000 parts, 64 distinct names — row-space pairing
  * would emit C(k,2) per repeated name, millions of lev-0 "matches"
  * that mean nothing). So: group to distinct names first (hash-agg,
  * map-side combinable), match THAT frame, and broadcast the resulting
  * canonical map back over the rows. Each distinct name gets a stable
  * numeric id = min(p_partkey) carrying it — deterministic, so the
  * DuckDB twin reproduces ids exactly.
  *
  * Matching is BLOCKED, not all-pairs. At the verified τ=1 both ER
  * match legs block on the 1-DELETION NEIGHBORHOOD (SymSpell): a name's
  * keys are itself plus its |s| delete-one variants — |s|+1 keys,
  * linear in name length, independent of vocabulary size — and block
  * width is bounded by the true near-duplicate density around a
  * surface form, NOT by token popularity. That distinction is the
  * whole 100 TB story: the earlier (position, token) blocking put
  * every name sharing a popular token in one block, so candidate
  * pairs grew with Σ C(block, 2) — quadratic in the popularity of
  * "premium"/"pro"/"mini" as the vocabulary scales (stress tier O
  * measures the two side by side). The oracle twin is the BRUTE-FORCE
  * all-pairs join, so every CORRECTNESS run re-proves losslessness.
  * τ ≥ 2 keeps the (position, token) path (delete-1 keys are lossless
  * only at distance 1) — documented as recall-heuristic there, with
  * the df-cap + multi-key discipline `span_dedup`/`winnow_pairs`
  * already use as the scale path.
  */
object EntityResolution {

  /** Distinct names with their stable ids and row support:
    * (p_name, name_id = min partkey, n_parts) — served from the
    * maintained `name_census` artifact. This is the ER family's scale
    * hinge: every ER leg starts from this frame, and without the
    * artifact each query re-runs the full catalog scan + vocabulary
    * hash-agg — at 100 TB, a corpus-wide pass per entity-resolution
    * query (the same per-query-rescan class tier N caught in
    * `ivfTopKTrained`). With it, the scan runs once per corpus state;
    * an appended part shard contributes a GENERATIONAL delta (its own
    * per-name min/count — rows that may repeat committed names, which
    * is what disqualifies the strictly-new `refreshDelta` form), and
    * consumers collapse generations at read with the algebraic merge —
    * min of mins, sum of counts — bit-identical to a full rebuild
    * because both aggregates are mergeable and name instances partition
    * disjointly across generations.
    */
  private[graft] def distinctNames(spark: SparkSession, sfDir: String): DataFrame = {
    def census(rows: DataFrame): DataFrame = rows
      .groupBy(col("p_name"))
      .agg(min(col("p_partkey")).as("name_id"), count(lit(1)).as("n_parts"))
    graft.ops.Layout.ensureDerived(spark, sfDir, "name_census",
      Seq("part.parquet"), "p_name",
      refreshGen = Some(graft.ops.Layout.GenRefresh(
        delta = ctx => census(spark.read.parquet(ctx.addedFiles: _*)
          .select(col("p_partkey"), col("p_name"))),
        merge = gens => gens.groupBy(col("p_name")).agg(
          min(col("name_id")).as("name_id"),
          sum(col("n_parts")).as("n_parts"))))) {
      census(Tables.part(spark, sfDir).select(col("p_partkey"), col("p_name")))
    }
  }

  /** s itself (i=0) plus each delete-one variant (i in 1..|s|): the
    * 1-deletion neighborhood. Lossless blocking for edit distance ≤ 1:
    * equality shares the 0-deletion key; a substitution (or, for DL, an
    * adjacent transposition) at i shares the delete-at-i key of both
    * sides; an insertion/deletion shares the shorter string itself.
    * `distinct` because deleting either of two equal adjacent chars
    * yields the same key and must not multiply the candidate row.
    */
  private[graft] def delKeys(df: DataFrame, str: String): DataFrame =
    df.withColumn("i", explode(sequence(lit(0), length(col(str)))))
      .withColumn("key",
        when(col("i") === 0, col(str))
          .otherwise(concat(
            expr(s"substring($str, 1, i - 1)"),
            expr(s"substring($str, i + 1)"))))
      .drop("i").distinct()

  /** Fuzzy name matches at edit distance ≤ `tau` (default 1) over the
    * distinct-name space: lossless 1-deletion-neighborhood blocking at
    * τ=1 (see the object scaladoc for why this is the scalable key;
    * (pos, token) blocking at τ≥2) + codegen'd `levenshtein`
    * verification. Output is one row per matched unordered pair,
    * id-ordered.
    */
  def nameMatches(spark: SparkSession, sfDir: String, tau: Int = 1): DataFrame = {
    val names = distinctNames(spark, sfDir)
      .select(col("name_id"), col("p_name"))
    val keys =
      if (tau <= 1) delKeys(names, "p_name").select(
        col("key"), col("name_id"), col("p_name"))
      else names
        .select(col("name_id"), col("p_name"),
          posexplode(split(col("p_name"), " ")).as(Seq("pos", "tok")))
        .distinct() // a token repeated inside one name: one candidate row
        .select(concat_ws(":", col("pos"), col("tok")).as("key"),
          col("name_id"), col("p_name"))
    val a = keys.select(col("key"),
      col("name_id").as("id_a"), col("p_name").as("name_a"))
    val b = keys.select(col("key"),
      col("name_id").as("id_b"), col("p_name").as("name_b"))
    a.join(b, Seq("key"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"))
      .distinct() // a pair may share several blocking keys; count once
      .where(levenshtein(col("name_a"), col("name_b")) <= tau)
      .withColumn("edit_dist",
        levenshtein(col("name_a"), col("name_b")).cast("int"))
      .orderBy(col("id_a").asc, col("id_b").asc)
  }

  /** Typo-robust resolution: every distinct name generates a DETERMINISTIC
    * adjacent-swap typo (the dominant human error class; the swap position
    * is keyed on name_id so the DuckDB twin reproduces the variant
    * exactly), and each typo is matched back against the clean vocabulary
    * at true Damerau–Levenshtein ≤ 1 via the native `graft_dl` — Spark's
    * own `levenshtein` scores a transposition 2 and would miss every such
    * variant at τ=1; `is_transposition` marks exactly those wins.
    *
    * Blocking is the 1-DELETION NEIGHBORHOOD (SymSpell's discipline): each
    * string emits itself plus its |s| delete-one variants; candidates must
    * share a key. For DL ≤ 1 this is LOSSLESS: equality shares the
    * 0-deletion key; a substitution or adjacent transposition at i shares
    * the delete-at-i key (delete the differing char from both sides); an
    * insertion/deletion shares the shorter string itself. The oracle twin
    * is the brute-force all-pairs join, so every CORRECTNESS run re-proves
    * the losslessness. Keys per name are |s|+1 — linear in name length,
    * independent of vocabulary size — and matching stays in the
    * distinct-name space like every ER leg here, never the row space.
    */
  def typoMatches(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val names = distinctNames(spark, sfDir)
      .select(col("name_id"), col("p_name"))
    // a 1-char name has no adjacent pair to swap — without the guard the
    // swap position's `% (len-1)` is a divide-by-zero (NULL row here, a
    // hard error in the DuckDB twin); the guard is mirrored in the twin
    val typos = names
      .filter(length(col("p_name")) >= 2)
      .select(col("name_id").as("typo_id"), col("p_name"),
        (pmod(col("name_id"), length(col("p_name")) - 1) + 1)
          .cast("int").as("p"))
      .select(col("typo_id"),
        concat(
          expr("substring(p_name, 1, p - 1)"),
          expr("substring(p_name, p + 1, 1)"),
          expr("substring(p_name, p, 1)"),
          expr("substring(p_name, p + 2)")).as("typo_text"))

    delKeys(typos, "typo_text")
      .join(delKeys(names, "p_name"), Seq("key"))
      .select("typo_id", "name_id", "typo_text", "p_name").distinct()
      .withColumn("dl_dist",
        call_function("graft_dl", col("typo_text"), col("p_name")).cast("int"))
      .filter(col("dl_dist") <= 1)
      .withColumn("lev_dist",
        levenshtein(col("typo_text"), col("p_name")).cast("int"))
      .select(col("typo_id"), col("name_id"), col("typo_text"),
        col("p_name").as("name"), col("dl_dist"), col("lev_dist"),
        (col("lev_dist") > col("dl_dist")).as("is_transposition"))
      .orderBy(col("typo_id").asc, col("name_id").asc)
  }

  /** Golden-record report: connected components over the match graph
    * (reusing the dedup CC kernel — union-find fast path under the edge
    * limit, contraction loop past it), canonical name = the cluster's
    * min-id name, one row per entity with variant and row support.
    * The per-row assignment this implies is a broadcast join of this
    * (vocabulary-sized) map against the catalog — rows never pair.
    */
  def goldenRecords(spark: SparkSession, sfDir: String, tau: Int = 1): DataFrame = {
    val names = distinctNames(spark, sfDir)
    val pairs = nameMatches(spark, sfDir, tau)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    val cc = Dedup.connectedComponents(
      pairs, names.select(col("name_id").as("doc_id")))
      .select(col("doc_id").as("name_id"), col("cluster_id").as("entity_id"))
    val canon = names.select(col("name_id").as("entity_id"),
      col("p_name").as("canonical_name"))
    names
      .join(cc, "name_id")
      .groupBy(col("entity_id"))
      .agg(
        count(lit(1)).as("n_variants"),
        sum(col("n_parts")).as("n_parts"))
      .join(canon, "entity_id")
      .select(col("entity_id"), col("canonical_name"),
        col("n_variants"), col("n_parts"))
      .orderBy(col("entity_id").asc)
  }
}
