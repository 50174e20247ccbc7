package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Iterative graph analytics beyond connected components
  * ([[Dedup.connectedComponents]]) — score-propagation algorithms whose
  * per-round shape is one edge join + one hash aggregation. Reference has
  * no analog (its data layer is CRUD, `/root/reference/src/routes/ads.ts`);
  * this is part of the §7.5 extension surface.
  */
object Graph {

  /** PageRank over the co-purchase part graph (parts are nodes; an edge
    * connects two parts that share an order — both orientations, so the
    * graph is symmetric): the influence ranking behind "important products"
    * / seed-selection, and the fourth ITERATIVE-algorithm family in the
    * engine next to min-label CC, Lloyd k-means and BPE merges.
    *
    * Engine-exact determinism for the oracle: the ENTIRE recurrence runs
    * in fixed-point integer arithmetic — ranks are BIGINT picounits
    * (10⁻¹² of total mass), neighbor contributions are integer division
    * `rank_e12 DIV deg`, damping is `(85·s) DIV 100` — so no float
    * touches the iteration and any engine reproduces it bit-exactly
    * (doubles failed here: Spark's decimal-string HALF_UP and DuckDB's
    * binary rounding disagree at half-ulp boundaries of round(·,12)).
    * Floor-division bias is < deg picounits per node per round —
    * immaterial at 10⁻¹² resolution, and deterministic. The DuckDB twin
    * unrolls the same `iters` rounds as CTEs ([[graft.SparkEntry]]
    * generates it from the same constants).
    *
    * Scale shape: per round, one edges⋈ranks equi-join on the src key and
    * one map-side-combinable sum keyed on dst — the classic distributed
    * PageRank step; the rank frame is |nodes| rows of (long, double).
    * `iters` is fixed (power iteration converges geometrically; 5 rounds
    * orders the head of the distribution); only the node COUNT crosses the
    * driver. Isolated parts (never co-ordered) are excluded — in the
    * symmetric graph every node has degree ≥ 1, so there is no dangling
    * mass to redistribute.
    */
  def partPageRank(
      spark: SparkSession, sfDir: String, iters: Int = 5,
      damping: Double = 0.85, topK: Int = 25): DataFrame = {
    // multigraph on purpose: two parts sharing k orders keep k parallel
    // edges, so rank flows in proportion to co-purchase FREQUENCY
    // (weighted PageRank with integer weights) — and the 2.4M-row pair
    // dedup shuffle a simple-graph formulation would pay is skipped
    val op = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = op.select(col("l_orderkey"), col("l_partkey").as("src"))
      .join(op.select(col("l_orderkey"), col("l_partkey").as("dst")),
        Seq("l_orderkey"))
      .filter(col("src") =!= col("dst"))
      .select("src", "dst")
      .persist()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .persist()
    try {
      val n = deg.count() // the one driver-side scalar (node count)
      val nodes = deg.select(col("src").as("node"))
      val unit = 1000000000000L // picounits of total rank mass
      val dPct = math.round(damping * 100) // 85
      val baseE12 = (unit - unit * dPct / 100L) / n // ((1-d)·unit) DIV n
      var ranks = nodes.withColumn("rank_e12", lit(unit / n))
      // The per-edge contribution rank÷deg is a function of the SOURCE
      // node alone, so it folds into a |nodes|-sized table BEFORE touching
      // edges: each round is then exactly one broadcast join over the
      // persisted edge list + one dst-keyed map-side-combinable sum.
      // (Entity tables are dwarfed by their edge tables — broadcast is the
      // right plan until |nodes| outgrows executor memory, where dropping
      // the hint falls back to a src-keyed shuffle join.)
      for (_ <- 1 to iters) {
        val nodeContrib = ranks.join(deg.withColumnRenamed("src", "node"),
          Seq("node"))
          .select(col("node").as("src"), expr("rank_e12 div deg").as("__c"))
        val contrib = edges
          .join(broadcast(nodeContrib), Seq("src"))
          .groupBy(col("dst").as("node"))
          .agg(sum(col("__c")).as("__s"))
        ranks = nodes.join(broadcast(contrib), Seq("node"), "left")
          .select(col("node"),
            (lit(baseE12) +
              expr(s"($dPct * coalesce(__s, 0L)) div 100")).as("rank_e12"))
      }
      ranks
        .select(col("node").as("p_partkey"), col("rank_e12"),
          (col("rank_e12").cast("double") / lit(1e12)).as("rank"))
        .orderBy(col("rank_e12").desc, col("p_partkey").asc)
        .limit(topK)
    } finally { deg.unpersist(); edges.unpersist() }
  }
}
