package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Curation, Dedup}

/** The 100× duplicate stress tier — the scale proof the small-SF oracle
  * runs cannot give. Replicates the `documents` table `reps`× with
  * remapped ids (every document becomes a `reps`-way exact duplicate —
  * the worst case for every pair producer), then drives the dedup
  * operators through their REAL public entry points and asserts the
  * behaviors that matter at 100 TB:
  *
  *   Tier A (sf0.1 × 100 ≈ 500k docs): the LINEAR paths. Exact dedup
  *   collapses the families; span/minhash boilerplate caps keep the
  *   pair producers bounded (zero pairs emitted, with `spanStats`
  *   making the drop VISIBLE); the end-to-end curation pipeline stays
  *   ~linear because exact dedup runs before near-dup.
  *
  *   Tier B (sf0.01 × 100 = 50k docs, maxBucket raised to admit the
  *   100-doc buckets): the QUADRATIC-bounded path for real — ~2.5M
  *   verified pairs (past connectedComponents' 2M driver edge limit),
  *   so the DISTRIBUTED min-label loop runs on a multi-million-edge
  *   graph and must converge with every replica family in one cluster.
  *
  *   Tier C (lineitem × 10): the iterative graph operators — weighted-
  *   edge collapse keeps per-round cost flat; both pagerank join plans
  *   (broadcast and the shuffle fallback) must agree bit-exactly.
  *
  *   Tier D (events × 100 ≈ 10M): the event-analytics family — the
  *   two-level exact rank, sessionization and the as-of join must
  *   reproduce replication-invariants exactly (see [[tierD]]).
  *
  *   Tier E (embeddings × 10 = 20k identical-twin vectors): the
  *   similarity family — LSH top-k combinatorics exact under bucket
  *   flooding, near-dup pair counts exact where bounded, and the
  *   driver-materialization cap REFUSING loudly past its budget
  *   (see [[tierE]]).
  *
  *   Tier F (documents × 100 = 500k twin docs): the text/rank family —
  *   Zipf mean_ranks and classifier logits are replication-invariant,
  *   so ppl_buckets and quality_calibration must reproduce the base
  *   report with integer fields × reps and identical boundaries,
  *   proving the two-level exact rank's boundary-independence under
  *   resampled cuts (see [[tierF]]).
  *
  *   Tier G (ALL tables × 10, FK-consistent key remap): the registry-
  *   wide scale readout — every registered query timed on base and
  *   replicated dirs, per-query ratios printed, super-linear rows
  *   flagged for fix-or-document triage (see [[tierG]]).
  *
  *   Tier H (tier G at the BENCH scale factor, sf0.1 × 10): the honest
  *   scaling curve at the SF the per-round bench measures — sf0.01's
  *   fixed stage overhead flattens ratios; run explicitly (not in "all",
  *   ~30 min) per round for STRESS_r{N}.md (see [[tierH]]).
  *
  *   Tier I (documents × 1000 from sf0.1 = 5M twin docs): the dedup
  *   ENVELOPE — pair producers only, default caps, bounded (zero) pair
  *   emission with the drop visible in the span census (see [[tierI]]).
  *
  *   Tier K (documents + embeddings × 100 from sf0.1): the CORPUS-
  *   artifact refresh decade — the three artifacts converted from
  *   rewrite-refresh to the partition-level delta commit in round 11
  *   (span_rows, winnow_sel, ivf_cells) built at 100×, then one
  *   appended shard driving each refresh path, which must cost a small
  *   fraction of its build and reproduce exact per-replica row
  *   invariants (see [[tierK]]).
  *
  *   Tier N (embeddings × 100 = 200k PERTURBED vectors): ANN rank
  *   quality at scale — trained-IVF and ADC→re-rank recall floors plus
  *   warm pruned-search-beats-brute, where replicas are distinct points
  *   (tier E owns the exact-twin worst case) (see [[tierN]]).
  *
  * Usage: sbt "runMain graft.tools.StressTier [a..n|all]" (h/i/j/k/l/m/n
  * are explicit-only — not part of "all")
  * Prints one `STRESS <phase> seconds=<s> <k>=<v>...` line per phase and
  * `STRESS_RESULT PASS|FAIL` last; exits non-zero on FAIL.
  */
object StressTier {

  private var failures = List.empty[String]

  private def check(cond: Boolean, what: String): Unit =
    if (!cond) {
      failures ::= what
      println(s"STRESS_CHECK FAIL: $what")
    }

  private def timed[A](phase: String)(f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    val s = (System.nanoTime() - t0) / 1e9
    (r, s)
  }

  /** Replicate documents reps× with family-contiguous ids
    * (new_id = base_id * reps + rep). One narrow generate + write.
    */
  private def replicate(
      spark: SparkSession, baseDir: String, outDir: String, reps: Int): Unit = {
    val docs = spark.read.parquet(s"$baseDir/documents.parquet")
    docs
      .withColumn("rep", explode(sequence(lit(0), lit(reps - 1))))
      .select(
        (col("doc_id") * reps + col("rep")).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
      .repartition(64)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
  }

  private def tierA(spark: SparkSession, baseDir: String, dir: String): Unit = {
    val reps = 100
    val (_, tRep) = timed("a.replicate")(replicate(spark, baseDir, dir, reps))
    val nBase = spark.read.parquet(s"$baseDir/documents.parquet").count()
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    println(f"STRESS a.replicate seconds=$tRep%.1f base=$nBase docs=$n")
    check(n == nBase * reps, s"tier A row count $n != $nBase*$reps")

    // exact dedup: fixed-width fingerprint shuffle — the 100× families
    // must collapse to the base corpus' distinct texts
    val (exact, tExact) = timed("a.exact")(
      Dedup.exactSummary(spark, dir).collect().head)
    val distinctBase = spark.read.parquet(s"$baseDir/documents.parquet")
      .select(sha2(col("text"), 256)).distinct().count()
    println(f"STRESS a.exact seconds=$tExact%.1f distinct=${exact.getAs[Long]("distinct_texts")} removed=${exact.getAs[Long]("dup_docs_removed")}")
    check(exact.getAs[Long]("distinct_texts") == distinctBase,
      "exact dedup must collapse each family to its base text")

    // span stats: every span now lives in >= reps docs > the default cap,
    // so ALL shared spans are dropped — visibly, not silently
    val (st, tStats) = timed("a.span_stats")(
      Dedup.spanStats(spark, dir).collect().head)
    val shared = st.getAs[Long]("n_spans_shared")
    val dropped = st.getAs[Long]("n_spans_dropped")
    println(f"STRESS a.span_stats seconds=$tStats%.1f shared=$shared dropped=$dropped candidates=${st.getAs[Long]("candidate_pairs")}")
    check(shared > 0, "stress corpus must actually share spans")
    check(dropped == shared && st.getAs[Long]("candidate_pairs") == 0L,
      "every shared span exceeds the cap: dropped must equal shared")

    // the pair producers under their DEFAULT caps: bounded — zero pairs,
    // not an n² attempt (every bucket/span group is >= 100 docs)
    val (nSpanPairs, tSpan) = timed("a.span_dedup")(
      Dedup.spanPairs(spark, dir).count())
    println(f"STRESS a.span_dedup seconds=$tSpan%.1f pairs=$nSpanPairs")
    check(nSpanPairs == 0L, "default span cap must drop the 100-doc span groups")
    val (nMhPairs, tMh) = timed("a.minhash")(
      Dedup.minHashPairs(spark, dir).count())
    println(f"STRESS a.minhash seconds=$tMh%.1f pairs=$nMhPairs")
    check(nMhPairs == 0L, "default maxBucket must drop the 100-doc buckets")

    // end-to-end curation: exact dedup sits before sampling, so the
    // pipeline stays ~linear in the replicated corpus
    val (nTrain, tTrain) = timed("a.training_set")(
      Curation.trainingSet(spark, dir).count())
    println(f"STRESS a.training_set seconds=$tTrain%.1f rows=$nTrain")
    check(nTrain > 0L, "curation pipeline must survive the stress corpus")
  }

  private def tierB(spark: SparkSession, baseDir: String, dir: String): Unit = {
    val reps = 100
    val (_, tRep) = timed("b.replicate")(replicate(spark, baseDir, dir, reps))
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    println(f"STRESS b.replicate seconds=$tRep%.1f docs=$nDocs")

    // admit the 100-doc buckets (maxBucket=128) and keep the pair list
    // DISTRIBUTED: ~nBase * C(100,2) verified pairs — far past the
    // smallLocal cap and past the 2M driver edge limit
    val (pairs, tPairs) = timed("b.pairs")(
      Dedup.minHashPairsDistributed(spark, dir, maxBucket = 128))
    val nPairs = pairs.count()
    println(f"STRESS b.pairs seconds=$tPairs%.1f pairs=$nPairs")
    check(nPairs > 2_000_000L,
      s"stress pairs $nPairs must cross the 2M driver edge limit")

    // connected components: edge count (2*pairs) > driver limit forces the
    // distributed min-label loop — the branch this tier exists to prove
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id")
    val (membership, tCC) = timed("b.cc")(
      Dedup.connectedComponents(pairs, docs).persist())
    val nLabeled = membership.count()
    println(f"STRESS b.cc seconds=$tCC%.1f labeled=$nLabeled")
    check(nLabeled == nDocs, "CC must label every doc exactly once")

    // every replica family must land in ONE cluster: group by base id and
    // count distinct labels — exactly one per family
    val fams = membership
      .withColumn("family", floor(col("doc_id") / reps).cast("long"))
      .groupBy(col("family"))
      .agg(countDistinct(col("cluster_id")).as("n_labels"))
      .filter(col("n_labels") =!= 1L)
      .count()
    check(fams == 0L, s"$fams families split across clusters")
    val clusters = membership.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("sz"))
    val minSz = clusters.agg(min(col("sz"))).collect().head.getLong(0)
    val nClusters = clusters.count()
    println(s"STRESS b.cc_shape clusters=$nClusters min_size=$minSz")
    check(minSz >= reps,
      "every cluster holds at least one full 100-replica family")
    membership.unpersist()

    // incremental delta-vs-index near-dup at the same tier: ids ending in
    // 9 (10 replicas per family) probe the index (90 per family) — every
    // delta doc must report its family keeper (rep 0 = family * reps,
    // jaccard 1, smallest corpus id wins the tie)
    val (inc, tInc) = timed("b.incremental_near")(
      Dedup.incrementalMinHash(spark, dir, maxBucket = 128).persist())
    val nDelta = inc.count()
    val missed = inc.filter(!col("is_dup") ||
      col("dup_of") =!= (floor(col("new_doc_id") / reps) * reps).cast("long"))
      .count()
    println(f"STRESS b.incremental_near seconds=$tInc%.1f delta=$nDelta missed=$missed")
    check(nDelta == nDocs / 10, s"delta carve must be 10% ($nDelta)")
    check(missed == 0L, s"$missed delta docs missed their family keeper")
    inc.unpersist()
    ()
  }

  /** Tier C: the ITERATIVE GRAPH operators under 10× order volume.
    * Lineitem replicates 10× with remapped order keys (same part
    * universe), so co-purchase pair MULTIPLICITY grows 10× while the
    * distinct (src,dst) pair set stays ~fixed — exactly the shape the
    * weighted-edge collapse in [[graft.ext.Graph.partPageRank]] exists
    * for: per-round join input must stay flat (a multigraph formulation
    * would pay 10× per round). Asserts rank-mass conservation over the
    * FULL node set and a bounded triangle census.
    */
  private def tierC(spark: SparkSession, baseDir: String, dir: String): Unit = {
    val reps = 10
    val (_, tRep) = timed("c.replicate") {
      spark.read.parquet(s"$baseDir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey"))
        .withColumn("rep", explode(sequence(lit(0), lit(reps - 1))))
        .select(
          (col("l_orderkey") * reps + col("rep")).as("l_orderkey"),
          col("l_partkey"))
        .repartition(64)
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      // partTriangles evaluates its vertex sample over the part node
      // universe — copied 1:1 (dim-sized), same as tier D's orders side
      spark.read.parquet(s"$baseDir/part.parquet")
        .write.mode("overwrite").parquet(s"$dir/part.parquet")
    }
    val nLines = spark.read.parquet(s"$dir/lineitem.parquet").count()
    println(f"STRESS c.replicate seconds=$tRep%.1f lines=$nLines")

    // full-node pagerank: topK past |nodes| returns every node, so the
    // fixed-point mass conservation is checkable end-to-end
    val (ranks, tPr) = timed("c.pagerank")(
      graft.ext.Graph.partPageRank(spark, dir, topK = 1000000).persist())
    val nNodes = ranks.count()
    val mass = ranks.agg(sum(col("rank_e12"))).collect().head.getLong(0)
    val unit = 1000000000000L
    println(f"STRESS c.pagerank seconds=$tPr%.1f nodes=$nNodes mass_e12=$mass")
    check(nNodes > 0, "pagerank must label nodes")
    check(math.abs(mass - unit).toDouble / unit < 1e-3,
      s"rank mass $mass drifted past the floor-division bound")
    ranks.unpersist()

    val (nTri, tTri) = timed("c.triangles")(
      graft.ext.Graph.partTriangles(spark, dir).count())
    println(f"STRESS c.triangles seconds=$tTri%.1f rows=$nTri")
    check(nTri > 0, "sampled triangle census must find triangles")

    // the broadcast FALLBACK: maxBroadcastNodes=0 strips the hint, so every
    // round runs the src-keyed shuffle join — the documented plan past
    // broadcastable node counts. The integer recurrence must be
    // bit-identical to the broadcast run
    val (shuffled, tPrS) = timed("c.pagerank_shuffle")(
      graft.ext.Graph.partPageRank(spark, dir, topK = 1000000,
        maxBroadcastNodes = 0L).persist())
    val nShuffled = shuffled.count()
    println(f"STRESS c.pagerank_shuffle seconds=$tPrS%.1f nodes=$nShuffled")
    val broadcastRun = graft.ext.Graph.partPageRank(spark, dir, topK = 1000000)
    val diverged = shuffled.select("p_partkey", "rank_e12")
      .except(broadcastRun.select("p_partkey", "rank_e12")).count()
    check(nShuffled > 0, "shuffle-fallback pagerank must label nodes")
    check(diverged == 0L,
      s"$diverged nodes diverged between broadcast and shuffle-join plans")
    shuffled.unpersist()
    ()
  }

  /** Tier D: the EVENT-ANALYTICS family at 100× event volume (sf0.1 ×
    * 100 ≈ 10M events; ids remapped, timestamps kept — every base event
    * becomes a 100-way twin). The replication fixes exact invariants the
    * operators must reproduce, proving their bounded shapes rather than
    * just surviving:
    *
    *   - `winsorized_stats` (the round-6 two-level exact rank): the p99
    *     ORDER STATISTIC is replication-invariant — rank ceil(0.99·100n)
    *     of the 100× multiset selects the same value as rank ceil(0.99·n)
    *     of the base — so per-type p99 must match the base run EXACTLY,
    *     with n_events and n_capped scaling by exactly 100.
    *   - `sessionize`: identical timestamp sets per user → identical
    *     session boundaries — per-user session COUNTS equal the base
    *     run's; only per-session event counts scale.
    *   - `events_asof_orders`: each twin matches its base event's order —
    *     row count scales by 100, the matched-key multiset by exactly 100.
    */
  private def tierD(spark: SparkSession, baseDir: String, dir: String): Unit = {
    val reps = 100
    val (_, tRep) = timed("d.replicate") {
      spark.read.parquet(s"$baseDir/events.parquet")
        .withColumn("rep", explode(sequence(lit(0), lit(reps - 1))))
        .select(
          (col("event_id") * reps + col("rep")).as("event_id"),
          col("ts"), col("user_id"), col("event_type"), col("value"),
          col("props"))
        .repartition(64)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      // as-of needs the order side too — copied 1:1 (dim-sized)
      spark.read.parquet(s"$baseDir/orders.parquet")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    }
    val nEv = spark.read.parquet(s"$dir/events.parquet").count()
    val nBase = spark.read.parquet(s"$baseDir/events.parquet").count()
    println(f"STRESS d.replicate seconds=$tRep%.1f events=$nEv")
    check(nEv == nBase * reps, s"tier D row count $nEv != $nBase*$reps")

    import graft.ext.EventAnalytics
    // winsorized: two-level rank at 10M rows — p99 replication-invariant
    val (w, tW) = timed("d.winsorized")(
      EventAnalytics.winsorizedStats(spark, dir).collect())
    val base = EventAnalytics.winsorizedStats(spark, baseDir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    println(f"STRESS d.winsorized seconds=$tW%.1f types=${w.length}")
    check(w.length == base.size, "per-type row count changed under replication")
    w.foreach { r =>
      val b = base(r.getAs[String]("event_type"))
      check(r.getAs[Double]("p99_value") == b.getAs[Double]("p99_value"),
        s"${r.getAs[String]("event_type")}: p99 not replication-invariant " +
          s"(${r.getAs[Double]("p99_value")} vs ${b.getAs[Double]("p99_value")})")
      check(r.getAs[Long]("n_events") == b.getAs[Long]("n_events") * reps,
        s"${r.getAs[String]("event_type")}: n_events did not scale by $reps")
      check(r.getAs[Long]("n_capped") == b.getAs[Long]("n_capped") * reps,
        s"${r.getAs[String]("event_type")}: n_capped did not scale by $reps")
    }

    // sessionize: same per-user timestamp SET → same session boundaries
    val (sessAndCount, tS) = timed("d.sessionize") {
      val s = EventAnalytics.sessionize(spark, dir).persist()
      (s, s.count()) // force inside the timer
    }
    val (sess, nUsers) = sessAndCount
    val sessBase = EventAnalytics.sessionize(spark, baseDir)
      .select(col("user_id"), col("n_sessions"))
    val sessDiff = sess.select(col("user_id"), col("n_sessions"))
      .except(sessBase).count()
    val evTotal = sess.agg(sum(col("total_events"))).collect().head.getLong(0)
    println(f"STRESS d.sessionize seconds=$tS%.1f users=$nUsers")
    check(sessDiff == 0L, s"$sessDiff users changed session counts under replication")
    check(evTotal == nEv, "sessionize must account for every event")
    val nSessions = sess.agg(sum(col("n_sessions"))).collect().head.getLong(0)
    sess.unpersist()

    // sft_pairs: at 100× every session's turn count is even (100·n), so
    // the pair count is EXACTLY nEv/2, exactly one pair per session has a
    // 1-turn context (turn 2), none has 2 (that would need odd turn 3),
    // and the rest carry the full bounded 3-turn window — the frame
    // bound rowsBetween(-3,-1) holding at 10M rows is the point
    val (sftHist, tF) = timed("d.sft_pairs") {
      EventAnalytics.sftPairs(spark, dir)
        .groupBy(col("n_context_turns")).agg(count(lit(1)).as("n"))
        .collect()
    }
    val hist = sftHist.map(r =>
      r.getAs[Long]("n_context_turns") -> r.getAs[Long]("n")).toMap
    val nPairs = hist.values.sum
    println(f"STRESS d.sft_pairs seconds=$tF%.1f pairs=$nPairs")
    check(nPairs == nEv / 2, s"pair count $nPairs != ${nEv / 2} (= events/2)")
    check(hist.getOrElse(1L, 0L) == nSessions,
      s"1-turn-context pairs ${hist.getOrElse(1L, 0L)} != $nSessions sessions")
    check(!hist.contains(2L), "a 2-turn context is impossible at 100×")
    check(hist.getOrElse(3L, 0L) == nPairs - nSessions,
      "full-window pair count wrong")

    // preference_pairs: session ids survive replication; for every session
    // the base run emitted, the 100× run must emit too (candidate pool only
    // grows), its chosen/rejected scores bracket the base run's (the 99
    // extra prompt twins join the candidate pool, so the extremes can only
    // widen), and the candidate count is pinned EXACTLY:
    // r.n_candidates = reps·(b.n_candidates + 1) − 1 (all twins of all
    // base turns, minus the one twin serving as prompt)
    val (prefAndCount, tP) = timed("d.preference_pairs") {
      val p = EventAnalytics.preferencePairs(spark, dir).persist()
      (p, p.count())
    }
    val (pref, nPref) = prefAndCount
    val basePref = EventAnalytics.preferencePairs(spark, baseDir)
      .select(col("user_id"), col("session_id"),
        col("chosen_score").as("b_ch"), col("rejected_score").as("b_rj"),
        col("n_candidates").as("b_nc"))
    val nBasePref = basePref.count()
    val prefJoined = pref.join(basePref, Seq("user_id", "session_id"))
      .collect()
    println(f"STRESS d.preference_pairs seconds=$tP%.1f pairs=$nPref")
    check(prefJoined.length.toLong == nBasePref,
      s"only ${prefJoined.length} of $nBasePref base pair sessions emitted at 100×")
    prefJoined.foreach { r =>
      check(r.getAs[Double]("chosen_score") >= r.getAs[Double]("b_ch"),
        "chosen score must not shrink under replication")
      check(r.getAs[Double]("rejected_score") <= r.getAs[Double]("b_rj"),
        "rejected score must not grow under replication")
      check(r.getAs[Long]("n_candidates") ==
        reps.toLong * (r.getAs[Long]("b_nc") + 1L) - 1L,
        "candidate count must be exactly reps·(base+1)−1")
      check(r.getAs[Double]("margin") > 0.0, "margin must stay strict")
    }
    pref.unpersist()

    // as-of join: every twin matches its base event's order
    val (asofAndCount, tA) = timed("d.asof") {
      val a = EventAnalytics.eventsAsOfOrders(spark, dir).persist()
      (a, a.count()) // force inside the timer
    }
    val (asof, nAsof) = asofAndCount
    val keySum = asof.agg(sum(col("last_order_key"))).collect().head.getLong(0)
    val baseKeySum = EventAnalytics.eventsAsOfOrders(spark, baseDir)
      .agg(sum(col("last_order_key"))).collect().head.getLong(0)
    println(f"STRESS d.asof seconds=$tA%.1f rows=$nAsof")
    check(nAsof == nEv, "as-of must emit one row per event")
    check(keySum == baseKeySum * reps,
      s"as-of matches changed under replication ($keySum vs ${baseKeySum}*$reps)")
    asof.unpersist()
    ()
  }

  /** Tier E: the SIMILARITY family under replication pressure (sf0.1
    * embeddings × 10 = 20k vectors; ids remapped `vec_id·R + rep`,
    * VECTORS KEPT — every base vector becomes an R-way exact duplicate,
    * the worst case for LSH bucket occupancy). Identical vectors mean
    * identical hyperplane signatures, so the replication pins exact
    * combinatorics the banded ops must reproduce:
    *
    *   - `lshTopK` (probes = the twins of the first two base vectors):
    *     each probe's first R−1 neighbors must be its OWN other twins at
    *     cosine 1.0 in id order, and the first non-twin neighbor must be
    *     the base run's rank-1 neighbor (same base id, same rounded
    *     similarity) — bucket flooding must not displace or reorder the
    *     exact re-rank.
    *   - `embeddingNearDupPairsLSH`: the pair count is EXACTLY
    *     P·R² + N₊·C(R,2) (P = base pairs, N₊ = positive-norm base
    *     vectors), and the found base-pair SET projected back through
    *     `id div R` is exactly the base run's — no pair lost to bucket
    *     collisions, none invented.
    */
  private def tierE(spark: SparkSession, baseDir: String, dir: String): Unit = {
    val reps = 10
    import graft.ext.Similarity
    val (_, tRep) = timed("e.replicate") {
      spark.read.parquet(s"$baseDir/embeddings.parquet")
        .withColumn("rep", explode(sequence(lit(0), lit(reps - 1))))
        .select((col("vec_id") * reps + col("rep")).as("vec_id"),
          col("embedding"), col("label"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }
    val nBase = spark.read.parquet(s"$baseDir/embeddings.parquet").count()
    val nRep = spark.read.parquet(s"$dir/embeddings.parquet").count()
    println(f"STRESS e.replicate seconds=$tRep%.1f vectors=$nRep")
    check(nRep == nBase * reps, s"tier E row count $nRep != $nBase*$reps")

    // base reference runs (tiny) — the invariants are stated against them
    val baseTop = Similarity.lshTopK(spark, baseDir, nProbes = 2, k = 1)
      .collect().map(r => r.getAs[Long]("q_id") ->
        ((r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine_sim")))).toMap
    check(baseTop.size == 2 && baseTop.values.forall(_._2 < 0.999999),
      "tier E precondition: base probes 0/1 need a sub-1.0 rank-1 neighbor")

    val k = reps + 4
    val (top, tT) = timed("e.lsh_topk")(
      Similarity.lshTopK(spark, dir, nProbes = 2 * reps, k = k).collect())
    println(f"STRESS e.lsh_topk seconds=$tT%.1f rows=${top.length}")
    check(top.length == 2 * reps * k,
      s"lshTopK rows ${top.length} != ${2 * reps * k} (every probe full-k)")
    top.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rows) =>
      val byRank = rows.sortBy(_.getAs[Int]("nn_rank"))
      val twinBlock = byRank.take(reps - 1)
      check(twinBlock.forall(r =>
        r.getAs[Long]("neighbor_id") / reps == q / reps &&
          r.getAs[Double]("cosine_sim") >= 0.999999),
        s"probe $q: ranks 1..${reps - 1} are not its cosine-1 twins")
      val (expBase, expSim) = baseTop(q / reps)
      val firstReal = byRank(reps - 1)
      check(firstReal.getAs[Long]("neighbor_id") / reps == expBase &&
        firstReal.getAs[Double]("cosine_sim") == expSim,
        s"probe $q: first non-twin neighbor " +
          s"${firstReal.getAs[Long]("neighbor_id")}/${firstReal.getAs[Double]("cosine_sim")} " +
          s"!= base rank-1 $expBase/$expSim")
    }

    // near-dup count exactness at R=2 (the candidate volume scales R², so
    // the exact-count proof runs where the driver materialization still
    // fits)…
    val r3 = 2
    spark.read.parquet(s"$baseDir/embeddings.parquet")
      .withColumn("rep", explode(sequence(lit(0), lit(r3 - 1))))
      .select((col("vec_id") * r3 + col("rep")).as("vec_id"),
        col("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$dir/../sf0.1em2/embeddings.parquet")
    val basePairs = Similarity.embeddingNearDupPairsLSH(spark, baseDir)
      .select(col("vec_a"), col("vec_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val nPos = spark.read.parquet(s"$baseDir/embeddings.parquet")
      .select(expr("aggregate(embedding, 0D, (a, x) -> a + x * x)").as("sq"))
      .filter(col("sq") > 0D).count()
    val (rep3, tN) = timed("e.near_dup")(
      Similarity.embeddingNearDupPairsLSH(spark, s"$dir/../sf0.1em2")
        .select(col("vec_a"), col("vec_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))))
    println(f"STRESS e.near_dup seconds=$tN%.1f pairs=${rep3.length}")
    val expected = basePairs.size.toLong * r3 * r3 +
      nPos * r3 * (r3 - 1) / 2
    check(rep3.length.toLong == expected,
      s"near-dup pair count ${rep3.length} != $expected " +
        s"(= ${basePairs.size}*$r3^2 + ${nPos}*C($r3,2))")
    val crossBase = rep3.map(p => (p._1 / r3, p._2 / r3))
      .filter(p => p._1 != p._2).toSet
    check(crossBase == basePairs,
      s"cross-family base-pair set diverged: ${
        (crossBase diff basePairs).take(3)} extra, ${
        (basePairs diff crossBase).take(3)} missing")

    // …and at R=10 the candidate volume (≈ base·R² + N·C(R,2) rows)
    // exceeds the driver-materialization budget: the op must SPILL the
    // pair frame to storage and stay distributed (r8 —
    // Materialize.localOrSpill; until then it refused loudly, which
    // tier H exposed as the one way the scale path failed at duplication
    // volume). The result must still be EXACT: count follows the
    // replication formula and the cross-family projection is the base
    // pair set — all verified distributed, nothing corpus-sized collects.
    val (n10, tC) = timed("e.near_dup_x10")(
      Similarity.embeddingNearDupPairsLSH(spark, dir).count())
    println(f"STRESS e.near_dup_x10 seconds=$tC%.1f pairs=$n10")
    val expected10 = basePairs.size.toLong * reps * reps +
      nPos * reps * (reps - 1) / 2
    check(n10 == expected10,
      s"10x near-dup pair count $n10 != $expected10 " +
        s"(= ${basePairs.size}*$reps^2 + ${nPos}*C($reps,2))")
    val crossProj = Similarity.embeddingNearDupPairsLSH(spark, dir)
      .filter(expr(s"vec_a div $reps") =!= expr(s"vec_b div $reps"))
      .select(expr(s"vec_a div $reps").as("a"), expr(s"vec_b div $reps").as("b"))
      .distinct()
    val baseDF = {
      import spark.implicits._
      basePairs.toSeq.toDF("a", "b")
    }
    check(crossProj.exceptAll(baseDF).count() == 0 &&
      baseDF.exceptAll(crossProj).count() == 0,
      "10x cross-family base-pair set diverged from the base run")

    // bitext_mine under twins: seeding k·reps cells makes the replicated
    // quantizer collapse to EXACTLY the base 16 directions (the first
    // 16·reps vectors are the base seeds' twin families; identical
    // directions tie to the lowest cell id), so candidate scope per twin
    // equals the base run's. Pinned: row count scales by reps; every
    // match is the rep-0 twin of the base match with the base similarity;
    // and every margin COLLAPSES TO EXACTLY 0 — the runner-up is always
    // another twin of the best match at an identical cosine.
    val baseMine = Similarity.crossLabelMine(spark, baseDir)
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    val (mine, tM) = timed("e.bitext")(
      Similarity.crossLabelMine(spark, dir, k = 16 * reps).collect())
    println(f"STRESS e.bitext seconds=$tM%.1f rows=${mine.length}")
    check(mine.length == baseMine.size * reps,
      s"bitext rows ${mine.length} != ${baseMine.size}*$reps")
    mine.foreach { r =>
      val b = baseMine(r.getAs[Long]("vec_id") / reps)
      val q = r.getAs[Long]("vec_id")
      check(r.getAs[Int]("label") == b.getAs[Int]("label"),
        s"probe $q: label drifted")
      check(r.getAs[Long]("match_id") == b.getAs[Long]("match_id") * reps,
        s"probe $q: match is not the rep-0 twin of the base match")
      check(r.getAs[Int]("match_label") == b.getAs[Int]("match_label"),
        s"probe $q: match label drifted")
      check(r.getAs[Double]("similarity") == b.getAs[Double]("similarity"),
        s"probe $q: similarity not replication-invariant")
      check(r.getAs[Double]("margin") == 0.0,
        s"probe $q: margin must collapse to 0 under exact twins")
    }
    ()
  }

  /** Tier F: the TEXT/RANK family under 100× document replication
    * (sf0.1 × 100 = 500k docs, every doc a 100-way exact twin). Zipf
    * ranks are ORDER statistics of the vocabulary — frequencies scale by
    * reps, their order does not — so every twin carries its base doc's
    * mean_rank and classifier logit exactly; twins are ADJACENT in each
    * ranking's total order (ids are remapped family-contiguously) and
    * |docs| stays divisible by the bucket counts, so every ntile cut
    * lands exactly on a twin-family boundary: each report row must equal
    * the base row with integer fields × reps and IDENTICAL boundary
    * values. The two-level exact rank RESAMPLES its bucket boundaries
    * from the 100× corpus, so agreement also proves the primitive's
    * boundary-independence claim at volume.
    */
  private def tierF(spark: SparkSession, baseDir: String, dir: String): Unit = {
    val reps = 100
    val (_, tRep) = timed("f.replicate")(replicate(spark, baseDir, dir, reps))
    val nBase = spark.read.parquet(s"$baseDir/documents.parquet").count()
    val nRep = spark.read.parquet(s"$dir/documents.parquet").count()
    println(f"STRESS f.replicate seconds=$tRep%.1f docs=$nRep")
    check(nRep == nBase * reps, s"tier F doc count $nRep != $nBase*$reps")

    import graft.ext.TextStats
    val (pplR, tP) = timed("f.ppl_buckets")(
      TextStats.perplexityBuckets(spark, dir).collect())
    val pplB = TextStats.perplexityBuckets(spark, baseDir).collect()
      .map(r => r.getAs[Int]("ppl_bucket") -> r).toMap
    println(f"STRESS f.ppl_buckets seconds=$tP%.1f buckets=${pplR.length}")
    check(pplB.values.map(_.getAs[Long]("n_docs")).toSet.size == 1,
      "base ppl buckets must be equal-sized for exact cut alignment")
    check(pplR.length == pplB.size, "ppl bucket count changed under replication")
    pplR.foreach { r =>
      val b = pplB(r.getAs[Int]("ppl_bucket"))
      val k = r.getAs[Int]("ppl_bucket")
      check(r.getAs[Long]("n_docs") == b.getAs[Long]("n_docs") * reps,
        s"ppl bucket $k: n_docs did not scale by $reps")
      check(r.getAs[Long]("total_tokens") == b.getAs[Long]("total_tokens") * reps,
        s"ppl bucket $k: total_tokens did not scale by $reps")
      check(r.getAs[Long]("total_rank_sum") ==
        b.getAs[Long]("total_rank_sum") * reps,
        s"ppl bucket $k: rank sums not replication-invariant (Zipf order moved)")
      check(r.getAs[Double]("min_mean_rank") == b.getAs[Double]("min_mean_rank"),
        s"ppl bucket $k: min_mean_rank moved — a cut missed its twin boundary")
      check(r.getAs[Double]("max_mean_rank") == b.getAs[Double]("max_mean_rank"),
        s"ppl bucket $k: max_mean_rank moved — a cut missed its twin boundary")
    }

    val (calR, tQ) = timed("f.calibration")(
      TextStats.qualityCalibration(spark, dir).collect())
    val calB = TextStats.qualityCalibration(spark, baseDir).collect()
      .map(r => r.getAs[Int]("score_decile") -> r).toMap
    println(f"STRESS f.calibration seconds=$tQ%.1f deciles=${calR.length}")
    check(calR.length == calB.size, "decile count changed under replication")
    calR.foreach { r =>
      val b = calB(r.getAs[Int]("score_decile"))
      val k = r.getAs[Int]("score_decile")
      check(r.getAs[Long]("n_docs") == b.getAs[Long]("n_docs") * reps,
        s"decile $k: n_docs did not scale by $reps")
      check(r.getAs[Long]("n_rule_pass") == b.getAs[Long]("n_rule_pass") * reps,
        s"decile $k: rule-pass count did not scale by $reps")
      check(r.getAs[Long]("min_logit") == b.getAs[Long]("min_logit"),
        s"decile $k: min_logit moved")
      check(r.getAs[Long]("max_logit") == b.getAs[Long]("max_logit"),
        s"decile $k: max_logit moved")
      check(r.getAs[Double]("rule_pass_rate") == b.getAs[Double]("rule_pass_rate"),
        s"decile $k: pass rate moved (same rational, same division)")
    }
  }

  /** Replicate EVERY table reps× with consistently remapped keys: each
    * column named `*key` / `*_id` becomes `v·reps + rep`, value columns
    * are copied — so the result is `reps` disjoint, FK-consistent shards
    * of the whole schema (no dangling references, no flooded join keys
    * on the relational side), while text/embedding payloads become
    * reps-way twin families (the realistic dedup/similarity stress).
    * Original column types are preserved via a cast back.
    */
  private def replicateAll(
      spark: SparkSession, baseDir: String, outDir: String, reps: Int): Unit =
    replicateTables(spark, baseDir, outDir, graft.io.Tables.all, reps,
      0 until reps)

  /** The key-remap replication kernel behind [[replicateAll]], with the
    * key MULTIPLIER decoupled from the shard-id range so tier J can
    * reserve shard ids for its refresh delta: each `*key`/`*_id` column
    * becomes `v·mult + rep` for every rep in `shards` — FK-consistent
    * disjoint shards whenever all tables use the same (mult, shards).
    */
  private def replicateTables(
      spark: SparkSession, baseDir: String, outDir: String,
      tables: Seq[String], mult: Int, shards: Range,
      mode: String = "overwrite"): Unit =
    tables.foreach { t =>
      val df = spark.read.parquet(s"$baseDir/$t.parquet")
      val cols = df.schema.fields.map { f =>
        if (f.name.endsWith("key") || f.name.endsWith("_id"))
          (col(f.name) * mult + col("__rep")).cast(f.dataType).as(f.name)
        else col(f.name)
      }
      df.withColumn("__rep",
          explode(sequence(lit(shards.head), lit(shards.last))))
        .select(cols.toSeq: _*)
        .repartition(32)
        .write.mode(mode).parquet(s"$outDir/$t.parquet")
    }

  /** Tier G — the REGISTRY-WIDE scale readout: every registered query
    * runs against the base dir and the 10×-replicated dir; per-query
    * wall-clock ratios are printed for the scaling table (STRESS_r7.md).
    * Interleaved rounds with a per-query min damp this host's CPU-steal
    * bursts (the Bench methodology). A query ERROR at 10× is a hard
    * failure; a super-linear ratio is REPORTED (`g.flag` lines) for
    * fix-or-document triage, not auto-failed — twin-flooded dedup
    * families are legitimately super-linear in emitted pairs.
    */
  private def tierG(spark: SparkSession, baseDir: String, dir: String): Unit =
    registryTier(spark, baseDir, dir, "g")

  /** Tier H — tier G's registry-wide 10× readout at the BENCH scale
    * factor (sf0.1 base → 6M lineitem / 50k vectors / 10× docs). Tier G
    * proved the shape at sf0.01, where fixed stage overhead flattens
    * ratios; this is the honest scaling curve at the SF the judge
    * benches. Same replication invariants, same flag rule.
    */
  private def tierH(spark: SparkSession, baseDir: String, dir: String): Unit =
    registryTier(spark, baseDir, dir, "h")

  private def registryTier(
      spark: SparkSession, baseDir: String, dir: String, label: String): Unit = {
    val reps = 10
    val (_, tRep) = timed(s"$label.replicate")(replicateAll(spark, baseDir, dir, reps))
    val nBase = spark.read.parquet(s"$baseDir/documents.parquet").count()
    val nRep = spark.read.parquet(s"$dir/documents.parquet").count()
    println(f"STRESS $label.replicate seconds=$tRep%.1f docs=$nRep")
    check(nRep == nBase * reps, s"tier $label doc count $nRep != $nBase*$reps")
    check(spark.read.parquet(s"$dir/lineitem.parquet").count() ==
      spark.read.parquet(s"$baseDir/lineitem.parquet").count() * reps,
      s"tier $label lineitem count must scale by reps")

    val names = graft.SparkEntry.queries.toSeq.sortBy(_._1)
    val base = scala.collection.mutable.Map.empty[String, Double]
    val rep = scala.collection.mutable.Map.empty[String, Double]
    val errs = scala.collection.mutable.Map.empty[String, String]
    for (round <- 1 to 2; (name, fn) <- names; (d, acc) <- Seq(
      (baseDir, base), (dir, rep))) {
      val t0 = System.nanoTime()
      try fn(spark, d).count() catch {
        case e: Throwable =>
          errs(name) = s"${e.getClass.getSimpleName}: ${
            Option(e.getMessage).getOrElse("").take(160)}"
      }
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      acc.updateWith(name) {
        case Some(p) => Some(math.min(p, t)); case None => Some(t)
      }
    }
    errs.toSeq.sortBy(_._1).foreach { case (q, m) =>
      check(false, s"tier $label: $q failed at ${reps}x: $m")
    }
    // the ratio floor keeps fixed session/planning overhead (~0.1 s at
    // this SF) from manufacturing or masking ratios on trivial queries
    val floor = 0.15
    val flagged = names.map(_._1).filterNot(errs.contains).flatMap { q =>
      val r = rep(q) / math.max(base(q), floor)
      println(f"STRESS $label.query name=$q base=${base(q)}%.3f rep=${rep(q)}%.3f ratio=$r%.1f")
      if (r > 15.0) Some(q -> r) else None
    }
    flagged.foreach { case (q, r) =>
      println(f"STRESS $label.flag name=$q ratio=$r%.1f (super-linear at ${reps}x — fix or document)")
    }
    println(f"STRESS $label.summary queries=${names.size} errors=${errs.size} flagged=${flagged.size}")
  }

  /** Tier I — the DEDUP-ENVELOPE readout for the README: documents
    * replicated 1000× from the BENCH scale factor (sf0.1 → 5M docs,
    * every doc a 1000-way exact twin — the worst duplication a crawl
    * shard can present), driving ONLY the pair producers under their
    * DEFAULT caps. The contract at this scale is bounded emission: the
    * linear paths (exact dedup, span census) stay exact, and every
    * quadratic-capable producer (span, minhash banding, winnowing)
    * must emit ZERO pairs because its df/bucket cap drops the
    * 1000-doc groups — visibly (the span census reports the drop),
    * never silently attempting C(1000,2)·5000 pairs. Run explicitly
    * (`stress i`); the replicate+scan volume is ~10 min on this host.
    */
  private def tierI(spark: SparkSession, baseDir: String, dir: String): Unit = {
    val reps = 1000
    val (_, tRep) = timed("i.replicate")(replicate(spark, baseDir, dir, reps))
    val nBase = spark.read.parquet(s"$baseDir/documents.parquet").count()
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    println(f"STRESS i.replicate seconds=$tRep%.1f base=$nBase docs=$n")
    check(n == nBase * reps, s"tier I row count $n != $nBase*$reps")

    val (exact, tExact) = timed("i.exact")(
      Dedup.exactSummary(spark, dir).collect().head)
    val distinctBase = spark.read.parquet(s"$baseDir/documents.parquet")
      .select(sha2(col("text"), 256)).distinct().count()
    println(f"STRESS i.exact seconds=$tExact%.1f distinct=${
      exact.getAs[Long]("distinct_texts")} removed=${
      exact.getAs[Long]("dup_docs_removed")}")
    check(exact.getAs[Long]("distinct_texts") == distinctBase,
      "exact dedup must collapse each 1000-family to its base text")

    val (st, tStats) = timed("i.span_stats")(
      Dedup.spanStats(spark, dir).collect().head)
    val shared = st.getAs[Long]("n_spans_shared")
    val dropped = st.getAs[Long]("n_spans_dropped")
    println(f"STRESS i.span_stats seconds=$tStats%.1f shared=$shared dropped=$dropped candidates=${st.getAs[Long]("candidate_pairs")}")
    check(shared > 0, "tier I corpus must actually share spans")
    check(dropped == shared && st.getAs[Long]("candidate_pairs") == 0L,
      "every shared span exceeds the cap at 1000 twins: dropped == shared")

    val (nSpanPairs, tSpan) = timed("i.span_dedup")(
      Dedup.spanPairs(spark, dir).count())
    println(f"STRESS i.span_dedup seconds=$tSpan%.1f pairs=$nSpanPairs")
    check(nSpanPairs == 0L, "span cap must drop the 1000-doc span groups")

    val (nMhPairs, tMh) = timed("i.minhash")(
      Dedup.minHashPairs(spark, dir).count())
    println(f"STRESS i.minhash seconds=$tMh%.1f pairs=$nMhPairs")
    check(nMhPairs == 0L, "maxBucket must drop the 1000-doc LSH buckets")

    val (nWinnow, tWn) = timed("i.winnow_pairs")(
      Dedup.winnowPairs(spark, dir).count())
    println(f"STRESS i.winnow_pairs seconds=$tWn%.1f pairs=$nWinnow")
    check(nWinnow == 0L,
      "maxDocsPerFp must drop every 1000-twin fingerprint group")
  }

  private val warehouseTables = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  /** The TPC-H / co-bucketed / graph family tier J drives — every
    * registered query that reads ONLY the seven warehouse tables and
    * exercises a fact-scale join, aggregation, or iteration.
    */
  private val tierJQueries = Seq(
    "pricing_summary", "min_cost_supplier", "shipping_priority",
    "priority_pipeline", "local_supplier_volume", "large_volume_customers",
    "supplier_scorecard", "excess_suppliers", "returned_item_loss",
    "dormant_customers", "part_affinity", "part_pagerank", "part_triangles",
    "copurchase_kcore", "copurchase_communities")

  /** Tier J — the WAREHOUSE FACTS at 100× the bench SF (~60M lineitem /
    * 15M orders): the last unproven scale decade (tier H replicated
    * everything 10×; documents got their ×1000 in tier I). The seven
    * relational tables replicate FK-consistently into `reps` disjoint
    * shards with key = v·(reps+1)+rep — the (reps+1) multiplier leaves
    * shard id `reps` FREE for the refresh delta; documents/embeddings/
    * events are untouched (no driven query reads them). Three phases:
    *
    *   j.artifact — the maintained fact artifacts BUILT at 100× (the
    *     co-bucketed orders_okey/lineitem_okey layout, the collapsed
    *     co-purchase edge list), each timed: the one-off cost a cluster
    *     pays per ingest epoch, separated from steady-state query cost.
    *   j.query — [[tierJQueries]] timed base vs 100× (interleaved
    *     min-of-2, the registryTier methodology). ERROR at 100× is a
    *     hard failure; ratio > 2.5·reps flags as super-linear.
    *   j.refresh — ONE more FK-consistent shard appended to orders +
    *     lineitem as a parquet delta, then every fact artifact
    *     re-consumed: each must take its APPEND-ONLY refresh path, and
    *     the refreshed contents must satisfy the exact shard-
    *     disjointness invariants — row counts scale to reps+1, and the
    *     edge list is exactly (reps+1)× the base dir's (disjoint shards
    *     can never cross-pair, so one extra shard adds exactly one
    *     base-pattern of edges).
    *
    * Run explicitly (`stress j`) for the round readout; the 100×
    * replicate+query volume is tens of minutes on this host.
    */
  private def tierJ(spark: SparkSession, baseDir: String, dir: String): Unit = {
    val reps = 100
    val mult = reps + 1
    val (_, tRep) = timed("j.replicate")(
      replicateTables(spark, baseDir, dir, warehouseTables, mult, 0 until reps))
    val nBaseLi = spark.read.parquet(s"$baseDir/lineitem.parquet").count()
    val nLi = spark.read.parquet(s"$dir/lineitem.parquet").count()
    val nBaseOrd = spark.read.parquet(s"$baseDir/orders.parquet").count()
    println(f"STRESS j.replicate seconds=$tRep%.1f lineitem=$nLi orders=${nBaseOrd * reps}")
    check(nLi == nBaseLi * reps, s"tier J lineitem count $nLi != $nBaseLi*$reps")

    // fact-artifact builds at 100× — the per-ingest-epoch cost
    val (nOkey, tOkey) = timed("j.artifact_okey") {
      graft.ops.Layout.ordersByOrderkey(spark, dir).count() +
        graft.ops.Layout.lineitemByOrderkey(spark, dir).count()
    }
    println(f"STRESS j.artifact_okey seconds=$tOkey%.1f rows=$nOkey")
    check(nOkey == (nBaseOrd + nBaseLi) * reps,
      "co-bucketed fact layout must carry every replicated row")
    val (nEdges, tEdges) = timed("j.artifact_edges")(
      graft.ext.Graph.coPurchaseEdges(spark, dir).count())
    val nEdgesBase = graft.ext.Graph.coPurchaseEdges(spark, baseDir).count()
    println(f"STRESS j.artifact_edges seconds=$tEdges%.1f edges=$nEdges base=$nEdgesBase")
    check(nEdges == nEdgesBase * reps,
      "disjoint shards must contribute exactly reps base edge patterns")

    // the warehouse family, base vs 100×
    val names = tierJQueries.map(q => q -> graft.SparkEntry.queries(q))
    val base = scala.collection.mutable.Map.empty[String, Double]
    val rep = scala.collection.mutable.Map.empty[String, Double]
    val errs = scala.collection.mutable.Map.empty[String, String]
    for (round <- 1 to 2; (name, fn) <- names; (d, acc) <- Seq(
      (baseDir, base), (dir, rep))) {
      val t0 = System.nanoTime()
      try fn(spark, d).count() catch {
        case e: Throwable =>
          errs(name) = s"${e.getClass.getSimpleName}: ${
            Option(e.getMessage).getOrElse("").take(160)}"
      }
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      acc.updateWith(name) {
        case Some(p) => Some(math.min(p, t)); case None => Some(t)
      }
    }
    errs.toSeq.sortBy(_._1).foreach { case (q, m) =>
      check(false, s"tier J: $q failed at ${reps}x: $m")
    }
    val floor = 0.15
    val flagged = tierJQueries.filterNot(errs.contains).flatMap { q =>
      val r = rep(q) / math.max(base(q), floor)
      println(f"STRESS j.query name=$q base=${base(q)}%.3f rep=${rep(q)}%.3f ratio=$r%.1f")
      if (r > 2.5 * reps) Some(q -> r) else None
    }
    flagged.foreach { case (q, r) =>
      println(f"STRESS j.flag name=$q ratio=$r%.1f (super-linear at ${reps}x — fix or document)")
    }

    // refresh: the 101st shard arrives as an append-only parquet delta
    val (_, tDelta) = timed("j.refresh_append")(
      replicateTables(spark, baseDir, dir, Seq("orders", "lineitem"), mult,
        reps to reps, mode = "append"))
    val (nOkey2, tRefOkey) = timed("j.refresh_okey") {
      graft.ops.Layout.ordersByOrderkey(spark, dir).count() +
        graft.ops.Layout.lineitemByOrderkey(spark, dir).count()
    }
    println(f"STRESS j.refresh_okey seconds=$tRefOkey%.1f append=$tDelta%.1f rows=$nOkey2")
    check(nOkey2 == (nBaseOrd + nBaseLi) * (reps + 1),
      "okey refresh must append exactly the delta shard's rows")
    val (nEdges2, tRefEdges) = timed("j.refresh_edges")(
      graft.ext.Graph.coPurchaseEdges(spark, dir).count())
    println(f"STRESS j.refresh_edges seconds=$tRefEdges%.1f edges=$nEdges2")
    check(nEdges2 == nEdgesBase * (reps + 1),
      "edge refresh must add exactly one base edge pattern (delta-only merge)")
    // the generational append must beat the build by construction: the
    // committed ~240M edge rows HARDLINK forward and only the delta's
    // pairs are derived (one linear scan of prior files, delta-sized
    // shuffles) and written — the r10 rewrite bound (refresh 80.9 s ≈
    // build 77.4 s) is exactly what this check now forbids
    check(tRefEdges < tEdges * 0.6 + 5.0,
      "generational edge refresh must cost well under a build")
    println(f"STRESS j.summary queries=${tierJQueries.size} errors=${errs.size} flagged=${flagged.size}")
  }

  /** Tier K — the corpus-artifact refresh decade (scaladoc above): the
    * per-row corpus artifacts whose refresh switched to the hardlink
    * delta commit, measured tier-J-style. Per-doc/per-vector derivation
    * is replication-invariant (replicas share bodies/vectors under
    * remapped ids), so build counts must be exactly base×reps and the
    * refreshed counts base×(reps+1); the appended shard's ids sit above
    * the frozen IVF seed ceiling by construction (rep index is the
    * id's low component), so ivf_cells must take the frozen-quantizer
    * delta path, never the rebuild.
    */
  private def tierK(spark: SparkSession, baseDir: String, dir: String): Unit = {
    val reps = 100
    // multiplier reserves shard ids for the refresh delta, the 12-epoch
    // file-growth walk (shards reps..reps+12) AND the 4-epoch
    // staleEpochs walk (reps+13..reps+16) — every id stays disjoint
    // from the build shards' v·mult + [0, reps) range
    val mult = reps + 17
    val walkEpochs = 12
    val (_, tRep) = timed("k.replicate")(replicateTables(
      spark, baseDir, dir, Seq("documents", "embeddings"), mult, 0 until reps))
    val nBaseDocs = spark.read.parquet(s"$baseDir/documents.parquet").count()
    val nBaseVecs = spark.read.parquet(s"$baseDir/embeddings.parquet").count()
    println(f"STRESS k.replicate seconds=$tRep%.1f docs=${nBaseDocs * reps} vecs=${nBaseVecs * reps}")

    // every maintained per-row corpus artifact family on the hardlink
    // delta commit (r12: +postings, +minhash/simhash sigs, +media sigs,
    // +the two-layer shingle pair). Each build count must be exactly
    // base-pattern × reps (per-doc/per-vector derivation is
    // replication-invariant), each refreshed count base × (reps+1).
    val families: Seq[(String, () => Long)] = Seq(
      ("spans", () => Dedup.spanRowsShared(spark, dir).count()),
      ("winnow", () => Dedup.winnowSelShared(spark, dir).count()),
      ("ivf", () => graft.ext.Similarity.ivfCellIndex(spark, dir).count()),
      ("postings", () => graft.ext.Search.postingsShared(spark, dir).count()),
      ("minhash_sig", () => Dedup.minHashSignaturesShared(spark, dir).count()),
      ("simhash_sig", () => Dedup.simHashSignaturesShared(spark, dir).count()),
      ("media_sig", () =>
        graft.ext.Multimodal.mediaSignaturesShared(spark, dir).count()),
      ("shingle_rows", () => Dedup.shingleRowsShared(spark, dir).count()),
      ("shingle_stats", () => Dedup.shingleStatsShared(spark, dir).count()))
    val basePattern: Map[String, Long] = Map(
      "spans" -> Dedup.spanRowsShared(spark, baseDir).count(),
      "winnow" -> Dedup.winnowSelShared(spark, baseDir).count(),
      "ivf" -> nBaseVecs,
      "postings" -> graft.ext.Search.postingsShared(spark, baseDir).count(),
      "minhash_sig" ->
        Dedup.minHashSignaturesShared(spark, baseDir).count(),
      "simhash_sig" ->
        Dedup.simHashSignaturesShared(spark, baseDir).count(),
      "media_sig" ->
        graft.ext.Multimodal.mediaSignaturesShared(spark, baseDir).count(),
      "shingle_rows" -> Dedup.shingleRowsShared(spark, baseDir).count(),
      "shingle_stats" -> Dedup.shingleStatsShared(spark, baseDir).count())

    // builds at 100×. NOTE shingle_stats builds AFTER shingle_rows, so
    // its timed build is the O(artifact) window recompute alone — the
    // honest "rebuild minus tokenize" number the two-layer split buys.
    val buildT = scala.collection.mutable.Map.empty[String, Double]
    families.foreach { case (name, ensure) =>
      val (n, t) = timed(s"k.artifact_$name")(ensure())
      buildT(name) = t
      println(f"STRESS k.artifact_$name seconds=$t%.1f rows=$n")
      check(n == basePattern(name) * reps,
        s"$name rows $n != base pattern ${basePattern(name)} x $reps")
    }

    // the (reps+1)-th shard lands as an append-only parquet delta
    val (_, tDelta) = timed("k.refresh_append")(replicateTables(
      spark, baseDir, dir, Seq("documents", "embeddings"), mult,
      reps to reps, mode = "append"))
    println(f"STRESS k.refresh_append seconds=$tDelta%.1f")
    val r0 = graft.ops.Layout.refreshCount.get
    val b0 = graft.ops.Layout.buildCount.get
    families.foreach { case (name, ensure) =>
      val (n, t) = timed(s"k.refresh_$name")(ensure())
      println(f"STRESS k.refresh_$name seconds=$t%.1f rows=$n " +
        f"ratio=${t / math.max(buildT(name), 0.001)}%.2f")
      check(n == basePattern(name) * (reps + 1),
        s"$name refresh must add exactly one shard pattern")
      // the delta commit must beat the build decisively — except
      // shingle_stats, whose refresh IS its (already tokenize-free)
      // global window recompute: bounded by build, not by half of it
      if (name == "shingle_stats")
        check(t < buildT(name) * 1.5 + 5.0,
          s"$name stats recompute must stay rebuild-shaped")
      else
        check(t < buildT(name) * 0.5 + 5.0,
          s"$name refresh must cost well under a build")
    }
    // buildCount also counts FullRebuild fallbacks inside the refresh
    // path, so rebuilds=0 genuinely asserts every delta path was taken
    // (e.g. a seed-ceiling regression in ivf_cells would trip it).
    // shingle_stats contributes ONE refresh of its own on top of
    // shingle_rows' (its kernel re-windows the already-refreshed rows).
    check(graft.ops.Layout.refreshCount.get == r0 + families.size,
      "all families must take the refresh path on the append")
    check(graft.ops.Layout.buildCount.get == b0,
      "no artifact may rebuild on an append-only delta")

    // 12-epoch WALK (postings): shards land one at a time, each refresh
    // links the committed files forward and adds ≤ `buckets` delta
    // files — total file count must stay inside the deltaFileFactor
    // compaction bound the whole way (tier K run 1 r11 caught the
    // unaligned writer exploding to tasks×buckets files in ONE epoch)
    val whRoot = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val fsW = whRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def postingsFiles(): Int = {
      val d = fsW.listStatus(whRoot).map(_.getPath)
        .filter(_.getName.startsWith("graft_postings_"))
        .maxBy(p => fsW.getFileStatus(p).getModificationTime)
      fsW.listStatus(d).count(s =>
        s.isFile && s.getPath.getName.endsWith(".parquet"))
    }
    var tWalk = 0.0
    var maxFiles = 0
    // mirror the postings artifact's layout constants (ensureDerived
    // defaults): the walk's growth bound derives from them instead of
    // hardcoding magic numbers that could desynchronize from the
    // contract. The walk deliberately stays BELOW the
    // buckets×deltaFileFactor compaction trigger — the compaction epoch
    // itself is pinned at small scale in LayoutRefreshSpec's 12-epoch
    // walk; what this tier pins is the ALIGNED writer's
    // ≤buckets-files-per-epoch growth at 100× volume (the r11 tier-K
    // run-1 regression wrote tasks×buckets files in ONE epoch, which
    // this bound catches immediately).
    val buckets = 32
    (1 to walkEpochs).foreach { e =>
      replicateTables(spark, baseDir, dir, Seq("documents"), mult,
        (reps + e) to (reps + e), mode = "append")
      val (_, t) = timed(s"k.walk_$e")(
        graft.ext.Search.postingsShared(spark, dir).count())
      tWalk += t
      val nf = postingsFiles()
      maxFiles = math.max(maxFiles, nf)
      // base(≤buckets) + the refresh shard(≤buckets) + ≤buckets per
      // walk epoch
      check(nf <= buckets * (2 + e),
        s"walk epoch $e: postings files $nf grew faster than buckets/epoch")
    }
    val nWalk = graft.ext.Search.postingsShared(spark, dir).count()
    check(nWalk == basePattern("postings") * (reps + 1 + walkEpochs),
      s"walk total $nWalk != base pattern x ${reps + 1 + walkEpochs}")
    println(f"STRESS k.walk epochs=$walkEpochs seconds=$tWalk%.1f " +
      s"max_files=$maxFiles rows=$nWalk")

    // staleEpochs AMORTIZATION walk (r13): the stats layer's window
    // recompute — the one cost the two-layer split cannot make
    // delta-proportional — amortizes to 1/K per epoch under the bounded-
    // staleness knob: at K = 4, three appends SERVE the committed stats
    // (hardlink-forward, no job) and the fourth recomputes.
    val nShards = reps + 1 + walkEpochs
    // NOTE on timings: the ENSURE is the maintainer's cost (the serve or
    // the recompute job runs inside it — commitBuild is eager); the
    // consumer count is a separate, untimed scan so a 30M-row read can't
    // masquerade as serve cost (tier K run 1 r13 mis-read exactly that).
    // Catch the stats layer up to the walk's 12 doc shards first, so the
    // stale walk measures exactly its own four epochs.
    val (dfC, tCatch) = timed("k.stale_catchup")(
      Dedup.shingleStatsShared(spark, dir))
    val fresh0 = dfC.count()
    println(f"STRESS k.stale_catchup seconds=$tCatch%.1f rows=$fresh0")
    check(fresh0 == basePattern("shingle_stats") * nShards,
      "catch-up recompute must cover the walk shards")
    spark.conf.set("graft.shingleStats.staleEpochs", "4")
    try {
      var tServe = 0.0
      var worstServe = 0.0
      val bS = graft.ops.Layout.buildCount.get
      (1 to 3).foreach { e =>
        replicateTables(spark, baseDir, dir, Seq("documents"), mult,
          (reps + 12 + e) to (reps + 12 + e), mode = "append")
        val (dfS, t) = timed(s"k.stale_serve_$e")(
          Dedup.shingleStatsShared(spark, dir))
        val n = dfS.count()
        tServe += t
        worstServe = math.max(worstServe, t)
        println(f"STRESS k.stale_serve_$e seconds=$t%.1f rows=$n")
        check(n == fresh0, s"stale serve $e must hand back the committed stats")
      }
      check(graft.ops.Layout.buildCount.get == bS,
        "stale serves must not build")
      replicateTables(spark, baseDir, dir, Seq("documents"), mult,
        (reps + 16) to (reps + 16), mode = "append")
      val (df4, t4) = timed("k.stale_recompute")(
        Dedup.shingleStatsShared(spark, dir))
      val n4 = df4.count()
      println(f"STRESS k.stale_recompute seconds=$t4%.1f rows=$n4")
      check(n4 == basePattern("shingle_stats") * (nShards + 4),
        "the Kth epoch's recompute must cover every stale-served shard")
      // a serve is kernel-free (buildCount pinned above); its wall cost
      // is session bookkeeping (catalog mint + hardlinks + GC sweep,
      // ~1-2 s at this warehouse's ~500 registered tables) — bound it
      // RELATIVE to the recompute it displaces, plus an absolute cap
      // that would catch a window job sneaking back in
      check(worstServe < math.max(0.35 * t4, 1.0) && worstServe < 4.0,
        f"stale serve cost $worstServe%.1f s vs recompute $t4%.1f s — a job leaked in?")
      val amortized = (tServe + t4) / 4.0
      println(f"STRESS k.stale_amortized per_epoch=$amortized%.1f " +
        f"recompute=$t4%.1f serve_total=$tServe%.1f " +
        f"ratio_vs_recompute=${amortized / math.max(t4, 0.001)}%.2f")
    } finally spark.conf.unset("graft.shingleStats.staleEpochs")

    println(s"STRESS k.summary artifacts=${families.size} " +
      s"refreshes=${graft.ops.Layout.refreshCount.get - r0} " +
      s"rebuilds=${graft.ops.Layout.buildCount.get - b0}")
  }

  /** Tier L — the STREAMING edge maintainer at scale: 20 order-disjoint
    * replicas of the sf0.1 lineitem (12M lines) arrive as 10 epochs
    * through [[graft.streaming.CorpusIngest.edgeBatchBody]] against a
    * growing committed index. Proves the three contract properties the
    * MemoryStream spec can only show at toy size:
    *
    *   - per-epoch cost stays EPOCH-SIZED as the member log grows (the
    *     old side is read touched-orders-only; new orders touch none);
    *   - an at-least-once redelivery of an already-committed replica's
    *     lines derives ZERO memberships and a zero edge delta;
    *   - the merged read equals the one-shot bounded derivation exactly
    *     (replication-invariant: replicas are id-remapped disjoint
    *     graphs, so merged edges = base pattern × reps).
    */
  private def tierL(spark: SparkSession, baseDir: String, dir: String): Unit = {
    val reps = 20
    val epochs = 10
    val (_, tRep) = timed("l.replicate")(replicateTables(
      spark, baseDir, dir, Seq("lineitem"), reps, 0 until reps))
    val nBase = spark.read.parquet(s"$baseDir/lineitem.parquet").count()
    println(f"STRESS l.replicate seconds=$tRep%.1f lines=${nBase * reps}")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val baseOp = graft.ext.Graph.boundedBaskets(
      spark.read.parquet(s"$baseDir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey")).distinct())
    val baseEdges = graft.ext.Graph.edgeAggW(
      graft.ext.Graph.edgePairsOf(baseOp, baseOp)).count()
    val idx = s"$dir/edge_index"
    val pIdx = new org.apache.hadoop.fs.Path(idx)
    pIdx.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(pIdx, true)
    var first = 0.0
    var worst = 0.0
    (0 until epochs).foreach { e =>
      val batch = li.filter(pmod(col("l_orderkey"), lit(reps.toLong))
        .isin(2L * e, 2L * e + 1))
      val (_, t) = timed(s"l.epoch_$e") {
        graft.streaming.CorpusIngest.edgeBatchBody(batch, idx, e.toLong); 0L
      }
      if (e == 0) first = t
      worst = math.max(worst, t)
      println(f"STRESS l.epoch_$e seconds=$t%.1f")
    }
    check(worst < first * 3.0 + 5.0,
      f"epoch cost grew with index size: first $first%.1f worst $worst%.1f")
    // at-least-once redelivery of replica 0's (committed) lines
    val (_, tReplay) = timed("l.replay_epoch") {
      graft.streaming.CorpusIngest.edgeBatchBody(
        li.filter(pmod(col("l_orderkey"), lit(reps.toLong)) === 0L),
        idx, epochs.toLong); 0L
    }
    println(f"STRESS l.replay_epoch seconds=$tReplay%.1f")
    val replayMembers = spark.read
      .schema("l_orderkey BIGINT, l_partkey BIGINT")
      .parquet(s"$idx/members/epoch=$epochs").count()
    check(replayMembers == 0L,
      s"redelivered lines contributed $replayMembers memberships (want 0)")
    val (nEdges, tMerge) = timed("l.merged_read")(
      graft.streaming.CorpusIngest.readEdgeIndex(spark, idx).count())
    println(f"STRESS l.merged_read seconds=$tMerge%.1f edges=$nEdges")
    check(nEdges == baseEdges * reps,
      s"merged stream index $nEdges != one-shot pattern $baseEdges x $reps")
    println(s"STRESS l.summary epochs=$epochs replay_zero=true " +
      f"first=$first%.1f worst=$worst%.1f")
  }

  /** Tier M — the SECOND streaming family at streaming-maintainer scale
    * (r12 verdict #4, pairing tier L's edge readout): the NEAR-DUP
    * ingest over 100k documents — 20 disjoint id-replicas of the sf0.1
    * corpus (texts repeat verbatim, the worst case for a near-dup
    * index) — fed through [[graft.streaming.CorpusIngest.nearDedupBody]]
    * in 10 epochs of two replicas each. Checks:
    *
    *   - per-epoch cost stays flat-ish as the signature index grows
    *     (each epoch pays its own tokenize+minhash plus a band-probe of
    *     the committed index — fixed-width rows, never the corpus text);
    *   - a REDELIVERED epoch (the crash-window retry) derives ZERO new
    *     keepers — the index never holds a duplicate signature;
    *   - the final keeper set equals the ONE-SHOT batch derivation over
    *     all 100k docs exactly. Bucket caps are lifted on BOTH sides for
    *     this check: cap-drop is order-dependent BY DESIGN (a bucket
    *     that crosses the cap only once all replicas pile in drops
    *     candidates the per-epoch view legitimately keeps), and the cap
    *     behavior has its own readout (tier I: 1000-twin buckets drop
    *     everywhere). With caps out of the way, keeper equality is
    *     forced: every epoch contains a replica of every text pattern,
    *     so a doc's dup witness is always present either in the epoch
    *     or in the committed keepers.
    */
  private def tierM(spark: SparkSession, baseDir: String, dir: String): Unit = {
    val reps = 20
    val epochs = 10
    val noCap = 1 << 20
    val thr = 0.5
    val (_, tRep) = timed("m.replicate")(replicateTables(
      spark, baseDir, dir, Seq("documents"), reps, 0 until reps))
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    println(f"STRESS m.replicate seconds=$tRep%.1f docs=$n")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val idx = s"$dir/near_index"
    val rep = s"$dir/near_report"
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(idx), true)
    fs.delete(new org.apache.hadoop.fs.Path(rep), true)
    var first = 0.0
    var worst = 0.0
    (0 until epochs).foreach { e =>
      val batch = docs.filter(pmod(col("doc_id"), lit(reps.toLong))
        .isin(2L * e, 2L * e + 1))
      val (_, t) = timed(s"m.epoch_$e") {
        graft.streaming.CorpusIngest.nearDedupBody(
          batch, idx, rep, thr, noCap); 0L
      }
      if (e == 0) first = t
      worst = math.max(worst, t)
      println(f"STRESS m.epoch_$e seconds=$t%.1f")
    }
    check(worst < first * 3.0 + 5.0,
      f"near-dup epoch cost grew with index size: first $first%.1f worst $worst%.1f")
    // crash-window redelivery of the LAST epoch: zero new keepers
    val preReplay = spark.read.parquet(idx).count()
    val (_, tReplay) = timed("m.replay_epoch") {
      graft.streaming.CorpusIngest.nearDedupBody(
        docs.filter(pmod(col("doc_id"), lit(reps.toLong))
          .isin(2L * (epochs - 1), 2L * (epochs - 1) + 1)),
        idx, rep, thr, noCap); 0L
    }
    val postReplay = spark.read.parquet(idx).count()
    println(f"STRESS m.replay_epoch seconds=$tReplay%.1f added=${postReplay - preReplay}")
    check(postReplay == preReplay,
      s"redelivered epoch appended ${postReplay - preReplay} keepers (want 0)")
    // keeper-set equality with the one-shot derivation over all docs
    val streamedKeepers = spark.read.parquet(idx)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val (oneShot, tOne) = timed("m.one_shot") {
      val sig = graft.ext.Dedup.minHashSignaturesOf(docs).persist()
      try {
        val emptyIdx = sig.filter(lit(false))
        val (report, _) = graft.ext.Dedup.nearDupBatch(sig, emptyIdx, thr, noCap)
        report.filter(!col("is_dup"))
          .select(col("new_doc_id")).collect().map(_.getLong(0)).toSet
      } finally { sig.unpersist(); () }
    }
    println(f"STRESS m.one_shot seconds=$tOne%.1f keepers=${oneShot.size} " +
      f"streamed=${streamedKeepers.size}")
    check(streamedKeepers == oneShot,
      s"streamed keeper set (${streamedKeepers.size}) != one-shot (${oneShot.size}); " +
        s"diff=${(streamedKeepers diff oneShot).take(5)} / ${(oneShot diff streamedKeepers).take(5)}")
    println(s"STRESS m.summary epochs=$epochs replay_zero=true " +
      f"first=$first%.1f worst=$worst%.1f keepers=${oneShot.size}")
  }

  /** Tier N — ANN RANK QUALITY at corpus ×100 (200k vectors): the recall
    * audits run per-round at sf0.1 prove the retrieval tiers against a
    * 2k-vector corpus; this tier re-proves them where cell pruning has
    * real teeth. Replicas are PERTURBED (multiplicative jitter up to
    * ±50% per element, deterministic in (vec_id, rep, i)), not twins —
    * tier E owns the exact-duplicate worst case; here every replica is a
    * distinct point so recall is a genuine ranking question, and probe
    * queries (base ids 0..19, identity replicas) see a 100×-denser
    * neighborhood. Checks: trained-IVF and ADC-shortlist→re-rank recall
    * hold a floor at 40× the audited corpus, and the warm bucket-pruned
    * search leg beats the brute scan it replaces — the inequality that
    * only widens with corpus size.
    */
  private def tierN(spark: SparkSession, baseDir: String, dir: String): Unit = {
    import graft.ext.Similarity
    val reps = 100
    val probes = 20
    val k = 5
    val base = spark.read.parquet(s"$baseDir/embeddings.parquet")
    val nBase = base.count()
    val (_, tRep) = timed("n.replicate") {
      base
        .withColumn("rep", explode(sequence(lit(0), lit(reps - 1))))
        .withColumn("emb2",
          when(col("rep") === 0, col("embedding")).otherwise(expr(
            "transform(embedding, (x, i) -> CAST(x * (1.0D + 0.5D * " +
              "((CAST(pmod(xxhash64(vec_id, rep, i), 2001) AS DOUBLE) " +
              "- 1000.0D) / 1000.0D)) AS FLOAT))")))
        // block-remapped ids: probe ids 0..probes-1 stay the DIVERSE base
        // vectors (family-contiguous ids would make every probe a jitter
        // of base vector 0)
        .select((col("vec_id") + col("rep") * nBase).as("vec_id"),
          col("emb2").as("embedding"), col("label"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    println(f"STRESS n.replicate seconds=$tRep%.1f vectors=$n")
    check(n == nBase * reps, s"tier N row count $n != $nBase*$reps")

    def meanRecall(df: org.apache.spark.sql.DataFrame): Double = {
      val rows = df.collect()
      check(rows.length == probes, s"recall rows ${rows.length} != $probes")
      rows.foreach { r =>
        val v = r.getAs[Double]("recall_at_k")
        check(v >= 0.0 && v <= 1.0, s"recall out of range: $v")
      }
      rows.map(_.getAs[Double]("recall_at_k")).sum / rows.length
    }

    // first call builds the trained-quantizer + PQ artifacts at 200k
    val (rIvf, tIvf) = timed("n.recall_ivf_trained")(
      meanRecall(Similarity.annRecallIvfTrained(spark, dir, probes, k)))
    println(f"STRESS n.recall_ivf_trained seconds=$tIvf%.1f recall=$rIvf%.3f")
    val (rRr, tRr) = timed("n.recall_ivfpq_rerank")(
      meanRecall(Similarity.annRecallIvfPqRerank(spark, dir, probes, k)))
    println(f"STRESS n.recall_ivfpq_rerank seconds=$tRr%.1f recall=$rRr%.3f")
    // floors: the sf0.1-audited legs sit at 0.88-0.92; cell pruning over
    // a 100x-denser corpus may cost some, but a collapse means the
    // index is routing wrong
    check(rIvf >= 0.6, f"trained-IVF recall collapsed at 100x: $rIvf%.3f")
    check(rRr >= 0.55, f"ADC re-rank recall collapsed at 100x: $rRr%.3f")

    // warm search legs: artifacts committed above, so this times the
    // QUERY path alone; the pruned probe must beat the brute scan. A
    // 1.3× margin keeps the signal (the regression class this caught —
    // per-query corpus re-assignment — was 5×) without flaking on a
    // loaded host's wall-clock jitter.
    val (nb, tBrute) = timed("n.brute_warm")(
      Similarity.bruteForceTopK(spark, dir, probes, k).collect().length)
    val (ni, tProbe) = timed("n.ivf_warm")(
      Similarity.ivfTopKTrained(spark, dir, probes, k).collect().length)
    println(f"STRESS n.warm_search brute=$tBrute%.1f ivf=$tProbe%.1f " +
      f"rows=$nb/$ni")
    check(nb == probes * k && ni == probes * k,
      s"top-k row counts $nb/$ni != ${probes * k}")
    check(tProbe < tBrute * 1.3,
      f"bucket-pruned search ($tProbe%.1f s) exceeds 1.3x brute " +
        f"($tBrute%.1f s) at 100x")
  }

  /** Tier O — the ER family at a WEB-SCALE VOCABULARY, plus the
    * canonicalization pass at documents×100.
    *
    * The fixture part catalog has 64 distinct names at EVERY SF, so the
    * registered ER rows never measure what actually limits entity
    * resolution at 100 TB: vocabulary growth. This tier builds a 2M-row
    * catalog with 600k distinct surface forms — 200k name families
    * ("adj noun sku<code>", the near-unique model-number token real
    * catalogs carry), each family one clean form (8 rows) plus two
    * deterministic substitution variants (1 row each): varA replaces the
    * adjective's first char, varB the noun's first char. Both edits stay
    * OUTSIDE the sku token, and the sku code doubles every digit-letter,
    * so any cross-family pair is ≥ 2 edits apart and the τ=1 ground
    * truth is EXACTLY 2 pairs per family (clean↔varA, clean↔varB;
    * varA↔varB is 2). Tier N's lesson applied to the late-round batch:
    * a leg's fixture-SF correctness says nothing about its blocking at
    * a grown vocabulary — measure it, with exact count invariants.
    */
  private def tierO(spark: SparkSession, baseDir: String, dir: String): Unit = {
    import graft.ext.{EntityResolution, Normalize}
    val families = 200000L
    val rowsPerFamily = 10L
    val (_, tGen) = timed("o.catalog") {
      val adjArr = array(
        "small,red,blue,hot,large,old,cold,new".split(",").map(lit(_)): _*)
      val nounArr = array(
        "ring,widget,bolt,gear,gizmo,plate,cap,valve".split(",").map(lit(_)): _*)
      spark.range(families * rowsPerFamily)
        .withColumn("f", col("id") % families)
        .withColumn("r", (col("id") / lit(families)).cast("int"))
        // doubled digit-letters: two distinct codes differ in >= 2 chars
        .withColumn("code",
          regexp_replace(
            translate(col("f").cast("string"), "0123456789", "abcdefghij"),
            "(.)", "$1$1"))
        .withColumn("adj", element_at(adjArr, (col("f") % 8 + 1).cast("int")))
        .withColumn("noun",
          element_at(nounArr, ((col("f") / 8) % 8 + 1).cast("int")))
        .withColumn("p_name",
          when(col("r") === 8, concat(lit("q"), expr("substring(adj, 2)"),
            lit(" "), col("noun"), lit(" sku"), col("code")))
            .when(col("r") === 9, concat(col("adj"), lit(" q"),
              expr("substring(noun, 2)"), lit(" sku"), col("code")))
            .otherwise(concat(col("adj"), lit(" "), col("noun"),
              lit(" sku"), col("code"))))
        .select((col("id") + 1).as("p_partkey"), col("p_name"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/part.parquet")
    }
    val cat = spark.read.parquet(s"$dir/part.parquet")
    val nRows = cat.count()
    val nNames = cat.select("p_name").distinct().count()
    println(f"STRESS o.catalog seconds=$tGen%.1f rows=$nRows names=$nNames")
    check(nRows == families * rowsPerFamily, s"tier O rows $nRows")
    check(nNames == families * 3,
      s"tier O distinct names $nNames != ${families * 3}")

    // the blocking contrast, measured on the real kernels: candidate
    // pairs each discipline would have to verify = sum C(block, 2)
    val names = EntityResolution.distinctNames(spark, dir)
      .select(col("name_id"), col("p_name"))
    def candSum(blocks: org.apache.spark.sql.DataFrame): Long = blocks
      .agg(sum(expr("cnt * (cnt - 1) / 2")).cast("long")).first().getLong(0)
    val delCand = candSum(EntityResolution.delKeys(names, "p_name")
      .groupBy("key").agg(count(lit(1)).as("cnt")))
    val tokCand = candSum(names
      .select(posexplode(split(col("p_name"), " ")).as(Seq("pos", "tok")))
      .groupBy("pos", "tok").agg(count(lit(1)).as("cnt")))
    println(s"STRESS o.blocking_candidates delete_neighborhood=$delCand " +
      s"pos_token=$tokCand")
    check(delCand > 0 && tokCand / math.max(delCand, 1L) > 1000,
      s"(pos, token) blocking should be >1000x the delete-neighborhood " +
        s"here: $tokCand vs $delCand")

    // tau=1 matches: the exact in-family truth, nothing else
    val (nPairs, tNm) = timed("o.name_matches")(
      EntityResolution.nameMatches(spark, dir).count())
    println(f"STRESS o.name_matches seconds=$tNm%.1f pairs=$nPairs")
    check(nPairs == families * 2,
      s"tier O name matches $nPairs != ${families * 2} (2 per family)")

    // typo leg: every generated adjacent-swap typo must find its own
    // source name at DL <= 1 (the self-match is the recall floor; the
    // blocking is lossless so extras, if any, are genuine DL<=1 hits)
    val (typo, tTy) = timed("o.typo_matches") {
      val t = EntityResolution.typoMatches(spark, dir)
      t.agg(count(lit(1)).as("n"),
        count(when(col("typo_id") === col("name_id"), 1)).as("self"),
        max(col("dl_dist")).as("maxdl")).first()
    }
    println(f"STRESS o.typo_matches seconds=$tTy%.1f rows=${typo.getAs[Long]("n")} self=${typo.getAs[Long]("self")}")
    check(typo.getAs[Long]("self") == nNames,
      s"every typo must match its source: ${typo.getAs[Long]("self")} != $nNames")
    check(typo.getAs[Int]("maxdl") <= 1, "typo match above the DL bound")

    // golden records: 200k entities of exactly 3 variants / 10 rows
    val (gr, tGr) = timed("o.golden_records") {
      val g = EntityResolution.goldenRecords(spark, dir)
      g.agg(count(lit(1)).as("n"),
        count(when(col("n_variants") === 3, 1)).as("v3"),
        sum(col("n_parts")).as("rows")).first()
    }
    println(f"STRESS o.golden_records seconds=$tGr%.1f entities=${gr.getAs[Long]("n")}")
    check(gr.getAs[Long]("n") == families,
      s"tier O entities ${gr.getAs[Long]("n")} != $families")
    check(gr.getAs[Long]("v3") == families, "every entity must have 3 variants")
    check(gr.getAs[Long]("rows") == nRows, "entity row support must cover the catalog")

    // canonicalization at documents x100: embarrassingly parallel row
    // pass; base-vs-100x ratio is the linearity readout
    val (baseStats, tBase) = timed("o.normalize_base")(
      Normalize.textNormalize(spark, baseDir)
        .agg(count(lit(1)).as("n"),
          count(when(!col("already_clean"), 1)).as("dirty")).first())
    val (_, tRepD) = timed("o.docs_replicate")(replicate(spark, baseDir, dir, 100))
    val (stats, tNorm) = timed("o.text_normalize")(
      Normalize.textNormalize(spark, dir)
        .agg(count(lit(1)).as("n"),
          count(when(!col("already_clean"), 1)).as("dirty")).first())
    val n100 = stats.getAs[Long]("n")
    println(f"STRESS o.text_normalize base_seconds=$tBase%.1f seconds=$tNorm%.1f docs=$n100 ratio=${tNorm / math.max(tBase, 0.001)}%.1f rep_seconds=$tRepD%.1f")
    check(n100 == baseStats.getAs[Long]("n") * 100, s"tier O doc count $n100")
    check(stats.getAs[Long]("dirty") == 0L,
      "the provided corpus is ASCII: normalization must be a no-op on it")
  }

  def main(args: Array[String]): Unit = {
    val tier = args.headOption.getOrElse("all")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val root = "/root/repo/target/stress"
    val (_, total) = timed("total") {
      if (tier == "a" || tier == "all")
        tierA(spark, "/root/testdata/sf0.1", s"$root/sf0.1x100")
      if (tier == "b" || tier == "all")
        tierB(spark, "/root/testdata/sf0.01", s"$root/sf0.01x100")
      if (tier == "c" || tier == "all")
        tierC(spark, "/root/testdata/sf0.1", s"$root/sf0.1li10")
      if (tier == "d" || tier == "all")
        tierD(spark, "/root/testdata/sf0.1", s"$root/sf0.1ev100")
      if (tier == "e" || tier == "all")
        tierE(spark, "/root/testdata/sf0.1", s"$root/sf0.1em10")
      if (tier == "f" || tier == "all")
        tierF(spark, "/root/testdata/sf0.1", s"$root/sf0.1doc100")
      if (tier == "g" || tier == "all")
        tierG(spark, "/root/testdata/sf0.01", s"$root/sf0.01x10all")
      // tiers H and I are NOT in "all": the sf0.1 registry-wide pass and
      // the 5M-doc dedup envelope each cost tens of minutes on this host —
      // run explicitly (`stress h`, `stress i`) for the round readout
      if (tier == "h")
        tierH(spark, "/root/testdata/sf0.1", s"$root/sf0.1x10all")
      if (tier == "i")
        tierI(spark, "/root/testdata/sf0.1", s"$root/sf0.1doc1000")
      if (tier == "j")
        tierJ(spark, "/root/testdata/sf0.1", s"$root/sf0.1wh100")
      if (tier == "k")
        tierK(spark, "/root/testdata/sf0.1", s"$root/sf0.1corpus100")
      if (tier == "l")
        tierL(spark, "/root/testdata/sf0.1", s"$root/sf0.1edgestream")
      if (tier == "m")
        tierM(spark, "/root/testdata/sf0.1", s"$root/sf0.1neardupstream")
      if (tier == "n")
        tierN(spark, "/root/testdata/sf0.1", s"$root/sf0.1annx100")
      if (tier == "o")
        tierO(spark, "/root/testdata/sf0.1", s"$root/sf0.1erx100")
    }
    println(f"STRESS total seconds=$total%.1f")
    println(s"STRESS_RESULT ${if (failures.isEmpty) "PASS" else "FAIL"}")
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
