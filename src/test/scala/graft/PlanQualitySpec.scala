package graft

/** Guards on the PHYSICAL plans of representative queries — the properties
  * that make them scale (pushdown, pruning, broadcast, no nested-loop
  * joins) must survive refactors. String-level assertions on the executed
  * plan: crude but stable across Spark minor versions, and they fail loud.
  */
class PlanQualitySpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("ads_search pushes the price range into the part scan and prunes columns") {
    val p = plan("ads_search")
    // (PushedFilters text is truncated in toString — assert on the Filter
    // expressions, which Catalyst only produces when pushdown analyzed.)
    assert("p_retailprice#\\d+ >= 905\\.0".r.findFirstIn(p).isDefined, p.take(2000))
    assert("p_retailprice#\\d+ <= 960\\.0".r.findFirstIn(p).isDefined)
    // lineitem feeds only the favorite-count: two columns at most
    val lineitemSchemas = "ReadSchema: struct<([^>]*l_[^>]*)>".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(lineitemSchemas.nonEmpty)
    lineitemSchemas.foreach { s =>
      assert(s.split(",").length <= 2, s"lineitem scan too wide: $s")
    }
  }

  test("ads_search_filtered keeps category + location predicates in-plan") {
    val p = plan("ads_search_filtered")
    assert("p_type#\\d+ = SMALL".r.findFirstIn(p).isDefined, p.take(2000))
    assert(p.toLowerCase.contains("contains(lower(p_brand"), p.take(2000))
  }

  test("ads_search_after evaluates the keyset cursor as a scan-side filter") {
    val p = plan("ads_search_after")
    // the composite (price, key) cursor must be a real predicate on the
    // part side (pushable OR-of-range), not applied after the join
    assert("p_retailprice#\\d+ > 910\\.0".r.findFirstIn(p).isDefined, p.take(2000))
    assert("p_partkey#\\d+L? > 0".r.findFirstIn(p).isDefined)
    // keyset pages are TakeOrdered (top-k), never a global sort
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("ad_by_id pushes the point key into BOTH fact scans") {
    val p = plan("ad_by_id")
    assert(p.contains("EqualTo(o_orderkey,42)"))
    assert(p.contains("EqualTo(l_orderkey,42)"))
  }

  test("favorites_list keeps the deleted-status filter in-plan (P9 fix)") {
    val p = plan("favorites_list")
    // the filter must appear as an actual pushed/evaluated predicate, not
    // merely as a projected column name
    assert("NOT \\(o_orderstatus#\\d+ = F\\)".r.findFirstIn(p).isDefined ||
      p.contains("Not(EqualTo(o_orderstatus,F))"), p.take(2000))
  }

  test("multi-way joins never degrade to nested-loop or cartesian") {
    for (q <- Seq("trades", "ads_search", "favorites_list", "conversations_list",
      "admin_users", "events_asof_orders", "scd2_history")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has a nested-loop join")
    }
  }

  test("round-4 pipeline queries never degrade to cartesian/nested-loop") {
    for (q <- Seq("span_dedup", "lm_score", "stratified_sample", "corpus_mix",
      "corpus_shard", "dedup_minhash", "dedup_simhash", "media_frames")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has a nested-loop join")
    }
  }

  test("round-5 queries never degrade to cartesian/nested-loop") {
    for (q <- Seq("span_stats", "span_doc_summary", "bpe_pair_counts",
      "stream_quality_windows", "ads_search_newest", "bpe_apply",
      "dedup_incremental_near")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has a nested-loop join")
    }
  }

  test("kmeans_assign_seed reads precomputed assignments: one artifact scan, no join") {
    val p = plan("kmeans_assign_seed")
    // r8: the seed assignment is a COLUMN of the maintained ivf_cells
    // artifact — the per-call plan is a plain scan + sort; any join means
    // the model leaked back distributed, any DotProduct means the
    // assignment is being recomputed per call
    assert(!p.contains("Join"), p.take(2000))
    assert(p.contains("graft_ivf_cells"), p.take(2000))
    assert(!p.toLowerCase.contains("dotproduct"), p.take(2000))
  }

  test("stream_quality_windows (batch mode) elides the watermark node") {
    // EliminateEventTimeWatermark must strip the streaming-only operator so
    // the batch twin is a plain hash aggregate
    val p = plan("stream_quality_windows")
    assert(!p.contains("EventTimeWatermark"), p.take(2000))
    assert(p.contains("HashAggregate"), p.take(2000))
  }

  test("round-5b queries never degrade to cartesian/nested-loop") {
    for (q <- Seq("corpus_upsample", "vocab_coverage", "source_novelty",
      "event_anomalies", "embedding_norms", "contamination_attribution")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has a nested-loop join")
    }
  }

  test("round-5c queries stay cartesian-free; fuzzy_search top-k is TakeOrdered") {
    for (q <- Seq("rolling_events", "event_funnel", "fuzzy_search")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has a nested-loop join")
    }
    // hourly_gapfill legitimately carries ONE nested-loop node: the
    // one-row span attach (|types| × 1). No cartesian of real relations.
    val gp = plan("hourly_gapfill")
    assert(!gp.contains("CartesianProduct"), gp.take(2000))
    val fz = plan("fuzzy_search")
    assert(fz.contains("TakeOrderedAndProject"), fz.take(2000))
  }

  test("corpus_upsample attaches the census by broadcast; corpus is never shuffled for the join") {
    val p = plan("corpus_upsample")
    // the |langs|-row epoch table must broadcast against the documents
    // scan; a SortMergeJoin here would shuffle the whole corpus at scale
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
    // repetition is a generator stage, not a join against a numbers table
    assert(p.contains("Generate"), p.take(2000))
  }

  test("vocab_coverage coverage join broadcasts the topK vocab") {
    val p = plan("vocab_coverage")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    // the vocab is TakeOrdered (per-partition top-k), never a global sort
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("training_set's stage filters are broadcast semi-joins, one window") {
    val p = plan("training_set")
    // survivor sets broadcast against the documents scan; the only
    // shuffle exchange belongs to near-dup/window machinery, and the
    // composition must never fall back to shuffled semi-joins of the
    // corpus against itself
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("span_dedup and stratified_sample scans stay column-pruned") {
    // span_dedup needs only (doc_id, text) from documents
    "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(plan("span_dedup"))
      .map(_.group(1)).foreach { s =>
        assert(s.split(",").length <= 2, s"span_dedup scan too wide: $s")
      }
    // stratified_sample projects (doc_id, lang, source) — never text
    "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(plan("stratified_sample"))
      .map(_.group(1)).foreach { s =>
        assert(!s.contains("text"), s"stratified_sample reads text: $s")
      }
  }

  test("pq_codes reads precomputed codes: one artifact scan, no join") {
    val p = plan("pq_codes")
    // r8: PQ codes are COLUMNS of the maintained ivf_cells artifact — the
    // per-call plan is a scan + sort; any join means the codebook leaked
    // back distributed, any DotProduct means codes recompute per call
    assert(!p.contains("Join"), p.take(2000))
    assert(p.contains("graft_ivf_cells"), p.take(2000))
    assert(!p.toLowerCase.contains("dotproduct"), p.take(2000))
  }

  test("ANN family reads the ivf_cells artifact with a bucket-PRUNED scan") {
    // knn_ivf / knn_ivfpq candidate retrieval must be a cell-filtered scan
    // of the cell-bucketed index (SelectedBucketsCount < total buckets) —
    // the probe's static IN filter is what lets the scan skip the other
    // cells' buckets entirely; neither may re-scan the raw corpus
    for (q <- Seq("knn_ivf", "knn_ivfpq")) {
      val p = plan(q)
      assert(p.contains("graft_ivf_cells"), s"$q must read the ivf_cells artifact")
      // substring trap: "graft_ivf_cells_trained" CONTAINS "graft_ivf_cells"
      // — the seeded legs must read the seeded artifact, not the trained one
      assert(!p.contains("graft_ivf_cells_trained"),
        s"$q reads the TRAINED artifact")
      assert(!p.contains("embeddings.parquet"), s"$q re-scans the raw corpus")
      val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(p)
      assert(m.isDefined, s"$q: no bucket-pruned scan in the plan")
      assert(m.get.group(1).toInt < m.get.group(2).toInt,
        s"$q: bucketed scan reads every bucket (${m.get.matched})")
    }
    // the TRAINED leg rides its own maintained artifact (tier N caught the
    // index-free form costing 5× brute at 200k): bucket-pruned scan of
    // graft_ivf_cells_trained, no raw-corpus re-scan, and no per-query
    // corpus re-assignment (the live path's argmax-over-centroids shows
    // up as a `greatest(` over the full scan)
    locally {
      val p = plan("knn_ivf_trained")
      assert(p.contains("graft_ivf_cells_trained"),
        "knn_ivf_trained must read the trained artifact")
      assert(!p.contains("embeddings.parquet"),
        "knn_ivf_trained re-scans the raw corpus")
      assert(!p.contains("greatest("),
        "knn_ivf_trained re-assigns the corpus per query")
      val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(p)
      assert(m.isDefined && m.get.group(1).toInt < m.get.group(2).toInt,
        "knn_ivf_trained: no bucket-pruned scan")
    }
    // cell-scoped semantic consumers start from the artifact's stored
    // assignments (their pair SIMS still run graft_dot, by design)
    for (q <- Seq("embedding_drift", "semantic_dedup", "bitext_mine")) {
      assert(plan(q).contains("graft_ivf_cells"),
        s"$q must read the ivf_cells artifact")
    }
    // the drift occupancy read is a pure column scan: ZERO dots per call
    assert(!plan("embedding_drift").toLowerCase.contains("dotproduct"),
      "embedding_drift recomputes cell assignments per call")
    // the recall audits keep their approximate leg on the bucket-pruned
    // artifact scan (the brute TRUTH leg legitimately reads the raw
    // corpus — it IS the exact baseline, so no raw-scan assertion here)
    for (q <- Seq("ann_recall_ivf", "ann_recall_ivfpq",
        "ann_recall_ivfpq_rerank")) {
      val p = plan(q)
      assert(p.contains("graft_ivf_cells"),
        s"$q's approximate leg must read the ivf_cells artifact")
      val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(p)
      assert(m.isDefined && m.get.group(1).toInt < m.get.group(2).toInt,
        s"$q: approximate leg lost the bucket prune")
    }
    // the re-rank tier: ADC stage keeps the artifact scan; the exact
    // stage's raw-vector fetch joins the embeddings table broadcast-keyed
    // on the shortlist, never a cartesian
    locally {
      val p = plan("knn_ivfpq_rerank")
      assert(p.contains("graft_ivf_cells"),
        "rerank shortlist must come off the ivf_cells artifact")
      assert(p.contains("BroadcastHashJoin"),
        "rerank raw-vector fetch must be broadcast-keyed")
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        "rerank must never go all-pairs")
    }
  }

  test("winsorized_stats caps via a broadcast of the |types|-row thresholds") {
    val p = plan("winsorized_stats")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("round-5d queries stay cartesian/nested-loop-free") {
    // ann_recall is excluded: its exact side IS the deliberate broadcast
    // nested-loop brute baseline (knn_brute) by construction
    for (q <- Seq("user_retention", "event_transitions", "corpus_diff")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has a nested-loop join")
    }
    // corpus_diff compares fingerprints, never bodies: the full-outer join
    // must key on doc_id (a shuffled hash/merge join is the right shape —
    // both sides are corpus-sized)
    val p = plan("corpus_diff")
    assert(p.contains("FullOuter"), p.take(2000))
  }

  test("round-5e queries: cell-keyed joins and gram aggs, no cartesians") {
    // semantic_dedup's pair search must be an equi-join ON CELL, never a
    // cross product; cluster_sample sorts only within cells; the gram
    // census is a straight hash-agg + TakeOrdered
    for (q <- Seq("semantic_dedup", "cluster_sample", "boilerplate_ngrams")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has a nested-loop join")
    }
    // the gram census aggregates 8-byte hashes and the ≤ topK report is
    // driver-materialized off the call-scoped cache → a LocalTableScan
    assert(plan("boilerplate_ngrams").contains("LocalTableScan"),
      "boilerplate_ngrams should return the driver-materialized bounded report")
  }

  test("round-5f queries: broadcast stat attaches, top-k never global-sorts") {
    for (q <- Seq("pmi_pairs", "value_histogram", "tokenizer_fertility")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
    }
    // pmi: the two totals rows attach via broadcast; the report is TakeOrdered
    val pmi = plan("pmi_pairs")
    assert(pmi.contains("TakeOrderedAndProject"), pmi.take(2000))
    // histogram: the |types|-row bounds attach via broadcast hash join
    val vh = plan("value_histogram")
    assert(vh.contains("BroadcastHashJoin"), vh.take(2000))
    assert(!vh.contains("SortMergeJoin"), vh.take(2000))
    // key_skew: keyed hash-agg + 1-row census + TakeOrdered — no sort of
    // the per-key frame
    val ks = plan("key_skew")
    assert(ks.contains("TakeOrderedAndProject"), ks.take(2000))
    // copurchase: the self-join must stay an order-keyed equi-join (the
    // `<` dedup predicate rides the join, it must not force a BNLJ)
    val cp = plan("copurchase_pairs")
    assert(!cp.contains("CartesianProduct") &&
      !cp.contains("BroadcastNestedLoopJoin"), cp.take(2000))
    assert(cp.contains("TakeOrderedAndProject"), cp.take(2000))
    // prefix-filtered similarity join: candidates come from the shingle
    // equi-join on prefix hashes — never a cartesian
    val jp = plan("jaccard_prefix")
    assert(!jp.contains("CartesianProduct") &&
      !jp.contains("BroadcastNestedLoopJoin"), jp.take(2000))
    // part_affinity: the k winners come off the edge scan as a
    // TakeOrdered, and the census denominators attach to those k rows by
    // BROADCAST — a SortMergeJoin here means the 100 TB pair frame is
    // being shuffled against the census again (the tier-J 58.9× shape)
    val pf = plan("part_affinity")
    assert(pf.contains("TakeOrderedAndProject"), pf.take(2000))
    assert(!pf.contains("SortMergeJoin"),
      s"part_affinity must not shuffle-join the pair frame:\n${pf.take(2000)}")
  }

  test("rank-based plans carry no single-reducer window sort (r6 two-level rank)") {
    // winsorized_stats / length_band / lm_score formerly ranked with a
    // window partitioned only by a low-cardinality column (or nothing) —
    // 100 TB through a handful of tasks. With Ranks.withExactRank* every
    // WindowExec must either partition on the synthetic bucket column or
    // run over an already-aggregated (tiny) frame.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try for (q <- Seq("winsorized_stats", "length_band", "lm_score",
      "zipf_fit")) {
      val phys = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan
      val windows = phys.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.nonEmpty, s"$q lost its rank windows entirely")
      windows.foreach { w =>
        val overBucket = w.partitionSpec.exists(
          _.toString.contains("__graft_rk_bkt"))
        val aboveAgg = w.child.exists {
          case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
          case _ => false
        }
        assert(overBucket || aboveAgg,
          s"$q: window neither bucket-partitioned nor over an aggregate:\n$w")
      }
      assert(windows.exists(_.partitionSpec.exists(
        _.toString.contains("__graft_rk_bkt"))),
        s"$q: two-level rank machinery missing from the plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    // ppl_buckets drains its call-scoped cache through a driver-side
    // materialization — the registered plan is the bounded local report
    // (its rank machinery is covered above via lm_score and by RanksSpec)
    assert(plan("ppl_buckets").contains("LocalTableScan"))
  }

  test("quality_classifier scores at scan speed: no hash exchange, no join") {
    // tokenize → feature-expand → hashed-weight sum are per-row
    // expressions; the only exchange allowed is the presentation
    // range sort
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val phys = SparkEntry.queries("quality_classifier")(spark, sf)
        .queryExecution.executedPlan
      val hashEx = phys.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if !e.outputPartitioning.toString.contains("rangepartitioning") => e
      }
      assert(hashEx.isEmpty,
        s"quality_classifier must not shuffle, found:\n${hashEx.mkString("\n")}")
      assert(!phys.toString.toLowerCase.contains("join"),
        "quality_classifier must not join")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("sft_pairs runs all three windows on ONE user_id exchange") {
    // the session window (user_id), turn window and context window
    // (user_id, __sess_id) must share a single hash exchange — the
    // subset-clustering rule means partitioning by user_id alone
    // satisfies the two-key windows, so only in-partition sorts differ.
    // A second exchange here would double the operator's 100 TB cost.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val phys = SparkEntry.queries("sft_pairs")(spark, sf)
        .queryExecution.executedPlan
      val exchanges = phys.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      // one hash exchange for the windows + the presentation range sort
      val hashEx = exchanges.filterNot(
        _.outputPartitioning.toString.contains("rangepartitioning"))
      assert(hashEx.length == 1,
        s"sft_pairs: expected exactly 1 hash exchange, got ${hashEx.length}:\n" +
          hashEx.mkString("\n"))
      assert(hashEx.head.outputPartitioning.toString.contains("user_id"),
        "the single exchange must key on user_id")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("preference_pairs: one user_id exchange, no joins (agg reuses it)") {
    // session window, turn window AND the (user_id, session) aggregation
    // must all ride the single user_id hash exchange — the aggregation's
    // ClusteredDistribution on (user_id, __sess_id) is satisfied by the
    // subset partitioning, same rule as the sft_pairs windows.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val phys = SparkEntry.queries("preference_pairs")(spark, sf)
        .queryExecution.executedPlan
      val hashEx = phys.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if !e.outputPartitioning.toString.contains("rangepartitioning") => e
      }
      assert(hashEx.length == 1,
        s"preference_pairs: expected exactly 1 hash exchange, got " +
          s"${hashEx.length}:\n" + hashEx.mkString("\n"))
      assert(hashEx.head.outputPartitioning.toString.contains("user_id"),
        "the single exchange must key on user_id")
      assert(!phys.toString.toLowerCase.contains("join"),
        "preference_pairs must not join — extremes come from struct min/max")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("calibration + mix reports drain through bounded local materialization") {
    // both collapse the corpus to a tiny report and refuse past the cap —
    // the registered plan is the LocalTableScan of that bounded frame
    // (rank machinery covered by the two-level-rank guard + RanksSpec)
    for (q <- Seq("quality_calibration", "domain_mix_report")) {
      val p = plan(q)
      assert(p.contains("LocalTableScan"), s"$q must materialize via smallLocal")
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
    }
  }

  test("dedup_incremental_near keeps distributed lineage (no driver pin)") {
    // the report is one row per DELTA doc — it grows with the ingest
    // batch, so the registered plan must stay a distributed scan of the
    // signature-index artifact end-to-end: no LocalTableScan anywhere
    // (the r6 form drained it through Materialize.smallLocal and would
    // refuse a 100 TB ingest batch at the 500k cap)
    val p = plan("dedup_incremental_near")
    assert(!p.contains("LocalTableScan"),
      s"dedup_incremental_near must not driver-materialize:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("dimension joins broadcast; hot paths stay in whole-stage codegen") {
    val p = plan("trades")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    // AQE materializes codegen stages only at execution; inspect the
    // static plan instead.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try for (q <- Seq("token_counts", "quality_score")) {
      val c = SparkEntry.queries(q)(spark, sf).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
      assert(!c.startsWith("Found 0 WholeStageCodegen"), s"$q: ${c.take(200)}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("shipping_priority: dim broadcasts, date predicates in-plan, top-k") {
    val p = plan("shipping_priority")
    assert(p.contains("BroadcastHashJoin"), p.take(2000)) // customer side
    // both date filters must reach their scans, not run post-join
    assert(p.contains("LessThan(o_orderdate,") ||
      "o_orderdate#\\d+ < ".r.findFirstIn(p).isDefined, p.take(2000))
    assert(p.contains("GreaterThan(l_shipdate,") ||
      "l_shipdate#\\d+ > ".r.findFirstIn(p).isDefined, p.take(2000))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("pricing_summary: one pruned scan, partial agg, no join/exchange bloat") {
    val p = plan("pricing_summary")
    assert(!p.contains("Join"), p.take(2000)) // pure scan + aggregate
    // the shipdate cutoff reaches the scan
    assert(p.contains("LessThanOrEqual(l_shipdate,") ||
      "l_shipdate#\\d+ <= ".r.findFirstIn(p).isDefined, p.take(2000))
    // map-side combine: a partial_ aggregate precedes the exchange
    assert(p.contains("partial_"), p.take(2000))
  }

  test("artifact-consuming queries survive a FRESH session over a warm warehouse") {
    // newSession() = fresh per-session state (function registry, catalog)
    // over the same warehouse — the environment every post-first session
    // actually runs in. A query that leans on registration or catalog
    // entries performed only inside an artifact's (now-skipped) build
    // fails exactly here: the graft_isect regression this spec pins rode
    // the signature-index artifact and only reproduced on reuse.
    val queries = Seq("dedup_minhash", "dedup_incremental_near",
      "cluster_split", "training_set", "lsh_recall_sampled",
      "bucketed_join", "part_pagerank", "part_triangles",
      "copurchase_communities")
    // warm pass builds every derived artifact in THIS session
    val warm = queries.map(q =>
      q -> SparkEntry.queries(q)(spark, sf).count()).toMap
    val fresh = spark.newSession()
    fresh.conf.set("spark.sql.shuffle.partitions", "4")
    queries.foreach { q =>
      val n = SparkEntry.queries(q)(fresh, sf).count()
      assert(n === warm(q),
        s"$q diverged on a fresh session over warm artifacts " +
          s"(warm ${warm(q)}, fresh $n)")
    }
  }

  test("events_pivot reads events exactly once (pinned values, no discovery)") {
    val p = plan("events_pivot")
    val scans = "FileScan parquet".r.findAllMatchIn(p).size
    assert(scans === 1, s"expected a single events scan, got $scans")
    assert(!p.contains("Join"), p.take(2000))
  }

  test("round-5g/5h queries stay cartesian/nested-loop-free") {
    for (q <- Seq("source_scorecard", "kn_counts", "zipf_fit",
      "knn_ivfpq", "cluster_split",
      "column_profile", "events_grouping_sets", "dominant_lang",
      "ppl_buckets", "incremental_daily_counts", "shard_checksums",
      "semantic_decontaminate", "part_pagerank", "part_triangles",
      "entropy_signals", "copurchase_communities", "bitext_mine",
      "cdc_chunks")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has a nested-loop join")
    }
    // heavy_hitters (1-row total), gapfill_interpolate (1-row span) and
    // dsir_weights (1-row model totals) attach scalars via broadcast —
    // the accepted scalar-attach BNLJ, same as key_skew/pmi — so only
    // cartesians are banned for them
    // psi_drift (1-row totals) and source_similarity (|sources|^2 pair
    // spine) attach tiny frames the same way
    // kn_score attaches the 1-row bigram-type total the same way
    for (q <- Seq("heavy_hitters", "gapfill_interpolate", "dsir_weights",
      "psi_drift", "source_similarity", "kn_score", "embedding_drift")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
    }
  }

  test("lexical family reads the tok-bucketed postings artifact, not the raw corpus") {
    // tfidf/inverted/fuzzy must consume the maintained postings table;
    // none of them may re-tokenize documents (no explode of a split over
    // the text column anywhere in the executed plan)
    for (q <- Seq("tfidf_terms", "inverted_index", "fuzzy_search")) {
      val p = plan(q)
      assert(p.contains("graft_postings"), s"$q must read the postings artifact")
      assert(!p.toLowerCase.contains("explode"), s"$q re-tokenizes the corpus")
    }
    // inverted_index's term aggregation rides the bucketing: the ONLY
    // exchange in its plan is the final presentation sort
    val inv = plan("inverted_index")
    assert("Exchange".r.findAllIn(inv).size == 1, inv.take(3000))
    assert(inv.contains("rangepartitioning"), inv.take(3000))
  }

  test("media family reads the maintained signature index, not the raw payloads") {
    // the shared signature frame the registered pair/cluster rows consume
    // must be the media_sig artifact scan — no per-call shingle
    // explosion, no SimHash vote re-aggregation, no mapPartitions decode
    val sig = graft.ext.Multimodal.mediaSignaturesShared(spark, sf)
    val sp = sig.queryExecution.executedPlan.toString
    assert(sp.contains("graft_media_sig"),
      "signatures must come off the maintained artifact")
    assert(!sp.toLowerCase.contains("explode"), "artifact read re-shingles")
    assert(!sp.contains("SerializeFromObject"), "artifact read re-decodes")
    // the pair row itself is the BOUNDED materialization of the banded
    // join (localOrSpill) — the candidate stream never feeds downstream
    // plans unbounded
    assert(plan("media_near_dup").contains("LocalTableScan") ||
      plan("media_near_dup").contains("graft_spill"))
  }

  test("round-8 retrieval ops: containment/negatives joins are keyed; rrf dense leg is TakeOrdered") {
    for (q <- Seq("containment_pairs", "hard_negatives")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has a nested-loop join")
    }
    // rrf_fusion's dense leg attaches the 1-row probe embedding by
    // broadcast (the accepted scalar-attach BNLJ) and ends in a
    // distributed top-k; the RETURNED frame is the materialized fused
    // list — a bounded LocalTableScan, never a live corpus-wide plan
    val p = plan("rrf_fusion")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("LocalTableScan"), p.take(2000))
    assert(!p.contains("Exchange"), p.take(2000))
  }

  test("round-8b queries: keyed joins, top-n plans, combined grouped top-k") {
    for (q <- Seq("er_name_matches", "er_golden_records", "funnel_latency",
      "weighted_sample", "filter_attribution", "local_supplier_volume",
      "small_quantity_revenue")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has a nested-loop join")
    }
    // cluster_keywords attaches the 1-row n_cells total by broadcast and
    // the retrieval-metric family the 1-row probe/exact-set — the
    // accepted scalar-attach BNLJ — so only cartesians are banned
    for (q <- Seq("cluster_keywords", "retrieval_metrics",
      "retrieval_metrics_ivf", "retrieval_metrics_rerank"))
      assert(!plan(q).contains("CartesianProduct"), s"$q has a cartesian product")
    // the A-ES weighted sample is per-partition top-n, never a global sort
    assert(plan("weighted_sample").contains("TakeOrderedAndProject"))
    // grouped top-k via the native aggregate: map-side partial combine,
    // no window operator, no full-extent sort
    val tk = plan("top_parts_per_brand_agg")
    assert(tk.contains("partial_graft_topk"), tk.take(2000))
    assert(!tk.contains("Window"), tk.take(2000))
    // Q5: the date range reaches the orders scan; nation⋈region broadcasts
    val q5 = plan("local_supplier_volume")
    assert(q5.contains("GreaterThanOrEqual(o_orderdate"), q5.take(2000))
    assert(q5.contains("BroadcastHashJoin"), q5.take(2000))
  }

  test("round-8c queries: keyed joins only; sweep/agg shapes hold") {
    for (q <- Seq("top_supplier_revenue", "sole_return_supplier",
      "min_cost_supplier", "peak_concurrency", "session_windows",
      "purchase_attribution")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has a nested-loop join")
    }
    // Q15: the 1-row max attaches by broadcast; the shipdate range reaches
    // the lineitem scan
    val q15 = plan("top_supplier_revenue")
    assert(q15.contains("BroadcastHashJoin"), q15.take(2000))
    assert(q15.contains("GreaterThanOrEqual(l_shipdate"), q15.take(2000))
    // Q2: the per-part winner is the mergeable min(struct) aggregate —
    // no window operator anywhere, and the top-100 is a TakeOrdered
    val q2 = plan("min_cost_supplier")
    assert(!q2.contains("Window"), q2.take(2000))
    assert(q2.contains("TakeOrderedAndProject"), q2.take(2000))
    // r12 filter-early rewrite: the size-filtered partkeys broadcast-
    // semi-join must sit BELOW the (part, supplier) cost aggregate, so
    // non-qualifying parts never reach it (r11 verdict, What's wrong #1)
    assert(q2.contains("LeftSemi"), q2.take(2000))
    val prevAqe2 = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val aggsWithSemi =
      try SparkEntry.queries("min_cost_supplier")(spark, sf)
        .queryExecution.executedPlan.collect {
          case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
              if a.exists {
                case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
                  j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi
                case _ => false
              } => a
        }
      finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe2)
    assert(aggsWithSemi.nonEmpty,
      "min_cost_supplier: the partkey semi-join must sit below the cost aggregate")
    // Q21: limit 25 never global-sorts
    assert(plan("sole_return_supplier").contains("TakeOrderedAndProject"))
    // sweep-line: every window either partitions on the hour bucket or
    // runs above an aggregate (the |hours|-row carry frame); the per-user
    // session pass partitions on user_id. (AQE hides WindowExec inside an
    // unmaterialized AdaptiveSparkPlan — disable it for the collect, the
    // rank-guard convention.)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val wins =
      try SparkEntry.queries("peak_concurrency")(spark, sf)
        .queryExecution.executedPlan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec => w
        }
      finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    assert(wins.nonEmpty)
    wins.foreach { w =>
      val partitioned = w.partitionSpec.nonEmpty
      val aboveAgg = w.child.exists {
        case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
        case _ => false
      }
      assert(partitioned || aboveAgg,
        s"peak_concurrency: unpartitioned window not above an aggregate:\n$w")
    }
    // attribution: merge-based as-of — a single user_id-partitioned
    // window pass, no range join, no nested loop
    val pa = plan("purchase_attribution")
    assert(pa.contains("Window"), pa.take(2000))
    assert(!pa.contains("SortMergeJoin") || pa.contains("BroadcastHashJoin"),
      pa.take(2000))
    // Q11/Q22: the global scalar attaches as a 1-row broadcast (the
    // accepted scalar-attach BNLJ) — only cartesians are banned
    for (q <- Seq("important_parts", "dormant_customers"))
      assert(!plan(q).contains("CartesianProduct"), s"$q has a cartesian")
    // Q22: the anti join builds on the DATE-PRUNED recent slice — the
    // cutoff must reach the orders scan, and the join must be LeftAnti
    val dc = plan("dormant_customers")
    assert(dc.contains("GreaterThanOrEqual(o_orderdate"), dc.take(2000))
    assert(dc.contains("LeftAnti"), dc.take(2000))
    // outliers: bottom-k per cell rides the mergeable aggregate (map-side
    // partial), never a window over the corpus
    val eo = plan("embedding_outliers")
    assert(eo.contains("partial_graft_topk"), eo.take(2000))
    assert(!eo.contains("WindowExec"), eo.take(2000))
    for (q <- Seq("priority_pipeline", "shipping_delay_bands",
      "nation_market_share")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has a nested loop")
    }
    // Q4: the EXISTS decorrelates to a LEFT SEMI with the quarter pruned
    // into the orders scan
    val q4 = plan("priority_pipeline")
    assert(q4.contains("LeftSemi"), q4.take(2000))
    assert(q4.contains("GreaterThanOrEqual(o_orderdate"), q4.take(2000))
    // Q19: the per-side weakening of the OR-of-ANDs must reach the
    // lineitem scan as pushed quantity bands (the pushdown this shape
    // exists to exercise)
    val q19 = plan("disjunctive_revenue")
    assert(q19.contains("GreaterThanOrEqual(l_quantity,1.0)"), q19.take(2000))
    assert(!q19.contains("CartesianProduct"), q19.take(2000))
    // Q10: flag + date pushed; top-20 is a TakeOrdered, never a sort
    val q10 = plan("returned_item_loss")
    assert(q10.contains("EqualTo(l_returnflag,R)"), q10.take(2000))
    assert(q10.contains("TakeOrderedAndProject"), q10.take(2000))
  }

  test("text_normalize: the whole canonicalization chain is codegen'd") {
    // execute with codegen fallback OFF so a generated-code compile error
    // fails loud instead of silently degrading to the interpreted path,
    // then read the FINAL adaptive plan (markers only exist post-run).
    // The knob lives on a newSession(): suites share one SparkSession and
    // run in parallel, and disabling fallback GLOBALLY makes any
    // concurrent suite's oversized-codegen plan (which normally degrades
    // silently) throw — a real cross-suite race, observed as 3
    // DedupScaleSpec failures in a full run.
    val iso = spark.newSession()
    iso.conf.set("spark.sql.codegen.fallback", "false")
    val df = SparkEntry.queries("text_normalize")(iso, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the native NFC expression sits INSIDE a WholeStageCodegen span with
    // the rest of the chain — one fused projection over the scan, the
    // property that makes this the cheapest pass at 100 TB; the `*(n)`
    // operator prefix is the codegen marker
    assert(p.contains("nfcnormalize"), p.take(2000))
    assert(p.linesIterator.exists(l =>
      l.contains("nfcnormalize") && l.trim.startsWith("+- *(")),
      s"NFC fell out of whole-stage codegen: ${p.take(2000)}")
    // row-local pass: the only exchange permitted is the final
    // presentation sort's (AQE's toString appends the initial plan too —
    // count the final section only)
    val finalSection = p.split("== Initial Plan ==").head
    val exchanges = "Exchange".r.findAllIn(finalSection).length
    assert(exchanges <= 1, s"normalization chain shuffles: $p")
  }

  test("er_typo_matches: matching stays in the vocabulary space") {
    val p = plan("er_typo_matches")
    // the candidate join is on deletion keys — an equi-join, never a
    // cartesian (the brute-force shape lives only in the DuckDB twin)
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("ER legs read the maintained name_census artifact, not the catalog") {
    // r13: distinctNames — the frame every ER leg starts from — is the
    // maintained vocabulary artifact; the per-query catalog re-scan +
    // hash-agg (a corpus-wide pass per ER query at 100 TB — the same
    // class tier N caught in the index-free trained-IVF search) must
    // not come back
    for (q <- Seq("er_name_matches", "er_typo_matches", "er_golden_records")) {
      val p = plan(q)
      assert(p.contains("graft_name_census"),
        s"$q must read the name_census artifact")
      assert(!p.contains("part.parquet"), s"$q re-scans the raw catalog")
    }
    // column pruning reaches the artifact scan: the match legs need only
    // (p_name, name_id) — n_parts stays unread
    val m = plan("er_name_matches")
    val schemas = "ReadSchema: struct<([^>]+)>".r
      .findAllMatchIn(m).map(_.group(1)).toSeq
    assert(schemas.nonEmpty)
    schemas.foreach { s =>
      assert(!s.contains("n_parts"), s"match leg reads n_parts: $s")
    }
  }
}
