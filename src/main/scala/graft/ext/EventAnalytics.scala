package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.{AsOf, Skew, Windows}

/** Event-time analytics over the `events` stream table — new capability
  * beyond the reference's arrival-order-only WebSocket handling (SURVEY
  * §2.10): tumbling windows, sessionization, top-k per group. The batch
  * forms here are oracle-checked; the streaming forms (watermarked) live in
  * graft.streaming and are covered by MemoryStream tests.
  */
object EventAnalytics {

  /** Tumbling 1-hour event-time windows per event type: arrival counts,
    * user reach, min/max value (order-independent → oracle-exact; double
    * SUMs are deliberately excluded from verified output — summation order
    * differs across engines).
    *
    * Scale shape: single hash-agg on (hour, type) with map-side partials;
    * a 100 TB month of events reduces to |hours|×|types| rows.
    */
  def hourlyWindows(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(
        window(col("ts"), "1 hour").getField("start").as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .orderBy(col("hour").asc, col("event_type").asc)

  /** Sliding 1-hour windows advancing every 15 minutes: each event lands in
    * 4 overlapping windows (the Spark `window(ts, len, slide)` generator).
    * Epoch-aligned starts — the DuckDB twin derives the same 4 starts per
    * event arithmetically.
    *
    * Scale shape: the ×4 expansion happens AFTER the scan inside the window
    * generator, and the aggregate reduces to |slides|×|types| rows — the
    * overlap factor (len/slide) multiplies shuffle rows, which is why slide
    * is a tuning knob, not a free parameter, at 100 TB.
    */
  def slidingWindows(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(
        window(col("ts"), "1 hour", "15 minutes").getField("start").as("window_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("window_start").asc, col("event_type").asc)

  /** Session stats per user: sessions split on >30 min inactivity
    * (gaps-and-islands via lag + running sum), then per-user rollup.
    *
    * Scale shape: one shuffle on user_id serves both windows and the final
    * group-by (same partitioning, no second shuffle).
    */
  def sessionize(spark: SparkSession, sfDir: String, gapMinutes: Int = 30): DataFrame =
    withSessionIds(spark, sfDir, gapMinutes)
      .groupBy(col("user_id"), col("__sess_id"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        max(col("__n")).as("max_session_events"),
        sum(col("__n")).as("total_events"))
      .orderBy(col("user_id").asc)

  /** Conversation → SFT pair assembly: the curation stage that turns raw
    * interaction streams into (context, response) supervised-fine-tuning
    * examples. Sessions come from the same gaps-and-islands pass as
    * [[sessionize]]; within a session, turns alternate roles by parity
    * (odd = user, even = assistant) and every assistant turn becomes one
    * training pair whose context is the previous `maxContext` turns of
    * the SAME session, oldest first, joined with " | ".
    *
    * Turn text is `event_type#event_id` — exact and cross-engine-stable
    * (no float formatting enters the string), so the DuckDB twin
    * hash-matches the assembled context strings byte-for-byte; a real
    * chat corpus swaps in the message body column with zero change to
    * the plan shape.
    *
    * Scale shape: ONE hash shuffle on user_id serves the session window,
    * the turn window and the context window (the (user_id, session)
    * windows' clustering is satisfied by the user_id partitioning — only
    * in-partition sorts are added), and the context frame
    * `rowsBetween(-maxContext, -1)` is bounded, so memory per row is
    * O(maxContext) regardless of session length. No joins, no driver
    * materialization; at 100 TB this is a pure map-side pipeline after
    * one exchange, and the output order key is (user_id, session, pair).
    */
  def sftPairs(
      spark: SparkSession, sfDir: String,
      gapMinutes: Int = 30, maxContext: Int = 3): DataFrame = {
    val bySess = Window
      .partitionBy(col("user_id"), col("__sess_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    withSessionIds(spark, sfDir, gapMinutes)
      .withColumn("__turn", row_number().over(bySess))
      .withColumn("__text",
        concat(col("event_type"), lit("#"), col("event_id")))
      .withColumn("__ctx", array_join(collect_list(col("__text")).over(
        bySess.rowsBetween(-maxContext, -1)), " | "))
      .filter(pmod(col("__turn"), lit(2)) === 0) // assistant turns
      .select(
        col("user_id"),
        col("__sess_id").as("session_id"),
        (col("__turn") / 2).cast("long").as("pair_idx"),
        least(lit(maxContext.toLong), col("__turn") - 1)
          .as("n_context_turns"),
        col("__ctx").as("context"),
        col("__text").as("response"))
      .orderBy(col("user_id").asc, col("session_id").asc,
        col("pair_idx").asc)
  }

  /** Conversation → preference (DPO/RLHF) pair assembly — the reward-model
    * counterpart of [[sftPairs]]: per session, the first turn is the
    * prompt, every later turn is a candidate response scored by `value`,
    * and the emitted pair is (chosen = highest-scored candidate,
    * rejected = lowest-scored). Sessions with fewer than two candidates,
    * or where every candidate ties (no strict margin), produce no pair —
    * a preference with zero margin teaches nothing.
    *
    * Determinism: ties inside the extremes break on event_id (lowest id
    * wins `chosen`, highest id loses to `rejected`) via lexicographic
    * MIN/MAX over (value, -event_id, payload) structs — the struct
    * comparison never reaches the payload fields because event_id is
    * unique, so both engines pick identical rows. `margin` is one double
    * subtraction (exactly rounded → cross-engine-stable; no float SUM
    * enters the verified output).
    *
    * Scale shape: the same single user_id hash exchange as [[sftPairs]]
    * serves the session window, the turn window AND the final
    * (user_id, session) aggregation (subset-clustering rule), and the
    * aggregation carries two bounded structs + two counters per group —
    * map-side combinable, no joins, no driver materialization. At 100 TB
    * this is one shuffle of (ids, ts, value, short text).
    */
  def preferencePairs(
      spark: SparkSession, sfDir: String, gapMinutes: Int = 30): DataFrame = {
    val bySess = Window
      .partitionBy(col("user_id"), col("__sess_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    // (score, -id) leads the struct so MIN/MAX order on it; text/score
    // ride along as payload extracted after the aggregate
    val cand = when(col("__turn") >= 2, struct(
      col("value").as("v"),
      (-col("event_id")).as("neg_id"),
      col("__text").as("txt")))
    withSessionIds(spark, sfDir, gapMinutes)
      .withColumn("__turn", row_number().over(bySess))
      .withColumn("__text",
        concat(col("event_type"), lit("#"), col("event_id")))
      .groupBy(col("user_id"), col("__sess_id"))
      .agg(
        // exactly one turn-1 row per session → max over a single non-null
        max(when(col("__turn") === 1, col("__text"))).as("prompt"),
        max(cand).as("__best"),
        min(cand).as("__worst"),
        count(when(col("__turn") >= 2, lit(1))).as("n_candidates"))
      .filter(col("n_candidates") >= 2 &&
        col("__best.v") > col("__worst.v"))
      .select(
        col("user_id"),
        col("__sess_id").as("session_id"),
        col("prompt"),
        col("__best.txt").as("chosen"),
        col("__worst.txt").as("rejected"),
        col("__best.v").as("chosen_score"),
        col("__worst.v").as("rejected_score"),
        (col("__best.v") - col("__worst.v")).as("margin"),
        col("n_candidates"))
      .orderBy(col("user_id").asc, col("session_id").asc)
  }

  /** Events with their gaps-and-islands session id (`__sess_id`): lag +
    * running sum over one user_id window — shared by [[sessionize]],
    * [[sftPairs]], [[preferencePairs]] and [[errorsDuringSessions]].
    */
  private def withSessionIds(
      spark: SparkSession, sfDir: String, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    // interval arithmetic, not unix_micros: the epoch helpers reject
    // TIMESTAMP_NTZ (which `ts` is when the parquet writer leaves the
    // isAdjustedToUTC flag off), while ts ± interval works for both types
    Tables.events(spark, sfDir)
      .withColumn("__prev", lag(col("ts"), 1).over(byUser))
      .withColumn("__new_sess",
        when(col("__prev").isNull ||
          col("ts") > col("__prev") + expr(s"INTERVAL '$gapMinutes' MINUTE"), 1L)
          .otherwise(0L))
      .withColumn("__sess_id", sum(col("__new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Range-join showcase (no equi key; see [[graft.ops.RangeJoin]]):
    * system-wide error events landing inside each user's active session
    * spans — "errors anywhere in the system while this user was active".
    * Sessions come from the same gaps-and-islands pass as [[sessionize]];
    * the oracle twin states the range predicate directly (tractable at
    * sf scale; the bucketized form is the distributed-scale shape).
    */
  def errorsDuringSessions(
      spark: SparkSession, sfDir: String, gapMinutes: Int = 30): DataFrame = {
    val bounds = withSessionIds(spark, sfDir, gapMinutes)
      .groupBy(col("user_id"), col("__sess_id"))
      .agg(min(col("ts")).as("s_start"), max(col("ts")).as("s_end"))
    val errors = Tables.events(spark, sfDir)
      .filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("ts"))
    graft.ops.RangeJoin.pointInInterval(errors, "ts", bounds, "s_start", "s_end")
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_hits"),
        countDistinct(col("err_id")).as("n_errors"))
      .orderBy(col("user_id").asc)
  }

  /** Distinct values per user via the SALTED two-stage aggregation
    * ([[graft.ops.Skew.saltedDistinctCount]]) — exact results, so the
    * oracle checks the skew machinery itself. On uniform keys the salting
    * costs one extra (tiny) reduce stage; on a hot key it spreads the
    * distinct-set build over `salts` reducers instead of one.
    */
  def distinctValuesPerUser(spark: SparkSession, sfDir: String): DataFrame =
    Skew.saltedDistinctCount(
      Tables.events(spark, sfDir),
      key = col("user_id"), saltBy = col("event_id"), distinctOn = col("value"),
      as = "n_distinct_values")
      .orderBy(col("user_id").asc)

  /** Multi-level rollup (type, hour) → (type) → grand total in ONE pass:
    * Spark expands each input row per grouping set and partially aggregates
    * map-side, so the three levels cost one shuffle, not three scans.
    * Rolled-up levels surface as NULLs (neither column is null in the data,
    * so levels are unambiguous without grouping_id). The hour is emitted as
    * its string form: null TIMESTAMPs (NaT) are not self-equal in the
    * driver's pandas-side compare, while null strings are; zero-padded
    * 'yyyy-MM-dd HH:mm:ss' stays chronologically sortable.
    */
  def eventTypeRollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("hour", date_trunc("hour", col("ts")).cast("string"))
      .rollup(col("event_type"), col("hour"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type").asc_nulls_first, col("hour").asc_nulls_first)

  /** Full CUBE over (event_type, day): every grouping-set combination in a
    * single pass — the OLAP dashboard materialization. Spark plans one
    * Expand (4 grouping sets) + one hash aggregation; at 100 TB the expand
    * multiplies input 4× before the map-side combine, which is the standard
    * trade for avoiding 4 separate scans. Day granularity (not hour) keeps
    * the cube dense. Distinct users per set needs the expand anyway, so the
    * cube costs nothing extra over the rollup.
    */
  def eventTypeCube(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("day", to_date(col("ts")).cast("string"))
      .cube(col("event_type"), col("day"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .orderBy(col("event_type").asc_nulls_first, col("day").asc_nulls_first)

  /** Exact per-brand price distribution: count/min/max plus exact linear-
    * interpolation percentiles (`percentile`, the sort-based exact form —
    * both engines define quantiles by the same (n−1)·p interpolation, so
    * the twin hash-matches at round-6). At 100 TB swap `percentile` for
    * `percentile_approx` (mergeable sketch, constant memory) — the exact
    * form materializes each group's values.
    */
  def brandPriceStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir)
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_parts"),
        min(col("p_retailprice")).as("min_price"),
        max(col("p_retailprice")).as("max_price"),
        round(percentile(col("p_retailprice"), lit(0.5)), 6).as("median_price"),
        round(percentile(col("p_retailprice"), lit(0.9)), 6).as("p90_price"))
      .orderBy(col("p_brand").asc)

  /** Point-in-time enrichment: each event carries the user's most recent
    * order at-or-before the event (as-of join; see [[graft.ops.AsOf]]).
    * Unmatched events (no prior order) surface as -1 — kept non-null so
    * the driver compare never meets a null numeric (NaN-vs-NaN trap).
    */
  def eventsAsOfOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables.events(spark, sfDir).select(col("event_id"), col("user_id"), col("ts"))
    val orders = Tables.orders(spark, sfDir).select(
      col("o_custkey").as("user_id"), col("o_orderdate").as("ts"),
      col("o_orderkey").as("last_order_key"))
    AsOf.joinAsOf(events, orders, "user_id", "ts", "last_order_key")
      .select(col("event_id"), col("user_id"), col("ts"),
        coalesce(col("last_order_key"), lit(-1L)).as("last_order_key"))
      .orderBy(col("event_id").asc)
  }

  /** Top-3 priciest parts per brand (rank-per-group, the generalized W1). */
  def topPartsPerBrand(spark: SparkSession, sfDir: String): DataFrame =
    Windows.withRank(
      Tables.part(spark, sfDir),
      partition = Seq(col("p_brand")),
      order = Seq(col("p_retailprice").desc, col("p_partkey").asc),
      as = "price_rank")
      .filter(col("price_rank") <= 3)
      .select(col("p_brand"), col("price_rank"), col("p_partkey"), col("p_name"),
        col("p_retailprice"))
      .orderBy(col("p_brand").asc, col("price_rank").asc)

  /** [[topPartsPerBrand]] recomputed through the native mergeable
    * [[graft.functions.TopKAgg]] aggregate — identical rows (hash-checked
    * against the SAME window-twin oracle), different physical plan: the
    * window form sorts every brand's full extent after the shuffle; this
    * form reduces each map task to ≤ k pairs per brand BEFORE the
    * exchange (ObjectHashAggregate partial merge), so the shuffle carries
    * |brands|·k fixed-size buffers and no full-extent sort ever runs —
    * the grouped-top-k plan that survives 100 TB. Wide columns (p_name)
    * are fetched AFTER selection by a broadcast join of the winners-only
    * frame — rows that lose the top-k never materialize their payload.
    */
  def topPartsPerBrandAgg(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val parts = Tables.part(spark, sfDir)
    val winners = parts
      .groupBy(col("p_brand"))
      .agg(expr("graft_topk(p_retailprice, p_partkey, 3)").as("top"))
      .select(col("p_brand"),
        posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("p_brand"),
        (col("pos") + 1).cast("int").as("price_rank"),
        col("s.id").as("p_partkey"))
    parts.select(col("p_partkey"), col("p_name"), col("p_retailprice"))
      .join(broadcast(winners), Seq("p_partkey"))
      .select(col("p_brand"), col("price_rank"), col("p_partkey"),
        col("p_name"), col("p_retailprice"))
      .orderBy(col("p_brand").asc, col("price_rank").asc)
  }

  /** Hourly volume anomalies per event type: hours whose event count sits
    * more than `zThreshold` sample standard deviations from that type's
    * hourly mean — the monitoring query behind ingestion alerting (traffic
    * spike, pipeline stall).
    *
    * Cross-engine exactness: mean and variance come from EXACT integer
    * moments (`Σn`, `Σn²` as longs) and the z-score is the identical
    * double expression in the DuckDB twin, so values are bit-equal —
    * no reliance on the engines' stddev implementations agreeing.
    *
    * Scale shape: two chained hash-aggs (hour×type, then type — the second
    * input is |hours|×|types| rows, trivially small) and a broadcast join
    * back; one shuffle of the raw events total, fully map-side-combined.
    */
  def eventAnomalies(spark: SparkSession, sfDir: String,
      zThreshold: Double = 2.0): DataFrame = {
    val hourly = Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val stats = hourly.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_hours"),
        sum(col("n_events")).as("sum_n"),
        sum(col("n_events") * col("n_events")).as("sum_sq"))
      .filter(col("n_hours") > 1)
    val nH = col("n_hours").cast("double")
    val mean = col("sum_n").cast("double") / nH
    val variance = (col("sum_sq").cast("double") -
      col("sum_n").cast("double") * col("sum_n").cast("double") / nH) /
      (nH - lit(1.0))
    hourly.join(broadcast(stats), Seq("event_type"))
      .filter(variance > 0.0)
      .withColumn("z_score",
        (col("n_events").cast("double") - mean) / sqrt(variance))
      .filter(abs(col("z_score")) > zThreshold)
      .select(col("event_type"), col("hour"), col("n_events"),
        round(col("z_score"), 6).as("z_score"))
      .orderBy(col("event_type").asc, col("hour").asc)
  }

  /** Zero-filled hourly series per event type: every hour of the corpus
    * time span appears for every type, absent hours as 0 — the resample
    * step dashboards and anomaly detectors need (a missing hour IS the
    * anomaly; an aggregation that simply omits it hides the outage).
    *
    * Scale shape: the grid is |types| × |hours| rows built from a one-row
    * span attach and a generator — never a scan of the raw events; the
    * fill join runs grid-vs-hourly-counts, both already reduced. At 100 TB
    * the events reduce to the same tiny hourly frame before anything
    * cross-shaped happens.
    */
  def gapFill(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val hourly = ev
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val span = ev.agg(
      date_trunc("hour", min(col("ts"))).as("h0"),
      date_trunc("hour", max(col("ts"))).as("h1"))
    val grid = ev.select(col("event_type")).distinct()
      // one-row scalar attach (the span), then a generator — the only
      // cross-shaped node touches |types| × 1 rows
      .crossJoin(broadcast(span))
      .select(col("event_type"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
    grid.join(hourly, Seq("event_type", "hour"), "left")
      .select(col("event_type"), col("hour"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy(col("event_type").asc, col("hour").asc)
  }

  /** Trailing `windowHours`-row rolling volume per event type over the
    * hourly series: rolling sum and mean — the smoothed load curve behind
    * capacity planning and alert thresholds.
    *
    * The frame is ROWS-based over observed hours (combine with [[gapFill]]
    * when absent hours must count as zeros). The mean divides the exact
    * integer rolling sum by the exact frame row count with the identical
    * expression in the DuckDB twin — bit-equal, no avg() dependence.
    *
    * Scale shape: one events shuffle into the hourly frame, then one
    * window pass partitioned by type — |hours| rows per partition at any
    * corpus size.
    */
  def rollingCounts(spark: SparkSession, sfDir: String,
      windowHours: Int = 24): DataFrame = {
    val hourly = Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour").asc)
      .rowsBetween(-(windowHours - 1), Window.currentRow)
    hourly
      .select(col("event_type"), col("hour"), col("n_events"),
        sum(col("n_events")).over(w).as("rolling_sum"),
        count(lit(1)).over(w).as("__n"))
      .select(col("event_type"), col("hour"), col("n_events"),
        col("rolling_sum"),
        round(col("rolling_sum").cast("double") / col("__n").cast("double"), 6)
          .as("rolling_avg"))
      .orderBy(col("event_type").asc, col("hour").asc)
  }

  /** Cohort retention matrix: users grouped by first-seen day, counted as
    * active on each later day-offset — the activation/retention view every
    * growth dashboard runs, and (for a training-data platform) the freshness
    * curve of contributor activity.
    *
    * Scale shape: first-seen is a user_id hash-agg; the offset expansion is
    * a user_id equi-join of the distinct (user, day) frame — both shuffles
    * key on user_id and the result reduces to |cohorts|×|offsets| rows at
    * any corpus size. No windows, no sort of the raw events.
    */
  def retention(spark: SparkSession, sfDir: String,
      maxOffsetDays: Int = 13): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val firstSeen = ev.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    ev.distinct()
      .join(firstSeen, Seq("user_id"))
      .withColumn("day_offset",
        datediff(col("day"), col("cohort_day")).cast("long"))
      .filter(col("day_offset") <= maxOffsetDays)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort_day").asc, col("day_offset").asc)
  }

  /** First-order event-type transition counts: for each user's time-ordered
    * event stream, how often does type A directly precede type B — the
    * Markov-chain view behind next-action prediction and bot detection
    * (impossible transitions spike for scripted traffic).
    *
    * Determinism: simultaneous timestamps are broken by event_id, so the
    * lag sequence — and therefore every count — is reproducible; the twin
    * orders by the identical (ts, event_id) key.
    *
    * Scale shape: ONE window pass partitioned by user_id (the per-user
    * streams are short), then a hash-agg to |types|² rows. The window
    * shuffle keys on user_id — the same partitioning sessionize uses, so a
    * multi-query pipeline over events reuses the exchange.
    */
  def transitions(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .orderBy(col("from_type").asc, col("to_type").asc)
  }

  /** Winsorized per-type value stats: values above the exact p99 ORDER
    * STATISTIC are capped to it before aggregation — the outlier-robust
    * summary used when a handful of corrupt readings would otherwise
    * dominate a mean.
    *
    * Cross-engine exactness: the threshold is a SELECTED value (the
    * ceil(0.99·n)-th smallest, exact rank arithmetic like length_band), not
    * an interpolated quantile — bit-equal across engines by construction.
    * Capped values are rounded to 6dp and summed as DECIMAL(18,6) (exact,
    * order-independent); the mean divides that by the exact count with the
    * identical expression in the twin.
    *
    * Scale shape: the threshold is an exact order-statistic SELECTION
    * ([[graft.ops.Ranks.selectOrderStatistic]]) — sampled literal value
    * boundaries bucket each type's values, a tiny per-(type, bucket)
    * histogram locates the bucket holding rank ceil(0.99·n), and ONLY
    * that bucket's rows (~1/buckets of each type) are ever sorted — so no
    * event type ever funnels through a single reducer (the naive
    * `row_number OVER (PARTITION BY event_type)` collapses 100 TB of
    * events onto |types| tasks) and no full per-type sort happens at all.
    * The cap-and-aggregate pass itself is one broadcast join (|types|
    * rows) plus a hash-agg.
    */
  def winsorizedStats(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"))
    val thresholds = graft.ops.Ranks.selectOrderStatistic(
      ev, Seq("event_type"), col("value"), 0.99, "p99")
    ev.join(broadcast(thresholds), Seq("event_type"))
      .withColumn("capped",
        round(least(col("value"), col("p99")), 6).cast("decimal(18,6)"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("value") > col("p99"), 1L).otherwise(0L)).as("n_capped"),
        round(max(col("p99")), 6).as("p99_value"),
        sum(col("capped")).as("__sum"))
      .select(col("event_type"), col("n_events"), col("n_capped"),
        col("p99_value"),
        round(col("__sum").cast("double"), 6).as("sum_capped"),
        round(col("__sum").cast("double") / col("n_events").cast("double"), 6)
          .as("mean_capped"))
      .orderBy(col("event_type").asc)
  }

  /** Ordered conversion funnel view → click → purchase: per user, the
    * earliest view, the earliest click strictly AFTER that view, and the
    * earliest purchase strictly after that click; reported as one summary
    * row of stage survivor counts. Event ORDER is the point — a user who
    * purchased before ever viewing does not convert through the funnel.
    *
    * Scale shape: three per-stage min-aggregations chained by user_id
    * equi-joins — every shuffle keys on user_id, each stage's frame only
    * shrinks, and the final count is a single-row aggregate.
    */
  def funnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val viewed = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("view_ts"))
    val clicked = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"))
      .join(viewed, Seq("user_id"))
      .filter(col("cts") > col("view_ts"))
      .groupBy(col("user_id")).agg(min(col("cts")).as("click_ts"))
    val purchased = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"))
      .join(clicked, Seq("user_id"))
      .filter(col("pts") > col("click_ts"))
      .groupBy(col("user_id")).agg(min(col("pts")).as("purchase_ts"))
    ev.select(col("user_id")).distinct()
      .join(viewed, Seq("user_id"), "left")
      .join(clicked, Seq("user_id"), "left")
      .join(purchased, Seq("user_id"), "left")
      .agg(
        count(lit(1)).as("n_users"),
        count(col("view_ts")).as("n_viewed"),
        count(col("click_ts")).as("n_clicked_after_view"),
        count(col("purchase_ts")).as("n_purchased_after_click"))
  }

  /** Conversion-lag profile of the [[funnel]]: for users who complete
    * view → click → purchase in order, the exact distribution (min /
    * median / p90 / max seconds) of each stage-to-stage lag. The report
    * that turns "how many converted" into "how long conversion takes" —
    * the second question every funnel owner asks.
    *
    * Same per-user min-ts chain as [[funnel]] (hash-aggs + joins on
    * user_id — at scale these co-partition after the first shuffle), then
    * the completed-funnel frame is |converted users| rows: tiny relative
    * to the event stream, so exact rank-selected order statistics are
    * safe here; at corpus-scale cardinalities swap for
    * `percentile_approx` (mergeable sketch, constant memory).
    */
  def funnelLatency(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    // exact integer MICROSECONDS, not a seconds cast: the fixture carries
    // sub-second timestamps, and Spark's long cast truncates where
    // DuckDB's double→int cast rounds — micros sidestep the convention
    def micros(c: Column) = unix_micros(c.cast("timestamp"))
    val viewed = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("view_ts"))
    val clicked = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"))
      .join(viewed, Seq("user_id"))
      .filter(col("cts") > col("view_ts"))
      .groupBy(col("user_id")).agg(min(col("cts")).as("click_ts"))
    val purchased = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"))
      .join(clicked, Seq("user_id"))
      .filter(col("pts") > col("click_ts"))
      .groupBy(col("user_id")).agg(min(col("pts")).as("purchase_ts"))
    val f = viewed
      .join(clicked, Seq("user_id"))
      .join(purchased, Seq("user_id"))
      .select(
        micros(col("view_ts")).as("vs"),
        micros(col("click_ts")).as("cs"),
        micros(col("purchase_ts")).as("ps"))
    // exact TYPE-1 (rank-selected) order statistics, no interpolation:
    // at 1e12-micro magnitudes interpolated percentiles differ in the
    // last ulp between engines (fma/ordering), and a .5 boundary sits
    // exactly there — the k-th smallest VALUE is engine-independent.
    // median rank = ceil(n/2), p90 rank = ceil(0.9n), both in integer
    // arithmetic; value-at-rank is well-defined under ties.
    val w = Window.partitionBy(col("stage")).orderBy(col("lag_us").asc)
    f.selectExpr(
        """stack(3,
          |  '1_view_to_click',     cs - vs,
          |  '2_click_to_purchase', ps - cs,
          |  '3_view_to_purchase',  ps - vs
          |) AS (stage, lag_us)""".stripMargin)
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("stage"))))
      .groupBy(col("stage"))
      .agg(
        count(lit(1)).as("n_users"),
        min(col("lag_us")).as("min_us"),
        max(when(col("rk") === expr("(n + 1) div 2"), col("lag_us")))
          .as("median_us"),
        max(when(col("rk") === expr("(n * 9 + 9) div 10"), col("lag_us")))
          .as("p90_us"),
        max(col("lag_us")).as("max_us"))
      .orderBy(col("stage").asc)
  }

  /** Fixed-width per-type value histogram — the distribution profile run
    * before choosing winsorization/normalization constants ([[
    * winsorizedStats]]'s exploratory sibling).
    *
    * Cross-engine exactness: no transcendentals — the bin index is
    * `floor((v − min) · nBins / (max − min))` clamped to nBins−1, a chain
    * of IEEE-exact double ops both engines evaluate identically (the twin
    * spells the identical expression); bounds are emitted rounded to 6dp.
    * A zero-width type (max = min) degenerates to bin 0 explicitly.
    *
    * Scale shape: one hash-agg for the |types|-row min/max, broadcast
    * back, one hash-agg for the bins — two linear passes, output bounded
    * at |types| × nBins rows.
    */
  def valueHistogram(
      spark: SparkSession, sfDir: String, nBins: Int = 20): DataFrame = {
    val ev = Tables.events(spark, sfDir).select(col("event_type"), col("value"))
    val bounds = ev.groupBy(col("event_type"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
    val width = col("hi") - col("lo")
    val rawBin = floor((col("value") - col("lo")) * lit(nBins.toDouble) / width)
    ev.join(broadcast(bounds), Seq("event_type"))
      .withColumn("bin",
        when(width === 0.0, lit(0L))
          .otherwise(least(rawBin.cast("long"), lit(nBins - 1L))))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n_events"))
      .join(broadcast(bounds), Seq("event_type"))
      .select(col("event_type"), col("bin"), col("n_events"),
        round(col("lo") + col("bin").cast("double") * (col("hi") - col("lo"))
          / lit(nBins.toDouble), 6).as("bin_lo"),
        round(col("lo") + (col("bin") + 1L).cast("double")
          * (col("hi") - col("lo")) / lit(nBins.toDouble), 6).as("bin_hi"))
      .orderBy(col("event_type").asc, col("bin").asc)
  }

  /** Join-key skew profile: the heaviest user_id keys with their share of
    * all rows and their multiple of the average key weight — the report
    * that decides whether a planned shuffle needs salting / AQE skew
    * handling BEFORE the job runs (a key at 1000× avg means one straggler
    * task owns the stage).
    *
    * Scale shape: one keyed hash-agg (map-side combined), a 1-row census
    * broadcast back, TakeOrdered top-k. Exactness: counts are integers;
    * the two ratios are single double divisions rounded to 6dp with
    * identical expressions in the twin; ordering is (count desc, key asc).
    */
  def keySkew(spark: SparkSession, sfDir: String, topK: Int = 20): DataFrame = {
    val perKey = Tables.events(spark, sfDir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_rows"))
    val census = perKey.agg(
      sum(col("n_rows")).as("total_rows"),
      count(lit(1)).as("n_keys"))
    perKey.crossJoin(broadcast(census))
      .select(col("user_id"), col("n_rows"),
        round(col("n_rows").cast("double") / col("total_rows").cast("double"), 6)
          .as("share"),
        round(col("n_rows").cast("double") /
          (col("total_rows").cast("double") / col("n_keys").cast("double")), 6)
          .as("x_avg"))
      .orderBy(col("n_rows").desc, col("user_id").asc)
      .limit(topK)
  }

  /** The five event-type values, pinned so [[dailyTypePivot]] never runs
    * the implicit values-discovery job (see its scaladoc).
    */
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Day × event-type PIVOT — the wide dashboard matrix (one column per
    * event type). The value list is PINNED: `pivot(col, values)` with an
    * explicit list compiles straight to one conditional-aggregation pass,
    * while the values-less overload first runs a separate distinct scan to
    * discover columns — an extra corpus pass AND a nondeterministic schema
    * if a new type appears, both wrong at 100 TB. Missing cells surface as
    * NULL from pivot-count; coalesced to 0 like the FILTER twin.
    *
    * Scale shape: identical to a groupBy(day) hash-agg with 5 conditional
    * counts — map-side combinable, one fixed-width shuffle, |days| rows
    * out. The day is emitted as its string form (driver-compare
    * convention, see [[eventTypeRollup]]).
    */
  def dailyTypePivot(spark: SparkSession, sfDir: String): DataFrame = {
    val pivoted = Tables.events(spark, sfDir)
      .withColumn("day", to_date(col("ts")).cast("string"))
      .groupBy(col("day"))
      .pivot(col("event_type"), EventTypes)
      .agg(count(lit(1)))
    pivoted.select(col("day") +:
      EventTypes.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy(col("day").asc)
  }

  /** Explicit GROUPING SETS — the general form [[eventTypeRollup]] /
    * [[eventTypeCube]] are shorthands of: exactly the four requested
    * levels (type×dow, type, dow, grand total) in ONE Expand+aggregate
    * pass. The day-of-week key is derived as days-since-a-known-Monday
    * mod 7 (0=Monday) — pure date arithmetic that folds identically in
    * any engine, where native dow functions disagree on week start.
    *
    * Scale shape: one Expand (4×) + map-side-combinable hash-agg, same as
    * cube; countDistinct is the only expand beyond it.
    */
  def groupingSetsReport(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("dow",
        pmod(datediff(col("ts").cast("date"), to_date(lit("1970-01-05"))), lit(7))
          .cast("int"))
      .groupingSets(
        Seq(Seq(col("event_type"), col("dow")), Seq(col("event_type")),
          Seq(col("dow")), Seq()),
        col("event_type"), col("dow"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .orderBy(col("event_type").asc_nulls_first, col("dow").asc_nulls_first)

  /** Incremental aggregate maintenance — the materialized-view pattern: a
    * standing daily (day × type) aggregate is kept current by merging the
    * BASE's partial aggregate with the arriving DELTA's partial aggregate,
    * never rescanning the base rows. Only mergeable state is kept — count
    * (sum of counts), decimal value sum (associative), min/max (idempotent
    * semilattice) — and deliberately NO countDistinct, which is not
    * mergeable without a set/HLL sketch ([[graft.ext.TextStats]]'
    * `corpus_sketch` carries the mergeable-sketch form).
    *
    * The delta is carved deterministically (`event_id % deltaMod ==
    * deltaRem`) so the merged view is oracle-checkable: the twin
    * recomputes the SAME numbers from a flat GROUP BY over all events —
    * base⊕delta ≡ full is exactly the invariant an incremental MV must
    * keep. Same shape family as [[graft.ext.Dedup.incrementalExact]]
    * (delta-vs-index), applied to aggregation instead of membership.
    *
    * Scale shape: at 100 TB the base partial is a stored table of
    * |days|×|types| rows; per batch, work is one hash-agg over the delta
    * plus a merge-agg over two tiny partials — the base raw events are
    * never touched. Here both partials derive from one scan-split for
    * checkability.
    */
  def incrementalDailyCounts(
      spark: SparkSession, sfDir: String,
      deltaMod: Int = 10, deltaRem: Int = 9): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .withColumn("day", to_date(col("ts")).cast("string"))
      .withColumn("__v", round(col("value"), 6).cast("decimal(18,6)"))
    def partial(df: DataFrame): DataFrame = df
      .groupBy(col("day"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("__v")).as("value_sum"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
    val base = partial(ev.filter(col("event_id") % deltaMod =!= deltaRem))
    val delta = partial(ev.filter(col("event_id") % deltaMod === deltaRem))
    base.unionByName(delta)
      .groupBy(col("day"), col("event_type"))
      .agg(
        sum(col("n_events")).as("n_events"),
        sum(col("value_sum")).as("__vs"),
        min(col("min_value")).as("min_value"),
        max(col("max_value")).as("max_value"))
      // exact decimal merge → deterministic double rendering (winsorized
      // convention) so the twin's flat GROUP BY hash-matches
      .withColumn("value_sum", round(col("__vs").cast("double"), 6))
      .select("day", "event_type", "n_events", "value_sum",
        "min_value", "max_value")
      .orderBy(col("day").asc, col("event_type").asc)
  }

  /** [[gapFill]]'s interpolating sibling: the hourly mean value per event
    * type with ABSENT hours linearly interpolated between the surrounding
    * observed hours — the time-series repair a monitoring/feature pipeline
    * applies before feeding models that can't represent "missing". Counts
    * zero-fill ([[gapFill]]); level-like measures interpolate — this is
    * the level form.
    *
    * Observed hours keep their exact mean (decimal sum ÷ count, one
    * deterministic double). Missing hours take
    * `prev + (next − prev) · Δh/span` from the nearest observed values via
    * IGNORE-NULLS window frames — two passes over the |types|×|hours| grid,
    * never over raw events. Leading/trailing gaps (no neighbor on one
    * side) stay NULL — extrapolation is a policy, not a repair. All
    * arithmetic is the same expression tree in the twin, so the doubles
    * agree bit-for-bit.
    *
    * Scale shape: one events hash-agg (map-side combinable) + a generated
    * grid of |types|×|hours| rows + two window passes over that grid —
    * grid size is independent of event volume, so at 100 TB this costs
    * the same as at 100 GB once the hourly aggregate exists.
    */
  def gapFillInterpolate(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val hourly = ev
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(
        round(sum(round(col("value"), 6).cast("decimal(18,6)")).cast("double")
          / count(lit(1)).cast("double"), 6).as("avg_value"))
    val span = ev.agg(
      date_trunc("hour", min(col("ts"))).as("h0"),
      date_trunc("hour", max(col("ts"))).as("h1"))
    val grid = ev.select(col("event_type")).distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour").asc)
    val before = w.rowsBetween(Window.unboundedPreceding, -1)
    val after = w.rowsBetween(1, Window.unboundedFollowing)
    val hEpoch = col("hour").cast("timestamp").cast("long")
    grid.join(hourly, Seq("event_type", "hour"), "left")
      .withColumn("__he", hEpoch)
      .withColumn("__pv", last(col("avg_value"), ignoreNulls = true).over(before))
      .withColumn("__ph",
        last(when(col("avg_value").isNotNull, col("__he")), ignoreNulls = true)
          .over(before))
      .withColumn("__nv", first(col("avg_value"), ignoreNulls = true).over(after))
      .withColumn("__nh",
        first(when(col("avg_value").isNotNull, col("__he")), ignoreNulls = true)
          .over(after))
      .select(col("event_type"), col("hour"),
        col("avg_value").isNotNull.as("observed"),
        round(coalesce(col("avg_value"),
          col("__pv") + (col("__nv") - col("__pv"))
            * (col("__he") - col("__ph")).cast("double")
            / (col("__nh") - col("__ph")).cast("double")), 6).as("value"))
      .orderBy(col("event_type").asc, col("hour").asc)
  }

  /** Peak concurrent sessions per hour — the sweep-line interval-overlap
    * aggregate (capacity planning / rate-limit sizing), computed WITHOUT
    * a global single-reducer running sum.
    *
    * Sweep semantics: each session contributes (+1 at start, −1 at end),
    * inclusive overlap — at equal timestamps starts order before ends
    * (`delta desc`), so a session ending exactly when another starts
    * counts as overlapping. `concurrency(t) = Σ deltas ≤ (t, start-first)`.
    *
    * The prefix sum is TWO-LEVEL, the same decomposition as
    * [[graft.ops.Ranks]]: an in-bucket running sum partitioned by the
    * hour (each hour's boundaries sort in one task), plus each hour's
    * carry-in — the cumulative sum of PRIOR hours' deltas, computed on
    * the |hours|-row aggregate frame (its single-partition window runs
    * over a tiny post-agg frame, the PlanQualitySpec-sanctioned shape).
    * No task ever sees more than one hour's boundaries; at 100 TB the
    * bucket would be the day/shard key, same algebra.
    *
    * Determinism: within equal (ts, delta) the prefix-value MULTISET is
    * permutation-invariant (equal summands), so per-hour `max` is exact
    * cross-engine — no tie column beyond `delta` is needed.
    */
  def peakConcurrency(
      spark: SparkSession, sfDir: String, gapMinutes: Int = 30): DataFrame = {
    val sessions = withSessionIds(spark, sfDir, gapMinutes)
      .groupBy(col("user_id"), col("__sess_id"))
      .agg(min(col("ts")).as("s_start"), max(col("ts")).as("s_end"))
    val boundaries = sessions
      .select(col("s_start").as("ts"), lit(1L).as("delta"))
      .unionByName(sessions.select(col("s_end").as("ts"), lit(-1L).as("delta")))
      .withColumn("hour", date_trunc("hour", col("ts")))
    val inHour = Window.partitionBy(col("hour"))
      .orderBy(col("ts").asc, col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = boundaries
      .withColumn("__run", sum(col("delta")).over(inHour))
    // carry-in per hour: cumulative total of all PRIOR hours' deltas —
    // |hours| rows, windowed above the aggregate (tiny frame)
    val carry = boundaries.groupBy(col("hour"))
      .agg(sum(col("delta")).as("__tot"))
      .withColumn("__carry",
        coalesce(sum(col("__tot")).over(
          Window.orderBy(col("hour").asc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("hour"), col("__carry"))
    local.join(broadcast(carry), Seq("hour"))
      .groupBy(col("hour"))
      .agg(
        max(col("__carry") + col("__run")).as("peak_concurrency"),
        sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_starts"),
        sum(when(col("delta") === -1L, 1L).otherwise(0L)).as("n_ends"))
      .orderBy(col("hour").asc)
  }

  /** Per-user session windows via Spark's NATIVE `session_window` —
    * the declarative dual of the gaps-and-islands [[sessionize]]: the
    * merging session-window aggregate node computes the same sessions
    * (the hash-checked twin proves the two formulations coincide), and
    * it is the form that carries over verbatim to Structured Streaming
    * (watermark + session_window, state-store-merged).
    *
    * Spark's session end = last event + gap; the twin states
    * `max(ts) + INTERVAL gap` over the island. Output is exact
    * timestamps and counts — no floats anywhere.
    */
  def sessionWindowsNative(
      spark: SparkSession, sfDir: String, gapMinutes: Int = 30): DataFrame =
    sessionWindowsOf(Tables.events(spark, sfDir), gapMinutes)

  /** [[sessionWindowsNative]] over an arbitrary (user_id, ts, event_type)
    * frame — the kernel the boundary-semantics spec drives with crafted
    * exact-gap timestamps.
    */
  def sessionWindowsOf(events: DataFrame, gapMinutes: Int): DataFrame =
    sessionWindowAgg(events, gapMinutes)
      .orderBy(col("user_id").asc, col("session_start").asc)

  /** The session_window aggregate WITHOUT the presentation sort — the body
    * shared verbatim between the batch query and the streaming monitor
    * ([[graft.streaming.CorpusIngest.sessionMonitor]]): a global sort is
    * not streamable, everything else is identical in both modes (the
    * batch/stream unification claim, stated as shared code).
    */
  def sessionWindowAgg(events: DataFrame, gapMinutes: Int): DataFrame =
    events
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("n_errors"))
      .select(col("user_id"),
        col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("n_events"), col("n_errors"))

  /** As-of join WITH TOLERANCE — last-touch attribution: each purchase
    * event picks up the same user's most recent VIEW event, but only if
    * that view happened within `lookbackMinutes` before the purchase
    * (the marketing-attribution lookback window; also the feature-store
    * point-in-time rule — a stale signal must NOT leak in just because
    * nothing newer exists).
    *
    * Same merge-based kernel as [[eventsAsOfOrders]] ([[AsOf.joinAsOf]]
    * union + last-carry — never a per-row range join): the carried value
    * is a STRUCT(view ts, view id), so the staleness predicate is applied
    * AFTER the carry against the matched view's own timestamp. Views
    * sharing a timestamp collapse to the max event_id first — the same
    * convention as the events_asof_orders twin.
    */
  def purchaseAttribution(
      spark: SparkSession, sfDir: String,
      lookbackMinutes: Int = 360): DataFrame = {
    val events = Tables.events(spark, sfDir)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = events.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("__vid"))
      .select(col("user_id"), col("ts"),
        struct(col("ts").as("vts"), col("__vid").as("vid")).as("last_view"))
    AsOf.joinAsOf(purchases, views, "user_id", "ts", "last_view")
      .select(col("event_id"), col("user_id"), col("ts"),
        when(col("last_view").isNotNull &&
          col("last_view.vts") >=
            col("ts") - expr(s"INTERVAL '$lookbackMinutes' MINUTE"),
          col("last_view.vid")).otherwise(lit(-1L)).as("attributed_view"))
      .orderBy(col("event_id").asc)
  }
}
