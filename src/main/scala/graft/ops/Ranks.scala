package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT rank — the two-level (bucket + offset) formulation of
  * `row_number() OVER (PARTITION BY part ORDER BY keys)` that never funnels
  * the frame through a single (or low-cardinality) reducer.
  *
  * Why: a global `Window.orderBy(...)` requires `Exchange SinglePartition` —
  * every row through ONE task — and `Window.partitionBy(t)` over a
  * low-cardinality `t` (event types, languages) is the same killer with k
  * tasks. At 100 TB both are non-starters, yet exact (not approximate) rank
  * arithmetic is what keeps the DuckDB twins bit-identical. The classic fix
  * (TeraSort's): split the order domain into BUCKETS that respect the sort
  * order, rank locally inside each bucket in parallel, and add per-bucket
  * COUNT OFFSETS computed from a tiny histogram.
  *
  *   global_rank(row) = Σ counts(lower buckets) + local_rank(row in bucket)
  *
  * Exactness is BOUNDARY-INDEPENDENT: any monotone bucketing yields the same
  * final ranks, so boundary quality only affects balance — which is why the
  * boundaries can come from a bounded sample. Boundaries are baked into the
  * plan as LITERALS, so every branch that recomputes the frame buckets rows
  * identically (no reliance on exchange reuse, unlike a
  * `repartitionByRange + spark_partition_id` formulation whose re-sampled
  * boundaries can diverge between plan branches).
  *
  * Cost: [[withExactRank]] reads the input three times (boundary sample,
  * bucket histogram, rank window); [[withExactRankDense]] twice. Pass a
  * frame that is cheap to recompute (a pruned scan) or already persisted.
  *
  * Order keys must be NON-NULL and ascending; express `DESC` by negating a
  * numeric key. All columns must be deterministic expressions over `df`.
  */
object Ranks {

  private val BKT = "__graft_rk_bkt"
  private val CNT = "__graft_rk_cnt"
  private val OFF = "__graft_rk_off"
  private val TOT = "__graft_rk_n"

  /** Exact `row_number` over (partitionBy `partCols` orderBy `orderKeys`
    * asc) as `rankCol` (LONG, 1-based), with the partition row count as
    * `nCol` when requested. Buckets come from sampled order-key boundaries:
    * a deterministic hash-sample (1/`sampleMod` of rows, hard-capped at
    * `sampleCap`) is collected, sorted on the driver, and `buckets`-iled
    * into literal lexicographic cut tuples. At 100 TB raise `sampleMod` so
    * the sample stays bounded; skewed or degenerate samples cost balance,
    * never correctness.
    */
  def withExactRank(
      df: DataFrame,
      partCols: Seq[String],
      orderKeys: Seq[Column],
      rankCol: String,
      nCol: Option[String] = None,
      buckets: Int = 32,
      sampleMod: Long = 64L,
      sampleCap: Int = 65536): DataFrame = {
    require(orderKeys.nonEmpty, "withExactRank needs at least one order key")
    val sample = df
      .filter(pmod(xxhash64(orderKeys: _*), lit(sampleMod)) === 0L)
      .select(orderKeys.zipWithIndex.map { case (c, i) => c.as(s"__gk$i") }: _*)
      .limit(sampleCap)
      .collect()
    val k = orderKeys.length
    val ord = new Ordering[org.apache.spark.sql.Row] {
      def compare(a: org.apache.spark.sql.Row, b: org.apache.spark.sql.Row): Int = {
        var i = 0
        while (i < k) {
          val c = cmpAny(a.get(i), b.get(i))
          if (c != 0) return c
          i += 1
        }
        0
      }
    }
    val sorted = sample.sorted(ord)
    val cuts = (1 until buckets).iterator
      .map(b => (b.toLong * sorted.length / buckets).toInt)
      .filter(i => i > 0 && i < sorted.length)
      .map(sorted(_))
      .toSeq.distinct
    // bucket = how many cut tuples this row's key exceeds (lexicographic) —
    // monotone in the order keys by construction
    val bucket = cuts.foldLeft(lit(0)) { (acc, cut) =>
      val gt = orderKeys.zipWithIndex.foldRight(lit(false)) {
        case ((key, i), rest) =>
          (key > lit(cut.get(i))) || (key === lit(cut.get(i)) && rest)
      }
      acc + when(gt, 1).otherwise(0)
    }
    rankedByBucket(df, partCols, orderKeys, bucket, rankCol, nCol)
  }

  /** Exact rank where the FIRST order key itself is the bucket — for keys
    * with bounded distinct values (integer lengths, term frequencies),
    * where the histogram `groupBy(part, key1)` stays small. One less input
    * pass than [[withExactRank]] and perfectly deterministic balance; the
    * largest single-key class bounds the widest rank task (ties beyond
    * `key1` still sort WITHIN that class, so a heavily tied first key —
    * e.g. Zipf `tf = 1` — concentrates that class in one task; use
    * [[withExactRank]] when that class itself is corpus-scale).
    */
  def withExactRankDense(
      df: DataFrame,
      partCols: Seq[String],
      orderKeys: Seq[Column],
      rankCol: String,
      nCol: Option[String] = None): DataFrame = {
    require(orderKeys.nonEmpty, "withExactRankDense needs at least one order key")
    rankedByBucket(df, partCols, orderKeys, orderKeys.head, rankCol, nCol)
  }

  /** Exact order-statistic SELECTION per group — the value at rank
    * `ceil(pct·n)` of `key` ascending within each `partCols` group —
    * without ranking (or even fully sorting) the frame: bucket by sampled
    * literal boundaries, aggregate the tiny per-(group, bucket) histogram,
    * locate the single bucket containing each group's target rank from
    * the prefix sums, then rank ONLY that bucket's rows. Per group,
    * exactly one bucket (~1/buckets of its rows) is ever sorted; every
    * other row is dropped at the scan by the broadcast of the
    * |groups|-row target-bucket table. This is the percentile-threshold
    * shape ([[graft.ext.EventAnalytics.winsorizedStats]]): cheaper than
    * [[withExactRank]] when only a cut VALUE is needed, same exactness
    * (the selected value is an actual data element, reproducible in any
    * engine — no interpolation).
    *
    * Returns one row per group: `partCols`, the selected value as
    * `valueCol`. The target rank uses `ceil(pct · n)` with the same
    * double arithmetic as the SQL twin (`CAST(ceil(n * pct) AS BIGINT)`).
    */
  def selectOrderStatistic(
      df: DataFrame,
      partCols: Seq[String],
      key: Column,
      pct: Double,
      valueCol: String,
      buckets: Int = 32,
      sampleMod: Long = 64L,
      sampleCap: Int = 65536): DataFrame = {
    val sample = df
      .filter(pmod(xxhash64(key), lit(sampleMod)) === 0L)
      .select(key.as("__gk0"))
      .limit(sampleCap)
      .collect()
    val sorted = sample.map(_.get(0)).sortWith((a, b) => cmpAny(a, b) < 0)
    val cuts = (1 until buckets).iterator
      .map(b => (b.toLong * sorted.length / buckets).toInt)
      .filter(i => i > 0 && i < sorted.length)
      .map(sorted(_)).toSeq.distinct
    val bucket = cuts.foldLeft(lit(0)) { (acc, cut) =>
      acc + when(key > lit(cut), 1).otherwise(0)
    }
    val part = partCols.map(col)
    val b = df.withColumn(BKT, bucket)
    val hist = b.groupBy(part :+ col(BKT): _*).agg(count(lit(1)).as(CNT))
    // tiny frame: locate each group's target bucket from the prefix sums
    val targets = hist
      .withColumn(OFF,
        sum(col(CNT)).over(
          Window.partitionBy(part: _*).orderBy(col(BKT).asc)) - col(CNT))
      .withColumn(TOT, sum(col(CNT)).over(Window.partitionBy(part: _*)))
      .withColumn("__graft_rk_r", ceil(col(TOT) * lit(pct)).cast("long"))
      .filter(col("__graft_rk_r") > col(OFF) &&
        col("__graft_rk_r") <= col(OFF) + col(CNT))
      .select(part :+ col(BKT) :+ col(OFF) :+ col("__graft_rk_r"): _*)
    val wIn = Window.partitionBy(part :+ col(BKT): _*).orderBy(key.asc)
    b.join(broadcast(targets), partCols :+ BKT) // drops every non-target bucket
      .withColumn("__graft_rk_lrk", row_number().over(wIn).cast("long"))
      .filter(col(OFF) + col("__graft_rk_lrk") === col("__graft_rk_r"))
      .select(part :+ key.as(valueCol): _*)
  }

  /** SQL-standard `ntile(b)` bucket (INT) derived from an exact 1-based
    * rank column and the partition size column — the first `n % b` buckets
    * take `n div b + 1` rows, the rest `n div b`. Lets a two-level rank
    * replace `ntile() OVER (ORDER BY ...)` bit-for-bit. Pure integer
    * arithmetic (`div`, `%`), so the DuckDB twin agrees exactly.
    */
  def ntileFromRank(rankCol: String, nCol: String, b: Int): Column =
    expr(
      s"""CAST(CASE WHEN $rankCol <= (($nCol div $b) + 1) * ($nCol % $b)
         |     THEN ($rankCol - 1) div (($nCol div $b) + 1) + 1
         |     ELSE ($nCol % $b) +
         |          ($rankCol - (($nCol div $b) + 1) * ($nCol % $b) - 1)
         |            div ($nCol div $b) + 1
         |END AS INT)""".stripMargin)

  /** [[ntileFromRank]] as driver-side integer arithmetic — the identical
    * CASE, for size-adaptive fast paths that rank a collected frame
    * locally. `rank` is 1-based; callers guarantee `1 <= rank <= n`
    * (which keeps the `n div b == 0` else-branch division unreachable,
    * exactly as in the SQL form).
    */
  def ntileLocal(rank: Long, n: Long, b: Int): Int = {
    val q = n / b
    val r = n % b
    if (rank <= (q + 1) * r) ((rank - 1) / (q + 1) + 1).toInt
    else (r + (rank - (q + 1) * r - 1) / q + 1).toInt
  }

  /** Core: given a deterministic `bucket` expression monotone non-decreasing
    * in `orderKeys` (within every `partCols` group), attach the exact rank.
    *   1. histogram: `groupBy(part, bucket).count` — map-side combinable,
    *      |parts|×|buckets| rows out;
    *   2. offsets: prefix-sum window over the HISTOGRAM (tiny — the only
    *      unpartitioned window runs over ≤ |parts|×|buckets| rows);
    *   3. local rank: `row_number` partitioned by (part, bucket) — every
    *      task sorts one bucket;
    *   4. broadcast the offsets back and add.
    * Both references to the bucketed frame recompute identically because
    * `bucket` is a literal-deterministic expression.
    */
  private def rankedByBucket(
      df: DataFrame,
      partCols: Seq[String],
      orderKeys: Seq[Column],
      bucket: Column,
      rankCol: String,
      nCol: Option[String]): DataFrame = {
    val part = partCols.map(col)
    val b = df.withColumn(BKT, bucket)
    val hist = b.groupBy(part :+ col(BKT): _*).agg(count(lit(1)).as(CNT))
    val offsets = hist
      .withColumn(OFF,
        sum(col(CNT)).over(
          Window.partitionBy(part: _*).orderBy(col(BKT).asc)) - col(CNT))
      .withColumn(TOT, sum(col(CNT)).over(Window.partitionBy(part: _*)))
      .drop(CNT)
    val wIn = Window.partitionBy(part :+ col(BKT): _*)
      .orderBy(orderKeys.map(_.asc): _*)
    val ranked = b
      .join(broadcast(offsets), partCols :+ BKT)
      .withColumn(rankCol, col(OFF) + row_number().over(wIn).cast("long"))
    val withN = nCol.fold(ranked)(n => ranked.withColumn(n, col(TOT)))
    withN.drop(BKT, OFF, TOT)
  }

  /** Driver-side ordering for sampled boundary tuples — mirrors Spark's
    * ascending, nulls-excluded comparison for the types the engine ranks
    * on. Order keys are required non-null; a null in the sample fails fast.
    */
  private def cmpAny(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: Int, y: Int) => Integer.compare(x, y)
    case (x: Short, y: Short) => java.lang.Short.compare(x, y)
    case (x: Byte, y: Byte) => java.lang.Byte.compare(x, y)
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case (x: Float, y: Float) => java.lang.Float.compare(x, y)
    case (x: String, y: String) => x.compareTo(y)
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y)
    case (x: java.sql.Timestamp, y: java.sql.Timestamp) => x.compareTo(y)
    case (x: java.sql.Date, y: java.sql.Date) => x.compareTo(y)
    case _ => throw new IllegalArgumentException(
      s"Ranks: unsupported or null order-key value ($a, $b) — order keys " +
        "must be non-null numeric/string/decimal/timestamp/date")
  }
}
