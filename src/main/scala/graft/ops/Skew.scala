package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation shapes for hot keys (100 TB design notes in the
  * builder prompt; complements AQE's skew-join splitting, which only fires
  * on sort-merge joins above its size thresholds).
  *
  * Determinism note: salts are derived from existing columns via xxhash64,
  * never from rand() — results stay reproducible and oracle-comparable.
  */
object Skew {

  /** Salted two-stage aggregation for aggregates whose per-key state is
    * heavy (collect_set/collect_list/distinct buffers — NOT plain sums,
    * which Spark already partially aggregates map-side): stage 1 groups on
    * (key, salt) spreading a hot key over `salts` reducers, stage 2 merges
    * the per-salt partials.
    *
    * `saltBy` must be a deterministic discriminator column (e.g. the fact
    * row's id) — rows of one key with different discriminators land on
    * different salts.
    */
  def saltedDistinctCount(
      df: DataFrame, key: Column, saltBy: Column, distinctOn: Column,
      as: String, salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(saltBy), lit(salts)))
      .groupBy(key.as("__k"), col("__salt"))
      .agg(collect_set(distinctOn).as("__partial"))
      .groupBy(col("__k"))
      .agg(size(array_distinct(flatten(collect_list(col("__partial"))))).as(as))
      .withColumnRenamed("__k", key.toString)

  /** Salted broadcast-replicated join for a skewed big side against a
    * small side: the small side is replicated `salts` times (explode), the
    * big side's rows scatter across salts by a deterministic hash of
    * `saltBy`, so one hot key no longer lands on one reducer. Result
    * equals `big.join(small, bigKey === smallKey)` exactly.
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String, saltBy: Column,
      salts: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(xxhash64(saltBy), lit(salts)))
    val replicatedSmall = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(salts - 1L))))
    saltedBig
      .join(replicatedSmall,
        saltedBig("__salt") === replicatedSmall("__salt") &&
          saltedBig(bigKey) === replicatedSmall(smallKey))
      .drop("__salt")
  }
}
