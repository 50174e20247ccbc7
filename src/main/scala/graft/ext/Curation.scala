package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** End-to-end corpus curation — the composition a real training-data run
  * executes, as ONE dataflow: C4-style cleaning → exact dedup (keep the
  * smallest id per identical text) → MinHash near-dup clustering (keep
  * each cluster's representative) → stratified sampling. Every stage is
  * an operator with its own registered, oracle-checked query
  * ([[TextStats.c4Filters]], [[Dedup.exactKeepers]],
  * [[Dedup.minHashClusters]], [[Corpus.stratifiedSample]]); composing
  * them stays oracle-checked because each stage is a deterministic
  * relation of the input.
  *
  * Scale shape: the stages are independent semi-join filters on doc_id —
  * Catalyst plans them as successive fixed-width-key joins against the
  * (much smaller) survivor sets, and the document text itself is only
  * read where a stage needs it. Nothing here is a new shuffle pattern:
  * the cost profile is the SUM of the component operators, which is how
  * a production curation run budgets too.
  */
object Curation {

  /** The final training-set manifest: documents surviving all four
    * stages, with their routing columns. `fractions`/`defaultFraction`
    * parameterize the last stage ([[Corpus.stratifiedSample]] semantics).
    * `requireTerminal` gates C4's terminal-punctuation rule — OFF by
    * default because corpora without sentence punctuation (code, logs,
    * the synthetic fixture) would be wiped to zero by it; a web-text run
    * turns it on.
    */
  def trainingSet(
      spark: SparkSession, sfDir: String,
      fractions: Map[String, Double] = Map("en" -> 0.5),
      defaultFraction: Double = 0.2,
      requireTerminal: Boolean = false,
      maxIter: Int = 10,
      driverEdgeLimit: Long = 2_000_000L): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val c4 = TextStats.c4Filters(spark, sfDir)
    val c4Survivors = c4.filter(
      !col("has_lorem") && !col("has_brace") && !col("has_js") &&
        (if (requireTerminal) col("ends_terminal") else lit(true)) &&
        col("n_words").between(5, 100000))
      .select("doc_id")
    val exactKeepers = Dedup.exactSurvivorIds(spark, sfDir)
    // maxIter/driverEdgeLimit thread through to connectedComponents: a dup
    // graph with diameter > 10 on the distributed path fails LOUDLY there,
    // and the caller needs a knob to raise the bound without forking the
    // pipeline.
    val nearDupKeepers = Dedup.minHashMembership(
      spark, sfDir, twinnable = true, maxIter = maxIter,
      driverEdgeLimit = driverEdgeLimit)
      .filter(col("cluster_id") === col("doc_id"))
      .select("doc_id")
    val sampled = Corpus.stratifiedSample(
      spark, sfDir, fractions, defaultFraction, twinnable = true)
      .select("doc_id")
    docs
      .join(c4Survivors, Seq("doc_id"), "left_semi")
      .join(exactKeepers, Seq("doc_id"), "left_semi")
      .join(nearDupKeepers, Seq("doc_id"), "left_semi")
      .join(sampled, Seq("doc_id"), "left_semi")
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy(col("doc_id").asc)
  }
}
