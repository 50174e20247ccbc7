package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Tables

/** Property pin for the ONE permanently rows-only registered query:
  * `corpus_sketch`'s HLL/quantile sketches have no cross-engine hash twin
  * by design (sketch internals differ per engine), so each estimate is
  * bounded here against the exact value computed from the same corpus —
  * the differential discipline the oracle can't provide.
  */
class CorpusSketchSpec extends SparkSpec {

  test("corpus_sketch estimates bound their exact counterparts") {
    val row = TextStats.corpusSketch(spark, sf).collect().head
    val docs = Tables.documents(spark, sf)
    val exact = docs.agg(
      count(lit(1)).as("n"),
      countDistinct(col("text")).as("dt"),
      countDistinct(col("source")).as("ds")).collect().head
    // n_docs is an exact count even in the sketch row
    assert(row.getAs[Long]("n_docs") === exact.getAs[Long]("n"))
    // HLL++ at default rsd (5%): allow 15% — loose enough to be stable,
    // tight enough that a broken sketch (0, or corpus-sized garbage) fails
    def within(est: Long, ex: Long, tol: Double): Boolean =
      math.abs(est - ex) <= math.max(1L, (ex * tol).toLong)
    assert(within(row.getAs[Long]("approx_distinct_texts"),
      exact.getAs[Long]("dt"), 0.15),
      s"distinct texts: est=${row.getAs[Long]("approx_distinct_texts")} " +
        s"exact=${exact.getAs[Long]("dt")}")
    assert(within(row.getAs[Long]("approx_sources"),
      exact.getAs[Long]("ds"), 0.15))
    // quantile sketches: each estimate must be an attained corpus value,
    // the trio must be ordered, and p50 must sit within the exact p25–p75
    // band (GK with accuracy 10000 is far tighter; this catches swaps and
    // off-by-rank regressions without pinning sketch internals)
    val chars = docs.select(col("n_chars").cast("long"))
      .collect().map(_.getLong(0)).sorted
    def exactQ(p: Double): Long = chars((p * (chars.length - 1)).toInt)
    val (p50, p90, p99) = (row.getAs[Number]("p50_chars").longValue(),
      row.getAs[Number]("p90_chars").longValue(),
      row.getAs[Number]("p99_chars").longValue())
    assert(p50 <= p90 && p90 <= p99)
    Seq(p50, p90, p99).foreach(v =>
      assert(chars.contains(v), s"sketch quantile $v not an attained value"))
    assert(p50 >= exactQ(0.25) && p50 <= exactQ(0.75),
      s"p50 sketch $p50 outside exact p25..p75 band")
    assert(p99 >= exactQ(0.90), s"p99 sketch $p99 below exact p90")
  }
}
