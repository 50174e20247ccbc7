package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The canonical-form contract of Normalize.normalizeText, checked on the
  * registered query's own output (the oracle pins cross-engine bytes; this
  * suite pins the INVARIANTS of the form so a chain edit that both engines
  * happen to agree on still can't weaken it).
  */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val out = Normalize.textNormalize(spark, sf).cache()

  test("canonical form: no junk codepoints, collapsed whitespace, trimmed") {
    val rows = out.collect()
    assert(rows.nonEmpty)
    val banned = Seq('\r', '\u200B', '\u200C', '\u200D',
      '\uFEFF', '\u00A0', '\u2007', '\u202F', '\u0007',
      '\u000B', '\u007F')
    rows.foreach { r =>
      val t = r.getAs[String]("norm_text")
      banned.foreach(c => assert(!t.contains(c), s"doc ${r.get(0)}: $c"))
      assert(!t.contains("  "), "double space survived")
      assert(!t.contains("\t"), "tab survived collapse")
      assert(!t.contains("\n\n\n"), "blank-line run survived")
      assert(t == t.trim, "untrimmed edges")
      assert(r.getAs[Int]("n_norm") == t.length)
      assert(java.text.Normalizer.isNormalized(
        t, java.text.Normalizer.Form.NFC))
    }
    // the provided corpus is clean ASCII: normalization must be a no-op
    assert(rows.forall(_.getAs[Boolean]("already_clean")))
  }

  test("normalizeText is idempotent on the decorated corpus") {
    graft.functions.GraftFunctions.register(spark)
    val twice = out.select($"doc_id", $"norm_text",
      Normalize.normalizeText($"norm_text").as("again"))
    assert(twice.where($"again" =!= $"norm_text").count() == 0L)
  }

  test("every dirt class changed its document (the decoration is live)") {
    // n_dirty > n_norm for every class that injects strippable content;
    // at minimum, every decorated doc must differ from its clean text in
    // dirty length vs the normalized length
    val byClass = out
      .withColumn("cls", (col("doc_id") % 6).cast("int"))
      .groupBy($"cls")
      .agg(sum(when($"n_dirty" > $"n_norm", 1L).otherwise(0L)).as("shrunk"),
        count(lit(1)).as("n"))
      .collect()
    assert(byClass.length == 6, "all six dirt classes present in fixture")
    byClass.foreach { r =>
      assert(r.getAs[Long]("shrunk") == r.getAs[Long]("n"),
        s"class ${r.get(0)}: decoration did not strip anything")
    }
  }
}
