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

  // NOT cached: DedupScaleSpec asserts the SHARED session's CacheManager
  // is empty after its CC paths, and suites run in parallel — a cached
  // frame here fails it (observed). The fixture is 50 rows; recompute.
  private lazy val out = Normalize.textNormalize(spark, sf)

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

  test("strips run BEFORE NFC: junk between base and mark exposes compose") {
    // a zero-width space (or control) between a base letter and its
    // combining mark blocks NFC composition; the canonical form must
    // strip first so the mark composes — normalizing first then stripping
    // would leave a decomposed, non-NFC, non-idempotent residue
    graft.functions.GraftFunctions.register(spark)
    val cases = Seq(
      "Cafe\u200B\u0301" -> "Caf\u00E9", // ZWSP between e and acute
      "a\u0007\u0300" -> "\u00E0", // C0 control between a and grave
      "x\uFEFF\u0301y" -> "x\u0301y") // BOM strip: x+acute has no composite
    val out = cases.map(_._1).toDF("s")
      .select(Normalize.normalizeText($"s").as("n")).as[String].collect()
    cases.map(_._2).zip(out).foreach { case (want, got) =>
      assert(got == want)
      assert(java.text.Normalizer.isNormalized(
        got, java.text.Normalizer.Form.NFC))
    }
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
