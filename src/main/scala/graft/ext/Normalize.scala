package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.io.Tables

/** Text canonicalization -- the pass every corpus pipeline runs BEFORE
  * the dedup/quality families, because byte-identical is the currency
  * those families trade in: composed vs decomposed accents, zero-width
  * characters, NBSP variants, CRLF line endings and control-char litter
  * all make "the same text" hash differently (`dedup_exact`'s sha2,
  * `minhash_sig`'s shingles, `span_rows`' token hashes). One codegen'd
  * row-local projection fixes that; nothing here shuffles.
  *
  * Canonical form, applied in order (each step is a Spark built-in
  * except NFC, which is the native [[graft.functions.NfcNormalize]] --
  * Spark has no normalization function; the oracle twin uses DuckDB's
  * `nfc_normalize` + the same replace chain, so every CORRECTNESS run
  * cross-checks the JDK's NFC against utf8proc's):
  *
  *  1. drop zero-width characters (ZWSP/ZWNJ/ZWJ/BOM)
  *  2. NBSP family (U+00A0, U+2007, U+202F) to plain space
  *  3. CRLF and bare CR to LF
  *  4. drop remaining C0 controls (except tab/LF) and DEL
  *  5. Unicode NFC (compose: e+U+0301, U+212B angstrom, Hangul jamo;
  *     canonical reordering of combining marks) -- AFTER the strips, so
  *     junk that blocked a composition exposes it rather than leaving a
  *     decomposed residue (see normalizeText)
  *  6. collapse horizontal whitespace runs to one space
  *  7. collapse 3+ blank lines to one blank line
  *  8. trim leading/trailing spaces and newlines
  *
  * At 100 TB this is the cheapest pass in the pipeline: embarrassingly
  * parallel, whole-stage-codegen end to end, with the NFC kernel's
  * ASCII/quick-check fast paths making the common (already-clean) row a
  * byte scan, zero allocation.
  */
object Normalize {

  /** The canonical-form kernel as a reusable Column (steps 1-8 above).
    * Callers must have run [[GraftFunctions.register]] on the session
    * (query entry points below do). Unicode characters appear as
    * source-level \\uXXXX escapes (compiled to the real chars);
    * regex classes use byte-hex escapes valid in BOTH Java regex and
    * RE2, so the twin reuses the pattern text verbatim.
    */
  def normalizeText(c: Column): Column = {
    // ALL removals run BEFORE NFC: a zero-width or control character
    // between a base letter and its combining mark blocks composition, so
    // stripping it AFTER NFC would leave a decomposed (non-NFC,
    // non-idempotent) string -- exactly the dodge this pass exists to
    // close. The strip set itself can never be PRODUCED by NFC (none of
    // those codepoints appear in any canonical decomposition), and the
    // post-NFC steps only replace/remove starters while always leaving a
    // space or newline between retained characters, so no new
    // composition opportunity arises after step NFC.
    val zw = translate(c, "\u200B\u200C\u200D\uFEFF", "")
    val nbsp = translate(zw, "\u00A0\u2007\u202F", "   ")
    // replacement is a REAL newline char: Java's Matcher treats backslash
    // in the replacement text as an escape, so a two-char `\n` replacement
    // would insert a literal 'n'
    val lf = translate(regexp_replace(nbsp, "\\r\\n", "\n"), "\r", "\n")
    val ctl = regexp_replace(lf, "[\\x00-\\x08\\x0B-\\x1F\\x7F]", "")
    val nfc = call_function("graft_nfc", ctl)
    val hws = regexp_replace(nfc, "[ \\t]+", " ")
    val nls = regexp_replace(hws, "\\n{3,}", "\n\n")
    regexp_replace(nls, "^[ \\n]+|[ \\n]+$", "")
  }

  /** Deterministic Unicode "dirt" for the verification corpus: the
    * provided documents are pure ASCII (normalization there is a proven
    * no-op -- see `already_clean`), so each doc_id class splices a
    * specific hazard the canonical form must fix. The SAME construction
    * runs in the DuckDB twin (via chr() codepoints), so the oracle hash
    * compares my NFC/strip/collapse chain against an independent engine
    * on every class: composed-vs-decomposed, Hangul jamo composition,
    * combining-mark reordering (U+0300 ordered after U+0316, then the
    * base composes), NFC singletons (U+212B angstrom, U+2126 ohm),
    * zero-width, NBSP, CRLF/CR, C0 controls, BOM, and whitespace runs.
    * Class 0 places the ZWSP BETWEEN the base letter and its combining
    * mark: composition is exposed only by the strip, pinning the
    * strip-BEFORE-NFC order cross-engine.
    */
  private[ext] def decorate(text: Column, docId: Column): Column = {
    val m = (docId % 6).cast("int")
    when(m === 0, concat(lit("Cafe\u200B\u0301 "), text, lit(" \u212B")))
      .when(m === 1, concat(lit("\u1100\u1161\u11A8 "), text, lit("\r\nend\r")))
      .when(m === 2, concat(text, lit(" a\u0300\u0316 \u2126")))
      .when(m === 3, concat(lit("\u00A0\u00A0"), text, lit("\t\t end")))
      .when(m === 4, concat(lit("\u0007"), text, lit("\u000B\uFEFF")))
      .otherwise(concat(text, lit("\n\n\n\nfin  tail")))
  }

  /** Registered query: decorate then canonicalize, one row per document
    * with before/after codepoint counts, the canonical text itself (the
    * hash pins every byte), and the clean-corpus invariant
    * `already_clean = (normalize(text) == text)`.
    */
  def textNormalize(spark: SparkSession, sfDir: String): DataFrame = {
    GraftFunctions.register(spark)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"))
    docs
      .withColumn("dirty", decorate(col("text"), col("doc_id")))
      .withColumn("norm_text", normalizeText(col("dirty")))
      .select(
        col("doc_id"), col("lang"),
        length(col("dirty")).cast("int").as("n_dirty"),
        length(col("norm_text")).cast("int").as("n_norm"),
        col("norm_text"),
        (normalizeText(col("text")) === col("text")).as("already_clean"))
      .orderBy(col("doc_id").asc)
  }
}
