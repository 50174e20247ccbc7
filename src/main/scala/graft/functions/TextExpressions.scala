package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for text canonicalization — the two string
  * kernels a corpus-curation pipeline needs that Spark's function library
  * genuinely lacks (SURVEY §7.3 discipline: custom code only where
  * built-ins can't express the semantics):
  *
  *  - [[NfcNormalize]] — Unicode NFC. Spark has no normalization function
  *    at all, yet exact dedup over web text is WRONG without one: "café"
  *    composed (U+00E9) and decomposed (e + U+0301) are different byte
  *    strings, different sha2 keys, different MinHash shingles — the same
  *    document dodges every dedup family. NFC before hashing is the
  *    standard fix (and what DuckDB ships as `nfc_normalize`, which the
  *    oracle twin uses).
  *  - [[DamerauLevenshtein]] — true (unrestricted) Damerau–Levenshtein.
  *    Spark ships plain `levenshtein` only; adjacent-character swaps — the
  *    dominant human typo class — cost 2 there and 1 here, so an ER leg
  *    thresholded at 1 misses every transposed variant without this.
  *
  * Both delegate to static kernels in [[StringKernels]] from `doGenCode`,
  * so they stay inside whole-stage codegen (one static call, no boxing,
  * no UDF serialization) while keeping the non-trivial bodies testable.
  */
object StringKernels {

  /** Unicode NFC over UTF8String. Fast paths in likelihood order at corpus
    * scale: pure-ASCII input (byte scan, no allocation — ASCII is closed
    * under NFC) and already-normalized input (Normalizer's NFC quick-check,
    * no allocation). Only strings that actually change pay the
    * String round-trip.
    */
  def nfc(s: UTF8String): UTF8String = {
    if (s.isFullAscii) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Guard-rail: DL is O(|a|·|b|) time AND space. Distance arguments are
    * vocabulary entries (names, tokens, titles) — a caller passing whole
    * documents gets a clear refusal, not an executor OOM. 4M cells ≈ two
    * 2 KB strings, far past any name use.
    */
  private val MaxDlCells: Long = 1L << 22

  /** True (unrestricted, Lowrance–Wagner) Damerau–Levenshtein over UTF-8
    * BYTES — deliberately byte-level, matching DuckDB's
    * `damerau_levenshtein` (probed: 'é'↔'e' = 2, i.e. the oracle engine
    * compares bytes too); for ASCII inputs bytes and characters coincide.
    * Unrestricted means a substring may be edited after a transposition
    * ("CA"→"ABC" = 2, where the restricted/OSA variant says 3), which is
    * what the `da` last-occurrence table buys over the common
    * three-row OSA recurrence. The byte alphabet makes that table a flat
    * 256-slot array — no per-call hash map.
    */
  def damerauLevenshtein(a: UTF8String, b: UTF8String): Int = {
    if (a.equals(b)) return 0
    val x = a.getBytes
    val y = b.getBytes
    val la = x.length
    val lb = y.length
    if (la == 0) return lb
    if (lb == 0) return la
    if ((la + 2).toLong * (lb + 2).toLong > MaxDlCells)
      throw new IllegalArgumentException(
        s"graft_dl: inputs of $la and $lb bytes exceed the " +
          s"$MaxDlCells-cell bound — DL is for vocabulary-sized strings " +
          "(names, tokens), not documents")
    val inf = la + lb
    val w = lb + 2
    val d = new Array[Int]((la + 2) * w)
    val da = new Array[Int](256)
    d(0) = inf
    var i = 0
    while (i <= la) {
      d((i + 1) * w) = inf
      d((i + 1) * w + 1) = i
      i += 1
    }
    var j = 0
    while (j <= lb) {
      d(j + 1) = inf
      d(w + j + 1) = j
      j += 1
    }
    i = 1
    while (i <= la) {
      var db = 0
      val ai = x(i - 1) & 0xff
      val rowPrev = i * w
      val rowCur = (i + 1) * w
      var jj = 1
      while (jj <= lb) {
        val bj = y(jj - 1) & 0xff
        val k = da(bj)
        val l = db
        var cost = 1
        if (ai == bj) { cost = 0; db = jj }
        var m = d(rowPrev + jj) + cost // substitute / match
        val ins = d(rowCur + jj) + 1
        if (ins < m) m = ins
        val del = d(rowPrev + jj + 1) + 1
        if (del < m) m = del
        val tr = d(k * w + l) + (i - k - 1) + 1 + (jj - l - 1)
        if (tr < m) m = tr
        d(rowCur + jj + 1) = m
        jj += 1
      }
      da(ai) = i
      i += 1
    }
    d((la + 1) * w + lb + 1)
  }
}

/** `graft_nfc(str)` — Unicode NFC normalization (see [[StringKernels.nfc]]).
  * Null-intolerant string→string; the DuckDB twin is `nfc_normalize`.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      // NullType: a bare NULL literal folds to null output (null-intolerant
      // eval), matching the built-in string functions' acceptance
      case _: StringType | NullType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_nfc expects a string input, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    StringKernels.nfc(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StringKernels.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_dl(a, b)` — true Damerau–Levenshtein distance over UTF-8 bytes
  * (see [[StringKernels.damerauLevenshtein]]). Null-intolerant
  * (string, string)→int; the DuckDB twin is `damerau_levenshtein`.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    // NullType as for graft_nfc: a bare NULL argument yields null
    val ok = Seq(left, right).forall(e =>
      e.dataType.isInstanceOf[StringType] || e.dataType == NullType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dl expects (string, string) inputs, got " +
        s"${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    StringKernels.damerauLevenshtein(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringKernels.damerauLevenshtein($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
