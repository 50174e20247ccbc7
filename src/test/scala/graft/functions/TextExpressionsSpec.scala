package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** The text-canonicalization kernels: graft_dl (true Damerau–Levenshtein
  * over UTF-8 bytes) and graft_nfc (Unicode NFC). The registered queries
  * cross-check both against DuckDB on every CORRECTNESS run; this suite
  * owns the properties the oracle can't see (codegen==interpreted,
  * fast-path identity, guard rails) plus an engine-independent vector
  * table probed from DuckDB 1.0.0 while designing the twins.
  */
class TextExpressionsSpec extends SparkSpec {

  private def dl(a: String, b: String): Int =
    StringKernels.damerauLevenshtein(
      UTF8String.fromString(a), UTF8String.fromString(b))

  /** Optimal String Alignment (restricted DL): the easy-to-verify 3-row
    * DP. True DL ≤ OSA everywhere, with strict inequality exactly when an
    * edit lands between transposed characters — the property that
    * distinguishes the Lowrance–Wagner table from the common shortcut.
    */
  private def osa(a: String, b: String): Int = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    val (la, lb) = (x.length, y.length)
    val d = Array.ofDim[Int](la + 1, lb + 1)
    for (i <- 0 to la) d(i)(0) = i
    for (j <- 0 to lb) d(0)(j) = j
    for (i <- 1 to la; j <- 1 to lb) {
      val cost = if (x(i - 1) == y(j - 1)) 0 else 1
      var m = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + cost)
      if (i > 1 && j > 1 && x(i - 1) == y(j - 2) && x(i - 2) == y(j - 1))
        m = math.min(m, d(i - 2)(j - 2) + 1)
      d(i)(j) = m
    }
    d(la)(lb)
  }

  test("graft_dl matches the DuckDB-probed vector table") {
    // probed against duckdb 1.0.0 damerau_levenshtein on 2026-08-16;
    // 'CA'/'ABC' = 2 pins the UNRESTRICTED variant (OSA says 3), and the
    // unicode rows pin BYTE-level comparison (U+00E9 is 2 UTF-8 bytes)
    val vectors = Seq(
      ("CA", "ABC", 2), ("ab", "ba", 1), ("teh", "the", 1),
      ("", "abc", 3), ("abc", "", 3), ("", "", 0),
      ("same", "same", 0), ("kitten", "sitting", 3),
      ("\u00E9", "e", 2), ("\u65E5\u672C", "\u65E5\u6728", 1))
    vectors.foreach { case (a, b, want) =>
      assert(dl(a, b) == want, s"dl($a, $b)")
      assert(dl(b, a) == want, s"dl($b, $a) symmetry")
    }
  }

  test("graft_dl <= OSA, with the known strict case; metric properties") {
    assert(osa("CA", "ABC") == 3 && dl("CA", "ABC") == 2)
    val rnd = new scala.util.Random(13)
    def word(): String =
      (0 until (1 + rnd.nextInt(9))).map(_ => ('a' + rnd.nextInt(4)).toChar)
        .mkString
    val ws = Seq.fill(300)(word())
    ws.zip(ws.tail).foreach { case (a, b) =>
      val v = dl(a, b)
      assert(v <= osa(a, b), s"dl > osa for ($a, $b)")
      assert(v >= math.abs(a.length - b.length))
      assert(v <= math.max(a.length, b.length))
      assert(v == dl(b, a))
      assert((v == 0) == (a == b))
    }
    // triangle inequality on random triples
    ws.grouped(3).filter(_.size == 3).foreach { case Seq(a, b, c) =>
      assert(dl(a, c) <= dl(a, b) + dl(b, c), s"triangle ($a, $b, $c)")
    }
    // a single adjacent swap always costs exactly 1
    ws.filter(_.length >= 2).foreach { w =>
      val p = rnd.nextInt(w.length - 1)
      val t = w.substring(0, p) + w(p + 1) + w(p) + w.substring(p + 2)
      assert(dl(w, t) == (if (t == w) 0 else 1), s"swap ($w, $t)")
    }
  }

  test("graft_dl codegen path equals the interpreted kernel") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(99)
    def word(): String =
      (0 until rnd.nextInt(12)).map(_ => ('a' + rnd.nextInt(5)).toChar)
        .mkString
    val pairs = Seq.fill(400)((word(), word()))
    val got = pairs.toDF("a", "b")
      .select(expr("graft_dl(a, b)").as("d")).as[Int].collect()
    pairs.zip(got).foreach { case ((a, b), g) =>
      assert(g == dl(a, b), s"codegen vs kernel for ($a, $b)")
    }
  }

  test("graft_dl null handling and guard rails") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dl(NULL, 'x') AS a, graft_dl('x', NULL) AS b").collect()
    assert(r.head.isNullAt(0) && r.head.isNullAt(1))
    // vocabulary guard: document-sized inputs are refused, not OOMed
    // (equal inputs short-circuit to 0 before the guard, so differ)
    val e = intercept[IllegalArgumentException](dl("x" * 4096, "y" * 4096))
    assert(e.getMessage.contains("graft_dl"))
    assert(dl("x" * 4096, "x" * 4096) == 0, "equal fast path skips the guard")
    // arity is checked at analysis
    intercept[Exception](spark.sql("SELECT graft_dl('x')").collect())
  }

  test("graft_nfc matches the DuckDB-probed vector table") {
    def nfc(s: String): String =
      StringKernels.nfc(UTF8String.fromString(s)).toString
    // probed against duckdb 1.0.0 nfc_normalize on 2026-08-16
    assert(nfc("Cafe\u0301") == "Caf\u00E9") // compose
    assert(nfc("\u212B") == "\u00C5") // angstrom singleton
    assert(nfc("\u2126") == "\u03A9") // ohm singleton
    assert(nfc("\u1100\u1161") == "\uAC00") // Hangul LV
    assert(nfc("\u1100\u1161\u11A8") == "\uAC01") // Hangul LVT
    // canonical reorder THEN compose: ccc(0316)=220 < ccc(0300)=230, so
    // the below-mark moves first and the grave still composes with the base
    assert(nfc("a\u0300\u0316") == "\u00E0\u0316")
    assert(nfc("\uFB01") == "\uFB01") // fi ligature: NFC-invariant
    assert(nfc("plain ascii 123") == "plain ascii 123")
    // non-BMP passes through intact (surrogate-pair safety)
    val emoji = new String(Character.toChars(0x1f600))
    assert(nfc(emoji) == emoji)
  }

  test("graft_nfc fast paths return the input object; idempotent") {
    val ascii = UTF8String.fromString("already clean ascii")
    assert(StringKernels.nfc(ascii) eq ascii)
    val composed = UTF8String.fromString("Caf\u00E9 \u00C5")
    assert(StringKernels.nfc(composed) eq composed)
    val rnd = new scala.util.Random(7)
    val pool = "ae\u0300\u0301\u0316\u212B\u1100\u1161 x"
    (0 until 200).foreach { _ =>
      val s = UTF8String.fromString(
        (0 until rnd.nextInt(12)).map(_ => pool(rnd.nextInt(pool.length)))
          .mkString)
      val once = StringKernels.nfc(s)
      assert(StringKernels.nfc(once) == once)
      assert(java.text.Normalizer.isNormalized(
        once.toString, java.text.Normalizer.Form.NFC))
    }
  }

  test("graft_nfc codegen path equals the interpreted kernel") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val inputs = Seq("Cafe\u0301", "\u212B", "a\u0300\u0316",
      "\u1100\u1161\u11A8", "ascii", "")
    val got = inputs.toDF("s")
      .select(expr("graft_nfc(s)").as("n")).as[String].collect()
    inputs.zip(got).foreach { case (in, g) =>
      assert(g == StringKernels.nfc(UTF8String.fromString(in)).toString)
    }
    val r = spark.sql("SELECT graft_nfc(NULL) AS n").collect()
    assert(r.head.isNullAt(0))
  }
}
