package graft.queries

import graft.SparkSpec

/** Pins the `props_schema` numeric-census gate on the exact cross-engine
  * edge values the fixture happens not to contain: the census must count a
  * value as numeric iff it matches the anchored integer regex, NOT iff an
  * engine's cast happens to accept it (Spark's non-ANSI cast truncates
  * '12.5'→12 and rejects '1e3'; DuckDB's TRY_CAST rounds '12.5'→13 and
  * accepts '1e3' — either behavior leaking in would hash-diverge the twin).
  */
class IngestSpec extends SparkSpec {

  test("props_schema numeric gate: integer regex, not engine cast semantics") {
    import spark.implicits._
    // one key per edge case so each census row isolates one value
    val events = Seq(
      (1L, """{"dec":"12.5"}"""),   // decimal: castable-with-truncation in Spark — must NOT census
      (2L, """{"sci":"1e3"}"""),    // scientific: TRY_CASTable in DuckDB — must NOT census
      (3L, """{"neg":"-7"}"""),     // signed integer — must census as -7
      (4L, """{"pad":"007"}"""),    // zero-padded — must census as 7
      (5L, """{"nl":"42\n"}"""),    // trailing newline: Java's $ would match, \z must not
      (6L, """{"sp":" 5"}"""),      // leading space — must NOT census
      (7L, """{"txt":"abc"}"""),    // non-numeric — must NOT census
      (8L, """{"big":"9223372036854775807"}"""), // Long.MaxValue — must census
      (9L, """{"pos":"13"}"""), (10L, """{"pos":"11"}""")) // min/max over a real group
      .toDF("event_id", "props")

    val rows = Ingest.propsSchemaOf(events)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]),
          Option(r.get(5)).map(_.asInstanceOf[Long]))))
      .toMap

    // n_numeric, min_num, max_num per key
    assert(rows("dec") === ((0L, None, None)), "'12.5' must not census as numeric")
    assert(rows("sci") === ((0L, None, None)), "'1e3' must not census as numeric")
    assert(rows("nl") === ((0L, None, None)), "'42\\n' must not census as numeric")
    assert(rows("sp") === ((0L, None, None)), "' 5' must not census as numeric")
    assert(rows("txt") === ((0L, None, None)))
    assert(rows("neg") === ((1L, Some(-7L), Some(-7L))))
    assert(rows("pad") === ((1L, Some(7L), Some(7L))))
    assert(rows("big") === ((1L, Some(Long.MaxValue), Some(Long.MaxValue))))
    assert(rows("pos") === ((2L, Some(11L), Some(13L))))
  }
}
