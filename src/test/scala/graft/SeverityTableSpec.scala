package graft

import org.apache.spark.sql.DataFrame

import graft.functions.Severity.{Num, Range, Str, MappingValue}
import graft.model.LogFrames
import graft.operators._
import graft.pipeline.{Pipeline, PipelineSpec}

/** Ports the stanza severity parser test table
  * (`operators/severity/parser_test.go:29-250` TestSeverityParser): every
  * case runs twice like the reference — parse_from the body root and from
  * `body.some_field` (the fork's JSON-body read). The `[]byte{100,100,100}`
  * sample/mapping-value appears as its string form "ddd" (this engine has no
  * byte-array entry values; stanza stringifies bytes for matching anyway).
  */
class SeverityTableSpec extends SparkSuite {
  import spark.implicits._

  private def run(spec: SeveritySpec, body: String): Int = {
    val df: DataFrame = LogFrames.withDefaults(Seq(body).toDF("body"))
    val out = Pipeline.compile(PipelineSpec(Seq(
      SeverityParserOp(Common("sev"), spec), NoopOp(Common("__noop")))))(df)
    out.select("severity_number").collect()(0).getInt(0)
  }

  /** (name, sample, mapping, expected level) — expected values are the
    * stanza enum: Default 0, Trace2 2, Info 9, Error 17, Fatal2 22.
    */
  private val allTheThings: Seq[(String, Seq[MappingValue])] = Seq(
    "info" -> Seq(Str("3xx")),
    "error3" -> Seq(Str("4xx")),
    "debug4" -> Seq(Str("5xx")),
    "trace2" -> Seq(Str("ttttttracer"), Str("ddd"), Range(1111, 1234)),
    "fatal2" -> Seq(Str("")))

  private val cases: Seq[(String, String, Seq[(String, Seq[MappingValue])], Int)] = Seq(
    ("unknown", "blah", Nil, 0),
    ("error", "error", Nil, 17),
    ("error-capitalized", "Error", Nil, 17),
    ("error-all-caps", "ERROR", Nil, 17),
    ("custom-string", "NOOOOOOO", Seq("error" -> Seq(Str("NOOOOOOO"))), 17),
    ("custom-string-caps-key", "NOOOOOOO", Seq("ErRoR" -> Seq(Str("NOOOOOOO"))), 17),
    ("custom-int", "1234", Seq("error" -> Seq(Num(1234))), 17),
    ("mixed-list-string", "ThiS Is BaD",
      Seq("error" -> Seq(Str("NOOOOOOO"), Str("this is bad"), Num(1234))), 17),
    ("mixed-list-int", "1234",
      Seq("error" -> Seq(Str("NOOOOOOO"), Str("this is bad"), Num(1234))), 17),
    ("in-range", "123", Seq("error" -> Seq(Range(120, 125))), 17),
    ("in-range-min", "120", Seq("error" -> Seq(Range(120, 125))), 17),
    ("in-range-max", "125", Seq("error" -> Seq(Range(120, 125))), 17),
    ("out-of-range-min-minus", "119", Seq("error" -> Seq(Range(120, 125))), 0),
    ("out-of-range-max-plus", "126", Seq("error" -> Seq(Range(120, 125))), 0),
    ("range-out-of-order", "123", Seq("error" -> Seq(Range(125, 120))), 17),
    ("Http2xx-hit", "201", Seq("error" -> Seq(Str("2xx"))), 17),
    ("Http2xx-miss", "301", Seq("error" -> Seq(Str("2xx"))), 0),
    ("Http3xx-hit", "301", Seq("error" -> Seq(Str("3xx"))), 17),
    ("Http4xx-hit", "404", Seq("error" -> Seq(Str("4xx"))), 17),
    ("Http5xx-hit", "555", Seq("error" -> Seq(Str("5xx"))), 17),
    ("Http-All", "301", Seq("debug" -> Seq(Str("2xx")), "info" -> Seq(Str("3xx")),
      "error" -> Seq(Str("4xx")), "warn" -> Seq(Str("5xx"))), 9),
    ("all-the-things-midrange", "1234", allTheThings, 2),
    ("all-the-things-bytes", "ddd", allTheThings, 2),
    ("all-the-things-empty", "", allTheThings, 22),
    ("all-the-things-3xx", "399", allTheThings, 9),
    ("all-the-things-miss", "miss", allTheThings, 0))

  test("severity parser table, parse_from body root (parser_test.go:29-250)") {
    cases.foreach { case (name, sample, mapping, expected) =>
      val got = run(SeveritySpec(FieldRef.Body, mapping = mapping), sample)
      assert(got == expected, s"case $name: got $got expected $expected")
    }
  }

  test("severity parser table, parse_from body.some_field (fork JSON-body read)") {
    cases.foreach { case (name, sample, mapping, expected) =>
      val body = s"""{"some_field":${graft.functions.JsonCanon.quote(sample)}}"""
      val got = run(SeveritySpec(FieldRef.BodyPath(Seq("some_field")),
        mapping = mapping), body)
      assert(got == expected, s"case $name: got $got expected $expected")
    }
  }

  test("preset none drops the builtin aliases (base-mapping-none)") {
    assert(run(SeveritySpec(FieldRef.Body, preset = "none"), "error") == 0)
    // and custom mappings still apply on top of none
    assert(run(SeveritySpec(FieldRef.Body, preset = "none",
      mapping = Seq("fatal" -> Seq(Str("error")))), "error") == 21)
  }
}
