package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.LogSources

/** httplogreceiver body-parser adapters: golden cases from the reference's
  * `bodyparser/heroku_test.go` (octet splitter + parse) and `json.go` /
  * `default.go` semantics.
  */
class LogSourcesSpec extends SparkSuite {
  import spark.implicits._

  private def split(payload: String): Seq[String] = {
    val r = graft.functions.OctetSplitKernel.split(UTF8String.fromString(payload))
    (0 until r.numElements()).map(i => r.getUTF8String(i).toString)
  }

  test("octet splitter: the reference's TestOctetCountingSplitter cases") {
    assert(split("9 <1>1 - -") == Seq("<1>1 - -"))
    assert(split("9 <1>1 - -9 <2>2 - -") == Seq("<1>1 - -", "<2>2 - -"))
    assert(split("9 <1>1 - -\n11 <2>2 - - s") == Seq("<1>1 - -", "<2>2 - - s"))
    assert(split("9 <1>1 - -\n\t\t\t9 <2>1 - -\n\t\t\t9 <3>1 - -") ==
      Seq("<1>1 - -", "<2>1 - -", "<3>1 - -"))
    assert(split("") == Seq.empty)
  }

  test("heroku parse: TestHerokuParse golden cases") {
    val payload1 =
      "151 <190>1 2023-10-12T07:25:48.393741+00:00 host app otel-collector.1 - " +
        "2023-10-12T07:25:48.393Z\tinfo\tservice/telemetry.go:104\tSetting up own telemetry..."
    val out = LogSources.fromHeroku(Seq(payload1).toDF("payload"), col("payload"))
      .select("body", "attributes_string", "resources_string").collect()
    assert(out.length == 1)
    assert(out(0).getString(0) ==
      "2023-10-12T07:25:48.393Z\tinfo\tservice/telemetry.go:104\tSetting up own telemetry...")
    assert(out(0).getMap[String, String](1).toMap ==
      Map("timestamp" -> "2023-10-12T07:25:48.393741+00:00", "msgid" -> "-"))
    assert(out(0).getMap[String, String](2).toMap ==
      Map("priority" -> "190", "version" -> "1", "hostname" -> "host",
        "appname" -> "app", "procid" -> "otel-collector.1"))

    // wrong pattern: whole line as body, no attrs (Test 4)
    val bad = LogSources.fromHeroku(
      Seq("28 Setting up own telemetry...").toDF("payload"), col("payload"))
      .select("body", "attributes_string", "resources_string").collect()
    assert(bad.length == 1 && bad(0).getString(0) == "Setting up own telemetry...")
    assert(bad(0).getMap[String, String](1).isEmpty &&
      bad(0).getMap[String, String](2).isEmpty)

    // empty payload -> no rows (Test 3)
    assert(LogSources.fromHeroku(Seq("").toDF("payload"), col("payload")).count() == 0)
  }

  test("json body parser: array of records -> typed LogRows") {
    val payload =
      """[{"timestamp": 1700000000000000000, "trace_id": "abc", "span_id": "de",
        |  "trace_flags": 1, "severity_text": "INFO", "severity_number": 9,
        |  "attributes": {"k": "v", "n": 2, "b": true},
        |  "resources": {"svc": "api", "replicas": 3}, "body": "hello"},
        | {"body": "minimal"}]""".stripMargin.replace("\n", "")
    val rows = LogSources.fromJsonBody(Seq(payload).toDF("j"), col("j"))
      .orderBy(col("body"))
      .select("body", "timestamp", "severity_number", "severity_text",
        "attributes_string", "attributes_number", "attributes_bool",
        "resources_string", "trace_id")
      .collect()
    assert(rows.length == 2)
    val full = rows(0)
    assert(full.getString(0) == "hello" && full.getLong(1) == 1700000000000000000L)
    assert(full.getInt(2) == 9 && full.getString(3) == "INFO")
    assert(full.getMap[String, String](4).toMap == Map("k" -> "v"))
    assert(full.getMap[String, Double](5).toMap == Map("n" -> 2.0))
    assert(full.getMap[String, Boolean](6).toMap == Map("b" -> true))
    // resource attrs force-stringified (exporter.go:1007-1031 semantics)
    assert(full.getMap[String, String](7).toMap == Map("svc" -> "api", "replicas" -> "3"))
    assert(full.getString(8) == "abc")
    val minimal = rows(1)
    assert(minimal.getString(0) == "minimal" && minimal.getLong(1) == 0L &&
      minimal.getInt(2) == 0 && minimal.getString(3) == "")
  }

  test("default body parser: newline split, one LogRow per line") {
    val rows = LogSources.fromTextLines(Seq("line one\nline two\nline three").toDF("t"), col("t"))
      .select("body").collect().map(_.getString(0)).toSeq
    assert(rows == Seq("line one", "line two", "line three"))
  }

  test("google parser mirrors the reference's no-op (empty logs)") {
    assert(LogSources.fromGoogle(Seq("anything").toDF("p"), col("p")).count() == 0)
  }
}
