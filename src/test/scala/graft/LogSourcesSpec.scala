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

  private def kafkaFrame(values: Seq[String]) = {
    val tsMicros = 1700000000000000L
    values.zipWithIndex.map { case (v, i) =>
      ("k".getBytes("UTF-8"), v.getBytes("UTF-8"), "logs-topic", 0, i.toLong,
        new java.sql.Timestamp(tsMicros / 1000))
    }.toDF("key", "value", "topic", "partition", "offset", "timestamp")
  }

  test("kafka adapter: raw/text one record per message, observed ts from kafka") {
    val rows = LogSources.fromKafka(kafkaFrame(Seq("hello", "world")), "raw")
      .orderBy("body").select("body", "observed_timestamp").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("hello", "world"))
    assert(rows.forall(_.getLong(1) == 1700000000000000000L))
    // text behaves identically for UTF-8 payloads
    assert(LogSources.fromKafka(kafkaFrame(Seq("a\nb")), "text").count() == 1)
  }

  test("kafka adapter: text_<charset> decodes via the textutils override table " +
      "(utf-16 = little-endian, ascii = utf-8, nop = raw, IANA fallback)") {
    val tsMicros = 1700000000000000L
    def frame(bytes: Array[Byte]) = Seq(
      ("k".getBytes("UTF-8"), bytes, "logs-topic", 0, 0L,
        new java.sql.Timestamp(tsMicros / 1000)))
      .toDF("key", "value", "topic", "partition", "offset", "timestamp")
    def body(bytes: Array[Byte], enc: String): String =
      LogSources.fromKafka(frame(bytes), enc).select("body").head.getString(0)
    // utf-16 override is LITTLE-endian (x/text unicode.UTF16(LittleEndian))
    assert(body("héllo".getBytes("UTF-16LE"), "text_utf-16") == "héllo")
    assert(body("héllo".getBytes("UTF-16LE"), "text_utf16") == "héllo")
    // ascii decodes as utf-8
    assert(body("plain".getBytes("UTF-8"), "text_ascii") == "plain")
    // IANA registry name (latin1)
    assert(body("café".getBytes("ISO-8859-1"), "text_ISO-8859-1") == "café")
    // gbk via IANA
    assert(body("中文".getBytes("GBK"), "text_GBK") == "中文")
  }

  test("kafka adapter: value bytes route through the body parsers") {
    val json = """[{"body": "from kafka", "severity_number": 9}]"""
    val viaJson = LogSources.fromKafka(kafkaFrame(Seq(json)), "json")
      .select("body", "severity_number").collect().head
    assert(viaJson.getString(0) == "from kafka" && viaJson.getInt(1) == 9)

    val viaLines = LogSources.fromKafka(kafkaFrame(Seq("l1\nl2")), "default")
      .select("body").collect().map(_.getString(0)).toSeq
    assert(viaLines == Seq("l1", "l2"))

    val heroku = "151 <190>1 2023-10-12T07:25:48.393741+00:00 host app otel-collector.1 - " +
      "2023-10-12T07:25:48.393Z\tinfo\tservice/telemetry.go:104\tSetting up own telemetry..."
    val viaHeroku = LogSources.fromKafka(kafkaFrame(Seq(heroku)), "heroku")
      .select("resources_string").collect().head.getMap[String, String](0).toMap
    assert(viaHeroku("appname") == "app")

    // otlp_proto is now a real mapping (OtlpProtoSpec covers it); malformed
    // payloads drop rather than throw, like the receiver's unmarshal-error
    // counter path
    assert(LogSources.fromKafka(kafkaFrame(Seq("x")), "otlp_proto").count() == 0)

    intercept[IllegalArgumentException] {
      LogSources.fromKafka(kafkaFrame(Seq("x")), "zipkin_thrift")
    }
  }

  test("clickhouse query_log adapter: attrs prefixed+typed, severity, log_comment flatten") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:05")
    val df = Seq(
      ("ch-host", "QueryFinish", ts, 42L, 1000L, Seq("db1", "db2"),
        """{"team":"infra","retries":2}""", "SELECT 1"),
      ("ch-host", "ExceptionWhileProcessing", ts, 7L, 0L, Seq.empty[String],
        "plain comment", "SELECT bad")
    ).toDF("hostname", "type", "event_time_microseconds", "query_duration_ms",
      "read_rows", "databases", "log_comment", "query")
    val rows = LogSources.fromClickhouseQueryLog(df)
      .orderBy("body")
      .select("body", "timestamp", "severity_text", "severity_number",
        "attributes_string", "attributes_number")
      .collect()
    val ok = rows(0)
    assert(ok.getString(0) == "SELECT 1")
    assert(ok.getLong(1) == ts.getTime * 1000000L)
    assert(ok.getString(2) == "INFO" && ok.getInt(3) == 9)
    val attrs = ok.getMap[String, String](4).toMap
    assert(attrs("clickhouse.query_log.hostname") == "ch-host")
    assert(attrs("clickhouse.query_log.type") == "QueryFinish")
    assert(attrs("clickhouse.query_log.event_time_microseconds") == "2024-01-01T00:00:05Z")
    assert(attrs("clickhouse.query_log.databases") == "db1,db2") // slice -> comma join
    assert(attrs("clickhouse.query_log.log_comment.team") == "infra") // JSON flatten
    assert(attrs("source") == "clickhouse")
    val nums = ok.getMap[String, Double](5).toMap
    assert(nums("clickhouse.query_log.query_duration_ms") == 42.0)
    assert(nums("clickhouse.query_log.read_rows") == 1000.0)
    assert(nums("clickhouse.query_log.log_comment.retries") == 2.0)

    val bad = rows(1)
    assert(bad.getString(2) == "ERROR" && bad.getInt(3) == 17)
    val badAttrs = bad.getMap[String, String](4).toMap
    assert(badAttrs("clickhouse.query_log.log_comment") == "plain comment")
  }

  private def gzip(s: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(s.getBytes("UTF-8"))
    gz.close()
    bos.toByteArray
  }

  test("firehose cwlogs: gunzip, newline split, invalid datums skipped, ts scaled") {
    // two datums in one record: one valid (2 events, ms + s precision
    // timestamps), one invalid (missing owner) -> skipped like the reference
    val valid =
      """{"messageType":"DATA_MESSAGE","owner":"111122223333",
        |"logGroup":"my-group","logStream":"my-stream","subscriptionFilters":["f"],
        |"logEvents":[
        |  {"id":"1","timestamp":1700000000123,"message":"first"},
        |  {"id":"2","timestamp":1700000001,"message":"second"}]}"""
        .stripMargin.replace("\n", "")
    val invalid = """{"messageType":"DATA_MESSAGE","logGroup":"g","logStream":"s","logEvents":[{"id":"3","timestamp":1,"message":"dropped"}]}"""
    val record = gzip(valid + "\n" + invalid)
    val out = LogSources.fromFirehoseCwLogs(
      Seq(Tuple1(record)).toDF("record"), col("record"))
      .orderBy("body").select("body", "timestamp", "resources_string").collect()
    assert(out.length == 2)
    assert(out(0).getString(0) == "first")
    // 13-digit ms epoch -> x 10^6 (toEpochNano, logsbuilder.go:57-69)
    assert(out(0).getLong(1) == 1700000000123L * 1000000L)
    // 10-digit s epoch -> x 10^9
    assert(out(1).getString(0) == "second" && out(1).getLong(1) == 1700000001L * 1000000000L)
    assert(out(0).getMap[String, String](2).toMap == Map(
      "cloud.account.id" -> "111122223333",
      "aws.cloudwatch.log_group_name" -> "my-group",
      "aws.cloudwatch.log_stream_name" -> "my-stream"))
    // a corrupt (non-gzip) record contributes nothing
    val corrupt = Seq(Tuple1("not gzip".getBytes("UTF-8"))).toDF("record")
    assert(LogSources.fromFirehoseCwLogs(corrupt, col("record")).count() == 0)
  }
}
