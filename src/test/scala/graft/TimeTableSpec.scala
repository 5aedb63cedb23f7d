package graft

import java.time.{LocalDateTime, ZoneOffset}

import org.apache.spark.sql.DataFrame

import graft.model.LogFrames
import graft.operators._
import graft.pipeline.{Pipeline, PipelineSpec}

/** Ports the stanza time parser test tables
  * (`operators/time/parser_test.go:131-263` TestTimeParser and `:265-424`
  * TestTimeEpochs): every gotime layout AND its strptime equivalent, each
  * parsed from the body root and from `body.some_field`; every epoch layout
  * with string and numeric (attributes_number) samples.
  *
  * Mapping notes vs the Go table:
  *  - `time.Local` cases run under this engine's pinned UTC session (the
  *    reference's expectation is host-zone-dependent; UTC is the
  *    deterministic instance of it);
  *  - MST/HST resolve to their fixed winter offsets (-7/-10) — equal to the
  *    IANA zones at every sampled date;
  *  - Spark timestamps are MICROsecond precision, so the k8s nanosecond
  *    sample asserts with <1us loss (the reference itself allows 100ns loss
  *    on float ns epochs);
  *  - `[]byte` samples are their string form (no byte-array entry values).
  */
class TimeTableSpec extends SparkSuite {
  import spark.implicits._

  private def runStr(spec: TimeParserSpec, body: String): Option[Long] = {
    val df: DataFrame = LogFrames.withDefaults(Seq(body).toDF("body"))
    val out = Pipeline.compile(PipelineSpec(Seq(
      TimeParserOp(Common("t"), spec), NoopOp(Common("__noop")))))(df)
    val r = out.select("timestamp").collect()(0)
    if (r.isNullAt(0) || r.getLong(0) == 0L) None else Some(r.getLong(0))
  }

  private def runNum(spec: TimeParserSpec, value: Double): Option[Long] = {
    val df: DataFrame = LogFrames.withDefaults(
      Seq(("x", Map("ts" -> value))).toDF("body", "attributes_number"))
    val out = Pipeline.compile(PipelineSpec(Seq(
      TimeParserOp(Common("t"), spec), NoopOp(Common("__noop")))))(df)
    val r = out.select("timestamp").collect()(0)
    if (r.isNullAt(0) || r.getLong(0) == 0L) None else Some(r.getLong(0))
  }

  private def ns(y: Int, mo: Int, d: Int, h: Int, mi: Int, s: Int, nanos: Int,
      offsetHours: Int): Long =
    LocalDateTime.of(y, mo, d, h, mi, s, nanos)
      .toInstant(ZoneOffset.ofHours(offsetHours)).toEpochMilli * 1000000L +
      (nanos % 1000000)

  // (name, sample, gotime layout, strptime layout, expected ns, maxLossNs)
  private val cases = Seq(
    ("unix-utc", "Mon Jan 2 15:04:05 UTC 2006", "Mon Jan 2 15:04:05 MST 2006",
      "%a %b %e %H:%M:%S %Z %Y", ns(2006, 1, 2, 15, 4, 5, 0, 0), 0L),
    ("almost-unix", "Mon Jan 02 15:04:05 MST 2006", "Mon Jan 02 15:04:05 MST 2006",
      "%a %b %d %H:%M:%S %Z %Y", ns(2006, 1, 2, 15, 4, 5, 0, -7), 0L),
    ("opendistro", "2020-06-09T15:39:58", "2006-01-02T15:04:05",
      "%Y-%m-%dT%H:%M:%S", ns(2020, 6, 9, 15, 39, 58, 0, 0), 0L),
    ("postgres", "2019-11-05 10:38:35.118 HST", "2006-01-02 15:04:05.999 MST",
      "%Y-%m-%d %H:%M:%S.%L %Z", ns(2019, 11, 5, 10, 38, 35, 118000000, -10), 0L),
    ("ibm-mq", "3/4/2018 11:52:29", "1/2/2006 15:04:05",
      "%q/%g/%Y %H:%M:%S", ns(2018, 3, 4, 11, 52, 29, 0, 0), 0L),
    ("cassandra", "2019-11-27T09:34:32.901-1000", "2006-01-02T15:04:05.999-0700",
      "%Y-%m-%dT%H:%M:%S.%L%z", ns(2019, 11, 27, 9, 34, 32, 901000000, -10), 0L),
    ("oracle", "2019-10-15T10:42:01.900436-10:00", "2006-01-02T15:04:05.999999-07:00",
      "%Y-%m-%dT%H:%M:%S.%f%j", ns(2019, 10, 15, 10, 42, 1, 900436000, -10), 0L),
    ("oracle-listener", "22-JUL-2019 15:16:13", "02-Jan-2006 15:04:05",
      "%d-%b-%Y %H:%M:%S", ns(2019, 7, 22, 15, 16, 13, 0, 0), 0L),
    ("k8s", "2019-03-08T18:41:12.152531115Z", "2006-01-02T15:04:05.999999999Z",
      "%Y-%m-%dT%H:%M:%S.%sZ", ns(2019, 3, 8, 18, 41, 12, 152531115, 0), 1000L),
    ("jetty", "05/Aug/2019:20:38:46 +0000", "02/Jan/2006:15:04:05 -0700",
      "%d/%b/%Y:%H:%M:%S %z", ns(2019, 8, 5, 20, 38, 46, 0, 0), 0L),
    ("esxi", "2020-12-16T21:43:28.391Z", "2006-01-02T15:04:05.999Z",
      "%Y-%m-%dT%H:%M:%S.%LZ", ns(2020, 12, 16, 21, 43, 28, 391000000, 0), 0L))

  private def check(name: String, variant: String, got: Option[Long],
      expected: Long, loss: Long): Unit = {
    assert(got.isDefined, s"$name/$variant: parse returned null")
    val d = math.abs(got.get - expected)
    assert(d <= loss, s"$name/$variant: got ${got.get} expected $expected (diff $d ns)")
  }

  test("gotime + strptime layout table, body root and body.some_field") {
    cases.foreach { case (name, sample, gotime, strptime, expected, loss) =>
      check(name, "gotime-root",
        runStr(TimeParserSpec(FieldRef.Body, "gotime", gotime), sample), expected, loss)
      check(name, "strptime-root",
        runStr(TimeParserSpec(FieldRef.Body, "strptime", strptime), sample), expected, loss)
      val jsonBody = s"""{"some_field":${graft.functions.JsonCanon.quote(sample)}}"""
      check(name, "gotime-non-root",
        runStr(TimeParserSpec(FieldRef.BodyPath(Seq("some_field")), "gotime", gotime),
          jsonBody), expected, loss)
      check(name, "strptime-non-root",
        runStr(TimeParserSpec(FieldRef.BodyPath(Seq("some_field")), "strptime", strptime),
          jsonBody), expected, loss)
    }
  }

  test("MST/HST named zones resolve through %Z / gotime MST") {
    // unix-mst / unix-hst: the layout names MST but the SAMPLE carries the
    // actual zone name; Jan 2 2006 15:04:05 in each zone
    val gotime = "Mon Jan 2 15:04:05 MST 2006"
    val strptime = "%a %b %e %H:%M:%S %Z %Y"
    for ((zone, off) <- Seq("MST" -> -7, "HST" -> -10)) {
      val sample = s"Mon Jan 2 15:04:05 $zone 2006"
      val expected = ns(2006, 1, 2, 15, 4, 5, 0, off)
      check(s"unix-$zone", "gotime",
        runStr(TimeParserSpec(FieldRef.Body, "gotime", gotime), sample), expected, 0L)
      check(s"unix-$zone", "strptime",
        runStr(TimeParserSpec(FieldRef.Body, "strptime", strptime), sample), expected, 0L)
    }
  }

  test("rfc3164 syslog: space-padded day, year-less layout takes the " +
      "SetTimestampYear heuristic (timeutils.go:89-103)") {
    import java.time.{LocalDate, LocalDateTime, ZoneOffset}
    def expected(mo: Int, d: Int, h: Int, mi: Int, s: Int): Long = {
      val now = LocalDate.now(ZoneOffset.UTC)
      val cand = LocalDate.of(now.getYear, mo, d)
      val yr = if (cand.isAfter(now.plusDays(7))) now.getYear - 1 else now.getYear
      LocalDateTime.of(yr, mo, d, h, mi, s).toEpochSecond(ZoneOffset.UTC) * 1000000000L
    }
    for ((layoutType, layout) <- Seq(
        "gotime" -> "Jan _2 15:04:05", "strptime" -> "%b %e %H:%M:%S")) {
      // single-digit day arrives space-padded (two spaces after the month)
      check(s"syslog-$layoutType-padded", "pad",
        runStr(TimeParserSpec(FieldRef.Body, layoutType, layout), "Jan  2 15:04:05"),
        expected(1, 2, 15, 4, 5), 0L)
      check(s"syslog-$layoutType-two-digit", "nopad",
        runStr(TimeParserSpec(FieldRef.Body, layoutType, layout), "Jan 12 15:04:05"),
        expected(1, 12, 15, 4, 5), 0L)
    }
  }

  test("fraction width semantics: .000 exact-mandatory, .999 optional-greedy") {
    // gotime ".000": EXACTLY three digits required (stdFracSecond0)
    val exact = TimeParserSpec(FieldRef.Body, "gotime", "2006-01-02 15:04:05.000")
    assert(runStr(exact, "2023-01-02 03:04:05.120").isDefined)
    assert(runStr(exact, "2023-01-02 03:04:05.12").isEmpty) // 2 digits: Go errors
    assert(runStr(exact, "2023-01-02 03:04:05").isEmpty) // absent: Go errors
    // gotime ".999": optional and greedy on digit count
    val opt = TimeParserSpec(FieldRef.Body, "gotime", "2006-01-02 15:04:05.999")
    assert(runStr(opt, "2023-01-02 03:04:05").isDefined) // no fraction ok
    assert(runStr(opt, "2023-01-02 03:04:05.12").contains(
      ns(2023, 1, 2, 3, 4, 5, 120000000, 0)))
    // non-3/6/9 widths translate too (".9999")
    val w4 = TimeParserSpec(FieldRef.Body, "gotime", "2006-01-02 15:04:05.9999")
    assert(runStr(w4, "2023-01-02 03:04:05.1234").contains(
      ns(2023, 1, 2, 3, 4, 5, 123400000, 0)))
    // strptime %L is the 999-family: input without sub-seconds parses
    val l = TimeParserSpec(FieldRef.Body, "strptime", "%Y-%m-%d %H:%M:%S.%L")
    assert(runStr(l, "2023-01-02 03:04:05").isDefined)
    assert(runStr(l, "2023-01-02 03:04:05.5").contains(
      ns(2023, 1, 2, 3, 4, 5, 500000000, 0)))
  }

  test("dot-separated date layouts are NOT fractions; comma fractions parse") {
    // "02.01.2006": '.' + digits is a date separator here (Go requires a
    // fraction's digit run to end the number)
    val de = TimeParserSpec(FieldRef.Body, "gotime", "02.01.2006 15:04:05")
    assert(runStr(de, "02.01.2023 03:04:05").contains(ns(2023, 1, 2, 3, 4, 5, 0, 0)))
    // Go commaOrPeriod: ',' separates fractions too (log4j default layout)
    val comma = TimeParserSpec(FieldRef.Body, "strptime", "%Y-%m-%d %H:%M:%S,%L")
    assert(runStr(comma, "2023-01-02 03:04:05,120").contains(
      ns(2023, 1, 2, 3, 4, 5, 120000000, 0)))
    assert(runStr(comma, "2023-01-02 03:04:05").isDefined) // optional
    val gComma = TimeParserSpec(FieldRef.Body, "gotime", "2006-01-02 15:04:05,999")
    assert(runStr(gComma, "2023-01-02 03:04:05,12").contains(
      ns(2023, 1, 2, 3, 4, 5, 120000000, 0)))
  }

  test("epoch layout table: string and numeric samples (parser_test.go:265-424)") {
    val base = 1136214245L * 1000000000L
    val epochCases = Seq(
      // (layout, string sample, numeric sample, expected ns, maxLossNs)
      ("s", "1136214245", 1136214245.0, base, 0L),
      ("ms", "1136214245123", 1136214245123.0, base + 123000000L, 0L),
      ("us", "1136214245123456", 1136214245123456.0, base + 123456000L, 0L),
      ("ns", "1136214245123456789", 1136214245123456789.0, base + 123456789L, 200L),
      ("s.ms", "1136214245.123", 1136214245.123, base + 123000000L, 0L),
      ("s.us", "1136214245.123456", 1136214245.123456, base + 123456000L, 0L),
      ("s.ns", "1136214245.123456789", 1136214245.123456789, base + 123456789L, 200L))
    epochCases.foreach { case (layout, str, num, expected, loss) =>
      check(s"epoch-$layout", "string",
        runStr(TimeParserSpec(FieldRef.Body, "epoch", layout), str), expected, loss)
      check(s"epoch-$layout", "numeric",
        runNum(TimeParserSpec(FieldRef.Attr(Seq("ts")), "epoch", layout), num),
        expected, loss)
    }
    // int sample through a fractional layout drops subseconds ("%d.0")
    check("epoch-s.ms", "int",
      runNum(TimeParserSpec(FieldRef.Attr(Seq("ts")), "epoch", "s.ms"), 1136214245.0),
      base, 0L)
  }
}
