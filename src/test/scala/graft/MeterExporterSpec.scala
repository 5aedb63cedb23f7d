package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.MetricFrames
import graft.pipeline.MeterExporter

/** Golden tests for the meter samples exporter, mirroring
  * exporter/signozclickhousemeter/exporter_test.go — the expected label
  * strings are the reference test's own literals (pmetricsgen single-point
  * shapes).
  */
class MeterExporterSpec extends SparkSuite {
  import spark.implicits._

  private def dp(name: String, desc: String, unit: String, typ: String,
      temporality: String, monotonic: Boolean, value: Double,
      attrs: Map[String, String]): DataFrame =
    MetricFrames.withDefaults(Seq(1).toDF("i").select(
      lit(name).as("metric_name"),
      lit(desc).as("description"),
      lit(unit).as("unit"),
      lit(typ).as("metric_type"),
      lit(temporality).as("temporality"),
      lit(monotonic).as("is_monotonic"),
      lit(1727286182000L).as("unix_milli"),
      lit(value).as("value"),
      typedLit(attrs).as("attrs"),
      lit("go.signoz.io/app/reader").as("scope_name"),
      lit("1.0.0").as("scope_version"),
      lit("scope.schema_url").as("scope_schema_url"),
      typedLit(Map("scope.attr_0" -> "value0")).as("scope_attrs"),
      typedLit(Map("resource.attr_0" -> "value0")).as("resource_attrs")))

  // Test_prepareBatchSumWithNoRecordedValue golden sample
  test("sum sample: identity columns + labels byte-parity") {
    val out = MeterExporter.samples(dp("system.cpu.time0",
      "cpu time of the host", "s", "Sum", "Cumulative", monotonic = true,
      value = 0.0, attrs = Map("sum.attr_0" -> "1"))).head()
    assert(out.getAs[String]("temporality") === "Cumulative")
    assert(out.getAs[String]("metric_name") === "system.cpu.time0")
    assert(out.getAs[String]("description") === "cpu time of the host")
    assert(out.getAs[String]("unit") === "s")
    assert(out.getAs[String]("type") === "Sum")
    assert(out.getAs[Boolean]("is_monotonic"))
    assert(out.getAs[Long]("unix_milli") === 1727286182000L)
    assert(out.getAs[Double]("value") === 0.0)
    assert(out.getAs[String]("labels") ===
      """{"__name__":"system.cpu.time0","__scope.name__":"go.signoz.io/app/reader","__scope.schema_url__":"scope.schema_url","__scope.version__":"1.0.0","__temporality__":"Cumulative","resource.attr_0":"value0","scope.attr_0":"value0","sum.attr_0":"1"}""")
  }

  // Test_prepareBatchGaugeWithNoRecordedValue golden sample
  test("gauge sample: Unspecified temporality, non-monotonic, labels byte-parity") {
    val out = MeterExporter.samples(dp("system.memory.usage0",
      "memory usage of the host", "bytes", "Gauge",
      temporality = "Delta", // stray input temporality must be normalized
      monotonic = true, // and stray monotonicity forced off (processGauge)
      value = 0.0, attrs = Map("gauge.attr_0" -> "1"))).head()
    assert(out.getAs[String]("temporality") === "Unspecified")
    assert(out.getAs[String]("type") === "Gauge")
    assert(!out.getAs[Boolean]("is_monotonic"))
    assert(out.getAs[String]("labels") ===
      """{"__name__":"system.memory.usage0","__scope.name__":"go.signoz.io/app/reader","__scope.schema_url__":"scope.schema_url","__scope.version__":"1.0.0","__temporality__":"Unspecified","gauge.attr_0":"1","resource.attr_0":"value0","scope.attr_0":"value0"}""")
  }

  // Test_prepareBatch{Sum,Gauge}WithNan: NaN datapoints dropped whole
  test("NaN datapoints are dropped") {
    val nan = dp("system.cpu.time0", "d", "s", "Sum", "Cumulative",
      monotonic = true, value = Double.NaN, attrs = Map.empty)
    assert(MeterExporter.samples(nan).count() === 0L)
  }

  // prepareBatch: non-scalar metric types are skipped
  test("non-scalar metric types are skipped") {
    val hist = dp("http.duration", "d", "ms", "Histogram", "Cumulative",
      monotonic = true, value = 1.0, attrs = Map.empty)
    assert(MeterExporter.samples(hist).count() === 0L)
  }

  // fingerprint equality with the metrics exporter's chain (same point ->
  // same HashWithName in both sinks)
  test("fingerprint matches the metrics exporter chain for the same point") {
    val in = dp("system.cpu.time0", "d", "s", "Sum", "Cumulative",
      monotonic = true, value = 3.0, attrs = Map("a" -> "b"))
    val meter = MeterExporter.samples(in).select("fingerprint").as[Long].head()
    val metrics = graft.pipeline.MetricsExporter.scalarPoints(in)
      .select("fingerprint").as[Long].head()
    assert(meter === metrics)
  }
}
