package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.MetricTransforms
import graft.sources.OtlpMetricFrames

/** Ports the signoztransformprocessor metrics-context function tests
  * (`processor/signoztransformprocessor/internal/metrics/func_*_test.go`)
  * and the testdata/config.yaml metric/trace statement blocks.
  *
  * Fixtures mirror `func_extract_sum_metric_test.go:17-92`: attrs
  * {test: "hello world", test2: 3, test3: true} render AsString the way
  * every MetricFrames producer renders them.
  */
class MetricTransformsSpec extends SparkSuite {
  import spark.implicits._

  private val testAttrs = Map("test" -> "hello world", "test2" -> "3", "test3" -> "true")

  private def ident(df: DataFrame, name: String): DataFrame = df
    .withColumn("metric_name", lit(name))
    .withColumn("attrs", typedLit(testAttrs))
    .withColumn("unix_milli", lit(1000L))

  /** getTestHistogramMetric: Delta, count=5, sum=12.34 (HasSum true). */
  private def histogramFrame: DataFrame =
    graft.model.MetricFrames.withHistogramDefaults(
      ident(Seq(("Histogram", "Delta")).toDF("metric_type", "temporality"), "histogram_metric")
        .withColumn("count", lit(5L)).withColumn("sum_v", lit(12.34))
        .withColumn("has_sum", lit(true))
        .withColumn("explicit_bounds", expr("array(1.0d)"))
        .withColumn("bucket_counts", expr("array(2L, 3L)")))

  /** getTestExponentialHistogramMetric: Delta, scale=1, count=5, sum=12.34. */
  private def expHistFrame: DataFrame =
    graft.model.MetricFrames.withExpHistDefaults(
      ident(Seq(("ExponentialHistogram", "Delta")).toDF("metric_type", "temporality"),
        "exponential_histogram_metric")
        .withColumn("count", lit(5L)).withColumn("sum_v", lit(12.34))
        .withColumn("has_sum", lit(true)).withColumn("scale", lit(1)))

  /** getTestSummaryMetric: count=100, sum=12.34, 3 quantile values. */
  private def summaryFrame: DataFrame =
    graft.model.MetricFrames.withSummaryDefaults(
      ident(Seq(("Summary", "Unspecified")).toDF("metric_type", "temporality"), "summary_metric")
        .withColumn("count", lit(100L)).withColumn("sum_v", lit(12.34))
        .withColumn("quantiles", expr(
          "array(named_struct('q', 0.99d, 'v', 1.0d), " +
            "named_struct('q', 0.95d, 'v', 2.0d), named_struct('q', 0.5d, 'v', 3.0d))")))

  /** getTestGaugeMetric: int value 12. */
  private def gaugeFrame: DataFrame =
    graft.model.MetricFrames.withDefaults(
      ident(Seq(("Gauge", "Unspecified")).toDF("metric_type", "temporality"), "gauge_metric")
        .withColumn("value", lit(12.0)))

  private def sumFrame: DataFrame =
    graft.model.MetricFrames.withDefaults(
      ident(Seq(("Sum", "Delta")).toDF("metric_type", "temporality"), "sum_metric")
        .withColumn("value", lit(12.0))
        .withColumn("is_monotonic", lit(true)))

  private def one(df: DataFrame): org.apache.spark.sql.Row = {
    val rows = df.collect()
    assert(rows.length == 1)
    rows.head
  }

  test("convert_gauge_to_sum: cumulative + delta, monotonicity, noop for " +
      "non-gauge (func_convert_gauge_to_sum_test.go)") {
    for ((temp, want) <- Seq("cumulative" -> "Cumulative", "delta" -> "Delta");
         mono <- Seq(true, false)) {
      val r = one(MetricTransforms.convertGaugeToSum(gaugeFrame, temp, mono))
      assert(r.getAs[String]("metric_type") == "Sum")
      assert(r.getAs[String]("temporality") == want)
      assert(r.getAs[Boolean]("is_monotonic") == mono)
      assert(r.getAs[Double]("value") == 12.0)
      assert(r.getAs[Map[String, String]]("attrs") == testAttrs)
    }
    // noop for an already-Sum frame
    val s = one(MetricTransforms.convertGaugeToSum(sumFrame, "cumulative", false))
    assert(s.getAs[String]("metric_type") == "Sum" &&
      s.getAs[String]("temporality") == "Delta" && s.getAs[Boolean]("is_monotonic"))
    // invalid aggregation temporality errors at compile, like the factory
    intercept[IllegalArgumentException] {
      MetricTransforms.convertGaugeToSum(gaugeFrame, "timeless", true)
    }
  }

  test("convert_sum_to_gauge: type + wrapper fields reset, noop for gauge " +
      "(func_convert_sum_to_gauge_test.go)") {
    val r = one(MetricTransforms.convertSumToGauge(sumFrame))
    assert(r.getAs[String]("metric_type") == "Gauge")
    assert(r.getAs[String]("temporality") == "Unspecified")
    assert(!r.getAs[Boolean]("is_monotonic"))
    assert(r.getAs[Double]("value") == 12.0)
    val g = one(MetricTransforms.convertSumToGauge(gaugeFrame))
    assert(g.getAs[String]("metric_type") == "Gauge")
  }

  test("extract_count_metric: histogram/exp-histogram keep their " +
      "temporality, summary is cumulative (func_extract_count_metric_test.go)") {
    for (mono <- Seq(true, false)) {
      val h = one(MetricTransforms.extractCountMetric(histogramFrame, mono))
      assert(h.getAs[String]("metric_name") == "histogram_metric_count")
      assert(h.getAs[String]("metric_type") == "Sum")
      assert(h.getAs[String]("temporality") == "Delta")
      assert(h.getAs[Boolean]("is_monotonic") == mono)
      assert(h.getAs[Double]("value") == 5.0)
      assert(h.getAs[Map[String, String]]("attrs") == testAttrs)

      val e = one(MetricTransforms.extractCountMetric(expHistFrame, mono))
      assert(e.getAs[String]("metric_name") == "exponential_histogram_metric_count")
      assert(e.getAs[String]("temporality") == "Delta")
      assert(e.getAs[Double]("value") == 5.0)

      val s = one(MetricTransforms.extractCountMetric(summaryFrame, mono))
      assert(s.getAs[String]("metric_name") == "summary_metric_count")
      assert(s.getAs[String]("temporality") == "Cumulative")
      assert(s.getAs[Double]("value") == 100.0)
    }
  }

  test("extract_sum_metric: sum values, HasSum gate on the histogram " +
      "families (func_extract_sum_metric_test.go)") {
    val h = one(MetricTransforms.extractSumMetric(histogramFrame, monotonic = true))
    assert(h.getAs[String]("metric_name") == "histogram_metric_sum")
    assert(h.getAs[String]("temporality") == "Delta")
    assert(h.getAs[Boolean]("is_monotonic"))
    assert(h.getAs[Double]("value") == 12.34)

    // a histogram datapoint without a recorded sum is skipped
    val noSum = histogramFrame.withColumn("has_sum", lit(false))
    assert(MetricTransforms.extractSumMetric(noSum, monotonic = true).count() == 0)

    val e = one(MetricTransforms.extractSumMetric(expHistFrame, monotonic = false))
    assert(e.getAs[String]("metric_name") == "exponential_histogram_metric_sum")
    assert(e.getAs[Double]("value") == 12.34)

    // summaries always carry a sum
    val s = one(MetricTransforms.extractSumMetric(summaryFrame, monotonic = false))
    assert(s.getAs[String]("metric_name") == "summary_metric_sum")
    assert(s.getAs[String]("temporality") == "Cumulative")
    assert(s.getAs[Double]("value") == 12.34)
  }

  test("convert_summary_count_val_to_sum / convert_summary_sum_val_to_sum: " +
      "explicit temporality (func_convert_summary_*_test.go)") {
    for ((temp, want) <- Seq("delta" -> "Delta", "cumulative" -> "Cumulative")) {
      val c = one(MetricTransforms.convertSummaryCountValToSum(summaryFrame, temp, true))
      assert(c.getAs[String]("metric_name") == "summary_metric_count")
      assert(c.getAs[String]("temporality") == want)
      assert(c.getAs[Double]("value") == 100.0)

      val s = one(MetricTransforms.convertSummarySumValToSum(summaryFrame, temp, false))
      assert(s.getAs[String]("metric_name") == "summary_metric_sum")
      assert(s.getAs[String]("temporality") == want)
      assert(s.getAs[Double]("value") == 12.34)
    }
    intercept[IllegalArgumentException] {
      MetricTransforms.convertSummaryCountValToSum(summaryFrame, "nope", true)
    }
    // gauges pass through the summary gate untouched (empty extraction)
    assert(MetricTransforms.convertSummaryCountValToSum(
      gaugeFrame.withColumn("count", lit(1L)), "delta", true).count() == 0)
  }

  test("metric_statements datapoint + resource contexts " +
      "(testdata/config.yaml:10-16)") {
    val dps = graft.model.MetricFrames.withDefaults(Seq(
      ("m0", "/animal", "GET"), ("m1", "/home", "POST"))
      .toDF("metric_name", "path", "method")
      .withColumn("attrs", map(
        lit("http.path"), col("path"), lit("http.method"), col("method"),
        lit("junk"), lit("x")))
      .withColumn("resource_attrs", map(lit("host"), lit("h1")))
      .drop("path", "method"))
    val out = MetricTransforms.datapointStatements(dps, Seq(
      "datapoint" -> Seq(
        """set(metric.name, "bear") where attributes["http.path"] == "/animal"""",
        """keep_keys(attributes, ["http.method", "http.path"])"""),
      "resource" -> Seq("""set(attributes["name"], "bear")""")))
      .orderBy(col("attrs").getItem("http.path"))
      .select("metric_name", "attrs", "resource_attrs")
      .collect()
    assert(out(0).getString(0) == "bear")
    assert(out(1).getString(0) == "m1")
    assert(out(0).getAs[Map[String, String]](1) ==
      Map("http.path" -> "/animal", "http.method" -> "GET"))
    assert(out(0).getAs[Map[String, String]](2) == Map("host" -> "h1", "name" -> "bear"))

    // a typed set renders AsString into the single attr map
    val typed = MetricTransforms.datapointStatements(dps, Seq(
      "datapoint" -> Seq("""set(attributes["n"], 3)""", """set(attributes["b"], true)""")))
      .select(col("attrs")).collect().head.getAs[Map[String, String]](0)
    assert(typed("n") == "3" && typed("b") == "true")
  }

  test("applyMetricStatements: function statements route to their family " +
      "and extracts append to scalars") {
    val frames = OtlpMetricFrames(
      scalars = gaugeFrame, histograms = histogramFrame,
      summaries = summaryFrame, expHistograms = expHistFrame)
    val out = MetricTransforms.applyMetricStatements(frames, Seq(
      "datapoint" -> Seq(
        "convert_gauge_to_sum(\"cumulative\", true)",
        "extract_sum_metric(true)",
        "convert_summary_count_val_to_sum(\"delta\", true)")))
    val names = out.scalars.select("metric_name", "metric_type", "temporality")
      .as[(String, String, String)].collect().toSet
    assert(names == Set(
      ("gauge_metric", "Sum", "Cumulative"),
      ("histogram_metric_sum", "Sum", "Delta"),
      ("exponential_histogram_metric_sum", "Sum", "Delta"),
      ("summary_metric_sum", "Sum", "Cumulative"),
      ("summary_metric_count", "Sum", "Delta")))
    // the source families are untouched
    assert(out.histograms.count() == 1 && out.summaries.count() == 1)
  }

  test("trace_statements span + resource contexts over a span frame " +
      "(testdata/config.yaml:2-8)") {
    val spans = graft.model.SpanFrames.withDefaults(Seq(
      ("s0", "/animal"), ("s1", "/home")).toDF("name", "path")
      .withColumn("attributes_string", map(
        lit("http.path"), col("path"), lit("http.method"), lit("GET"),
        lit("junk"), lit("x")))
      .withColumn("resources_string", map(lit("service.name"), lit("svc")))
      .drop("path"))
    val out = graft.operators.OttlStatements.applyAll(spans, Seq(
      "span" -> Seq(
        """set(name, "bear") where attributes["http.path"] == "/animal"""",
        """keep_keys(attributes, ["http.method", "http.path"])"""),
      "resource" -> Seq("""set(attributes["name"], "bear")""")))
      .orderBy(col("attributes_string").getItem("http.path"))
      .select("name", "attributes_string", "resources_string").collect()
    assert(out(0).getString(0) == "bear" && out(1).getString(0) == "s1")
    assert(out(0).getAs[Map[String, String]](1).keySet == Set("http.path", "http.method"))
    assert(out(0).getAs[Map[String, String]](2) ==
      Map("service.name" -> "svc", "name" -> "bear"))
  }
}
