package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{LogFrames, LogSchema, MetricFrames, SpanFrames}

/** Port of the reference's test/benchmark data generators
  * (`pkg/pdatagen/{plogsgen,pmetricsgen,ptracesgen}`) as DISTRIBUTED frame
  * generators: every generator is `spark.range`-driven so the same code that
  * builds a 1-row fixture builds the 10 M-record benchmark input with no
  * driver-side loop.
  *
  * Faithful-by-value with two documented policies:
  *  - the reference stamps `time.Now()`; a deterministic engine takes the
  *    timestamp as a parameter (pmetricsgen already pins 1727286182 itself);
  *  - `pmetricsgen.WithAttributes` exists but `Generate` never applies it in
  *    the reference (data.go) — not carried.
  */
object PdataGen {

  /** `plogsgen.Generate` (logs.go:11-41): N identical log records, one
    * resource with `resource.<i>` attrs, constant body, ts=observed_ts.
    * The reference's exporter benchmark workload is
    * `Generate(WithLogRecordCount(100000))` (exporter_benchmark_test.go:78).
    */
  def logs(spark: SparkSession, logRecordCount: Long,
      resourceAttributeCount: Int = 1,
      body: String = "This is a test log record",
      resourceAttributeStringValue: String = "resource",
      endTimeNanos: Long = 1727286182000000000L): DataFrame = {
    val res = map((0 until resourceAttributeCount).flatMap(i =>
      Seq(lit(s"resource.$i"), lit(resourceAttributeStringValue))): _*)
    LogFrames.withDefaults(spark.range(logRecordCount).select(
      lit(body).as("body"),
      lit(endTimeNanos).as("timestamp"),
      lit(endTimeNanos).as("observed_timestamp"),
      res.as("resources_string")))
  }

  /** `ptracesgen.Generate` (traces.go:12-76): N spans `span.<i>`, shared
    * ids, optional events and typed attrs. Quirk preserved: the reference
    * converts 32/16-char ASCII literals to 16/8-byte ids, so the ids are
    * the FIRST 16/8 ASCII bytes of "5B8EFFF798038103…"/"EEE19B7E…" — as hex
    * strings, "3542…" / "4545…".
    */
  def traces(spark: SparkSession, spanCount: Long, eventCount: Int = 0,
      resourceAttributeCount: Int = 1,
      resourceAttributeStringValue: String = "resource",
      spanKind: Int = 3, // ptrace.SpanKindClient
      attributes: Map[String, Any] = Map.empty,
      endTimeNanos: Long = 1727286182000000000L): DataFrame = {
    def asciiHex(s: String): String =
      s.getBytes("US-ASCII").map(b => f"$b%02x").mkString
    val res = map((0 until resourceAttributeCount).flatMap(i =>
      Seq(lit(s"resource.$i"), lit(resourceAttributeStringValue))): _*)
    val strAttrs = attributes.collect { case (k, v: String) => Seq(lit(k), lit(v)) }
    val numAttrs = attributes.collect {
      case (k, v: Double) => Seq(lit(k), lit(v))
      case (k, v: Int) => Seq(lit(k), lit(v.toDouble))
      case (k, v: Long) => Seq(lit(k), lit(v.toDouble))
    }
    val boolAttrs = attributes.collect { case (k, v: Boolean) => Seq(lit(k), lit(v)) }
    def mapOr(parts: Iterable[Seq[Column]], tpe: String): Column =
      if (parts.isEmpty) map().cast(tpe) else map(parts.flatten.toSeq: _*)
    val events =
      if (eventCount == 0) lit(null).cast(graft.model.SpanSchema.eventType)
      else array((0 until eventCount).map(j => struct(
        lit(s"event.$j").as("name"),
        lit(endTimeNanos).as("ts_ns"),
        map().cast(LogSchema.mapSS).as("attrs"))): _*)
    SpanFrames.withDefaults(spark.range(spanCount).select(
      concat(lit("span."), col("id").cast("string")).as("name"),
      lit(spanKind).as("kind"),
      lit(endTimeNanos).as("start_ts"),
      lit(endTimeNanos).as("end_ts"),
      lit(asciiHex("5B8EFFF798038103")).as("trace_id"),
      lit(asciiHex("EEE19B7E")).as("span_id"),
      lit(asciiHex("EEE19B7E")).as("parent_span_id"),
      mapOr(strAttrs, LogSchema.mapSS.sql).as("attributes_string"),
      mapOr(numAttrs, LogSchema.mapSD.sql).as("attributes_number"),
      mapOr(boolAttrs, LogSchema.mapSB.sql).as("attributes_bool"),
      res.as("resources_string"),
      events.as("events")))
  }

  /** `pmetricsgen.Count` (options.go:3-33). */
  final case class Count(
      gaugeMetrics: Int = 0, gaugeDataPoints: Int = 0, gaugeNan: Int = 0,
      gaugeNoRecorded: Int = 0, gaugePointAttrs: Int = 0,
      sumMetrics: Int = 0, sumDataPoints: Int = 0, sumNoRecorded: Int = 0,
      sumNan: Int = 0, sumPointAttrs: Int = 0,
      histMetrics: Int = 0, histDataPoints: Int = 0, histBuckets: Int = 20,
      histNan: Int = 0, histNoRecorded: Int = 0, histPointAttrs: Int = 0,
      expHistMetrics: Int = 0, expHistDataPoints: Int = 0,
      expHistBuckets: Int = 0, expHistNan: Int = 0, expHistNoRecorded: Int = 0,
      expHistPointAttrs: Int = 0,
      summaryMetrics: Int = 0, summaryDataPoints: Int = 0,
      summaryQuantiles: Int = 0, summaryNan: Int = 0,
      summaryNoRecorded: Int = 0)

  private val BaseTs = 1727286182L // data.go baseTimestamp

  /** One family grid: metrics 0..n-1 × ordered (segment, j) datapoints —
    * j restarts per segment exactly like each addDataPoints call, and the
    * per-segment j drives the timestamp offset. Segments carry
    * (noRecorded, useNaN).
    */
  private def family(spark: SparkSession, numMetrics: Int,
      segments: Seq[(Int, Boolean, Boolean)]): DataFrame = {
    val live = segments.zipWithIndex.collect {
      case ((n, noRec, nan), s) if n > 0 =>
        struct(lit(s).as("seg"), lit(n).as("n"),
          lit(noRec).as("no_rec"), lit(nan).as("nan"))
    }
    // zero datapoints (or zero metrics) -> an empty frame: a row-per-
    // datapoint model has no "metric with no points" representation. The
    // dummy segment only types the plan; range(0) never evaluates it.
    val segStructs = if (live.nonEmpty) live else Seq(struct(
      lit(0).as("seg"), lit(1).as("n"), lit(false).as("no_rec"),
      lit(false).as("nan")))
    val n = if (live.isEmpty) 0L else numMetrics.toLong
    spark.range(n).select(col("id").cast("int").as("i"))
      .select(col("i"), explode(array(segStructs: _*)).as("s"))
      .select(col("i"), col("s.no_rec").as("no_rec"), col("s.nan").as("nan"),
        explode(sequence(lit(0), col("s.n") - 1)).as("j"))
      .withColumn("unix_milli", (lit(BaseTs) + col("j")) * 1000L)
      .withColumn("flags", when(col("no_rec"), 1).otherwise(0))
  }

  private def pointAttrs(prefix: String, n: Int): Column =
    if (n == 0) map().cast(LogSchema.mapSS)
    else map((0 until n).flatMap(k => Seq(lit(s"$prefix$k"), lit("1"))): _*)

  /** `pmetricsgen.Generate` (data.go): the five families under ONE
    * resource/scope (Generate discards the family-internal resource — only
    * metrics are copied into the outer scope). Returns the same
    * four-family split the OTLP decoder produces, ready for
    * [[graft.pipeline.MetricsExporter]].
    */
  def metrics(spark: SparkSession, count: Count,
      resourceAttributeCount: Int = 1,
      resourceAttributeStringValue: String = "resource",
      scopeAttributeCount: Int = 1,
      scopeAttributeStringValue: String = "scope"): OtlpMetricFrames = {
    val resourceAttrs = map((0 until resourceAttributeCount).flatMap(i =>
      Seq(lit(s"resource.attr_$i"), lit(resourceAttributeStringValue + i))): _*)
    val scopeAttrs = map((0 until scopeAttributeCount).flatMap(i =>
      Seq(lit(s"scope.attr_$i"), lit(scopeAttributeStringValue + i))): _*)
    def withContext(df: DataFrame): DataFrame = df
      .withColumn("scope_name", lit("go.signoz.io/app/reader"))
      .withColumn("scope_version", lit("1.0.0"))
      .withColumn("scope_schema_url", lit("scope.schema_url"))
      .withColumn("scope_attrs", scopeAttrs)
      .withColumn("resource_attrs", resourceAttrs)
    val evenCumulative =
      when(col("i") % 2 === 0, "Cumulative").otherwise("Delta")

    // gauge + sum land in one scalar frame (value = METRIC index — the
    // reference's addDataPoints uses SetIntValue(metricIndex))
    val gauges = family(spark, count.gaugeMetrics, Seq(
      (count.gaugeDataPoints - count.gaugeNan - count.gaugeNoRecorded, false, false),
      (count.gaugeNoRecorded, true, false),
      (count.gaugeNan, false, true)))
      .select(
        concat(lit("system.memory.usage"), col("i")).as("metric_name"),
        lit("memory usage of the host").as("description"),
        lit("bytes").as("unit"), lit("Gauge").as("metric_type"),
        lit("Unspecified").as("temporality"), lit(false).as("is_monotonic"),
        col("unix_milli"), col("flags"),
        when(col("nan"), Double.NaN).otherwise(col("i").cast("double")).as("value"),
        pointAttrs("gauge.attr_", count.gaugePointAttrs).as("attrs"))
    val sums = family(spark, count.sumMetrics, Seq(
      (count.sumDataPoints - count.sumNoRecorded - count.sumNan, false, false),
      (count.sumNoRecorded, true, false),
      (count.sumNan, false, true)))
      .select(
        concat(lit("system.cpu.time"), col("i")).as("metric_name"),
        lit("cpu time of the host").as("description"),
        lit("s").as("unit"), lit("Sum").as("metric_type"),
        evenCumulative.as("temporality"),
        (col("i") % 3 === 0).as("is_monotonic"),
        col("unix_milli"), col("flags"),
        when(col("nan"), Double.NaN).otherwise(col("i").cast("double")).as("value"),
        pointAttrs("sum.attr_", count.sumPointAttrs).as("attrs"))

    val histBounds = lit((0 until 20).map(_.toDouble).toArray)
    val histCounts =
      lit(Array[Long](1, 1, 1, 1, 1, 5, 1, 1, 1, 1, 1, 1, 12, 1, 1, 1, 1, 1, 1, 1))
    val hists = family(spark, count.histMetrics, Seq(
      (count.histDataPoints - count.histNan - count.histNoRecorded, false, false),
      (count.histNan, false, true),
      (count.histNoRecorded, true, false)))
      .select(
        concat(lit("http.server.duration"), col("i")).as("metric_name"),
        lit("server duration of the http server").as("description"),
        lit("ms").as("unit"), lit("Histogram").as("metric_type"),
        evenCumulative.as("temporality"), lit(false).as("is_monotonic"),
        col("unix_milli"), col("flags"),
        lit(30L).as("count"), lit(35.0).as("sum_v"),
        when(col("nan"), Double.NaN).otherwise(0.0).as("min_v"),
        when(col("nan"), Double.NaN).otherwise(12.0).as("max_v"),
        lit(true).as("has_sum"), lit(true).as("has_min"), lit(true).as("has_max"),
        histBounds.as("explicit_bounds"), histCounts.as("bucket_counts"),
        pointAttrs("histogram.attr_", count.histPointAttrs).as("attrs"))

    // fixedPattern copied into a numBucketCount-sized array (pad/truncate)
    val expPattern =
      Array[Long](0, 0, 0, 1, 0, 0, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 11, 1, 1, 1, 1, 10)
    val expBuckets = lit(Array.tabulate(count.expHistBuckets)(k =>
      if (k < expPattern.length) expPattern(k) else 0L))
    val expHists = family(spark, count.expHistMetrics, Seq(
      (count.expHistDataPoints - count.expHistNan - count.expHistNoRecorded, false, false),
      (count.expHistNan, false, true),
      (count.expHistNoRecorded, true, false)))
      .select(
        concat(lit("http.server.duration"), col("i")).as("metric_name"),
        lit("server duration of the http server but in exponential histogram format")
          .as("description"),
        lit("ms").as("unit"), lit("ExponentialHistogram").as("metric_type"),
        evenCumulative.as("temporality"), lit(false).as("is_monotonic"),
        col("unix_milli"), col("flags"),
        lit(1L).as("count"),
        when(col("nan"), Double.NaN).otherwise(1.0).as("sum_v"),
        lit(0.0).as("min_v"), lit(1.0).as("max_v"), lit(true).as("has_sum"),
        lit(2).as("scale"), lit(0L).as("zero_count"),
        lit(1).as("positive_offset"), expBuckets.as("positive_counts"),
        lit(1).as("negative_offset"), expBuckets.as("negative_counts"),
        pointAttrs("exponential.histogram.attr_", count.expHistPointAttrs).as("attrs"))

    val nq = count.summaryQuantiles
    val quantiles =
      if (nq == 0) // a correctly-typed empty array literal (slice to length 0)
        slice(array(struct(lit(0.0).as("q"), lit(0.0).as("v"))), 1, 0)
      else array((0 until nq).map(q => struct(
        lit(q.toDouble / nq).as("q"),
        (col("j") + q).cast("double").as("v"))): _*)
    val summaries = family(spark, count.summaryMetrics, Seq(
      (count.summaryDataPoints - count.summaryNan - count.summaryNoRecorded, false, false),
      (count.summaryNan, false, true),
      (count.summaryNoRecorded, true, false)))
      .select(
        concat(lit("zk.duration"), col("i")).as("metric_name"),
        lit("This is a summary metrics").as("description"),
        lit("ms").as("unit"), lit("Summary").as("metric_type"),
        lit("Unspecified").as("temporality"), lit(false).as("is_monotonic"),
        col("unix_milli"), col("flags"),
        col("j").cast("long").as("count"),
        when(col("nan"), Double.NaN).otherwise(col("j").cast("double")).as("sum_v"),
        quantiles.as("quantiles"))

    OtlpMetricFrames(
      scalars = MetricFrames.withDefaults(withContext(gauges.unionByName(sums))),
      histograms = MetricFrames.withHistogramDefaults(withContext(hists)),
      summaries = MetricFrames.withSummaryDefaults(withContext(summaries)),
      expHistograms = MetricFrames.withExpHistDefaults(withContext(expHists)))
  }
}
