package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.{LogSchema, MetricFrames}
import graft.operators.OttlStatements
import graft.sources.OtlpMetricFrames

/** The signoztransformprocessor's METRICS signal surface: the six in-tree
  * metric functions
  * (`processor/signoztransformprocessor/internal/metrics/func_*.go`) plus
  * datapoint/resource-context OTTL statements over [[MetricFrames]]-shaped
  * frames (`metric_statements`, testdata/config.yaml:10-16).
  *
  * Spark-first restatement: every function is a pure projection (or a
  * projection + unionByName append for the extract family) over the
  * flattened datapoint frames — no shuffle, whole-stage codegen throughout.
  *
  * Documented divergences:
  *  - `extract_count_metric`/`extract_sum_metric` ERROR in the reference
  *    when the input metric's temporality is Unspecified
  *    (func_extract_count_metric.go:40-42); a column program cannot fail a
  *    single row, so those rows are silently excluded from the extraction
  *    output (the original frame is untouched either way).
  *  - the reference stores the count as an INT datapoint value
  *    (SetIntValue); this frame model carries one float64 `value` column,
  *    exactly what the exporter writes into samples_v4 anyway.
  */
object MetricTransforms {

  private def temporality(stringAggTemp: String): String = stringAggTemp match {
    case "delta" => "Delta"
    case "cumulative" => "Cumulative"
    case other =>
      throw new IllegalArgumentException(s"unknown aggregation temporality: $other")
  }

  /** `convert_sum_to_gauge()` (func_convert_sum_to_gauge.go:24-37): Sum
    * datapoints become Gauge; temporality/monotonicity live on the Sum
    * wrapper in OTLP, so they reset with the type.
    */
  def convertSumToGauge(scalars: DataFrame, where: Column = lit(true)): DataFrame = {
    val hit = col("metric_type") === "Sum" && where
    scalars
      .withColumn("temporality", when(hit, "Unspecified").otherwise(col("temporality")))
      .withColumn("is_monotonic", when(hit, false).otherwise(col("is_monotonic")))
      .withColumn("metric_type", when(hit, "Gauge").otherwise(col("metric_type")))
  }

  /** `convert_gauge_to_sum(aggTemp, monotonic)`
    * (func_convert_gauge_to_sum.go:35-62); unknown temporality strings fail
    * at compile time, like the factory does.
    */
  def convertGaugeToSum(scalars: DataFrame, stringAggTemp: String,
      monotonic: Boolean, where: Column = lit(true)): DataFrame = {
    val temp = temporality(stringAggTemp)
    val hit = col("metric_type") === "Gauge" && where
    scalars
      .withColumn("temporality", when(hit, temp).otherwise(col("temporality")))
      .withColumn("is_monotonic", when(hit, monotonic).otherwise(col("is_monotonic")))
      .withColumn("metric_type", when(hit, "Sum").otherwise(col("metric_type")))
  }

  /** The effective temporality of a histogram-family metric
    * (functions.go getAggregationTemporality): summaries have none in OTLP
    * and are treated as cumulative per the OpenMetrics spec.
    */
  private def familyTemporality: Column =
    when(col("metric_type") === "Summary", "Cumulative").otherwise(col("temporality"))

  /** Shared shaping for the extract family: new Sum rows carrying the
    * source datapoint's attrs + timestamp, the source metric's
    * description/unit, and a fresh default datapoint otherwise (flags are
    * NOT copied — the reference appends a new datapoint and only sets
    * attrs/value/timestamps, func_extract_sum_metric.go:99-105).
    */
  private def extracted(family: DataFrame, suffix: String, valueCol: Column,
      monotonic: Boolean, temp: Column = familyTemporality): DataFrame =
    MetricFrames.withDefaults(family
      .filter(temp =!= "Unspecified")
      .select(
        concat(col("metric_name"), lit(suffix)).as("metric_name"),
        col("description"), col("unit"),
        lit("Sum").as("metric_type"),
        temp.as("temporality"),
        lit(monotonic).as("is_monotonic"),
        col("unix_milli"),
        valueCol.as("value"),
        col("attrs"),
        col("scope_name"), col("scope_version"), col("scope_schema_url"),
        col("scope_attrs"), col("resource_attrs")))

  /** `extract_count_metric(monotonic)` over a histogram / exponential
    * histogram / summary frame -> the `<name>_count` Sum rows to append to
    * the scalar frame (func_extract_count_metric.go:35-77).
    */
  def extractCountMetric(family: DataFrame, monotonic: Boolean): DataFrame =
    extracted(family, "_count", col("count").cast("double"), monotonic)

  /** `extract_sum_metric(monotonic)` -> the `<name>_sum` Sum rows
    * (func_extract_sum_metric.go:45-97); histogram-family datapoints
    * without a sum are skipped (HasSum gate), summaries always carry one.
    */
  def extractSumMetric(family: DataFrame, monotonic: Boolean): DataFrame =
    extracted(
      if (family.columns.contains("has_sum"))
        family.filter(col("metric_type") === "Summary" || col("has_sum"))
      else family,
      "_sum", col("sum_v"), monotonic)

  /** `convert_summary_count_val_to_sum(aggTemp, monotonic)`
    * (func_convert_summary_count_val_to_sum.go:35-71): like the extract
    * family but with an EXPLICIT temporality and summaries only.
    */
  def convertSummaryCountValToSum(summaries: DataFrame, stringAggTemp: String,
      monotonic: Boolean): DataFrame = {
    val temp = temporality(stringAggTemp)
    extracted(summaries.filter(col("metric_type") === "Summary"),
      "_count", col("count").cast("double"), monotonic, lit(temp))
  }

  /** `convert_summary_sum_val_to_sum(aggTemp, monotonic)`. */
  def convertSummarySumValToSum(summaries: DataFrame, stringAggTemp: String,
      monotonic: Boolean): DataFrame = {
    val temp = temporality(stringAggTemp)
    extracted(summaries.filter(col("metric_type") === "Summary"),
      "_sum", col("sum_v"), monotonic, lit(temp))
  }

  // ---- datapoint/resource-context OTTL statements --------------------------

  private val emptyDN = map().cast(LogSchema.mapSD)
  private val emptyDB = map().cast(LogSchema.mapSB)

  /** Apply `metric_statements` blocks (context `datapoint` or `resource`)
    * to one MetricFrames-shaped frame. The frame's single string attr map is
    * viewed through the LogRow typed-map column names so the shared
    * statement compiler ([[OttlStatements.applyStmt]] over FieldCols /
    * ExprLang) runs unchanged; typed writes merge back AsString-rendered.
    */
  def datapointStatements(df: DataFrame,
      blocks: Seq[(String, Seq[String])]): DataFrame = {
    val viewed = df
      .withColumnRenamed("attrs", "attributes_string")
      .withColumnRenamed("resource_attrs", "resources_string")
      .withColumn("attributes_number", emptyDN)
      .withColumn("attributes_bool", emptyDB)
    val applied = blocks.foldLeft(viewed) { case (acc, (context, stmts)) =>
      val ctx = if (context == "resource") "resource" else "datapoint"
      stmts.foldLeft(acc)((d, s) => OttlStatements.applyStmt(d, OttlStatements.parse(s), ctx))
    }
    // typed writes (a `set` with a number/bool literal) merge back
    // AsString-rendered; the codegen kernel keeps this projection fused
    // (setString/setNumber keep keys disjoint across the typed maps)
    applied
      .withColumn("attributes_string", graft.functions.StringifyTypedMaps(
        col("attributes_string"), col("attributes_number"), col("attributes_bool")))
      .drop("attributes_number", "attributes_bool")
      .withColumnRenamed("attributes_string", "attrs")
      .withColumnRenamed("resources_string", "resource_attrs")
  }

  /** Full `metric_statements` application over the four-family bundle:
    * set/delete/keep/replace statements run per family; the six metric
    * functions route to their family (converts rewrite scalars in place,
    * extracts append new Sum rows to the scalar frame) — the same visible
    * effect as the reference's per-metric mutation loop.
    */
  def applyMetricStatements(frames: OtlpMetricFrames,
      blocks: Seq[(String, Seq[String])]): OtlpMetricFrames =
    blocks.foldLeft(frames) { case (acc, (context, stmts)) =>
      stmts.foldLeft(acc)((f, s) => applyOne(f, s, context))
    }

  private val fnCall = "^(\\w+)\\s*\\(".r

  private def applyOne(frames: OtlpMetricFrames, statement: String,
      context: String): OtlpMetricFrames = {
    val fn = fnCall.findFirstMatchIn(statement.trim).map(_.group(1)).getOrElse("")
    def args(n: Int): Seq[String] = {
      val s = statement.trim
      val open = s.indexOf('(')
      val close = s.lastIndexOf(')')
      val raw = s.substring(open + 1, close).split(",").map(_.trim).toSeq
      require(raw.size == n, s"$fn expects $n args: $statement")
      raw
    }
    def bool(s: String): Boolean = s == "true"
    def str(s: String): String = s.stripPrefix("\"").stripSuffix("\"")
    fn match {
      case "convert_sum_to_gauge" =>
        frames.copy(scalars = convertSumToGauge(frames.scalars))
      case "convert_gauge_to_sum" =>
        val a = args(2)
        frames.copy(scalars =
          convertGaugeToSum(frames.scalars, str(a.head), bool(a(1))))
      case "extract_count_metric" =>
        val a = args(1)
        frames.copy(scalars = frames.scalars
          .unionByName(extractCountMetric(frames.histograms, bool(a.head)), allowMissingColumns = true)
          .unionByName(extractCountMetric(frames.expHistograms, bool(a.head)), allowMissingColumns = true)
          .unionByName(extractCountMetric(frames.summaries, bool(a.head)), allowMissingColumns = true))
      case "extract_sum_metric" =>
        val a = args(1)
        frames.copy(scalars = frames.scalars
          .unionByName(extractSumMetric(frames.histograms, bool(a.head)), allowMissingColumns = true)
          .unionByName(extractSumMetric(frames.expHistograms, bool(a.head)), allowMissingColumns = true)
          .unionByName(extractSumMetric(frames.summaries, bool(a.head)), allowMissingColumns = true))
      case "convert_summary_count_val_to_sum" =>
        val a = args(2)
        frames.copy(scalars = frames.scalars.unionByName(
          convertSummaryCountValToSum(frames.summaries, str(a.head), bool(a(1))),
          allowMissingColumns = true))
      case "convert_summary_sum_val_to_sum" =>
        val a = args(2)
        frames.copy(scalars = frames.scalars.unionByName(
          convertSummarySumValToSum(frames.summaries, str(a.head), bool(a(1))),
          allowMissingColumns = true))
      case _ =>
        // set / delete_key / keep_keys / replace_pattern apply per family
        val b = Seq((context, Seq(statement)))
        OtlpMetricFrames(
          scalars = datapointStatements(frames.scalars, b),
          histograms = datapointStatements(frames.histograms, b),
          summaries = datapointStatements(frames.summaries, b),
          expHistograms = datapointStatements(frames.expHistograms, b))
    }
  }
}
