package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** In-flight metric datapoint model for the metrics exporter slice — one row
  * per flattened OTLP datapoint with its resource/scope context, the way
  * [[LogRow]]/[[SpanFrames]] flatten the other signals. Attribute values are
  * already `pcommon.Value.AsString`-rendered (the fingerprint/label layer of
  * the reference only consumes strings, exporter.go:1110-1125).
  */
object MetricFrames {

  val quantileType: ArrayType = ArrayType(StructType(Seq(
    StructField("q", DoubleType, nullable = false),
    StructField("v", DoubleType, nullable = false))), containsNull = false)

  /** Shared identity/scalar defaults (gauge/sum shape). */
  def withDefaults(df: DataFrame): DataFrame = {
    val defaults: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "metric_name" -> lit(""),
      "description" -> lit(""),
      "unit" -> lit(""),
      "metric_type" -> lit("Gauge"),
      "temporality" -> lit("Unspecified"),
      "is_monotonic" -> lit(false),
      "unix_milli" -> lit(0L),
      "value" -> lit(0.0),
      "flags" -> lit(0),
      "attrs" -> map().cast(LogSchema.mapSS),
      "scope_name" -> lit(""),
      "scope_version" -> lit(""),
      "scope_schema_url" -> lit(""),
      "scope_attrs" -> map().cast(LogSchema.mapSS),
      "resource_attrs" -> map().cast(LogSchema.mapSS))
    defaults.foldLeft(df) { case (d, (c, v)) =>
      if (d.columns.contains(c)) d else d.withColumn(c, v)
    }
  }

  /** Histogram datapoint extras (count/sum/min/max + buckets). */
  def withHistogramDefaults(df: DataFrame): DataFrame = {
    val defaults: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "count" -> lit(0L),
      "sum_v" -> lit(0.0),
      "min_v" -> lit(0.0),
      "max_v" -> lit(0.0),
      "has_sum" -> lit(false),
      "has_min" -> lit(false),
      "has_max" -> lit(false),
      "explicit_bounds" -> lit(Array.empty[Double]).cast("array<double>"),
      "bucket_counts" -> lit(Array.empty[Long]).cast("array<bigint>"))
    defaults.foldLeft(withDefaults(df)) { case (d, (c, v)) =>
      if (d.columns.contains(c)) d else d.withColumn(c, v)
    }
  }

  /** Summary datapoint extras (count/sum + quantile values). */
  def withSummaryDefaults(df: DataFrame): DataFrame = {
    val defaults: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "count" -> lit(0L),
      "sum_v" -> lit(0.0),
      "quantiles" -> lit(null).cast(quantileType))
    defaults.foldLeft(withDefaults(df)) { case (d, (c, v)) =>
      if (d.columns.contains(c)) d else d.withColumn(c, v)
    }
  }

  /** Exponential-histogram datapoint extras (DD sketch inputs). */
  def withExpHistDefaults(df: DataFrame): DataFrame = {
    val defaults: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "count" -> lit(0L),
      "sum_v" -> lit(0.0),
      "min_v" -> lit(0.0),
      "max_v" -> lit(0.0),
      "has_sum" -> lit(false),
      "scale" -> lit(0),
      "zero_count" -> lit(0.0),
      "positive_offset" -> lit(0),
      "positive_counts" -> lit(Array.empty[Double]).cast("array<double>"),
      "negative_offset" -> lit(0),
      "negative_counts" -> lit(Array.empty[Double]).cast("array<double>"))
    defaults.foldLeft(withDefaults(df)) { case (d, (c, v)) =>
      if (d.columns.contains(c)) d else d.withColumn(c, v)
    }
  }
}
