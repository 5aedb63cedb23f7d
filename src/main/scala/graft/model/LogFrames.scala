package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Helpers to lift arbitrary DataFrames into the LogRow column set. */
object LogFrames {

  /** Add any missing [[LogSchema.logRow]] columns with neutral defaults so
    * pipeline operators can run over partial frames (tests, adapters).
    */
  def withDefaults(df: DataFrame): DataFrame = {
    val defaults: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "conv_id" -> lit(""),
      "turn_idx" -> lit(0),
      "role" -> lit(""),
      "tool" -> lit(""),
      "timestamp" -> lit(0L),
      "observed_timestamp" -> lit(0L),
      "severity_number" -> lit(0),
      "severity_text" -> lit(""),
      "body" -> lit(null).cast("string"),
      "attributes_string" -> map().cast(LogSchema.mapSS),
      "attributes_number" -> map().cast(LogSchema.mapSD),
      "attributes_bool" -> map().cast(LogSchema.mapSB),
      "resources_string" -> map().cast(LogSchema.mapSS),
      "trace_id" -> lit(""),
      "span_id" -> lit(""),
      "trace_flags" -> lit(0),
      "scope_name" -> lit(""),
      "scope_version" -> lit(""),
      "scope_string" -> map().cast(LogSchema.mapSS)
    )
    val present = df.columns.toSet
    val missing = defaults.filterNot { case (n, _) => present.contains(n) }
    if (missing.isEmpty) df else df.withColumns(missing.toMap)
  }

  /** A minimal LogRow frame from raw body strings (tests, adapters). */
  def fromBodies(spark: org.apache.spark.sql.SparkSession, bodies: Seq[String]): DataFrame = {
    import spark.implicits._
    withDefaults(bodies.zipWithIndex
      .map { case (b, i) => (s"c$i", i, b) }
      .toDF("conv_id", "turn_idx", "body"))
  }
}
