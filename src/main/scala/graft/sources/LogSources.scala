package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.{LogFrames, LogSchema}

/** Ingestion adapters mirroring the reference's httplogreceiver body parsers
  * (`receiver/httplogreceiver/bodyparser/json.go:18-48`, `default.go:14-31`):
  * each turns raw payloads into LogRow frames the pipeline consumes.
  */
object LogSources {

  /** `json` body parser: a column holding a JSON array of
    * `{timestamp, trace_id, span_id, trace_flags, severity_text,
    *   severity_number, attributes, resources, body}` objects -> one LogRow
    * per element. Timestamps are nanosecond epochs; severity defaults
    * applied like the reference. Attribute values are split into the typed
    * maps by JSON type (the exporter's own rule).
    */
  def fromJsonBody(df: DataFrame, jsonCol: Column): DataFrame = {
    val exploded = df.select(
      explode(from_json(jsonCol,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType))).as("__obj"))
    val o = col("__obj")
    val attrs = graft.functions.JsonTypedMaps.of(get_json_object(o, "$.attributes"))
    val res = graft.functions.JsonTypedMaps.of(get_json_object(o, "$.resources"))
    LogFrames.withDefaults(exploded.select(
      coalesce(get_json_object(o, "$.timestamp").cast("long"), lit(0L)).as("timestamp"),
      coalesce(get_json_object(o, "$.trace_id"), lit("")).as("trace_id"),
      coalesce(get_json_object(o, "$.span_id"), lit("")).as("span_id"),
      coalesce(get_json_object(o, "$.trace_flags").cast("int"), lit(0)).as("trace_flags"),
      coalesce(get_json_object(o, "$.severity_text"), lit("")).as("severity_text"),
      coalesce(get_json_object(o, "$.severity_number").cast("int"), lit(0)).as("severity_number"),
      coalesce(get_json_object(o, "$.body"), lit("")).as("body"),
      coalesce(attrs.getField("strings"), map().cast(LogSchema.mapSS)).as("attributes_string"),
      coalesce(attrs.getField("numbers"), map().cast(LogSchema.mapSD)).as("attributes_number"),
      coalesce(attrs.getField("bools"), map().cast(LogSchema.mapSB)).as("attributes_bool"),
      // resource attrs are force-stringified at the sink; stringify here too
      coalesce(stringifyAll(res), map().cast(LogSchema.mapSS)).as("resources_string")))
  }

  private def stringifyAll(typedStruct: Column): Column =
    map_concat(
      typedStruct.getField("strings"),
      transform_values(typedStruct.getField("numbers"), (_, v) =>
        when(v === v.cast("long").cast("double"), v.cast("long").cast("string"))
          .otherwise(v.cast("string"))),
      transform_values(typedStruct.getField("bools"), (_, v) => v.cast("string")))

  /** `default` body parser: newline-split text -> one LogRow per line. */
  def fromTextLines(df: DataFrame, textCol: Column): DataFrame =
    LogFrames.withDefaults(
      df.select(explode(split(textCol, "\n")).as("body")))
}
