package graft.model

import org.apache.spark.sql.types._

/** The engine's in-flight row model.
  *
  * Mirrors the union of the reference's stanza `entry.Entry` (flat record:
  * body/attributes/resource/timestamp/severity/trace, see
  * `processor/signozlogspipelineprocessor/stanza/operator/helper/expr.go:45-67`)
  * and the at-rest `logs_v2` sink schema
  * (`cmd/signozschemamigrator/schema_migrator/v2_squashed_logs_migration.go:163-209`).
  *
  * Attributes are kept in the three typed maps of the sink schema from the
  * start (string/number/bool) — the reference's dynamic `map[string]any`
  * resolves to exactly this split at export time
  * (`exporter/clickhouselogsexporter/exporter.go:1007-1031`), so carrying the
  * split through the pipeline loses nothing and avoids a dynamic-typing layer
  * Spark doesn't want.
  *
  * Transcript provenance columns (conv_id, turn_idx, role, tool) ride along so
  * the stable-ordering invariant `ORDER BY (conv_id, turn_idx)` and per-turn
  * text equality are checkable at any stage.
  */
case class LogRow(
    conv_id: String,
    turn_idx: Int,
    role: String,
    tool: String,
    timestamp: Long, // ns since epoch (LogRecord.Timestamp)
    observed_timestamp: Long, // ns since epoch
    severity_number: Int, // 0..24 OTLP enum
    severity_text: String,
    body: String,
    attributes_string: Map[String, String],
    attributes_number: Map[String, Double],
    attributes_bool: Map[String, Boolean],
    resources_string: Map[String, String],
    trace_id: String,
    span_id: String,
    trace_flags: Int,
    scope_name: String,
    scope_version: String,
    scope_string: Map[String, String] // v2_squashed_logs_migration.go:183
)

object LogSchema {
  /** Input table shape from BASELINE.json `input_hint`. */
  val transcript: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", IntegerType, nullable = false),
    StructField("role", StringType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("tool", StringType, nullable = true),
    StructField("ts", TimestampType, nullable = false)
  ))

  val mapSS: MapType = MapType(StringType, StringType, valueContainsNull = true)
  val mapSD: MapType = MapType(StringType, DoubleType, valueContainsNull = true)
  val mapSB: MapType = MapType(StringType, BooleanType, valueContainsNull = true)

  /** Pipeline/in-flight schema (matches [[LogRow]]). */
  val logRow: StructType = StructType(Seq(
    StructField("conv_id", StringType),
    StructField("turn_idx", IntegerType),
    StructField("role", StringType),
    StructField("tool", StringType),
    StructField("timestamp", LongType),
    StructField("observed_timestamp", LongType),
    StructField("severity_number", IntegerType),
    StructField("severity_text", StringType),
    StructField("body", StringType),
    StructField("attributes_string", mapSS),
    StructField("attributes_number", mapSD),
    StructField("attributes_bool", mapSB),
    StructField("resources_string", mapSS),
    StructField("trace_id", StringType),
    StructField("span_id", StringType),
    StructField("trace_flags", IntegerType),
    StructField("scope_name", StringType),
    StructField("scope_version", StringType),
    StructField("scope_string", mapSS)
  ))
}
