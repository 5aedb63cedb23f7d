package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** In-flight span row model for the traces exporter slice — the Spark
  * analogue of one `ptrace.Span` + its resource/scope context, pre-flattened
  * the way [[LogRow]] flattens `plog.LogRecord`:
  *
  *  - `start_ts`/`end_ts` are ns-since-epoch longs
  *    (`Span.StartTimestamp/EndTimestamp`);
  *  - ids are hex strings (the reference converts to hex at shaping time,
  *    `utils.TraceIDToHexOrEmptyString`); we carry them already-hex;
  *  - attributes are the typed three-map split the sink schema stores
  *    (`attributes_string/number/bool` — clickhouse_exporter_v3.go:174-240
  *    attributesData resolves pcommon values to exactly this split);
  *  - `events` is an array of (name, ts_ns, attrs) structs
  *    (`Span.Events()`), `links` an array of (trace_id, span_id) structs
  *    (`Span.Links()`; Jaeger ref type is not carried — the exporter
  *    hardcodes FOLLOWS_FROM for links).
  */
object SpanSchema {
  val eventType: ArrayType = ArrayType(StructType(Seq(
    StructField("name", StringType, nullable = true),
    StructField("ts_ns", LongType, nullable = true),
    StructField("attrs", LogSchema.mapSS, nullable = true))), containsNull = false)

  val linkType: ArrayType = ArrayType(StructType(Seq(
    StructField("trace_id", StringType, nullable = true),
    StructField("span_id", StringType, nullable = true))), containsNull = false)
}

object SpanFrames {

  /** Add any missing span columns with neutral defaults, like
    * [[LogFrames.withDefaults]] does for log rows.
    */
  def withDefaults(df: DataFrame): DataFrame = {
    val defaults: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "start_ts" -> lit(0L),
      "end_ts" -> lit(0L),
      "trace_id" -> lit(""),
      "span_id" -> lit(""),
      "parent_span_id" -> lit(""),
      "trace_state" -> lit(""),
      "flags" -> lit(0),
      "name" -> lit(""),
      "kind" -> lit(0),
      "status_code" -> lit(0),
      "status_message" -> lit(""),
      "attributes_string" -> map().cast(LogSchema.mapSS),
      "attributes_number" -> map().cast(LogSchema.mapSD),
      "attributes_bool" -> map().cast(LogSchema.mapSB),
      "resources_string" -> map().cast(LogSchema.mapSS),
      "scope_name" -> lit(""),
      "scope_version" -> lit(""),
      "scope_string" -> map().cast(LogSchema.mapSS),
      "events" -> lit(null).cast(SpanSchema.eventType),
      "links" -> lit(null).cast(SpanSchema.linkType))
    defaults.foldLeft(df) { case (d, (c, v)) =>
      if (d.columns.contains(c)) d else d.withColumn(c, v)
    }
  }
}
