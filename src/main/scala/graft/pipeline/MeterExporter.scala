package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The meter samples exporter (`exporter/signozclickhousemeter/
  * exporter.go`): the billing-meter sink that persists ONLY scalar
  * (gauge/sum) datapoints, carrying the full metric identity columns the
  * metrics exporter splits across samples/time_series
  * (`samplesSQLTmpl`, exporter.go:20 — temporality, metric_name,
  * description, unit, type, is_monotonic, labels, fingerprint, unix_milli,
  * value).
  *
  * Semantics replicated:
  *  - only Gauge and Sum metrics are consumed; every other type is
  *    warn-skipped (prepareBatch, exporter.go:190-199) — here a typed
  *    filter on `metric_type`;
  *  - gauges force temporality=Unspecified and is_monotonic=false
  *    regardless of the datapoint (processGauge, exporter.go:131-139);
  *    sums keep theirs (processSum, exporter.go:85-92);
  *  - NaN datapoints are dropped (exporter.go:106-109) — inherited from
  *    [[MetricsExporter.scalarPoints]];
  *  - the resource→scope→point FNV-1a fingerprint chain, the
  *    `__temporality__` point extra, `HashWithName`, and the merged labels
  *    JSON are byte-identical to the metrics exporter's
  *    (exporter.go:111-125 vs signozclickhousemetrics) — shared via
  *    [[MetricsExporter.scalarPoints]], so both sinks stay in one
  *    whole-stage-codegen projection over the same identified points.
  */
object MeterExporter {

  /** Meter `samples` rows from raw scalar datapoint frames. */
  def samples(dps: DataFrame): DataFrame =
    fromPoints(MetricsExporter.scalarPoints(normalize(dps)))

  /** The gauge/sum gate + gauge identity normalization, applied BEFORE
    * fingerprinting: `__temporality__` enters the point fingerprint, so a
    * gauge row arriving with a stray temporality must be canonicalized
    * first to hash like the reference (which never reads gauge
    * temporality at all).
    */
  private def normalize(dps: DataFrame): DataFrame = dps
    .filter(col("metric_type").isin("Gauge", "Sum"))
    .withColumn("temporality",
      when(col("metric_type") === "Gauge", lit("Unspecified"))
        .otherwise(col("temporality")))
    .withColumn("is_monotonic",
      when(col("metric_type") === "Gauge", lit(false))
        .otherwise(col("is_monotonic")))

  /** Projection to the meter table schema from already-identified points —
    * reusable when a job also feeds the metrics sinks from the same
    * [[MetricsExporter.scalarPoints]] pass (one scan, two sinks).
    */
  def fromPoints(points: DataFrame): DataFrame =
    points.select(col("temporality"), col("metric_name"), col("description"),
      col("unit"), col("metric_type").as("type"), col("is_monotonic"),
      col("labels"), col("fingerprint"), col("unix_milli"), col("value"))
}
