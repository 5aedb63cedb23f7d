package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.MetricFrames

/** The clickhousesystemtables receiver's metrics slice: snapshot rows of
  * `system.view_refreshes` emitted as OTel gauges
  * (`receiver/clickhousesystemtablesreceiver/system_metrics.go:10-50` row
  * shape + scrape SQL, `metrics_receiver.go:110-144` collect,
  * `internal/metadata/metadata.yaml:26-60` metric names/units).
  *
  * The reference scrapes ClickHouse on an interval and feeds a
  * MetricsBuilder; here any DataFrame with view_refreshes-shaped columns
  * (a JDBC snapshot, a test frame) maps to MetricFrames rows — one gauge
  * datapoint per metric per row, `database`/`view` datapoint attrs, the
  * replica hostname as the `clickhouse.hostname` resource (the reference's
  * group-by-host EmitForResource), all stamped with the caller's scrape
  * time (`collect`'s single `now` per scrape).
  *
  * Faithful details: `last_success_age` is skipped when negative (the
  * scrape SQL coalesces a never-succeeded view's NULL age to -1 and
  * `collect` drops that datapoint so it reads as missing data, not a bogus
  * age); `exception` is the 0/1 flag (`toUInt8(exception != '')`); value
  * types follow metadata.yaml (int gauges land integral in the shared
  * float64 value column, exactly like the exporter's samples column).
  */
object SystemTables {

  val ScopeName = "github.com/SigNoz/signoz-otel-collector/receiver/clickhousesystemtablesreceiver"

  private case class GaugeSpec(name: String, unit: String, description: String,
      value: Column, keep: Column)

  /** `system.view_refreshes` snapshot -> gauge MetricFrames.
    *
    * Expected input columns: `hostname` string, `database` string, `view`
    * string, `last_success_age` long, `last_duration` double, `exception`
    * int (0/1), `retry` long, `progress` double.
    */
  def viewRefreshMetrics(df: DataFrame, scrapeUnixMilli: Column): DataFrame = {
    val specs = Seq(
      GaugeSpec("clickhouse.view_refresh.last_success_age", "s",
        "Seconds since the last successful refresh of the view (now() - last_success_time). Primary staleness signal for refreshable materialized views.",
        col("last_success_age").cast("double"), col("last_success_age") >= 0),
      GaugeSpec("clickhouse.view_refresh.last_duration", "s",
        "Duration of the most recent refresh of the view. Compared against the refresh cadence to detect overrun.",
        col("last_duration").cast("double"), lit(true)),
      GaugeSpec("clickhouse.view_refresh.exception", "1",
        "1 if the view's last refresh ended in an exception, 0 otherwise.",
        col("exception").cast("double"), lit(true)),
      GaugeSpec("clickhouse.view_refresh.retry", "{retries}",
        "Current retry count for the view's refresh.",
        col("retry").cast("double"), lit(true)),
      GaugeSpec("clickhouse.view_refresh.progress", "1",
        "Progress of an in-flight refresh, between 0 and 1.",
        col("progress").cast("double"), lit(true)))

    val points = array(specs.map(s => struct(
      lit(s.name).as("metric_name"),
      lit(s.unit).as("unit"),
      lit(s.description).as("description"),
      s.value.as("value"),
      s.keep.as("keep"))): _*)

    val exploded = df
      .select(col("hostname"), col("database"), col("view"),
        explode(points).as("__p"))
      .filter(col("__p.keep"))

    MetricFrames.withDefaults(exploded.select(
      col("__p.metric_name").as("metric_name"),
      col("__p.description").as("description"),
      col("__p.unit").as("unit"),
      lit("Gauge").as("metric_type"),
      scrapeUnixMilli.cast("long").as("unix_milli"),
      col("__p.value").as("value"),
      map(lit("database"), col("database"), lit("view"), col("view")).as("attrs"),
      lit(ScopeName).as("scope_name"),
      map(lit("clickhouse.hostname"), col("hostname")).as("resource_attrs")))
  }
}
