package graft

import org.apache.spark.sql.functions._

import graft.sources.SystemTables

/** clickhousesystemtables metrics slice: `system.view_refreshes` snapshot
  * rows -> OTel gauges. Ports the reference's own receiver tests
  * (`metrics_receiver_test.go:62-103` TestMetricsScrapeGroupsByHostname +
  * TestMetricsSkipsNeverSucceededAge).
  */
class SystemTablesSpec extends SparkSuite {
  import spark.implicits._

  private val rows = Seq(
    // Hostname, Database, View, LastSuccessAge, LastDuration, Exception, Retry, Progress
    ("host-1", "signoz_metrics", "samples_reduced_mv", 12L, 0.5, 0, 0L, 1.0),
    ("host-2", "signoz_metrics", "samples_reduced_mv", 4000L, 2.0, 1, 3L, 0.0)
  ).toDF("hostname", "database", "view", "last_success_age", "last_duration",
    "exception", "retry", "progress")

  test("scrape groups by hostname; per-replica values (metrics_receiver_test.go port)") {
    val md = SystemTables.viewRefreshMetrics(rows, lit(1700000000000L))
    def gauge(host: String, name: String): Double =
      md.filter($"resource_attrs".getItem("clickhouse.hostname") === host &&
        $"metric_name" === name).select("value").as[Double].head()

    assert(md.select($"resource_attrs".getItem("clickhouse.hostname"))
      .distinct().as[String].collect().toSet == Set("host-1", "host-2"))
    assert(gauge("host-2", "clickhouse.view_refresh.exception") == 1.0)
    assert(gauge("host-1", "clickhouse.view_refresh.exception") == 0.0)
    assert(gauge("host-2", "clickhouse.view_refresh.last_success_age") == 4000.0)
    assert(gauge("host-2", "clickhouse.view_refresh.retry") == 3.0)
    assert(md.filter($"metric_name" === "clickhouse.view_refresh.last_duration" &&
      $"resource_attrs".getItem("clickhouse.hostname") === "host-1").count() == 1)
    // every datapoint carries database/view attrs, the scrape stamp, Gauge
    // type, and the receiver scope
    assert(md.filter($"attrs".getItem("database") =!= "signoz_metrics" ||
      $"attrs".getItem("view") =!= "samples_reduced_mv" ||
      $"unix_milli" =!= 1700000000000L || $"metric_type" =!= "Gauge" ||
      $"scope_name" =!= SystemTables.ScopeName).count() == 0)
  }

  test("never-succeeded view skips the age datapoint only") {
    val never = Seq(("host-1", "signoz_metrics", "mv", -1L, 0.0, 0, 0L, 0.0))
      .toDF("hostname", "database", "view", "last_success_age", "last_duration",
        "exception", "retry", "progress")
    val md = SystemTables.viewRefreshMetrics(never, lit(0L))
    val names = md.select("metric_name").as[String].collect().toSet
    assert(!names.contains("clickhouse.view_refresh.last_success_age"))
    assert(names == Set(
      "clickhouse.view_refresh.last_duration",
      "clickhouse.view_refresh.exception",
      "clickhouse.view_refresh.retry",
      "clickhouse.view_refresh.progress"))
  }
}
