package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.MetricsExporter

/** Temporary stage-timing probe for the firehose cwmetrics scaleup row
  * (dev-only).
  */
object FHProbe {
  def time(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.configure(spark)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2m")

    val e = spark.read.parquet("/tmp/graft_scaleup/events_10000000")
    val recs = MetricQueries.firehoseRecordsFrom(e)

    for (_ <- 1 to 2) {
      time("record build") { recs.agg(sum(length(col("record")))).collect().head.getLong(0); 10000000L }
      import graft.sources.FirehoseMetrics.cwMetricSchema
      val datums = recs
        .select(explode(split(col("record").cast("string"), "\n")).as("__datum"))
        .filter(length(col("__datum")) > 0)
        .select(graft.functions.OptimizerFence(
          from_json(col("__datum"), cwMetricSchema)).as("__m"))
      time("+from_json") {
        datums.agg(sum(when(col("__m").isNotNull, 1L).otherwise(0L))).collect().head.getLong(0)
      }
      val frames = graft.sources.FirehoseMetrics.fromFirehoseCwMetrics(recs, col("record"))
      time("decode frames (distinct)") { frames.count() }
      time("+typed maps forced") {
        frames.agg(sum(size(col("attrs")) + size(col("resource_attrs")))).collect().head.getLong(0)
      }
      time("+values forced") {
        frames.agg(sum(col("value")).cast("long")).collect().head.getLong(0)
      }
      val pts = MetricsExporter.scalarPoints(frames)
      time("+chain (fingerprint)") {
        pts.agg(sum(col("fingerprint"))).collect().head.getLong(0)
      }
      time("full row") {
        MetricsExporter.samplesV4(MetricsExporter.scalarPoints(frames))
          .select(xxhash64(col("temporality"), col("metric_name"),
            col("fingerprint"), col("unix_milli"), col("value")).as("h"))
          .agg(sum(col("h"))).collect().head.getLong(0)
      }
    }
    spark.stop()
  }
}
