package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.MetricsExporter

/** Temporary stage-timing probe for slow queries (dev-only). */
object QProbe {
  def time(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "16g")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.configure(spark)
    val d = "/root/testdata/sf0.1"

    val ev = spark.read.parquet(s"$d/events.parquet").cache()
    ev.count()

    val record = to_json(struct(
      lit("ms").as("metric_stream_name"),
      (col("user_id") % 3).cast("string").as("account_id"),
      lit("us-east-1").as("region"),
      when(col("event_id") % 3 === 0, "AWS/EC2")
        .when(col("event_id") % 3 === 1, "AWS/Lambda")
        .otherwise("Custom").as("namespace"),
      concat(lit("M"), (col("event_id") % 2).cast("string")).as("metric_name"),
      map(lit("InstanceId"),
        concat(lit("i-"), (col("user_id") % 5).cast("string"))).as("dimensions"),
      expr("unix_micros(cast(ts as timestamp)) div 1000").as("timestamp"),
      struct(
        (floor(col("value")) + 2.0).cast("double").as("max"),
        lit(0.0).as("min"),
        floor(col("value")).cast("double").as("sum"),
        lit(3.0).as("count")).as("value"),
      when(col("event_id") % 11 =!= 0, lit("Count")).as("unit")))

    val recDf = ev.select(record.as("record"))
    for (_ <- 1 to 2) {
      time("record-build (to_json)") { recDf.agg(sum(length(col("record")))).collect().head.getLong(0) }

      import graft.sources.FirehoseMetrics.cwMetricSchema
      val datums = recDf
        .select(explode(split(col("record").cast("string"), "\n")).as("__datum"))
        .filter(length(col("__datum")) > 0)
        .select(graft.functions.OptimizerFence(
          from_json(col("__datum"), cwMetricSchema)).as("__m"))
      time("split+from_json") {
        datums.agg(sum(when(col("__m").isNotNull, 1L).otherwise(0L))).collect().head.getLong(0)
      }
      val m = col("__m")
      def nn(c: org.apache.spark.sql.Column) = coalesce(c, lit(""))
      val valid = datums.filter(m.isNotNull &&
        nn(m.getField("metric_name")) =!= "" && nn(m.getField("namespace")) =!= "" &&
        nn(m.getField("unit")) =!= "" && m.getField("value").isNotNull)
      time("+valid filter") { valid.count() }
      val attrs = graft.functions.MapRenameKeys(
        coalesce(m.getField("dimensions"), map().cast(graft.model.LogSchema.mapSS)),
        Seq("InstanceId" -> "service.instance.id"))
      val ns = m.getField("namespace")
      val slash = instr(ns, "/")
      val isAws = slash > 0 && lower(substring_index(ns, "/", 1)) === "aws"
      val resource = map_concat(
        map(lit("cloud.provider"), lit("aws"),
          lit("cloud.account.id"), nn(m.getField("account_id")),
          lit("cloud.region"), nn(m.getField("region")),
          lit("service.name"),
          when(isAws, expr("substring(__m.namespace, instr(__m.namespace, '/') + 1)")).otherwise(ns),
          lit("aws.cloudwatch.metric_stream_name"), nn(m.getField("metric_stream_name"))),
        when(isAws, map(lit("service.namespace"), substring_index(ns, "/", 1)))
          .otherwise(map().cast(graft.model.LogSchema.mapSS)))
      val nsParts = regexp_replace(regexp_replace(regexp_replace(ns,
        "(?i)(?<=^|/)aws(?=/|$)", ""), "^/+|/+$", ""), "/+", "_")
      val namePrefix = concat_ws("_", lit("aws"), nsParts, m.getField("metric_name"))
      val v = m.getField("value")
      val preDistinct = valid.select(
        namePrefix.as("__prefix"), nn(m.getField("unit")).as("unit"),
        coalesce(m.getField("timestamp"), lit(0L)).as("unix_milli"),
        graft.functions.MapSortedJson(attrs).as("__attrs_json"),
        graft.functions.MapSortedJson(resource).as("__res_json"),
        coalesce(v.getField("sum"), lit(0.0)).as("__sum"),
        coalesce(v.getField("count"), lit(0.0)).as("__count"),
        coalesce(v.getField("min"), lit(0.0)).as("__min"),
        coalesce(v.getField("max"), lit(0.0)).as("__max"))
      time("+project (pre-distinct)") { preDistinct.agg(sum(length(col("__attrs_json")))).collect().head.getLong(0) }
      time("+distinct") { preDistinct.distinct().count() }

      val frames = graft.sources.FirehoseMetrics.fromFirehoseCwMetrics(recDf, col("record"))
      time("decode frames") { frames.count() }

      val pts = MetricsExporter.scalarPoints(frames)
      time("scalarPoints") { pts.count() }

      val s4 = MetricsExporter.samplesV4(pts)
      time("samplesV4") { s4.count() }

      time("full query") {
        s4.groupBy(col("env"), col("temporality"), col("metric_name"), col("fingerprint"))
          .agg(count(lit(1)).as("n"), sum(col("value").cast("long")).as("sum_value"))
          .count()
      }
    }
    spark.stop()
  }
}
