package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.TraceExporter

/** Temporary stage-timing probe for the dep_graph scaleup row (dev-only). */
object DGProbe {
  def time(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "40g")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.configure(spark)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2m")

    val e = spark.read.parquet("/tmp/graft_scaleup/events_10000000")
    val emptyMap = map().cast("map<string,string>")
    def spans0 = TraceQueries.spansFrom(e)
      .withColumn("attributes_string", map_concat(
        col("attributes_string"),
        when(col("event_id") % 11 === 0,
          map(lit("db.system"), lit("postgres"))).otherwise(emptyMap),
        when(col("event_id") % 13 === 0,
          map(lit("messaging.system"), lit("kafka"))).otherwise(emptyMap)))
      .withColumn("resources_string", map(lit("service.name"),
        concat(lit("svc-"), (col("event_id") % 4).cast("string"))))
    def v3 = TraceExporter.spansV3(spans0)

    def resTag(k: String): Column =
      coalesce(col("resources_string").getItem(k), lit(""))
    def base = v3.select(
      col("trace_id"), col("span_id"), col("parent_span_id"),
      col("service_name"), col("kind"), col("status_code"),
      col("duration_nano"), col("timestamp"),
      col("attributes_string").getItem("db.system").as("db_system"),
      col("attributes_string").getItem("messaging.system").as("msg_system"),
      resTag("deployment.environment").as("deployment_environment"),
      resTag("k8s.cluster.name").as("k8s_cluster_name"),
      resTag("k8s.namespace.name").as("k8s_namespace_name"))

    val edgeCols = Seq(
      expr("(timestamp div 60000000000) * 60").as("timestamp"),
      col("deployment_environment"), col("k8s_cluster_name"),
      col("k8s_namespace_name"), col("status_code"), col("duration_nano"))
    def attrEdges(dest: Column): DataFrame = base
      .filter(dest.isNotNull && dest =!= "" && col("kind") =!= 2)
      .select(col("service_name").as("src") +: dest.as("dest") +: edgeCols: _*)

    for (_ <- 1 to 2) {
      time("base scan (forced)") {
        base.select(xxhash64(col("trace_id"), col("span_id"), col("duration_nano")).as("h"))
          .agg(sum(col("h"))).collect().head.getLong(0); 10000000L
      }
      time("attr edges only") {
        attrEdges(col("db_system")).unionByName(attrEdges(col("msg_system")))
          .agg(count(lit(1))).collect().head.getLong(0)
      }
      time("svc join only") {
        val parents = base.select(col("trace_id"),
          col("span_id").as("parent_span_id"), col("service_name").as("src"))
        base.filter(col("parent_span_id") =!= "")
          .join(parents, Seq("trace_id", "parent_span_id"))
          .filter(col("src") =!= col("service_name"))
          .agg(count(lit(1))).collect().head.getLong(0)
      }
      time("full dep graph") {
        TraceExporter.dependencyGraph(v3)
          .agg(count(lit(1)).as("edges"),
            coalesce(sum(col("total_count")), lit(0L)).as("spans"))
          .collect().head.getLong(1)
      }
      time("svc join SHJ") {
        val parents = base.select(col("trace_id"),
          col("span_id").as("parent_span_id"), col("service_name").as("src"))
        base.filter(col("parent_span_id") =!= "")
          .join(parents.hint("SHUFFLE_HASH"), Seq("trace_id", "parent_span_id"))
          .filter(col("src") =!= col("service_name"))
          .agg(count(lit(1))).collect().head.getLong(0)
      }
      time("attr edges one-scan") {
        base.filter(col("kind") =!= 2)
          .select(col("service_name").as("src"),
            explode(array(col("db_system"), col("msg_system"))).as("dest"),
            col("duration_nano"))
          .filter(col("dest").isNotNull && col("dest") =!= "")
          .agg(count(lit(1))).collect().head.getLong(0)
      }
      time("all edges one-scan window") {
        import org.apache.spark.sql.expressions.Window
        val attrOk = col("kind") =!= 2
        // tag: P = parent candidate (every span), C = child link, A = finished attr edge
        val tagged = base.select(col("trace_id"), col("span_id"),
          col("parent_span_id"), col("service_name"), col("status_code"),
          col("duration_nano"), col("timestamp"),
          explode(array(
            struct(lit("P").as("tag"), col("span_id").as("key"), lit(null).cast("string").as("dest")),
            struct(lit("C").as("tag"), col("parent_span_id").as("key"), lit(null).cast("string").as("dest")),
            struct(lit("A").as("tag"), lit(null).cast("string").as("key"), when(attrOk, col("db_system")).as("dest")),
            struct(lit("A").as("tag"), lit(null).cast("string").as("key"), when(attrOk, col("msg_system")).as("dest")))).as("t"))
          .filter((col("t.tag") === "P") ||
            (col("t.tag") === "C" && col("parent_span_id") =!= "") ||
            (col("t.tag") === "A" && col("t.dest").isNotNull && col("t.dest") =!= ""))
        val w = Window.partitionBy(col("trace_id"), col("t.key"))
        val withSrc = tagged.withColumn("src",
          when(col("t.tag") === "A", col("service_name"))
            .otherwise(max(when(col("t.tag") === "P", col("service_name"))).over(w)))
        withSrc.filter(col("t.tag") =!= "P")
          .filter(col("t.tag") === "A" || (col("src").isNotNull && col("src") =!= col("service_name")))
          .select(col("src"),
            when(col("t.tag") === "A", col("t.dest")).otherwise(col("service_name")).as("dest"),
            col("duration_nano"))
          .agg(count(lit(1))).collect().head.getLong(0)
      }
    }
    spark.stop()
  }
}
