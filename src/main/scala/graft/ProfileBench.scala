package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{Exporter, Pipeline}
import graft.sources.Transcripts

/** Long-running profile target: full pipeline over the bench parquet. */
object ProfileBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse("PB_CORES", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("PB_CORES", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val input = spark.read.parquet("/tmp/graft_bench_transcripts")
    val routed = Pipeline.compile(SparkEntry.transcriptPipeline)(Transcripts.toLogFrame(input))
    val main0 = Exporter.logsV2(routed)
    val t0 = System.nanoTime()
    val n = main0.select(xxhash64(col("route"), col("severity_number"), col("timestamp"),
      col("resource_fingerprint"), col("id"), size(col("attributes_string"))).as("h"))
      .agg(sum(col("h"))).collect().head.getLong(0)
    println(f"[profile] done h=$n in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
