package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Exporter, Pipeline}
import graft.sources.Transcripts

/** Stage-by-stage scaling decomposition: which stage stops scaling? */
object DecompBench {
  def run(cores: Int, stage: String): Double = {
    val spark = SparkSession.builder().master(s"local[$cores]")
      .appName(s"decomp-$stage-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      // the 67 MB bench input must split into >= cores tasks, or every
      // stage is task-count-bound (default 128m packing -> ~3 tasks) and
      // the per-stage speedup measures file packing, not the host
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val input = spark.read.parquet(sys.env.getOrElse("SPARK_GRAFT_DECOMP_INPUT",
        "/tmp/graft_bench_transcripts"))
      def frame: DataFrame = stage match {
        case "scan" => input.select(xxhash64(col("conv_id"), col("turn_idx"), col("text")).as("h"))
        case "adapt" => Transcripts.toLogFrame(input)
          .select(xxhash64(col("conv_id"), col("body"), col("timestamp")).as("h"))
        case "route" =>
          val logs = Transcripts.toLogFrame(input)
          val spec = graft.pipeline.PipelineSpec(Seq(
            SparkEntry.transcriptPipeline.ops.head, // router only
            graft.operators.NoopOp(graft.operators.Common("parse_hotrod")),
            graft.operators.NoopOp(graft.operators.Common("parse_json")),
            graft.operators.NoopOp(graft.operators.Common("parse_status")),
            graft.operators.NoopOp(graft.operators.Common("parse_kv")),
            graft.operators.NoopOp(graft.operators.Common("noop"))))
          Pipeline.compile(spec)(logs).select(xxhash64(col("route")).as("h"))
        case "pipeline" =>
          Pipeline.compile(SparkEntry.transcriptPipeline)(Transcripts.toLogFrame(input))
            .select(xxhash64(col("route"), col("severity_number"),
              size(col("attributes_string"))).as("h"))
        case "full" =>
          Exporter.logsV2(Pipeline.compile(SparkEntry.transcriptPipeline)(
            Transcripts.toLogFrame(input)))
            .select(xxhash64(col("route"), col("severity_number"), col("ts_bucket_start"),
              col("resource_fingerprint"), col("id"), size(col("attributes_string"))).as("h"))
      }
      // warm on the full plan, then min of 2 timed passes
      frame.agg(sum(col("h"))).collect()
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        frame.agg(sum(col("h"))).collect()
        (System.nanoTime() - t0) / 1e9
      }.min
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val stages = Seq("scan", "adapt", "route", "pipeline", "full")
    val coreLevels = sys.env.getOrElse("SPARK_GRAFT_DECOMP_CORES", "8,32")
      .split(",").toSeq.map(_.trim.toInt)
    val results = for (stage <- stages; cores <- coreLevels) yield {
      val sec = run(cores, stage)
      println(f"[decomp] stage=$stage cores=$cores sec=$sec%.1f")
      (stage, cores, sec)
    }
    results.grouped(coreLevels.size).foreach { g =>
      val st = g.head._1
      val lo = g.head._3
      val hi = g.last._3
      println(f"[decomp] $st speedup(${coreLevels.head}->${coreLevels.last})=${lo / hi}%.2f")
    }
  }
}
