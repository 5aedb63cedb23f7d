package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sinks.GraftTable
import graft.sources.Transcripts

/** The full production job: transcripts -> parse/route pipeline -> exporter
  * fan-out -> snapshot-committed sinks, with the partitioning/skew/ordering
  * story from SURVEY.md §7.2 step 9 (BASELINE.json north_rule).
  *
  * Scale design notes (targeting 10^12 turns / 1000 executors):
  *  - The parse->route->export chain is pure per-row projection — ZERO
  *    shuffles from scan to sink files; parallelism is bounded only by input
  *    splits. The single required shuffle is the explicit layout
  *    repartition before the write.
  *  - Layout: `repartition(hash(conv_id, turn_block))` where
  *    `turn_block = turn_idx / saltBlockTurns`. A conversation hotter than
  *    one block is split across partitions (bounded partition size no matter
  *    how hot a conv_id gets — skew-proof by construction, no stats pass
  *    needed), while blocks keep turns contiguous so
  *    `sortWithinPartitions(conv_id, turn_idx)` preserves the stable
  *    ordering invariant within every file — the ClickHouse
  *    `ORDER BY (bucket, fp, severity, ts, id)` analogue
  *    (v2_squashed_logs_migration.go:200-208).
  *  - Side sinks (resources, tags, keys) aggregate over orders of magnitude
  *    fewer distinct values; their dropDuplicates shuffles partial-aggregate
  *    map-side first, so reduce-side traffic is proportional to distinct
  *    counts, not row counts.
  */
final case class JobConfig(
    layoutPartitions: Int = 0, // 0 = leave to AQE / input parallelism
    saltBlockTurns: Int = 4096, // turns per layout block for hot conversations
    exporter: ExporterConfig = ExporterConfig()
)

object TranscriptJob {

  /** transcript table -> committed sinks under `outDir`; returns the sink
    * DataFrames (lazily re-readable via [[GraftTable.read]]).
    */
  def run(spark: SparkSession, transcripts: DataFrame, outDir: String,
      spec: PipelineSpec, cfg: JobConfig = JobConfig(),
      resume: Boolean = false): Map[String, Long] = {
    val logs = Transcripts.toLogFrame(transcripts)
    val routed = Enrich.roleToolEnrich(Pipeline.compile(spec)(logs))

    // layout shuffle: co-locate conversation blocks, bound skew
    val block = (col("turn_idx") / cfg.saltBlockTurns).cast("int")
    val layout =
      if (cfg.layoutPartitions > 0) routed.repartition(cfg.layoutPartitions, col("conv_id"), block)
      else routed.repartition(col("conv_id"), block)

    val main = Exporter.logsV2(layout, cfg.exporter)
      .sortWithinPartitions("conv_id", "turn_idx")
      .cache() // shared upstream of the 5-way fan-out (exporter.go:796-827)
    try {
      val counts = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      val existingRes =
        if (resume) scala.util.Try(GraftTable.read(spark, s"$outDir/logs_v2_resource")).toOption
        else None

      val mainSnap =
        if (resume) GraftTable.appendMissingPartitions(main, s"$outDir/logs_v2", "route", "logs_v2")
        else GraftTable.write(main, s"$outDir/logs_v2", Some("route"), "logs_v2")
      counts("logs_v2") = mainSnap.rowCount

      counts("logs_v2_resource") = GraftTable.write(
        Exporter.resources(main, existingRes), s"$outDir/logs_v2_resource",
        None, "resources", overwrite = !resume).rowCount
      counts("tag_attributes_v2") = GraftTable.write(
        Exporter.tagAttributes(main, cfg.exporter), s"$outDir/tag_attributes_v2",
        None, "tags").rowCount
      counts("logs_attribute_keys") = GraftTable.write(
        Exporter.attributeKeys(main), s"$outDir/logs_attribute_keys", None, "keys").rowCount
      counts("logs_resource_keys") = GraftTable.write(
        Exporter.resourceKeys(main), s"$outDir/logs_resource_keys", None, "keys").rowCount
      counts.toMap
    } finally main.unpersist()
  }
}
