package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.{Exporter, ExporterConfig, Pipeline, PipelineSpec}
import graft.sources.Transcripts

/** Structured Streaming variants of the pipeline stages.
  *
  * The reference is a push-based streaming collector; this engine's batch
  * plan is stateless per row end-to-end, so the SAME compiled pipeline
  * applies unchanged to a `readStream` DataFrame (parse -> enrich -> route
  * -> export are all projections). Only the aggregating pieces need
  * streaming-specific state handling:
  *
  *  - meter connector (`connectors/signozmeterconnector/connector.go:128-221`):
  *    group-by-dimensions count+bytes, flushed periodically as deltas ->
  *    tumbling event-time window + watermark, `update` output mode;
  *  - resource-sink dedup (rfCache, TTL 1800 s) ->
  *    `dropDuplicatesWithinWatermark` keyed (fingerprint, bucket);
  *  - late data: the reference drops rows older than an age cutoff rather
  *    than using watermarks (`exporter.go:515`) — the watermark is the
  *    Spark-native expression of the same bound.
  */
object StreamJobs {

  /** Apply the full parse->route->export chain to a streaming transcript
    * source. Stateless: works under any output mode / trigger.
    */
  def pipelineStream(transcripts: DataFrame, spec: PipelineSpec,
      cfg: ExporterConfig = ExporterConfig()): DataFrame =
    Exporter.logsV2(Pipeline.compile(spec)(Transcripts.toLogFrame(transcripts)), cfg)

  /** Meter connector: per-dimension (route, role) record counts and byte
    * sizes over tumbling windows — the delta-sum flush of the reference's
    * in-memory accumulation maps.
    */
  def meter(logsV2: DataFrame, windowLen: String = "30 minutes",
      watermarkDelay: String = "30 minutes"): DataFrame =
    logsV2
      .withColumn("event_time", timestamp_micros(expr("timestamp div 1000")))
      .withWatermark("event_time", watermarkDelay)
      .groupBy(window(col("event_time"), windowLen), col("route"), col("role"))
      .agg(count(lit(1)).as("n_records"), sum(col("record_size")).as("n_bytes"))

  /** Streaming resource sink rows with cross-batch dedup inside the
    * watermark horizon (the rfCache TTL analogue).
    */
  def resourceStream(logsV2: DataFrame, watermarkDelay: String = "30 minutes"): DataFrame =
    logsV2
      .withColumn("event_time", timestamp_micros(expr("timestamp div 1000")))
      .withWatermark("event_time", watermarkDelay)
      .select(col("labels"), col("resource_fingerprint").as("fingerprint"),
        col("ts_bucket_start").as("seen_at_ts_bucket_start"), col("event_time"))
      .dropDuplicatesWithinWatermark("fingerprint", "seen_at_ts_bucket_start")
      .drop("event_time")

  /** Probabilistic sampling policy (`signoztailsampler` evaluator semantics,
    * `processor/signoztailsampler/evaluator.go:13-80`): keep a deterministic
    * hash-fraction of groups — usable in batch and streaming alike.
    */
  def sampleByKey(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    df.filter(pmod(xxhash64(col(keyCol)), lit(10000L)) < lit((fraction * 10000).toLong))
  }
}
