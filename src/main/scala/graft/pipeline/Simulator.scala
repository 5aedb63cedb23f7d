package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.operators.{OttlStatements, PipelineConfig}

/** Pipeline-preview API — the Spark restatement of the reference's
  * `pkg/collectorsimulator` (`collectorsimulator.go` NewCollectorSimulator,
  * `logs.go` SimulateLogsProcessing, `traces.go` SimulateTracesProcessing):
  * SigNoz uses it to preview a user-edited processor chain over sample
  * data (inmemory receiver -> configured processors -> inmemory exporter).
  *
  * Spark-first restatement: the "collector service" is just the composed
  * transform chain — each processor config compiles to a `DataFrame =>
  * DataFrame` and the simulator folds the input through them in order.
  * There is no receiver/exporter lifecycle to manage (no goroutine
  * plumbing, no timeout-poll — `GetProcessedLogsFromSimulator`'s wait loop
  * exists only because the Go pipeline is asynchronous).
  *
  * Error semantics mirror the reference split:
  *  - config errors (unknown processor/operator, bad statement) fail FAST
  *    at compile, like a collector that refuses to start;
  *  - row-level errors follow each operator's own on_error semantics
  *    (the entry passes through or drops — nothing stops the batch).
  *
  * Processor `name` selects the factory like the reference's
  * `ProcessorConfig.Name` ("logstransform/test" -> the logstransform
  * factory): the prefix before "/" dispatches.
  */
object Simulator {

  /** One processor in the simulated chain: `name` = "type/instance" (the
    * reference's ProcessorConfig.Name), `configJson` = that processor's
    * config (stanza `{"operators": [...]}` for logstransform,
    * `{"log_statements"|"trace_statements": [...]}` for signoztransform).
    */
  final case class ProcessorConfig(name: String, configJson: String)

  private def processorType(name: String): String = name.takeWhile(_ != '/')

  /** Simulate logs processing through the configured chain. The output
    * keeps exactly the caller's input columns (the reference strips
    * pipeline-internal temp attrs at each processor's emitter tail,
    * `convertEntriesToPlogs`); rows a router black-holes are dropped like
    * the reference does.
    */
  def simulateLogsProcessing(processors: Seq[ProcessorConfig], input: DataFrame): DataFrame = {
    val cols = input.columns.map(col(_))
    processors.foldLeft(input) { (df, p) =>
      val out = processorType(p.name) match {
        case "logstransform" | "signozlogspipeline" =>
          Pipeline.compile(PipelineConfig.fromJson(p.configJson))(df)
        case "signoztransform" | "transform" =>
          OttlStatements.applyAll(df, OttlStatements.fromJson(p.configJson))
        case "attributes" =>
          AttributesProcessor.compile(p.configJson)(df)
        case other => throw new IllegalArgumentException(
          s"unsupported logs processor type: $other (of ${p.name})")
      }
      out.select(cols: _*)
    }
  }

  /** Simulate traces processing: signoztransform `trace_statements`
    * (span + resource contexts) over a span frame.
    */
  def simulateTracesProcessing(processors: Seq[ProcessorConfig], input: DataFrame): DataFrame = {
    val cols = input.columns.map(col(_))
    processors.foldLeft(input) { (df, p) =>
      val out = processorType(p.name) match {
        case "signoztransform" | "transform" =>
          OttlStatements.applyAll(df,
            OttlStatements.fromJson(p.configJson, "trace_statements"))
        case "attributes" =>
          AttributesProcessor.compile(p.configJson)(df)
        case other => throw new IllegalArgumentException(
          s"unsupported traces processor type: $other (of ${p.name})")
      }
      out.select(cols: _*)
    }
  }
}
