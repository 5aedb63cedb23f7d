package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.LogFrames
import graft.operators._
import graft.pipeline.{Pipeline, PipelineSpec}

/** The driver-checked query registry: each entry exercises one engine
  * operator over the shared testdata tables, with a DuckDB-equivalent oracle
  * in [[Queries.oracles]]. Column names are aligned between both sides.
  */
object Queries {

  private def read(spark: SparkSession, dir: String, table: String): DataFrame =
    spark.read.parquet(s"$dir/$table.parquet")

  /** events table lifted into LogRow shape: props string is the body,
    * event_type/value become typed attributes.
    */
  private def eventsAsLogs(spark: SparkSession, dir: String): DataFrame = {
    SparkEntry.configure(spark)
    val ev = read(spark, dir, "events")
    LogFrames.withDefaults(
      ev.select(
        col("event_id"),
        col("ts"),
        col("props").as("body"),
        map(lit("event_type"), col("event_type")).as("attributes_string"),
        map(lit("value"), col("value")).as("attributes_number")))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // router: ordered first-match-wins routing (SURVEY §2.1 #8)
    "q_router" -> ((s, d) => {
      val logs = eventsAsLogs(s, d)
      val spec = PipelineSpec(Seq(
        RouterOp(Common("router"), Seq(
          Route("attributes.event_type == \"error\"", Seq("errors")),
          Route("attributes.value > 100", Seq("high_value"))
        ), default = Seq("noop")),
        NoopOp(Common("errors")),
        NoopOp(Common("high_value")),
        NoopOp(Common("noop"))
      ))
      Pipeline.compile(spec)(logs)
        .groupBy(col("route")).agg(count(lit(1)).as("n"))
    }),

    // regex_parser: named-group extraction (SURVEY §2.1 #1)
    "q_regex_parser" -> ((s, d) => {
      val logs = eventsAsLogs(s, d)
      val spec = PipelineSpec(Seq(
        RegexParserOp(Common("re"), "\"k\": (?P<kval>[0-9]+)"),
        NoopOp(Common("noop"))
      ))
      Pipeline.compile(spec)(logs)
        .select(col("event_id"), col("attributes_string").getItem("kval").as("kval"))
    }),

    // severity_parser: alias mapping + canonical text (SURVEY §2.1 #9)
    "q_severity_parser" -> ((s, d) => {
      val logs = eventsAsLogs(s, d)
      val spec = PipelineSpec(Seq(
        SeverityParserOp(Common("sev"), SeveritySpec(
          FieldRef.Attr(Seq("event_type")), overwriteText = true,
          mapping = Seq(
            "error" -> Seq(graft.functions.Severity.Str("error")),
            "info" -> Seq(graft.functions.Severity.Str("signup"),
              graft.functions.Severity.Str("purchase")),
            "debug" -> Seq(graft.functions.Severity.Str("click"),
              graft.functions.Severity.Str("view"))))),
        NoopOp(Common("noop"))
      ))
      Pipeline.compile(spec)(logs)
        .groupBy(col("severity_text"), col("severity_number"))
        .agg(count(lit(1)).as("n"))
    }),

    // json_parser: body JSON -> typed attributes (SURVEY §2.1 #3)
    "q_json_parser" -> ((s, d) => {
      val logs = eventsAsLogs(s, d)
      val spec = PipelineSpec(Seq(
        JsonParserOp(Common("json")),
        NoopOp(Common("noop"))
      ))
      Pipeline.compile(spec)(logs)
        .select(col("event_id"),
          col("attributes_number").getItem("k").cast("long").as("kval"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_router" ->
      """SELECT CASE WHEN event_type = 'error' THEN 'errors'
        |            WHEN value > 100 THEN 'high_value'
        |            ELSE 'noop' END AS route,
        |       count(*) AS n
        |FROM events GROUP BY 1""".stripMargin,
    "q_regex_parser" ->
      """SELECT event_id, regexp_extract(props, '"k": ([0-9]+)', 1) AS kval
        |FROM events""".stripMargin,
    "q_severity_parser" ->
      """SELECT CASE event_type WHEN 'error' THEN 'ERROR'
        |                       WHEN 'signup' THEN 'INFO' WHEN 'purchase' THEN 'INFO'
        |                       ELSE 'DEBUG' END AS severity_text,
        |       CASE event_type WHEN 'error' THEN 17
        |                       WHEN 'signup' THEN 9 WHEN 'purchase' THEN 9
        |                       ELSE 5 END AS severity_number,
        |       count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_json_parser" ->
      """SELECT event_id, CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS kval
        |FROM events""".stripMargin
  )
}
