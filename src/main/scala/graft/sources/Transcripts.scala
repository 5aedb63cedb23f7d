package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.LogSchema

/** Deterministic synthetic transcript source + the transcript -> LogRow
  * adapter.
  *
  * The input table shape is fixed by BASELINE.json's `input_hint`:
  * `(conv_id string, turn_idx int, role string, text string, tool string,
  * ts timestamp)`. The generator is pure column arithmetic over
  * `spark.range` — seeded, fully distributed (no driver-side state, no RDD),
  * so the same (seed, nConvs) always produces identical rows at any
  * parallelism, and generation scales to arbitrarily many conversations.
  *
  * Text payload shapes and their mix mirror the reference's own test corpus
  * (FIXTURES.md §1): hotrod tab-separated lines
  * (`processor_test.go:309`), JSON bodies, `a=aval;b=bval` kv text,
  * `status: NNN` grok-able lines, and free text. Conversation sizes are
  * Pareto/Zipf-skewed so hot conversations exercise the salting path.
  */
object Transcripts {

  /** Generate `nConvs` conversations. Row count ~= nConvs * E[size]
    * (E[size] ~ 6 at the default cap).
    */
  def generate(spark: SparkSession, nConvs: Long, seed: Long = 42L,
      maxTurns: Int = 512): DataFrame = {
    val conv = spark.range(nConvs).withColumnRenamed("id", "conv_n")
    // u in (0,1]; Pareto(alpha=1.2) sizes capped at maxTurns
    val u = (pmod(xxhash64(col("conv_n"), lit(seed)), lit(1000000L)) + lit(1.0)) / lit(1000001.0)
    val size = least(lit(maxTurns),
      greatest(lit(1), floor(pow(u, lit(-1.0 / 1.2))))).cast("int")
    val convs = conv
      .withColumn("conv_id", concat(lit("conv-"), lpad(col("conv_n").cast("string"), 10, "0")))
      .withColumn("n_turns", size)
      .withColumn("turn_idx", explode(sequence(lit(0), col("n_turns") - 1)))

    val h = xxhash64(col("conv_id"), col("turn_idx"), lit(seed))
    val shape = pmod(h, lit(100L))
    val hHex = graft.functions.FastLower(hex(h)) // deterministic hex material
    val level = element_at(
      typedlit(Map(0 -> "INFO", 1 -> "WARN", 2 -> "ERROR", 3 -> "DEBUG", 4 -> "INFO")),
      pmod(h, lit(5L)).cast("int"))
    val service = element_at(
      typedlit(Map(0 -> "driver", 1 -> "frontend", 2 -> "route", 3 -> "customer")),
      pmod(xxhash64(col("conv_id"), lit(seed + 1)), lit(4L)).cast("int"))
    val retryNo = pmod(h, lit(9L)) + 1
    val statusCode = element_at(
      typedlit(Map(0 -> 200, 1 -> 200, 2 -> 301, 3 -> 404, 4 -> 500)),
      pmod(h, lit(5L)).cast("int"))

    // shape 0-29: hotrod tab-separated line with embedded JSON tail
    val tsIso = date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
    val hotrod = concat(
      tsIso, lit("\t"), level, lit("\t"), service, lit("/server.go:85"),
      lit("\tRetrying GetDriver after error\t"),
      lit("{\"service\":\""), service,
      lit("\",\"trace_id\":\""), substring(hHex, 1, 16),
      lit("\",\"span_id\":\""), substring(concat(hHex, hHex), 3, 16),
      lit("\",\"retry_no\":"), retryNo,
      lit(",\"error\":\"redis timeout\"}"))
    // shape 30-54: plain JSON body
    val jsonBody = concat(
      lit("{\"status\": "), statusCode,
      lit(", \"request\": {\"id\": \"req-"), substring(hHex, 1, 8),
      lit("\"}, \"msg\": \"handled\"}"))
    // shape 55-69: kv text
    val kvBody = concat(lit("a="), substring(hHex, 1, 4), lit(";b="), substring(hHex, 5, 4))
    // shape 70-84: grok-able status line
    val statusBody = concat(lit("status: "), statusCode)
    // shape 85-99: free text
    val freeBody = concat(lit("test log "), substring(hHex, 1, 6))

    val role = when(pmod(h, lit(7L)) === 0, "tool")
      .when(col("turn_idx") % 2 === 0, "user")
      .otherwise("assistant")
    val tool = when(pmod(h, lit(7L)) === 0,
      element_at(typedlit(Map(0 -> "search", 1 -> "bash", 2 -> "browser")),
        pmod(h, lit(3L)).cast("int")))
      .otherwise(lit(""))

    convs
      .withColumn("ts", timestamp_micros(
        lit(1704067200000000L) + // 2024-01-01T00:00:00Z
          pmod(xxhash64(col("conv_id")), lit(86400L * 30)) * 1000000L +
          col("turn_idx").cast("long") * 30000000L))
      .withColumn("role", role)
      .withColumn("tool", tool)
      .withColumn("text",
        when(shape < 30, hotrod)
          .when(shape < 55, jsonBody)
          .when(shape < 70, kvBody)
          .when(shape < 85, statusBody)
          .otherwise(freeBody))
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
  }

  /** Adapt a transcript table to the pipeline's LogRow columns.
    *
    * `text` plays the part of the log body; `role` becomes a resource label
    * (the dimension the reference groups resources by) and a non-empty
    * `tool` becomes a string attribute. Timestamps are nanoseconds like
    * OTLP's `LogRecord.Timestamp`.
    */
  def toLogFrame(transcripts: DataFrame): DataFrame = {
    transcripts
      .withColumn("timestamp", unix_micros(col("ts")) * 1000L)
      .withColumn("observed_timestamp", unix_micros(col("ts")) * 1000L)
      .withColumn("severity_number", lit(0))
      .withColumn("severity_text", lit(""))
      .withColumn("body", col("text"))
      .withColumn("attributes_string",
        when(col("tool").isNotNull && col("tool") =!= "", map(lit("tool"), col("tool")))
          .otherwise(map().cast(LogSchema.mapSS)))
      .withColumn("attributes_number", map().cast(LogSchema.mapSD))
      .withColumn("attributes_bool", map().cast(LogSchema.mapSB))
      .withColumn("resources_string", map(lit("role"), col("role")))
      .withColumn("trace_id", lit(""))
      .withColumn("span_id", lit(""))
      .withColumn("trace_flags", lit(0))
      .withColumn("scope_name", lit(""))
      .withColumn("scope_version", lit(""))
      .withColumn("scope_string", map().cast(graft.model.LogSchema.mapSS))
      .drop("ts", "text")
  }
}
