package graft

import org.apache.spark.sql.DataFrame

import graft.pipeline.LlmPricing
import graft.pipeline.LlmPricing._

/** Golden tests mirroring the reference LLM-pricing processor suite
  * (processor/signozllmpricingprocessor/processor_test.go — every compute
  * comment's expected value), restated over the typed-map row model.
  */
class LlmPricingSpec extends SparkSuite {
  import spark.implicits._

  // processor_test.go testCfg
  private val cfg = Config(
    attrs = AttrMapping(
      model = "gen_ai.request.model",
      in = "gen_ai.usage.input_tokens",
      out = "gen_ai.usage.output_tokens",
      cacheRead = "gen_ai.usage.cache_read_tokens",
      cacheWrite = "gen_ai.usage.cache_write_tokens"),
    rules = Seq(
      Rule("gpt-4o", Seq("gpt-4o*"), CacheCfg(CacheModeSubtract, read = 2.5), in = 5.0, out = 15.0),
      Rule("claude", Seq("claude-*"), CacheCfg(CacheModeAdditive, read = 0.30, write = 3.75),
        in = 3.0, out = 15.0)),
    outputAttrs = OutputMapping(
      in = "_signoz.gen_ai.cost_input",
      out = "_signoz.gen_ai.cost_output",
      cacheRead = "_signoz.gen_ai.cost_cache_read",
      cacheWrite = "_signoz.gen_ai.cost_cache_write",
      total = "_signoz.gen_ai.total_cost"))

  private def frame(model: Option[String], nums: Map[String, Double]): DataFrame =
    Seq((model.map(m => Map("gen_ai.request.model" -> m)).getOrElse(Map.empty[String, String]),
      nums)).toDF("attributes_string", "attributes_number")

  private def costs(df: DataFrame): Map[String, Double] =
    df.head().getMap[String, Double](df.columns.indexOf("attributes_number")).toMap

  private def approx(m: Map[String, Double], key: String, v: Double): Unit = {
    assert(m.contains(key), s"expected $key present in $m")
    assert(math.abs(m(key) - v) < 1e-9, s"$key: got ${m(key)}, want $v")
  }

  test("subtract mode, no caching") {
    val out = costs(LlmPricing(frame(Some("gpt-4o"),
      Map("gen_ai.usage.input_tokens" -> 1000, "gen_ai.usage.output_tokens" -> 500)), cfg))
    approx(out, "_signoz.gen_ai.cost_input", 0.005)
    approx(out, "_signoz.gen_ai.cost_output", 0.0075)
    approx(out, "_signoz.gen_ai.cost_cache_read", 0.0)
    approx(out, "_signoz.gen_ai.cost_cache_write", 0.0)
    approx(out, "_signoz.gen_ai.total_cost", 0.0125)
  }

  test("subtract mode with cache read (billed_input = in - cache_read)") {
    val out = costs(LlmPricing(frame(Some("gpt-4o-mini"),
      Map("gen_ai.usage.input_tokens" -> 1000, "gen_ai.usage.output_tokens" -> 500,
        "gen_ai.usage.cache_read_tokens" -> 200)), cfg))
    approx(out, "_signoz.gen_ai.cost_input", 0.004)
    approx(out, "_signoz.gen_ai.cost_cache_read", 0.0005)
    approx(out, "_signoz.gen_ai.cost_output", 0.0075)
    approx(out, "_signoz.gen_ai.total_cost", 0.012)
  }

  test("subtract mode: cache_read exceeding input clamps billed input to 0") {
    val out = costs(LlmPricing(frame(Some("gpt-4o"),
      Map("gen_ai.usage.input_tokens" -> 100, "gen_ai.usage.output_tokens" -> 200,
        "gen_ai.usage.cache_read_tokens" -> 500)), cfg))
    approx(out, "_signoz.gen_ai.cost_input", 0.0)
    approx(out, "_signoz.gen_ai.cost_cache_read", 500 * 2.5 / 1e6)
  }

  test("additive mode bills all four buckets") {
    val out = costs(LlmPricing(frame(Some("claude-3-5-sonnet"),
      Map("gen_ai.usage.input_tokens" -> 1000, "gen_ai.usage.output_tokens" -> 500,
        "gen_ai.usage.cache_read_tokens" -> 200, "gen_ai.usage.cache_write_tokens" -> 100)), cfg))
    approx(out, "_signoz.gen_ai.cost_input", 0.003)
    approx(out, "_signoz.gen_ai.cost_output", 0.0075)
    approx(out, "_signoz.gen_ai.cost_cache_read", 0.00006)
    approx(out, "_signoz.gen_ai.cost_cache_write", 0.000375)
    approx(out, "_signoz.gen_ai.total_cost", 0.010935)
  }

  test("additive mode, no caching") {
    val out = costs(LlmPricing(frame(Some("claude-3-haiku"),
      Map("gen_ai.usage.input_tokens" -> 2000, "gen_ai.usage.output_tokens" -> 1000)), cfg))
    approx(out, "_signoz.gen_ai.cost_input", 2000 * 3.0 / 1e6)
    approx(out, "_signoz.gen_ai.cost_output", 1000 * 15.0 / 1e6)
    approx(out, "_signoz.gen_ai.total_cost", 2000 * 3.0 / 1e6 + 1000 * 15.0 / 1e6)
  }

  test("first matching flattened pattern wins") {
    val withCatchAll = cfg.copy(rules = cfg.rules :+
      Rule("fallback", Seq("*"), CacheCfg(), in = 100.0, out = 100.0))
    val out = costs(LlmPricing(frame(Some("gpt-4o-2024-11-20"),
      Map("gen_ai.usage.input_tokens" -> 1000, "gen_ai.usage.output_tokens" -> 0)), withCatchAll))
    approx(out, "_signoz.gen_ai.cost_input", 1000 * 5.0 / 1e6)
  }

  test("no matching rule skips the span (nothing written)") {
    val out = costs(LlmPricing(frame(Some("unknown-model-xyz"),
      Map("gen_ai.usage.input_tokens" -> 1000, "gen_ai.usage.output_tokens" -> 500)), cfg))
    assert(!out.contains("_signoz.gen_ai.total_cost"))
  }

  test("no model attribute skips the span") {
    val out = costs(LlmPricing(frame(None,
      Map("gen_ai.usage.input_tokens" -> 1000, "gen_ai.usage.output_tokens" -> 500)), cfg))
    assert(!out.contains("_signoz.gen_ai.total_cost"))
  }

  test("all token counts zero skips the span") {
    val out = costs(LlmPricing(frame(Some("gpt-4o"), Map.empty), cfg))
    assert(!out.contains("_signoz.gen_ai.total_cost"))
  }

  test("empty output keys are not written; total alone works") {
    val totalOnly = cfg.copy(outputAttrs = OutputMapping(total = "_signoz.gen_ai.total_cost"))
    val out = costs(LlmPricing(frame(Some("gpt-4o"),
      Map("gen_ai.usage.input_tokens" -> 1000, "gen_ai.usage.output_tokens" -> 500)), totalOnly))
    assert(!out.contains("_signoz.gen_ai.cost_input"))
    approx(out, "_signoz.gen_ai.total_cost", 0.0125)
  }

  test("empty cache mode bills input as-is and no cache buckets") {
    val plain = cfg.copy(rules = Seq(
      Rule("gpt-4o", Seq("gpt-4o*"), CacheCfg(), in = 5.0, out = 15.0)))
    val out = costs(LlmPricing(frame(Some("gpt-4o"),
      Map("gen_ai.usage.input_tokens" -> 1000, "gen_ai.usage.output_tokens" -> 500,
        "gen_ai.usage.cache_read_tokens" -> 200, "gen_ai.usage.cache_write_tokens" -> 100)), plain))
    approx(out, "_signoz.gen_ai.cost_input", 1000 * 5.0 / 1e6)
    approx(out, "_signoz.gen_ai.cost_cache_read", 0.0)
    approx(out, "_signoz.gen_ai.cost_cache_write", 0.0)
    approx(out, "_signoz.gen_ai.total_cost", 1000 * 5.0 / 1e6 + 500 * 15.0 / 1e6)
  }

  test("pre-existing attributes survive and cost keys overwrite") {
    val in = Seq((Map("gen_ai.request.model" -> "gpt-4o", "other" -> "x"),
      Map("gen_ai.usage.input_tokens" -> 1000.0, "keepme" -> 7.0,
        "_signoz.gen_ai.total_cost" -> 99.0)))
      .toDF("attributes_string", "attributes_number")
    val out = costs(LlmPricing(in, cfg))
    assert(out("keepme") == 7.0)
    approx(out, "_signoz.gen_ai.total_cost", 0.005)
  }

  // testdata/config.yaml: the full valid entry loads; each invalid entry fails
  test("config loader: reference testdata config and Validate parity") {
    val full = LlmPricing.fromJson(
      """{"attrs":{"model":"gen_ai.request.model","in":"gen_ai.usage.input_tokens",
        |"out":"gen_ai.usage.output_tokens","cache_read":"gen_ai.usage.input_token_details.cached",
        |"cache_write":"gen_ai.usage.input_token_details.cache_creation"},
        |"default_pricing":{"rules":[
        |{"name":"gpt-4o","pattern":["gpt-4o*"],"cache":{"mode":"subtract","read":2.5,"write":0.0},"in":5.0,"out":15.0},
        |{"name":"claude","pattern":["claude-*"],"cache":{"mode":"additive","read":0.30,"write":3.75},"in":3.0,"out":15.0}]},
        |"output_attrs":{"in":"_signoz.gen_ai.cost_input","out":"_signoz.gen_ai.cost_output",
        |"cache_read":"_signoz.gen_ai.cost_cache_read","cache_write":"_signoz.gen_ai.cost_cache_write",
        |"total":"_signoz.gen_ai.total_cost"}}""".stripMargin)
    assert(full.rules.map(_.name) == Seq("gpt-4o", "claude"))
    assert(full.rules(1).cache.mode == CacheModeAdditive)

    def fails(json: String, msgPart: String): Unit = {
      val e = intercept[IllegalArgumentException](LlmPricing.fromJson(json))
      assert(e.getMessage.contains(msgPart), s"got: ${e.getMessage}")
    }
    // no_model_attr
    fails("""{"attrs":{"model":""},"default_pricing":{"rules":[{"pattern":["*"],"in":1.0,"out":2.0}]},
      |"output_attrs":{"total":"t"}}""".stripMargin, "attrs.model")
    // no_pattern
    fails("""{"attrs":{"model":"m"},"default_pricing":{"rules":[{"pattern":[],"in":1.0,"out":2.0}]},
      |"output_attrs":{"total":"t"}}""".stripMargin, "pattern must not be empty")
    // bad_cache_mode
    fails("""{"attrs":{"model":"m"},"default_pricing":{"rules":[{"pattern":["*"],
      |"cache":{"mode":"unknown"},"in":1.0,"out":2.0}]},
      |"output_attrs":{"total":"t"}}""".stripMargin, "cache.mode")
    // no_total_output
    fails("""{"attrs":{"model":"m"},"default_pricing":{"rules":[{"pattern":["*"],"in":1.0,"out":2.0}]},
      |"output_attrs":{"total":""}}""".stripMargin, "output_attrs.total")
  }

  test("token counts stored as non-integer doubles work (TestTokenAsFloat)") {
    val out = costs(LlmPricing(frame(Some("gpt-4o"),
      Map("gen_ai.usage.input_tokens" -> 500.0, "gen_ai.usage.output_tokens" -> 250.0)), cfg))
    approx(out, "_signoz.gen_ai.cost_input", 500 * 5.0 / 1e6)
  }
}
