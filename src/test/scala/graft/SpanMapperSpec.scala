package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.SpanMapper
import graft.pipeline.SpanMapper.{Group, Rule, Source}

/** Golden tests mirroring the reference spanmapper processor suite
  * (processor/signozspanmapperprocessor/processor_test.go), restated over
  * the typed-map row model, plus engine-specific typed-value cases.
  */
class SpanMapperSpec extends SparkSuite {
  import spark.implicits._

  private def frame(
      s: Map[String, String] = Map.empty,
      n: Map[String, Double] = Map.empty,
      b: Map[String, Boolean] = Map.empty,
      r: Map[String, String] = Map.empty): DataFrame =
    Seq((s, n, b, r)).toDF(
      "attributes_string", "attributes_number", "attributes_bool",
      "resources_string")

  private def row(df: DataFrame):
      (Map[String, String], Map[String, Double], Map[String, Boolean], Map[String, String]) = {
    val r = df.select("attributes_string", "attributes_number",
      "attributes_bool", "resources_string").head()
    (r.getMap[String, String](0).toMap, r.getMap[String, Double](1).toMap,
      r.getMap[String, Boolean](2).toMap, r.getMap[String, String](3).toMap)
  }

  private val llmGroup = Group("llm", attrPatterns = Seq("model"),
    resPatterns = Nil,
    rules = Seq(Rule("gen_ai.request.model", Seq(Source("llm.model")))))

  // TestEmptyConfig / TestEmptyGroups: no groups -> pass-through
  test("empty groups is a pass-through") {
    val in = frame(s = Map("llm.model" -> "gpt-4"),
      r = Map("service.name" -> "svc"))
    val (s, _, _, r) = row(SpanMapper(in, Nil))
    assert(s === Map("llm.model" -> "gpt-4"))
    assert(r === Map("service.name" -> "svc"))
  }

  // TestSubstringMatchInSpanAttrs: "model" substring gates on key names
  test("substring match in span attrs") {
    val in = frame(s = Map("llm.model" -> "gpt-4", "gen_ai.llm.model" -> "gpt-40"))
    val (s, _, _, _) = row(SpanMapper(in, Seq(llmGroup)))
    assert(s("gen_ai.request.model") === "gpt-4")
  }

  // TestSubstringMatchInResourceAttrs: resource gate + resource.-prefixed source
  test("substring match in resource attrs, resource-prefixed source") {
    val g = Group("llm", attrPatterns = Nil, resPatterns = Seq("service.name"),
      rules = Seq(Rule("gen_ai.request.model",
        Seq(Source("resource.service.name")))))
    val in = frame(r = Map("service.name" -> "my-llm-service"))
    val (s, _, _, r) = row(SpanMapper(in, Seq(g)))
    assert(s("gen_ai.request.model") === "my-llm-service")
    assert(r === Map("service.name" -> "my-llm-service"))
  }

  // TestNoMatchSkipsGroup
  test("no key containing the substring skips the group") {
    val in = frame(s = Map("some.other.key" -> "value"))
    val (s, _, _, _) = row(SpanMapper(in, Seq(llmGroup)))
    assert(!s.contains("gen_ai.request.model"))
  }

  // TestSourceFirstMatchWins / TestSourceFallsBackToSecond
  test("first existing source wins, later ones fall back") {
    val g = Group("tokens", attrPatterns = Seq("llm"), resPatterns = Nil,
      rules = Seq(Rule("gen_ai.request.tokens",
        Seq(Source("gen_ai.request_tokens"), Source("llm.tokens")))))
    val both = frame(s = Map("gen_ai.request_tokens" -> "100", "llm.tokens" -> "200"))
    assert(row(SpanMapper(both, Seq(g)))._1("gen_ai.request.tokens") === "100")
    val second = frame(s = Map("llm.tokens" -> "200"))
    assert(row(SpanMapper(second, Seq(g)))._1("gen_ai.request.tokens") === "200")
  }

  // TestPerSourceAction: move and copy honored per source
  test("per-source action: move deletes only the matching source") {
    val g = Group("mixed", attrPatterns = Seq("input"), resPatterns = Nil,
      rules = Seq(Rule("gen_ai.request.input",
        Seq(Source("gen_ai.input", move = true), Source("llm.input")))))
    val first = frame(s = Map("gen_ai.input" -> "first", "llm.input" -> "second"))
    val (s1, _, _, _) = row(SpanMapper(first, Seq(g)))
    assert(s1("gen_ai.request.input") === "first")
    assert(!s1.contains("gen_ai.input"), "matched move source must be removed")
    assert(s1("llm.input") === "second", "non-matching source untouched")

    val only = frame(s = Map("llm.input" -> "only"))
    val (s2, _, _, _) = row(SpanMapper(only, Seq(g)))
    assert(s2("gen_ai.request.input") === "only")
    assert(s2("llm.input") === "only", "copy source kept")
  }

  // TestContextResource: target lands in resource attrs only
  test("context=resource writes the target to resource attrs only") {
    val g = Group("llm", attrPatterns = Seq("llm"), resPatterns = Nil,
      rules = Seq(Rule("gen_ai.request.model", Seq(Source("llm.model")),
        toResource = true)))
    val in = frame(s = Map("llm.model" -> "gpt-4o"))
    val (s, _, _, r) = row(SpanMapper(in, Seq(g)))
    assert(r("gen_ai.request.model") === "gpt-4o")
    assert(!s.contains("gen_ai.request.model"))
  }

  // TestResourceConditionNotLeakedAcrossResources: per-row resource gate
  test("resource condition does not leak across rows") {
    val g = Group("llm", attrPatterns = Nil, resPatterns = Seq("service.name"),
      rules = Seq(Rule("gen_ai.request.model", Seq(Source("llm.model")))))
    val in = Seq(
      (Map("llm.model" -> "gpt-4"), Map("service.name" -> "my-llm-service"), 1),
      (Map("llm.model" -> "gpt-4"), Map("host.name" -> "node-1"), 2))
      .toDF("attributes_string", "resources_string", "id")
      .withColumn("attributes_number", map().cast("map<string,double>"))
      .withColumn("attributes_bool", map().cast("map<string,boolean>"))
    val out = SpanMapper(in, Seq(g)).orderBy("id")
      .select("attributes_string").as[Map[String, String]].collect()
    assert(out(0).contains("gen_ai.request.model"), "matching resource row")
    assert(!out(1).contains("gen_ai.request.model"), "non-matching resource row")
  }

  // TestLLMGroupScenario: multi-rule group end-to-end
  test("llm group scenario (reference end-to-end case)") {
    val g = Group("llm",
      attrPatterns = Seq("mode"), resPatterns = Seq("service.name"),
      rules = Seq(
        Rule("gen_ai.request.model",
          Seq(Source("gen_ai.llm.model"), Source("llm.model"),
            Source("resource.service.name")), toResource = true),
        Rule("gen_ai.request.tokens",
          Seq(Source("gen_ai.request_tokens"), Source("llm.tokens"))),
        Rule("gen_ai.request.input",
          Seq(Source("gen_ai.input", move = true),
            Source("llm.input", move = true)))))
    val in = frame(
      s = Map("llm.model" -> "gpt-4", "llm.tokens" -> "512",
        "gen_ai.input" -> "tell me a story"),
      r = Map("service.name" -> "my-llm-service"))
    val (s, _, _, r) = row(SpanMapper(in, Seq(g)))
    assert(r("gen_ai.request.model") === "gpt-4")
    assert(s("gen_ai.request.tokens") === "512")
    assert(s("gen_ai.request.input") === "tell me a story")
    assert(!s.contains("gen_ai.input"))
  }

  // Engine-specific: typed values keep their map when copied attr->attr
  test("typed source value stays in its typed map; target evicted elsewhere") {
    val g = Group("tok", attrPatterns = Seq("tokens"), resPatterns = Nil,
      rules = Seq(Rule("gen_ai.request.tokens", Seq(Source("llm.tokens")))))
    val in = frame(
      s = Map("gen_ai.request.tokens" -> "stale"),
      n = Map("llm.tokens" -> 512.0))
    val (s, n, _, _) = row(SpanMapper(in, Seq(g)))
    assert(n("gen_ai.request.tokens") === 512.0)
    assert(n("llm.tokens") === 512.0)
    assert(!s.contains("gen_ai.request.tokens"),
      "stale string-typed target must be evicted when the value lands in the number map")
  }

  // Engine-specific: number source into resource context stringifies AsString-style
  test("number source into resource context stringifies like pcommon AsString") {
    val g = Group("tok", attrPatterns = Seq("tokens"), resPatterns = Nil,
      rules = Seq(Rule("gen_ai.request.tokens", Seq(Source("llm.tokens")),
        toResource = true)))
    val in = frame(n = Map("llm.tokens" -> 512.0))
    val (_, _, _, r) = row(SpanMapper(in, Seq(g)))
    assert(r("gen_ai.request.tokens") === "512")
  }

  // Engine-specific: bool source move — value crosses to target, source removed
  test("bool source with move") {
    val g = Group("flag", attrPatterns = Seq("stream"), resPatterns = Nil,
      rules = Seq(Rule("gen_ai.request.stream",
        Seq(Source("llm.stream", move = true)))))
    val in = frame(b = Map("llm.stream" -> true))
    val (_, _, b, _) = row(SpanMapper(in, Seq(g)))
    assert(b === Map("gen_ai.request.stream" -> true))
  }

  // Sequential group semantics: a later group's ATTR gate sees the earlier
  // group's writes (reference applies groups in order over the mutated map)...
  test("later group's attribute gate sees earlier group's writes") {
    val g1 = Group("first", attrPatterns = Seq("llm"), resPatterns = Nil,
      rules = Seq(Rule("gen_ai.request.model", Seq(Source("llm.model")))))
    val g2 = Group("second", attrPatterns = Seq("gen_ai.request"), resPatterns = Nil,
      rules = Seq(Rule("seen", Seq(Source("gen_ai.request.model")))))
    val in = frame(s = Map("llm.model" -> "gpt-4"))
    val (s, _, _, _) = row(SpanMapper(in, Seq(g1, g2)))
    assert(s("seen") === "gpt-4")
  }

  // ...but a later group's RESOURCE gate is evaluated against the resource
  // attrs AS RECEIVED (reference precomputes resMatched per batch,
  // processor.go:75-80), so a resource-context write must NOT trigger it.
  test("later group's resource gate uses the as-received resource attrs") {
    val g1 = Group("first", attrPatterns = Seq("llm"), resPatterns = Nil,
      rules = Seq(Rule("written.by.first", Seq(Source("llm.model")),
        toResource = true)))
    val g2 = Group("second", attrPatterns = Nil,
      resPatterns = Seq("written.by.first"),
      rules = Seq(Rule("leaked", Seq(Source("llm.model")))))
    val in = frame(s = Map("llm.model" -> "gpt-4"))
    val (s, _, _, r) = row(SpanMapper(in, Seq(g1, g2)))
    assert(r("written.by.first") === "gpt-4")
    assert(!s.contains("leaked"),
      "group 2's resource condition must be judged on the pre-mutation resource attrs")
  }

  // Reference order-of-operations: target written, THEN move deletes the
  // source — for target == source the delete wins (processor.go:150-165).
  test("move with target == source removes the key entirely") {
    val g = Group("self", attrPatterns = Seq("llm"), resPatterns = Nil,
      rules = Seq(Rule("llm.model", Seq(Source("llm.model", move = true)))))
    val in = frame(s = Map("llm.model" -> "gpt-4", "llm.other" -> "x"))
    val (s, _, _, _) = row(SpanMapper(in, Seq(g)))
    assert(s === Map("llm.other" -> "x"))
  }

  // AnyKeyContains kernel edge cases
  test("AnyKeyContains: null map and empty substring list match nothing") {
    import graft.functions.AnyKeyContains
    val df = Seq((Map("a.b" -> "1"), 1), (null.asInstanceOf[Map[String, String]], 2))
      .toDF("m", "id")
    val hits = df.select(AnyKeyContains(col("m"), Seq("a")).as("hit"), $"id")
      .orderBy("id").as[(Boolean, Int)].collect()
    assert(hits.toSeq === Seq((true, 1), (false, 2)))
    val none = df.select(AnyKeyContains(col("m"), Nil).as("hit"))
      .as[Boolean].collect()
    assert(none.forall(_ == false))
  }
}
