package graft

import org.apache.spark.sql.functions._

import graft.model.{LogFrames, LogSchema}
import graft.operators.OttlStatements

/** The signoztransformprocessor OTTL statement surface
  * (set/delete_key/keep_keys/replace_pattern + `where`, log and resource
  * contexts), exercised with the reference's own example statements
  * (`processor/signoztransformprocessor/testdata/config.yaml:18-25`
  * log_statements).
  */
class OttlStatementsSpec extends SparkSuite {
  import spark.implicits._

  private def frame = LogFrames.withDefaults(Seq(
    ("c1", 0, "request one"),
    ("c1", 1, "request two")
  ).toDF("conv_id", "turn_idx", "body"))
    .withColumn("attributes_string",
      when($"turn_idx" === 0,
        map(lit("http.path"), lit("/animal"), lit("http.method"), lit("GET"),
          lit("extra"), lit("x")))
        .otherwise(map(lit("http.path"), lit("/other"),
          lit("http.method"), lit("POST"))))
    .withColumn("attributes_number", map(lit("latency"), lit(1.5)))

  test("reference config.yaml log_statements port end-to-end") {
    // the reference's own example block (testdata/config.yaml:18-25)
    val cfg = """{"log_statements": [
      {"context": "log", "statements": [
        "set(body, \"bear\") where attributes[\"http.path\"] == \"/animal\"",
        "keep_keys(attributes, [\"http.method\", \"http.path\"])"
      ]},
      {"context": "resource", "statements": [
        "set(attributes[\"name\"], \"bear\")"
      ]}
    ]}"""
    val out = OttlStatements.applyAll(frame, OttlStatements.fromJson(cfg))
      .orderBy("turn_idx")
      .select("body", "attributes_string", "attributes_number", "resources_string")
      .collect()
    // row 0 matched the where -> body replaced; row 1 untouched
    assert(out(0).getString(0) == "bear")
    assert(out(1).getString(0) == "request two")
    // keep_keys pruned `extra` AND the number map (latency not in the list)
    assert(out(0).getMap[String, String](1).toMap ==
      Map("http.path" -> "/animal", "http.method" -> "GET"))
    assert(out(0).getMap[String, Double](2).toMap == Map.empty)
    // resource-context set targets the resource map
    assert(out(0).getMap[String, String](3).toMap == Map("name" -> "bear"))
  }

  test("delete_key and typed set") {
    val stmts = Seq("log" -> Seq(
      """delete_key(attributes, "extra")""",
      """set(attributes["score"], 7)""",
      """set(attributes["ok"], true)"""))
    val out = OttlStatements.applyAll(frame, stmts).orderBy("turn_idx")
    val (s, n, b) = attrs(out).head
    assert(!s.contains("extra"))
    assert(n("score") == 7.0 && n("latency") == 1.5)
    assert(b("ok"))
  }

  test("replace_pattern with group references; unset targets untouched") {
    val df = LogFrames.withDefaults(Seq(
      ("c1", 0, "error code 404 here"),
      ("c2", 1, null.asInstanceOf[String])
    ).toDF("conv_id", "turn_idx", "body"))
    val out = OttlStatements.applyAll(df, Seq("log" -> Seq(
      """replace_pattern(body, "code (\\d+)", "code=[$1]")""")))
      .orderBy("turn_idx").select("body").as[String].collect()
    assert(out(0) == "error code=[404] here")
    assert(out(1) == null) // nil target -> no-op
  }

  test("set from a path value copies; nil source is a no-op") {
    val out = OttlStatements.applyAll(frame, Seq("log" -> Seq(
      """set(attributes["copied"], body)""",
      """set(attributes["missing_copy"], attributes["nope"])""")))
      .orderBy("turn_idx")
    val (s, _, _) = attrs(out).head
    assert(s("copied") == "request one")
    assert(!s.contains("missing_copy"))
  }

  test("where in resource context rewrites attribute paths to the resource map") {
    val df = frame.withColumn("resources_string",
      when($"turn_idx" === 0, map(lit("name"), lit("bear")))
        .otherwise(map().cast(LogSchema.mapSS)))
    val out = OttlStatements.applyAll(df, Seq("resource" -> Seq(
      """set(attributes["tagged"], "yes") where attributes["name"] == "bear"""")))
      .orderBy("turn_idx").select("resources_string").collect()
    assert(out(0).getMap[String, String](0).toMap ==
      Map("name" -> "bear", "tagged" -> "yes"))
    assert(!out(1).getMap[String, String](0).toMap.contains("tagged"))
  }
}
