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

  // ---- upstream standard-library editors (ottlfuncs.StandardFuncs, the
  // full set the processor registers — internal/logs/functions.go:28) ----

  test("delete_matching_keys / keep_matching_keys: unanchored key regex " +
      "across the typed maps") {
    val del = OttlStatements.applyAll(frame, Seq("log" -> Seq(
      """delete_matching_keys(attributes, "^http")"""))).orderBy("turn_idx")
    val (s, n, _) = attrs(del).head
    assert(s.keySet == Set("extra"))
    assert(n.keySet == Set("latency")) // regex didn't match the number key
    val keep = OttlStatements.applyAll(frame, Seq("log" -> Seq(
      """keep_matching_keys(attributes, "^http")"""))).orderBy("turn_idx")
    val (s2, n2, _) = attrs(keep).head
    assert(s2.keySet == Set("http.path", "http.method"))
    assert(n2.isEmpty)
  }

  test("truncate_all cuts string values only; limit enforces a joint budget " +
      "with priority keys") {
    val t = OttlStatements.applyAll(frame, Seq("log" -> Seq(
      """truncate_all(attributes, 3)"""))).orderBy("turn_idx")
    val (s, n, _) = attrs(t).head
    assert(s("http.path") == "/an" && s("http.method") == "GET" && s("extra") == "x")
    assert(n("latency") == 1.5) // numbers pass through

    // row 0 has 4 attrs across the maps (3 strings + 1 number); keep 2 with
    // `latency` protected -> latency + the first string in stored order
    val l = OttlStatements.applyAll(frame, Seq("log" -> Seq(
      """limit(attributes, 2, ["latency"])"""))).orderBy("turn_idx")
    val (ls, ln, lb) = attrs(l).head
    assert(ln.keySet == Set("latency"))
    assert(ls.size + ln.size + lb.size == 2)
    // a generous budget is a no-op
    val noop = OttlStatements.applyAll(frame, Seq("log" -> Seq(
      """limit(attributes, 10, [])"""))).orderBy("turn_idx")
    val (ns, nn, _) = attrs(noop).head
    assert(ns.size == 3 && nn.size == 1)
  }

  test("replace_all_patterns: value mode rewrites string values with group " +
      "refs, key mode renames keys everywhere") {
    val v = OttlStatements.applyAll(frame, Seq("log" -> Seq(
      """replace_all_patterns(attributes, "value", "^/(\\w+)$", "path:$1")""")))
      .orderBy("turn_idx")
    val (vs, _, _) = attrs(v).head
    assert(vs("http.path") == "path:animal" && vs("http.method") == "GET")

    val k = OttlStatements.applyAll(frame, Seq("log" -> Seq(
      """replace_all_patterns(attributes, "key", "^http\\.", "h_")""")))
      .orderBy("turn_idx")
    val (ks, kn, _) = attrs(k).head
    assert(ks.keySet == Set("h_path", "h_method", "extra"))
    assert(kn.keySet == Set("latency"))
  }

  test("replace_match / replace_all_matches: whole-value glob semantics") {
    val m = OttlStatements.applyAll(frame, Seq("log" -> Seq(
      """replace_match(attributes["http.path"], "/anim*", "/masked")""",
      """replace_match(attributes["http.method"], "/anim*", "/nope")""")))
      .orderBy("turn_idx")
    val (ms, _, _) = attrs(m).head
    assert(ms("http.path") == "/masked")
    assert(ms("http.method") == "GET") // glob did not match -> untouched

    val all = OttlStatements.applyAll(frame, Seq("log" -> Seq(
      """replace_all_matches(attributes, "/anim*", "/masked")""")))
      .orderBy("turn_idx")
    val (as2, _, _) = attrs(all).head
    assert(as2("http.path") == "/masked" && as2("extra") == "x")
  }

  test("converter calls in set value position: Concat/Int/Double/Len/" +
      "Substring/ConvertCase/SHA256/IsMatch") {
    val out = OttlStatements.applyAll(frame, Seq("log" -> Seq(
      """set(attributes["joined"], Concat([attributes["http.method"], attributes["http.path"]], "-"))""",
      """set(attributes["n"], Int("42"))""",
      """set(attributes["d"], Double("2.5"))""",
      """set(attributes["len"], Len(body))""",
      """set(attributes["sub"], Substring(attributes["http.path"], 1, 4))""",
      """set(attributes["up"], ConvertCase(attributes["http.method"], "lower"))""",
      """set(attributes["is"], IsMatch(attributes["http.path"], "^/an"))""",
      """set(attributes["sha"], SHA256("a"))"""))).orderBy("turn_idx")
    val (s, n, b) = attrs(out).head
    assert(s("joined") == "GET-/animal")
    assert(n("n") == 42.0 && n("d") == 2.5)
    assert(n("len") == "request one".length.toDouble)
    assert(s("sub") == "anim")
    assert(s("up") == "get")
    assert(b("is"))
    // sha256("a"), the well-known public vector
    assert(s("sha") ==
      "ca978112ca1bbdcafac231b39a23dc4da786eff8147c4e72b9807785afee48bb")
    // unknown converters fail at compile
    intercept[IllegalArgumentException] {
      OttlStatements.applyAll(frame, Seq("log" -> Seq(
        """set(attributes["x"], Reverse(body))""")))
    }
  }
}
