package graft

import org.apache.spark.sql.functions._

import graft.functions.{JsonPathTypes, JsonPathTypesKernel, KeyCheck}
import graft.model.LogFrames
import graft.pipeline.Metadata

/** Ports the metadataexporter json walker's own tests
  * (exporter/metadataexporter/json_writer_test.go TestWalk_EndToEndTypes +
  * TestWalk_InferArrayMask) against [[JsonPathTypes]].
  */
class JsonPathTypesSpec extends SparkSuite {
  import spark.implicits._

  private def walk(json: String, maxDepth: Int = 100, maxArr: Int = 100,
      maxKeys: Int = 1024): Map[String, Set[String]] =
    JsonPathTypesKernel.walk(
      org.apache.spark.unsafe.types.UTF8String.fromString(json),
      maxDepth, maxArr, maxKeys)
      .groupBy(_._1).map { case (p, ts) => p -> ts.map(_._2).toSet }

  private val fullInput =
    """{
      | "_p":"F",
      | "array_objects":[{"a":"Processing event"},{"x.y":false},{"p":{"q":65}},
      |   {"nested":[{"inside_a":0.4986468944784865},{"inside_b":"I am String"},{"inside_a":false}],
      |    "inbox":["hello",4.5669]}],
      | "array_objects_and_primitives":["Error sending abc webhooks",
      |   {"x":"y","nested":[{"message":"hello","number":4.5669},"hello",4.5669,false]}],
      | "array_primitives_mixed":[10,"Webhook sent",false,0.9155561531002926,"hello"],
      | "array_primitives_same_type":[69,8,18,90,100],
      | "sage":{"number":"failed450"},
      | "created_by":"piyushsingariya",
      | "details":{"game":{"is_game":"false","marked_favourite":true,"play_time_hours":5.5,
      |   "beta-tester":true,
      |   "metadata":{"installation_path":"/opt/games/witcher3",
      |     "drm":{"hash_check_status":"success","malformed_hardware":false,"running":false,
      |       "version":"patch_v1.101.0"},
      |     "version":"v0.0.3"}},
      |  "uninstall":true},
      | "docker":["container_1","container_8"],
      | "kubernetes":{"container_image":"some-image","container_name":"witcher2-0000-01",
      |   "docker_id":"10fe04f01bb9d2ba","host":"ip-42-96-24-40.ap-south-1.compute.internal",
      |   "namespace_name":"prod","pod_id":"1feea36b1ff05767","pod_name":"aws-integration-agent-00-1"},
      | "log":"{\"level\":\"INFO\",\"target\":\"amzn_nfm::events::3rdevent_provider_ebpf\"}",
      | "log_processed":{"level":"DEBUG","message":"Processing event",
      |   "target":"amzn_nfm::events::event_provider_ebpf","timestamp":"1753769510807"},
      | "message":"under valorant 3",
      | "stream":"stdout",
      | "uninstall":false
      |}""".stripMargin

  test("message_skip: message map records as string, dotted message.* key skipped") {
    assert(walk("""{"message":{"level":"info"},"test":"value"}""", maxDepth = 2, maxArr = 4) ==
      Map("message" -> Set("string"), "test" -> Set("string")))
    assert(walk("""{"message.level":"info","test":"value"}""", maxDepth = 2, maxArr = 4) ==
      Map("test" -> Set("string")))
  }

  test("simple_datatype_test") {
    assert(walk("""{"string":["hello"],"int":123,"float":123.456,"bool":[true]}""",
      maxDepth = 2, maxArr = 4) == Map(
      "string" -> Set("[]string"), "int" -> Set("int64"),
      "float" -> Set("float64"), "bool" -> Set("[]bool")))
  }

  test("full_test: all 31 paths with type accumulation (json_writer_test.go)") {
    val got = walk(fullInput, maxDepth = 100, maxArr = 5)
    val expected = Map(
      "_p" -> Set("string"),
      "array_objects" -> Set("[]json"),
      "array_objects[].a" -> Set("string"),
      "array_objects[].x.y" -> Set("bool"),
      "array_objects[].p.q" -> Set("int64"),
      "array_objects[].nested" -> Set("[]json"),
      "array_objects[].nested[].inside_a" -> Set("bool", "float64"),
      "array_objects[].nested[].inside_b" -> Set("string"),
      "array_objects[].inbox" -> Set("[]dynamic"),
      "array_objects_and_primitives" -> Set("[]dynamic"),
      "array_objects_and_primitives[].x" -> Set("string"),
      "array_objects_and_primitives[].nested" -> Set("[]dynamic"),
      "array_objects_and_primitives[].nested[].message" -> Set("string"),
      "array_objects_and_primitives[].nested[].number" -> Set("float64"),
      "array_primitives_mixed" -> Set("[]dynamic"),
      "array_primitives_same_type" -> Set("[]int64"),
      "sage.number" -> Set("string"),
      "created_by" -> Set("string"),
      "details.game.beta-tester" -> Set("bool"),
      "details.game.is_game" -> Set("string"),
      "details.game.marked_favourite" -> Set("bool"),
      "details.game.play_time_hours" -> Set("float64"),
      "details.game.metadata.installation_path" -> Set("string"),
      "details.game.metadata.drm.hash_check_status" -> Set("string"),
      "details.game.metadata.drm.malformed_hardware" -> Set("bool"),
      "details.game.metadata.drm.running" -> Set("bool"),
      "details.game.metadata.drm.version" -> Set("string"),
      "details.game.metadata.version" -> Set("string"),
      "details.uninstall" -> Set("bool"),
      "docker" -> Set("[]string"),
      "kubernetes.container_image" -> Set("string"),
      "kubernetes.container_name" -> Set("string"),
      "kubernetes.docker_id" -> Set("string"),
      "kubernetes.host" -> Set("string"),
      "kubernetes.namespace_name" -> Set("string"),
      "kubernetes.pod_id" -> Set("string"),
      "kubernetes.pod_name" -> Set("string"),
      "log" -> Set("string"),
      "log_processed.level" -> Set("string"),
      "log_processed.message" -> Set("string"),
      "log_processed.target" -> Set("string"),
      "log_processed.timestamp" -> Set("string"),
      "message" -> Set("string"),
      "stream" -> Set("string"),
      "uninstall" -> Set("bool"))
    assert(got == expected)
  }

  test("max_depth_traverse_test: depth 2 drops deep containers, keeps primitives") {
    val got = walk(fullInput, maxDepth = 2, maxArr = 4)
    assert(got.keySet == Set(
      "_p", "array_objects", "array_objects[].a", "array_objects[].x.y",
      "array_objects_and_primitives", "array_objects_and_primitives[].x",
      "created_by", "details.uninstall", "docker",
      "kubernetes.container_image", "kubernetes.container_name",
      "kubernetes.docker_id", "kubernetes.host", "kubernetes.namespace_name",
      "kubernetes.pod_id", "kubernetes.pod_name", "log",
      "log_processed.level", "log_processed.message", "log_processed.target",
      "log_processed.timestamp", "message", "sage.number", "stream", "uninstall"))
    assert(got("array_objects") == Set("[]json"))
    assert(got("array_objects_and_primitives") == Set("[]dynamic"))
    assert(got("docker") == Set("[]string"))
  }

  test("inferArrayMask matrix (TestWalk_InferArrayMask)") {
    def arrType(json: String): String =
      walk(s"""{"a":$json}""").getOrElse("a", Set.empty).headOption.orNull
    assert(arrType("[true,false]") == "[]bool")
    assert(arrType("[1,2.5]") == "[]float64")            // int+float -> float
    assert(arrType("[1,true]") == "[]int64")             // int+bool -> int
    assert(arrType("[true,2.5]") == "[]float64")         // bool+float -> float
    assert(arrType("""["s",1]""") == "[]dynamic")
    assert(arrType("""["s",true]""") == "[]dynamic")
    assert(arrType("""["s"]""") == "[]string")
    assert(arrType("""[{"k":1}]""") == "[]json")
    assert(arrType("""[{"k":1},2]""") == "[]dynamic")
    assert(arrType("""[{"k":1},"s"]""") == "[]dynamic")
    assert(arrType("[1,1]") == "[]int64")
    assert(arrType("""["a","b"]""") == "[]string")
    // nested array voids the whole array type
    assert(walk("""{"alphabets":["a","b",["c","d"]]}""").isEmpty)
    // empty / oversized arrays skipped
    assert(walk("""{"a":[]}""").isEmpty)
    assert(walk("""{"a":[1,2,3]}""", maxArr = 2).isEmpty)
  }

  test("cardinal map keys are skipped (keycheck.IsCardinal)") {
    assert(KeyCheck.isCardinal("deadbeefdeadbeef"))
    assert(KeyCheck.isCardinal("550e8400-e29b-41d4-a716-446655440000"))
    assert(KeyCheck.isCardinal("has space"))
    assert(!KeyCheck.isCardinal("pod_name"))
    assert(walk("""{"deadbeefdeadbeef":"x","ok":"y"}""") == Map("ok" -> Set("string")))
  }

  test("Metadata.jsonPathTypes: batch set-union over records, sink tagging") {
    val logs = LogFrames.withDefaults(Seq(
      ("c1", 0, """{"k":1,"tags":["a"]}"""),
      ("c1", 1, """{"k":2.5,"user":"u1"}"""),
      ("c2", 0, "not json at all"))
      .toDF("conv_id", "turn_idx", "body"))
    val rows = Metadata.jsonPathTypes(logs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(rows == Set(
      ("logs", "body", "k", "int64"),
      ("logs", "body", "k", "float64"),
      ("logs", "body", "tags", "[]string"),
      ("logs", "body", "user", "string")))
  }

  test("expression is codegen-capable inside a projection") {
    val df = Seq("""{"a":1}""").toDF("body")
      .select(explode(JsonPathTypes(col("body"))).as("pt"))
    assert(df.collect().map(r => r.getStruct(0).getString(0)).toSeq == Seq("a"))
  }
}
