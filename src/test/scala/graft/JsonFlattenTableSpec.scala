package graft

import org.apache.spark.sql.DataFrame

import graft.model.LogFrames
import graft.operators._
import graft.pipeline.{Pipeline, PipelineSpec}

/** Ports the stanza json parser test table
  * (`operators/json/parser_test.go:70-466` testJSONPayload + TestParser):
  * the full flattening config matrix over the reference's own payload.
  * Mapping note: this engine's attributes are three typed flat maps, so
  * nested map/array values appear as their compact JSON text in
  * `attributes_string` (the reference keeps `map[string]any`; its exporter
  * stringifies identically when sinking).
  */
class JsonFlattenTableSpec extends SparkSuite {
  import spark.implicits._

  private val payload = """{
  "stream": "stdout",
  "_p": "F",
  "log": "{\"level\":\"INFO\",\"target\":\"amzn_nfm::events::event_provider_ebpf\"}",
  "log_processed": {
    "level": "INFO",
    "message": "Under log_processed",
    "target": "amzn_nfm::events::event_provider_ebpf",
    "timestamp": 1748426199363
  },
  "kubernetes": {
    "pod_name": "aws-network-flow-monitor-agent-qdrt2",
    "namespace_name": "amazon-network-flow-monitor",
    "pod_id": "c514f9a4-0412-4dd7-a4cb-7ff51d9ddee9",
    "host": "ip-172-31-29-49.ap-south-1.compute.internal",
    "container_name": "aws-network-flow-monitor-agent",
    "docker_id": "257e614a0a24c811d9d56b2ae6245b8ae29a1cd3023f3f8a550164108f1fd128",
    "container_hash": "602401143452.dkr.ecr.ap-south-1.amazonaws.com/aws-network-sonar-agent@sha256:13bc6a5d47f0fc196e969159676dcb52a1eadbe5097b952a1b53bc449c525ed2",
    "container_image": "602401143452.dkr.ecr.ap-south-1.amazonaws.com/aws-network-sonar-agent:v1.0.2-eksbuild.4"
  },
  "docker": [
    "container_1",
    "container_8"
  ],
  "valorant": {
    "game": {
      "is_game": "false",
      "metadata": {
        "version": "v0.0.1",
        "installation_path": "C://games/installed/valorant",
        "vanguard": {
          "running": true,
          "malformed_hardware": false,
          "version": "patch_v1.100.0",
          "hash_check_status": "success"
        }
      }
    },
    "uninstall": true,
    "message": "under valorant 3"
  }
}"""

  private val logStr = """{"level":"INFO","target":"amzn_nfm::events::event_provider_ebpf"}"""
  private val k8sJson = """{"pod_name":"aws-network-flow-monitor-agent-qdrt2","namespace_name":"amazon-network-flow-monitor","pod_id":"c514f9a4-0412-4dd7-a4cb-7ff51d9ddee9","host":"ip-172-31-29-49.ap-south-1.compute.internal","container_name":"aws-network-flow-monitor-agent","docker_id":"257e614a0a24c811d9d56b2ae6245b8ae29a1cd3023f3f8a550164108f1fd128","container_hash":"602401143452.dkr.ecr.ap-south-1.amazonaws.com/aws-network-sonar-agent@sha256:13bc6a5d47f0fc196e969159676dcb52a1eadbe5097b952a1b53bc449c525ed2","container_image":"602401143452.dkr.ecr.ap-south-1.amazonaws.com/aws-network-sonar-agent:v1.0.2-eksbuild.4"}"""
  private val logProcessedJson = """{"level":"INFO","message":"Under log_processed","target":"amzn_nfm::events::event_provider_ebpf","timestamp":1748426199363}"""
  private val vanguardJson = """{"running":true,"malformed_hardware":false,"version":"patch_v1.100.0","hash_check_status":"success"}"""
  private val metadataJson = s"""{"version":"v0.0.1","installation_path":"C://games/installed/valorant","vanguard":$vanguardJson}"""
  private val gameJson = s"""{"is_game":"false","metadata":$metadataJson}"""
  private val valorantJson = s"""{"game":$gameJson,"uninstall":true,"message":"under valorant 3"}"""
  private val dockerJson = """["container_1","container_8"]"""

  private val k8sScalars = Map(
    "pod_name" -> "aws-network-flow-monitor-agent-qdrt2",
    "namespace_name" -> "amazon-network-flow-monitor",
    "pod_id" -> "c514f9a4-0412-4dd7-a4cb-7ff51d9ddee9",
    "host" -> "ip-172-31-29-49.ap-south-1.compute.internal",
    "container_name" -> "aws-network-flow-monitor-agent",
    "docker_id" -> "257e614a0a24c811d9d56b2ae6245b8ae29a1cd3023f3f8a550164108f1fd128",
    "container_hash" -> "602401143452.dkr.ecr.ap-south-1.amazonaws.com/aws-network-sonar-agent@sha256:13bc6a5d47f0fc196e969159676dcb52a1eadbe5097b952a1b53bc449c525ed2",
    "container_image" -> "602401143452.dkr.ecr.ap-south-1.amazonaws.com/aws-network-sonar-agent:v1.0.2-eksbuild.4")

  private def run(op: JsonParserOp, body: String = payload) = {
    val df: DataFrame = LogFrames.withDefaults(Seq(body).toDF("body"))
    val out = Pipeline.compile(PipelineSpec(Seq(op, NoopOp(Common("__noop")))))(df)
    val r = out.select("attributes_string", "attributes_number", "attributes_bool",
      "timestamp", "scope_name").collect()(0)
    (r.getMap[String, String](0).toMap, r.getMap[String, Double](1).toMap,
      r.getMap[String, Boolean](2).toMap, r.getLong(3), r.getString(4))
  }

  test("simple + nested (parser_test.go cases 1-2)") {
    val (s0, n0, b0, _, _) = run(JsonParserOp(Common("j")), body = "{}")
    assert(s0.isEmpty && n0.isEmpty && b0.isEmpty)
    val (s1, _, _, _, _) = run(JsonParserOp(Common("j")), body = """{"superkey":"superval"}""")
    assert(s1 == Map("superkey" -> "superval"))
  }

  test("with_timestamp: embedded epoch-s time parser over the parsed attr") {
    val (s, n, _, ts, _) = run(JsonParserOp(Common("j"), extras = ParserExtras(
      timestamp = Some(TimeParserSpec(FieldRef.Attr(Seq("timestamp")), "epoch", "s")))),
      body = """{"superkey":"superval","timestamp":1136214245}""")
    assert(s == Map("superkey" -> "superval"))
    assert(n == Map("timestamp" -> 1136214245.0))
    assert(ts == 1136214245L * 1000000000L)
  }

  test("with_scope: embedded scope-name parser") {
    val (s, _, _, _, scope) = run(JsonParserOp(Common("j"), extras = ParserExtras(
      scopeName = Some(FieldRef.Attr(Seq("logger_name"))))),
      body = """{"superkey":"superval","logger_name":"logger"}""")
    assert(s("logger_name") == "logger" && scope == "logger")
  }

  test("simple_json_test: flattening disabled keeps top-level keys, nested as JSON") {
    val (s, n, b, _, _) = run(JsonParserOp(Common("j")))
    assert(s == Map(
      "stream" -> "stdout", "_p" -> "F", "log" -> logStr,
      "log_processed" -> logProcessedJson, "kubernetes" -> k8sJson,
      "docker" -> dockerJson, "valorant" -> valorantJson))
    assert(n.isEmpty && b.isEmpty)
  }

  test("enable_flattening_and_path level 1") {
    val (s, n, b, _, _) = run(JsonParserOp(Common("j"),
      maxFlatteningDepth = Some(1), enablePaths = true))
    assert(s == Map(
      "stream" -> "stdout", "_p" -> "F", "log" -> logStr,
      "log_processed.level" -> "INFO",
      "log_processed.message" -> "Under log_processed",
      "log_processed.target" -> "amzn_nfm::events::event_provider_ebpf",
      "docker" -> dockerJson,
      "valorant.game" -> gameJson,
      "valorant.message" -> "under valorant 3") ++
      k8sScalars.map { case (k, v) => s"kubernetes.$k" -> v })
    assert(n == Map("log_processed.timestamp" -> 1.748426199363e12))
    assert(b == Map("valorant.uninstall" -> true))
  }

  test("enable_flattening_and_path level 2") {
    val (s, n, b, _, _) = run(JsonParserOp(Common("j"),
      maxFlatteningDepth = Some(2), enablePaths = true))
    assert(s("valorant.game.is_game") == "false")
    assert(s("valorant.game.metadata") == metadataJson)
    assert(s("kubernetes.pod_name") == "aws-network-flow-monitor-agent-qdrt2")
    assert(!s.contains("valorant.game"))
    assert(n == Map("log_processed.timestamp" -> 1.748426199363e12))
    assert(b == Map("valorant.uninstall" -> true))
  }

  test("enable_flattening_and_path level 4 with path_prefix") {
    val (s, n, b, _, _) = run(JsonParserOp(Common("j"),
      maxFlatteningDepth = Some(4), enablePaths = true, pathPrefix = "flattened"))
    assert(s == Map(
      "flattened.stream" -> "stdout", "flattened._p" -> "F",
      "flattened.log" -> logStr,
      "flattened.log_processed.level" -> "INFO",
      "flattened.log_processed.message" -> "Under log_processed",
      "flattened.log_processed.target" -> "amzn_nfm::events::event_provider_ebpf",
      "flattened.docker" -> dockerJson,
      "flattened.valorant.game.is_game" -> "false",
      "flattened.valorant.game.metadata.installation_path" -> "C://games/installed/valorant",
      "flattened.valorant.game.metadata.vanguard.hash_check_status" -> "success",
      "flattened.valorant.game.metadata.vanguard.version" -> "patch_v1.100.0",
      "flattened.valorant.game.metadata.version" -> "v0.0.1",
      "flattened.valorant.message" -> "under valorant 3") ++
      k8sScalars.map { case (k, v) => s"flattened.kubernetes.$k" -> v })
    assert(n == Map("flattened.log_processed.timestamp" -> 1.748426199363e12))
    assert(b == Map(
      "flattened.valorant.uninstall" -> true,
      "flattened.valorant.game.metadata.vanguard.running" -> true,
      "flattened.valorant.game.metadata.vanguard.malformed_hardware" -> false))
  }

  test("enable_flattening_and_disable_paths: leaf keys, sorted-walk last-wins") {
    val (s, n, b, _, _) = run(JsonParserOp(Common("j"),
      maxFlatteningDepth = Some(4), enablePaths = false))
    assert(s == Map(
      "_p" -> "F", "stream" -> "stdout", "log" -> logStr,
      "docker" -> dockerJson,
      "level" -> "INFO",
      "target" -> "amzn_nfm::events::event_provider_ebpf",
      // valorant.message walks after log_processed.message (sorted keys)
      "message" -> "under valorant 3",
      "is_game" -> "false",
      "installation_path" -> "C://games/installed/valorant",
      "hash_check_status" -> "success",
      // metadata.version walks after vanguard.version at its level
      "version" -> "v0.0.1") ++ k8sScalars)
    assert(n == Map("timestamp" -> 1.748426199363e12))
    assert(b == Map(
      "uninstall" -> true, "running" -> true, "malformed_hardware" -> false))
  }
}
