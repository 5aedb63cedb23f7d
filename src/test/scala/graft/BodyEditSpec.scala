package graft

import org.apache.spark.sql.DataFrame

import graft.model.LogFrames
import graft.operators._
import graft.pipeline.{Pipeline, PipelineSpec}

/** Body-path write semantics, porting the stanza operator test tables:
  * `operators/move/transformer_test.go:40-500` (TestProcessAndBuild),
  * `operators/copy/transformer_test.go`, `operators/remove/transformer_test.go`,
  * `operators/add/transformer_test.go` — under this engine's map-body ≙
  * JSON-object-body correspondence (see functions/BodyEdit.scala Scaladoc):
  * the Go tests' `map[string]any` bodies become JSON-object body strings,
  * outputs render canonical sorted-key JSON, and map values written into the
  * typed attribute/resource maps stringify as JSON text (documented
  * divergence — the reference keeps real nested maps in pcommon).
  */
class BodyEditSpec extends SparkSuite {
  import spark.implicits._

  /** The shared base entry (transformer_test.go:27-38):
    * body = {"key":"val","nested":{"nestedkey":"nestedval"}}.
    */
  private val baseBody = """{"key":"val","nested":{"nestedkey":"nestedval"}}"""

  private def logs(body: String, attrs: Map[String, String] = Map.empty,
      res: Map[String, String] = Map.empty): DataFrame =
    LogFrames.withDefaults(
      Seq((body, attrs, res)).toDF("body", "attributes_string", "resources_string"))

  private def run(op: Op, df: DataFrame): DataFrame =
    Pipeline.compile(PipelineSpec(Seq(op, NoopOp(Common("__noop")))))(df)

  private def one(df: DataFrame): (String, Map[String, String], Map[String, String]) = {
    val r = df.select("body", "attributes_string", "resources_string").collect()
    assert(r.length == 1)
    (r(0).getString(0), r(0).getMap[String, String](1).toMap,
      r(0).getMap[String, String](2).toMap)
  }

  private def mv(from: String, to: String, onError: OnError.T = OnError.Send) =
    MoveOp(Common("mv", onError = onError), FieldRef.parse(from), FieldRef.parse(to))
  private def cp(from: String, to: String) =
    CopyOp(Common("cp"), FieldRef.parse(from), FieldRef.parse(to))

  // ---- move/transformer_test.go table --------------------------------------

  test("MoveBodyToBody") {
    val (body, _, _) = one(run(mv("body.key", "body.new"), logs(baseBody)))
    assert(body == """{"nested":{"nestedkey":"nestedval"},"new":"val"}""")
  }

  test("MoveBodyToAttribute") {
    val (body, attrs, _) = one(run(mv("body.key", "attributes.new"), logs(baseBody)))
    assert(body == """{"nested":{"nestedkey":"nestedval"}}""")
    assert(attrs == Map("new" -> "val"))
  }

  test("MoveAttributeToBody") {
    val (body, attrs, _) =
      one(run(mv("attributes.new", "body.new"), logs(baseBody, Map("new" -> "val"))))
    assert(body == """{"key":"val","nested":{"nestedkey":"nestedval"},"new":"val"}""")
    assert(attrs.isEmpty)
  }

  test("MoveAttributeToResource + bracketed key forms") {
    val (_, attrs, res) =
      one(run(mv("attributes.new", "resource.new"), logs(baseBody, Map("new" -> "val"))))
    assert(attrs.isEmpty && res == Map("new" -> "val"))
    // MoveBracketedAttributeToResource
    val (_, a2, r2) = one(run(
      mv("""attributes["dotted.field.name"]""", "resource.new"),
      logs(baseBody, Map("dotted.field.name" -> "val"))))
    assert(a2.isEmpty && r2 == Map("new" -> "val"))
    // MoveBracketedAttributeToBracketedResource
    val (_, a3, r3) = one(run(
      mv("""attributes["dotted.field.name"]""", """resource["dotted.field.name"]"""),
      logs(baseBody, Map("dotted.field.name" -> "val"))))
    assert(a3.isEmpty && r3 == Map("dotted.field.name" -> "val"))
    // MoveAttributeToBracketedResource
    val (_, a4, r4) = one(run(
      mv("attributes.new", """resource["dotted.field.name"]"""),
      logs(baseBody, Map("new" -> "val"))))
    assert(a4.isEmpty && r4 == Map("dotted.field.name" -> "val"))
  }

  test("MoveResourceToAttribute") {
    val (_, attrs, res) = one(run(mv("resource.new", "attributes.new"),
      logs(baseBody, res = Map("new" -> "val"))))
    assert(res.isEmpty && attrs == Map("new" -> "val"))
  }

  test("MoveNest (object value within body)") {
    val (body, _, _) = one(run(mv("body.nested", "body.NewNested"), logs(baseBody)))
    assert(body == """{"NewNested":{"nestedkey":"nestedval"},"key":"val"}""")
  }

  test("MoveFromNestedObj") {
    val (body, _, _) =
      one(run(mv("body.nested.nestedkey", "body.unnestedkey"), logs(baseBody)))
    assert(body == """{"key":"val","nested":{},"unnestedkey":"nestedval"}""")
  }

  test("MoveToNestedObj") {
    val in = """{"key":"val","nested":{"nestedkey":"nestedval"},"newnestedkey":"nestedval"}"""
    val (body, _, _) = one(run(mv("body.newnestedkey", "body.nested.newnestedkey"), logs(in)))
    assert(body ==
      """{"key":"val","nested":{"nestedkey":"nestedval","newnestedkey":"nestedval"}}""")
  }

  test("MoveDoubleNestedObj") {
    val in =
      """{"key":"val","nested":{"nested2":{"nestedkey":"nestedval"},"nestedkey":"nestedval"}}"""
    val (body, _, _) = one(run(mv("body.nested.nested2", "body.nested2"), logs(in)))
    assert(body ==
      """{"key":"val","nested":{"nestedkey":"nestedval"},"nested2":{"nestedkey":"nestedval"}}""")
  }

  test("MoveNestToResource / MoveNestToAttribute (map values stringify as JSON)") {
    val (body, _, res) = one(run(mv("body.nested", "resource.NewNested"), logs(baseBody)))
    assert(body == """{"key":"val"}""")
    assert(res == Map("NewNested" -> """{"nestedkey":"nestedval"}"""))
    val (b2, a2, _) = one(run(mv("body.nested", "attributes.NewNested"), logs(baseBody)))
    assert(b2 == """{"key":"val"}""")
    assert(a2 == Map("NewNested" -> """{"nestedkey":"nestedval"}"""))
  }

  test("MoveNestedBodyStringToNestedAttribute (nested attr path = flat dotted key)") {
    val (body, attrs, _) =
      one(run(mv("body.nested.nestedkey", "attributes.one.two.three"), logs(baseBody)))
    assert(body == """{"key":"val","nested":{}}""")
    assert(attrs == Map("one.two.three" -> "nestedval"))
  }

  test("MoveAttributeTodBody (scalar to body root replaces the body)") {
    val (body, attrs, _) = one(run(mv("attributes.one.two.three", "body"),
      logs(baseBody, Map("one.two.three" -> "nestedval"))))
    assert(body == "nestedval")
    assert(attrs.isEmpty)
  }

  test("ReplaceBodyObj (object to body root merges into remaining root)") {
    val in = """{"wrapper":{"key":"val","nested":{"nestedkey":"nestedval"}}}"""
    val (body, _, _) = one(run(mv("body.wrapper", "body"), logs(in)))
    assert(body == baseBody)
  }

  test("ReplaceBodyString") {
    val (body, _, _) = one(run(mv("body.key", "body"), logs(baseBody)))
    assert(body == "val")
  }

  test("MergeObjToBody (root merge keeps siblings)") {
    val (body, _, _) = one(run(mv("body.nested", "body"), logs(baseBody)))
    assert(body == """{"key":"val","nestedkey":"nestedval"}""")
  }

  // ---- error paths (Delete !exist -> on_error) ------------------------------

  test("move from missing body path: send passes through, drop drops") {
    val sent = run(mv("body.absent", "attributes.x"), logs(baseBody))
    val (body, attrs, _) = one(sent)
    assert(body == baseBody && attrs.isEmpty)
    assert(run(mv("body.absent", "attributes.x", OnError.Drop), logs(baseBody)).count() == 0)
    // non-object body: every body path is missing
    assert(run(mv("body.key", "attributes.x", OnError.Drop), logs("plain text")).count() == 0)
  }

  test("move self-overlap body.a -> body.a.b (reference Delete-then-Set order)") {
    val (body, _, _) = one(run(mv("body.key", "body.key.inner"), logs(baseBody)))
    assert(body == """{"key":{"inner":"val"},"nested":{"nestedkey":"nestedval"}}""")
  }

  // ---- copy/transformer_test.go body cases ----------------------------------

  test("copy body path keeps the source") {
    val (body, attrs, _) = one(run(cp("body.key", "attributes.new"), logs(baseBody)))
    assert(body == baseBody)
    assert(attrs == Map("new" -> "val"))
  }

  test("copy body.nested to body root merges and keeps source") {
    val (body, _, _) = one(run(cp("body.nested", "body"), logs(baseBody)))
    assert(body == """{"key":"val","nested":{"nestedkey":"nestedval"},"nestedkey":"nestedval"}""")
  }

  test("copy whole body into a path: object body merges as map, text body as string") {
    val (body, _, _) = one(run(cp("body", "body.copied"), logs(baseBody)))
    assert(body ==
      """{"copied":{"key":"val","nested":{"nestedkey":"nestedval"}},"key":"val","nested":{"nestedkey":"nestedval"}}""")
    // plain-text body: upstream Set replaces the non-map body with a fresh
    // map containing the string scalar
    val (b2, _, _) = one(run(cp("body", "body.copied"), logs("hello world")))
    assert(b2 == """{"copied":"hello world"}""")
  }

  test("move whole body into a path (root Delete first -> fresh object)") {
    val (body, _, _) = one(run(mv("body", "body.moved"), logs(baseBody)))
    assert(body == """{"moved":{"key":"val","nested":{"nestedkey":"nestedval"}}}""")
  }

  // ---- typed scalar -> body path --------------------------------------------

  test("number/bool attrs keep their JSON types; string attrs stay strings") {
    val in = LogFrames.withDefaults(
      Seq(("{}", Map("s" -> "123"), Map("n" -> 7.0), Map("b" -> true)))
        .toDF("body", "attributes_string", "attributes_number", "attributes_bool"))
    val (b1, _, _) = one(run(mv("attributes.s", "body.v"), in))
    assert(b1 == """{"v":"123"}""") // string "123" does NOT become a number
    val (b2, _, _) = one(run(mv("attributes.n", "body.v"), in))
    assert(b2 == """{"v":7}""") // Go %v integral rendering, JSON number
    val (b3, _, _) = one(run(mv("attributes.b", "body.v"), in))
    assert(b3 == """{"v":true}""")
  }

  // ---- remove/transformer_test.go body cases ---------------------------------

  test("remove body path; missing path routes to on_error") {
    val (body, _, _) =
      one(run(RemoveOp(Common("rm"), FieldRef.parse("body.key")), logs(baseBody)))
    assert(body == """{"nested":{"nestedkey":"nestedval"}}""")
    // absent field + on_error drop -> row dropped (remove/transformer.go:38-42)
    assert(run(RemoveOp(Common("rm", onError = OnError.Drop),
      FieldRef.parse("body.absent")), logs(baseBody)).count() == 0)
    // absent field + send -> unchanged
    val (b2, _, _) = one(run(RemoveOp(Common("rm"),
      FieldRef.parse("body.absent")), logs(baseBody)))
    assert(b2 == baseBody)
  }

  test("remove body root nulls the body; JSON null leaf IS present") {
    val out = run(RemoveOp(Common("rm"), FieldRef.parse("body")), logs(baseBody))
    assert(out.select("body").collect()(0).isNullAt(0))
    // {"k":null}: Go map has the key with nil value -> Delete succeeds
    val (b2, _, _) = one(run(RemoveOp(Common("rm", onError = OnError.Drop),
      FieldRef.parse("body.k")), logs("""{"k":null,"x":1}""")))
    assert(b2 == """{"x":1}""")
  }

  // ---- add/transformer_test.go body cases ------------------------------------

  test("add to body path: string value, nested path creates objects") {
    val (body, _, _) = one(run(AddOp(Common("add"), FieldRef.parse("body.new"),
      "some.value"), logs(baseBody)))
    assert(body ==
      """{"key":"val","nested":{"nestedkey":"nestedval"},"new":"some.value"}""")
    val (b2, _, _) = one(run(AddOp(Common("add"), FieldRef.parse("body.one.two"),
      "v"), logs("plain")))
    // non-object body: upstream Set replaces it with a fresh map
    assert(b2 == """{"one":{"two":"v"}}""")
  }

  test("add EXPR value to body path") {
    val (body, _, _) = one(run(AddOp(Common("add"), FieldRef.parse("body.sev"),
      "EXPR(attributes.lvl)"), logs("{}", Map("lvl" -> "warn"))))
    assert(body == """{"sev":"warn"}""")
  }

  // ---- getNestedMap clobber semantics ----------------------------------------

  test("non-object intermediates are clobbered by {} (field.go:241-256)") {
    val (body, _, _) = one(run(AddOp(Common("add"), FieldRef.parse("body.key.sub"),
      "v"), logs(baseBody)))
    // "key" held the string "val" -> replaced by {"sub":"v"}
    assert(body == """{"key":{"sub":"v"},"nested":{"nestedkey":"nestedval"}}""")
  }
}
