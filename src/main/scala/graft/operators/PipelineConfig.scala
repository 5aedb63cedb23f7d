package graft.operators

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.functions.Severity
import graft.pipeline.PipelineSpec

/** Loads a reference-style pipeline configuration (the stanza operator list
  * the collector accepts as YAML/JSON — SigNoz pipelines arrive as JSON) into
  * this engine's [[PipelineSpec]] ADT, so an existing collector pipeline
  * config ports without rewriting it by hand.
  *
  * Field names mirror the reference's mapstructure tags exactly
  * (`signozlogspipelineprocessor/stanza/operator/operators/<op>/config.go`,
  * `helper/severity_builder.go:114-117`, `helper/time.go:40-43`,
  * `helper/trace.go:35-49`): `type id if on_error output` plus per-operator
  * `regex pattern parse_from parse_to field value from to routes default
  * timestamp severity trace`. `output`/`default` accept a string or a list,
  * like the reference. Operators without an `id` default to their `type`
  * (de-duplicated with a numeric suffix, stanza-style); an op without
  * `output` flows to the next in config order (handled by
  * [[graft.pipeline.Pipeline.compile]]).
  */
object PipelineConfig {

  private val mapper = new ObjectMapper()

  /** Parse `{"operators": [...]}` (or a bare operator array). */
  def fromJson(json: String): PipelineSpec = {
    val root = mapper.readTree(json)
    val opsNode =
      if (root.isArray) root
      else {
        val o = root.get("operators")
        require(o != null && o.isArray, "config needs an 'operators' array")
        o
      }
    import scala.jdk.CollectionConverters._
    val rawOps = opsNode.elements().asScala.toSeq

    // stanza default ids: the operator type, de-duplicated with a counter
    val used = scala.collection.mutable.Set.empty[String]
    def idFor(n: JsonNode, typ: String): String = {
      val explicit = str(n, "id")
      val base = explicit.getOrElse(typ)
      var id = base
      var k = 1
      while (used.contains(id)) { id = s"$base$k"; k += 1 }
      used += id
      id
    }

    PipelineSpec(rawOps.map(parseOp(_, idFor)))
  }

  private def str(n: JsonNode, f: String): Option[String] =
    Option(n.get(f)).filterNot(_.isNull).map(_.asText())

  private def strOrList(n: JsonNode, f: String): Seq[String] =
    Option(n.get(f)).filterNot(_.isNull).toSeq.flatMap { v =>
      import scala.jdk.CollectionConverters._
      if (v.isArray) v.elements().asScala.map(_.asText()).toSeq
      else Seq(v.asText())
    }

  private def fieldRef(n: JsonNode, f: String): Option[FieldRef] =
    str(n, f).map(FieldRef.parse)

  private def common(n: JsonNode, id: String): Common =
    Common(
      id = id,
      ifExpr = str(n, "if"),
      onError = OnError.parse(str(n, "on_error").getOrElse("")),
      output = strOrList(n, "output"))

  private def timeSpec(n: JsonNode): TimeParserSpec =
    TimeParserSpec(
      parseFrom = fieldRef(n, "parse_from").getOrElse(FieldRef.Body),
      layoutType = str(n, "layout_type").getOrElse("strptime"),
      layout = str(n, "layout").getOrElse(""),
      location = str(n, "location"))

  private def severitySpec(n: JsonNode): SeveritySpec = {
    import scala.jdk.CollectionConverters._
    def values(v: JsonNode): Seq[Severity.MappingValue] =
      if (v.isArray) v.elements().asScala.toSeq.flatMap(values)
      else if (v.isObject)
        Seq(Severity.Range(v.get("min").asInt(), v.get("max").asInt()))
      else if (v.isNumber) Seq(Severity.Num(v.asInt()))
      else Seq(Severity.Str(v.asText()))
    val mapping = Option(n.get("mapping")).filterNot(_.isNull).toSeq.flatMap { m =>
      m.fields().asScala.toSeq.map(e => e.getKey -> values(e.getValue))
    }
    SeveritySpec(
      parseFrom = fieldRef(n, "parse_from").getOrElse(FieldRef.Body),
      preset = str(n, "preset").getOrElse(""),
      mapping = mapping,
      overwriteText = Option(n.get("overwrite_text")).exists(_.asBoolean(false)))
  }

  private def traceSpec(n: JsonNode): TraceSpec = {
    def sub(f: String): Option[FieldRef] =
      Option(n.get(f)).filterNot(_.isNull).flatMap(fieldRef(_, "parse_from"))
    TraceSpec(sub("trace_id"), sub("span_id"), sub("trace_flags"))
  }

  private def extras(n: JsonNode): ParserExtras =
    ParserExtras(
      timestamp = Option(n.get("timestamp")).filterNot(_.isNull).map(timeSpec),
      severity = Option(n.get("severity")).filterNot(_.isNull).map(severitySpec),
      trace = Option(n.get("trace")).filterNot(_.isNull).map(traceSpec))

  private def parseOp(n: JsonNode, idFor: (JsonNode, String) => String): Op = {
    val typ = str(n, "type").getOrElse(
      throw new IllegalArgumentException(s"operator without a type: $n"))
    val id = idFor(n, typ)
    val c = common(n, id)
    def from = fieldRef(n, "parse_from").getOrElse(FieldRef.Body)
    def to = fieldRef(n, "parse_to").getOrElse(FieldRef.AttrsRoot)
    typ match {
      case "noop" => NoopOp(c)
      case "add" =>
        // a non-string config value is a TYPED value (add/config.go `any`):
        // ship its JSON rendering and let the operator dispatch on the shape
        val vNode = Option(n.get("value")).filterNot(_.isNull)
        vNode match {
          case Some(v) if !v.isTextual =>
            AddOp(c, FieldRef.parse(str(n, "field").get), v.toString, json = true)
          case _ =>
            AddOp(c, FieldRef.parse(str(n, "field").get), str(n, "value").getOrElse(""))
        }
      case "remove" => RemoveOp(c, FieldRef.parse(str(n, "field").get))
      case "copy" =>
        CopyOp(c, FieldRef.parse(str(n, "from").get), FieldRef.parse(str(n, "to").get))
      case "move" =>
        MoveOp(c, FieldRef.parse(str(n, "from").get), FieldRef.parse(str(n, "to").get))
      case "normalize" => NormalizeOp(c)
      case "regex_parser" =>
        RegexParserOp(c, str(n, "regex").getOrElse(
          throw new IllegalArgumentException(s"regex_parser $id: missing required field 'regex'")),
          from, to, extras(n))
      case "grok_parser" =>
        GrokParserOp(c, str(n, "pattern").getOrElse(
          throw new IllegalArgumentException(s"grok_parser $id: missing required field 'pattern'")),
          parseFrom = from, parseTo = to, extras = extras(n))
      case "json_parser" =>
        JsonParserOp(c, from, to,
          maxFlatteningDepth =
            Option(n.get("max_flattening_depth")).filterNot(_.isNull).map(_.asInt()),
          enablePaths = Option(n.get("enable_paths")).exists(_.asBoolean(false)),
          pathPrefix = str(n, "path_prefix").getOrElse(""),
          extras = extras(n))
      case "severity_parser" => SeverityParserOp(c, severitySpec(n))
      case "time_parser" => TimeParserOp(c, timeSpec(n))
      case "trace_parser" => TraceParserOp(c, traceSpec(n))
      case "router" =>
        import scala.jdk.CollectionConverters._
        val routes = Option(n.get("routes")).filterNot(_.isNull).toSeq.flatMap {
          _.elements().asScala.toSeq.map { r =>
            val attrs = Option(r.get("attributes")).filterNot(_.isNull).map { a =>
              a.fields().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
            }.getOrElse(Map.empty[String, String])
            Route(str(r, "expr").getOrElse("true"), strOrList(r, "output"), attrs)
          }
        }
        RouterOp(c, routes, default = strOrList(n, "default"))
      case other =>
        throw new IllegalArgumentException(s"unsupported operator type: $other")
    }
  }
}
