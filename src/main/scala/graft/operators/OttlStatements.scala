package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The signoztransformprocessor's OTTL statement surface for the logs
  * pipeline (`processor/signoztransformprocessor/config.go` `log_statements`,
  * `internal/logs/processor.go`; statement grammar = the public OTTL
  * standard library the processor embeds, e.g.
  * `testdata/config.yaml:18-25`):
  *
  *  - `set(target, value) [where cond]`
  *  - `delete_key(attributes | resource.attributes, "key") [where cond]`
  *  - `keep_keys(attributes | resource.attributes, ["k1", "k2"]) [where cond]`
  *  - `replace_pattern(target, "regex", "replacement") [where cond]`
  *
  * over the `log` and `resource` contexts. Spark-first restatement: each
  * statement compiles to gated column updates over the LogRow frame
  * ([[FieldCols.applyUpdates]] — per-row `when(cond, new).otherwise(old)`,
  * the same machinery the pipeline operators use), and `where` conditions
  * reuse the [[ExprLang]] translator after a path-syntax rewrite (OTTL
  * `resource.attributes["k"]` == stanza `resource["k"]`). Everything stays
  * a pure projection — one whole-stage-codegen pass, zero shuffle.
  *
  * Scope notes (documented simplifications):
  *  - `set` with a path-valued `value` copies via stringify-on-read (the
  *    engine's `fmt.Sprintf("%v")` convention); literal values keep their
  *    type (string/number/bool -> the matching typed map);
  *  - OTTL converter functions beyond the ported custom trio
  *    (EXPR/GrokParse/HexToInt, see [[ExprLang]]) are out of scope;
  *  - `replace_pattern` follows RE2 `ReplaceAllString` semantics: `$1`
  *    group references, no-op when the target field is unset.
  */
object OttlStatements {

  sealed trait Stmt {
    def where: Option[String]
  }
  final case class SetStmt(target: String, value: Value, where: Option[String]) extends Stmt
  final case class DeleteKeyStmt(map: String, key: String, where: Option[String]) extends Stmt
  final case class KeepKeysStmt(map: String, keys: Seq[String], where: Option[String]) extends Stmt
  final case class ReplacePatternStmt(target: String, pattern: String,
      replacement: String, where: Option[String]) extends Stmt

  sealed trait Value
  final case class VStr(s: String) extends Value
  final case class VNum(d: Double) extends Value
  final case class VBool(b: Boolean) extends Value
  final case class VPath(p: String) extends Value

  // ---- statement parsing ---------------------------------------------------

  /** Split `func(args...) [where cond]`; args split on top-level commas with
    * quote/bracket awareness.
    */
  def parse(statement: String): Stmt = {
    val s = statement.trim
    val open = s.indexOf('(')
    require(open > 0, s"not an OTTL statement: $statement")
    val fn = s.substring(0, open).trim
    val close = matchingParen(s, open)
    val argsRaw = s.substring(open + 1, close)
    val tail = s.substring(close + 1).trim
    val where =
      if (tail.isEmpty) None
      else if (tail.startsWith("where ")) Some(tail.stripPrefix("where ").trim)
      else throw new IllegalArgumentException(s"trailing junk after statement: $tail")
    val args = splitArgs(argsRaw)
    fn match {
      case "set" =>
        require(args.size == 2, s"set needs 2 args: $statement")
        SetStmt(args.head, parseValue(args(1)), where)
      case "delete_key" =>
        require(args.size == 2, s"delete_key needs 2 args: $statement")
        DeleteKeyStmt(args.head, unquote(args(1)), where)
      case "keep_keys" =>
        require(args.size == 2, s"keep_keys needs 2 args: $statement")
        val list = args(1).trim
        require(list.startsWith("[") && list.endsWith("]"),
          s"keep_keys needs a list literal: $statement")
        KeepKeysStmt(args.head,
          splitArgs(list.substring(1, list.length - 1)).map(unquote), where)
      case "replace_pattern" =>
        require(args.size == 3, s"replace_pattern needs 3 args: $statement")
        ReplacePatternStmt(args.head, unquote(args(1)), unquote(args(2)), where)
      case other =>
        throw new IllegalArgumentException(s"unsupported OTTL function: $other")
    }
  }

  private def matchingParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    var inStr = false
    var q = ' '
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        if (c == '\\') i += 1
        else if (c == q) inStr = false
      } else if (c == '"' || c == '\'') { inStr = true; q = c }
      else if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; if (depth == 0) return i }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced parens in: $s")
  }

  private def splitArgs(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inStr = false
    var q = ' '
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        cur.append(c)
        if (c == '\\' && i + 1 < s.length) { cur.append(s.charAt(i + 1)); i += 1 }
        else if (c == q) inStr = false
      } else c match {
        case '"' | '\'' => inStr = true; q = c; cur.append(c)
        case '(' | '[' => depth += 1; cur.append(c)
        case ')' | ']' => depth -= 1; cur.append(c)
        case ',' if depth == 0 => out += cur.toString.trim; cur.clear()
        case _ => cur.append(c)
      }
      i += 1
    }
    if (cur.toString.trim.nonEmpty || out.nonEmpty) out += cur.toString.trim
    out.toSeq.filter(_.nonEmpty)
  }

  private def unquote(s: String): String = {
    val t = s.trim
    require(t.length >= 2 && (t.head == '"' || t.head == '\'') && t.last == t.head,
      s"expected a string literal, got: $s")
    val sb = new StringBuilder
    var i = 1
    while (i < t.length - 1) {
      val c = t.charAt(i)
      if (c == '\\' && i + 1 < t.length - 1) {
        t.charAt(i + 1) match {
          case 'n' => sb.append('\n'); case 't' => sb.append('\t')
          case 'r' => sb.append('\r')
          case e => sb.append(e)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def parseValue(s: String): Value = {
    val t = s.trim
    if (t.startsWith("\"") || t.startsWith("'")) VStr(unquote(t))
    else if (t == "true") VBool(true)
    else if (t == "false") VBool(false)
    else if (t.nonEmpty && (t.head.isDigit || t.head == '-' || t.head == '.'))
      VNum(t.toDouble)
    else VPath(t)
  }

  // ---- path resolution -----------------------------------------------------

  /** OTTL log/resource-context path -> this engine's [[FieldRef]].
    * `resource.attributes["k"]` == stanza `resource["k"]`; in the
    * `resource` context a bare `attributes[...]` IS the resource map.
    */
  def pathToRef(path: String, context: String): FieldRef = {
    val p = path.trim
    def key(rest: String): Seq[String] = FieldRef.parse(s"attributes$rest") match {
      case FieldRef.Attr(keys) => keys
      case FieldRef.AttrsRoot => Seq.empty
      case other => throw new IllegalArgumentException(s"bad map path $p -> $other")
    }
    if (context == "span") p match {
      // ottlspan context (testdata/config.yaml trace_statements): the span
      // frame carries the same typed attr maps as LogRow, so only the
      // span-specific top-level paths need mapping
      case "name" => FieldRef.Top("name")
      case "kind.string" | "kind" => FieldRef.Top("kind")
      case "status.code" => FieldRef.Top("status_code")
      case "status.message" => FieldRef.Top("status_message")
      case "trace_id.string" => FieldRef.Top("trace_id")
      case "span_id.string" => FieldRef.Top("span_id")
      case "parent_span_id.string" => FieldRef.Top("parent_span_id")
      case "trace_state" => FieldRef.Top("trace_state")
      case _ if p == "attributes" => FieldRef.AttrsRoot
      case _ if p == "resource.attributes" => FieldRef.ResourceRoot
      case _ if p.startsWith("resource.attributes") =>
        FieldRef.Resource(key(p.stripPrefix("resource.attributes")))
      case _ if p.startsWith("attributes") => FieldRef.Attr(key(p.stripPrefix("attributes")))
      case other => throw new IllegalArgumentException(s"unsupported span-context path: $other")
    }
    else if (context == "datapoint") p match {
      // ottldatapoint context (metric_statements): metric.* are the
      // enclosing-metric scalars, attributes is the datapoint attr map
      case "metric.name" => FieldRef.Top("metric_name")
      case "metric.description" => FieldRef.Top("description")
      case "metric.unit" => FieldRef.Top("unit")
      case "time_unix_nano" | "time" => FieldRef.Top("unix_milli")
      case _ if p == "attributes" => FieldRef.AttrsRoot
      case _ if p == "resource.attributes" => FieldRef.ResourceRoot
      case _ if p.startsWith("resource.attributes") =>
        FieldRef.Resource(key(p.stripPrefix("resource.attributes")))
      case _ if p.startsWith("attributes") => FieldRef.Attr(key(p.stripPrefix("attributes")))
      case other => throw new IllegalArgumentException(s"unsupported datapoint-context path: $other")
    }
    else if (context == "resource") {
      if (p == "attributes") FieldRef.ResourceRoot
      else if (p.startsWith("attributes")) FieldRef.Resource(key(p.stripPrefix("attributes")))
      else throw new IllegalArgumentException(s"unsupported resource-context path: $p")
    } else p match {
      case "body" => FieldRef.Body
      case "attributes" => FieldRef.AttrsRoot
      case "resource.attributes" => FieldRef.ResourceRoot
      case "time_unix_nano" => FieldRef.Top("timestamp")
      case "observed_time_unix_nano" => FieldRef.Top("observed_timestamp")
      case "trace_id.string" => FieldRef.Top("trace_id")
      case "span_id.string" => FieldRef.Top("span_id")
      case _ if p.startsWith("resource.attributes") =>
        FieldRef.Resource(key(p.stripPrefix("resource.attributes")))
      case _ if p.startsWith("attributes") => FieldRef.Attr(key(p.stripPrefix("attributes")))
      case other => FieldRef.parse(other) // severity_text, severity_number, ...
    }
  }

  /** Rewrite OTTL path syntax inside a `where` condition to the stanza path
    * syntax [[ExprLang]] speaks: `resource.attributes[` -> `resource[`, and
    * in the resource context a bare `attributes[` -> `resource[`.
    * Quote-aware so string literals pass through untouched.
    */
  private[operators] def rewriteCondition(cond: String, context: String): String = {
    val sb = new StringBuilder
    var i = 0
    var inStr = false
    var q = ' '
    while (i < cond.length) {
      val c = cond.charAt(i)
      if (inStr) {
        sb.append(c)
        if (c == '\\' && i + 1 < cond.length) { sb.append(cond.charAt(i + 1)); i += 1 }
        else if (c == q) inStr = false
        i += 1
      } else if (c == '"' || c == '\'') { inStr = true; q = c; sb.append(c); i += 1 }
      else if (cond.startsWith("resource.attributes", i) && wordBoundary(cond, i)) {
        sb.append("resource"); i += "resource.attributes".length
      } else if (context == "resource" && cond.startsWith("attributes", i) &&
          wordBoundary(cond, i)) {
        sb.append("resource"); i += "attributes".length
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def wordBoundary(s: String, i: Int): Boolean =
    i == 0 || { val p = s.charAt(i - 1); !p.isLetterOrDigit && p != '_' && p != '.' }

  // ---- compilation ---------------------------------------------------------

  /** Apply one parsed statement to a LogRow frame. */
  def applyStmt(df: DataFrame, stmt: Stmt, context: String = "log"): DataFrame = {
    val whereGate = stmt.where.map(w => ExprLang.boolExpr(rewriteCondition(w, context)))
    def gated(updates: Seq[(String, Column)], extraGate: Option[Column] = None): DataFrame = {
      val gate = (whereGate, extraGate) match {
        case (Some(a), Some(b)) => Some(a && b)
        case (a, b) => a.orElse(b)
      }
      FieldCols.applyUpdates(df, updates, gate)
    }
    stmt match {
      case SetStmt(target, value, _) =>
        val ref = pathToRef(target, context)
        value match {
          case VStr(s) => gated(FieldCols.setString(ref, lit(s)))
          case VNum(d) => gated(FieldCols.setNumber(ref, lit(d)))
          case VBool(b) => gated(FieldCols.setBool(ref, lit(b)))
          case VPath(p) =>
            val read = FieldCols.readString(pathToRef(p, context))
            // OTTL `set` is a no-op when the value resolves to nil
            gated(FieldCols.setString(ref, read), extraGate = Some(read.isNotNull))
        }
      case DeleteKeyStmt(m, key, _) =>
        val ref = pathToRef(m, context) match {
          case FieldRef.AttrsRoot => FieldRef.Attr(Seq(key))
          case FieldRef.ResourceRoot => FieldRef.Resource(Seq(key))
          case other => throw new IllegalArgumentException(s"delete_key needs a map, got $other")
        }
        gated(FieldCols.remove(ref))
      case KeepKeysStmt(m, keys, _) =>
        pathToRef(m, context) match {
          case FieldRef.AttrsRoot => gated(Seq(
            "attributes_string" ->
              graft.functions.MapFilterKeys(col("attributes_string"), keys, keep = true),
            "attributes_number" ->
              graft.functions.MapFilterKeys(col("attributes_number"), keys, keep = true),
            "attributes_bool" ->
              graft.functions.MapFilterKeys(col("attributes_bool"), keys, keep = true)))
          case FieldRef.ResourceRoot => gated(Seq(
            "resources_string" ->
              graft.functions.MapFilterKeys(col("resources_string"), keys, keep = true)))
          case other => throw new IllegalArgumentException(s"keep_keys needs a map, got $other")
        }
      case ReplacePatternStmt(target, pattern, replacement, _) =>
        val ref = pathToRef(target, context)
        val read = FieldCols.readString(ref)
        val jp = graft.functions.RegexNamedGroups.scan(pattern).javaPattern
        gated(FieldCols.setString(ref, regexp_replace(read, jp, replacement)),
          extraGate = Some(read.isNotNull))
    }
  }

  /** Apply a statement block list (the processor's `log_statements` config
    * shape: `[{context: log|resource, statements: [...]}, ...]`), in order.
    */
  def applyAll(df: DataFrame, blocks: Seq[(String, Seq[String])]): DataFrame =
    blocks.foldLeft(df) { case (acc, (context, stmts)) =>
      stmts.foldLeft(acc)((d, s) => applyStmt(d, parse(s), context))
    }

  /** Config loader for the processor's statement-list JSON
    * (`signoztransformprocessor/config.go` mapstructure field names:
    * `log_statements` / `trace_statements` / `metric_statements`).
    */
  def fromJson(json: String, signal: String = "log_statements"): Seq[(String, Seq[String])] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    val blocks =
      if (root.isArray) root
      else {
        val b = root.get(signal)
        require(b != null && b.isArray, s"config needs a '$signal' array")
        b
      }
    import scala.jdk.CollectionConverters._
    blocks.elements().asScala.toSeq.map { b =>
      val ctx = Option(b.get("context")).map(_.asText()).getOrElse("log")
      val stmts = Option(b.get("statements")).toSeq.flatMap(
        _.elements().asScala.map(_.asText()).toSeq)
      (ctx, stmts)
    }
  }
}
