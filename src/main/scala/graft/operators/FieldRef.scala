package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Field addressing for pipeline operators.
  *
  * The reference addresses entry data with a small path language —
  * `body.x.y`, `attributes.foo`, `resource["k8s.pod.name"]`, bracket-quoted
  * keys — parsed by a state machine (`stanza/entry/field.go:86-205`), with
  * SigNoz's fork adding reads *through* a JSON string body
  * (`stanza/entry/body_field.go:58-127`).
  *
  * In this engine a field reference resolves statically (at plan build) to
  * Spark `Column` reads/writes over the [[graft.model.LogRow]] columns:
  *  - `attributes.*` / `resource.*` -> the typed attribute maps (nested path
  *    segments join with '.' — the same flattened-dotted-key convention the
  *    reference's own JSON flattener uses, `operators/json/parser.go:65-92`);
  *  - `body` -> the body string; `body.x.y` -> a JSON read through the body
  *    (`get_json_object`), Catalyst's equivalent of the reference's lazy
  *    cached body parse; body-path WRITES (set/remove) edit the body JSON
  *    with the stanza `BodyField.Set/Delete/Merge` semantics via the
  *    [[graft.functions.BodyEdit]] kernels;
  *  - bare names (`severity_text`, `trace_id`, ...) -> top-level columns.
  */
sealed trait FieldRef
object FieldRef {
  case object Body extends FieldRef
  /** Read-through-JSON-body path (SigNoz `ParseBodyJson` semantics). */
  final case class BodyPath(keys: Seq[String]) extends FieldRef
  /** Attribute map entry; nested keys are dot-joined into one flat key. */
  final case class Attr(keys: Seq[String]) extends FieldRef
  final case class Resource(keys: Seq[String]) extends FieldRef
  /** Top-level entry field: severity_text, severity_number, timestamp,
    * observed_timestamp, trace_id, span_id, trace_flags, scope_name, plus the
    * transcript provenance columns (conv_id, turn_idx, role, tool).
    */
  final case class Top(name: String) extends FieldRef

  /** Whole-attributes / whole-resource roots (for `remove: attributes`). */
  case object AttrsRoot extends FieldRef
  case object ResourceRoot extends FieldRef

  private val topLevel = Set(
    "severity_text", "severity_number", "timestamp", "observed_timestamp",
    "trace_id", "span_id", "trace_flags", "scope_name", "scope_version",
    "conv_id", "turn_idx", "role", "tool")

  /** Split `a.b["c.d"].e` into segments, honoring bracket-quoted keys. */
  private[operators] def segments(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    def flush(): Unit = { if (cur.nonEmpty || out.isEmpty) out += cur.toString; cur.clear() }
    while (i < s.length) {
      s.charAt(i) match {
        case '.' => flush(); i += 1
        case '[' =>
          val q = s.charAt(i + 1)
          require(q == '"' || q == '\'', s"expected quote after '[' in field: $s")
          val end = s.indexOf(q, i + 2)
          require(end > 0 && end + 1 < s.length && s.charAt(end + 1) == ']',
            s"malformed bracketed key in field: $s")
          if (cur.nonEmpty) { out += cur.toString; cur.clear() }
          out += s.substring(i + 2, end)
          i = end + 2
          if (i < s.length && s.charAt(i) == '.') i += 1
        case c => cur.append(c); i += 1
      }
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq
  }

  def parse(path: String): FieldRef = {
    val segs = segments(path.trim)
    segs.head match {
      case "attributes" => if (segs.tail.isEmpty) AttrsRoot else Attr(segs.tail)
      case "resource" | "resources" => if (segs.tail.isEmpty) ResourceRoot else Resource(segs.tail)
      case "body" => if (segs.tail.isEmpty) Body else BodyPath(segs.tail)
      case n if topLevel.contains(n) && segs.tail.isEmpty => Top(n)
      // stanza default root is body when no recognized prefix is given
      case _ => BodyPath(segs)
    }
  }
}

/** Column-level read/write resolution for [[FieldRef]]s. */
object FieldCols {
  import FieldRef._

  def attrKey(keys: Seq[String]): String = keys.mkString(".")

  private def jsonPath(keys: Seq[String]): String =
    "$." + keys.map(k => if (k.exists(c => c == '.' || c == ' ')) s"['$k']" else k).mkString(".")

  /** `get_json_object` behind a cheap looks-like-a-JSON-object guard:
    * `$.x` paths only ever match object bodies, but the evaluator still
    * pays a full Jackson parser setup per call on every non-JSON row
    * (profiled ~7% of flagship CPU for a usually-absent field). The anchored
    * regex fails on the first byte for non-`{` bodies.
    */
  private def bodyJson(keys: Seq[String]): Column =
    when(col("body").rlike("^\\s*\\{"),
      get_json_object(col("body"), jsonPath(keys)))

  /** Read a field as STRING (stringify-on-read, like `fmt.Sprintf("%v")`
    * call sites in the reference). Null when absent.
    */
  def readString(f: FieldRef): Column = f match {
    case Body => col("body")
    case BodyPath(keys) => bodyJson(keys)
    case Attr(keys) =>
      val k = attrKey(keys)
      val flat = coalesce(
        col("attributes_string").getItem(k),
        stringifyNumber(col("attributes_number").getItem(k)),
        col("attributes_bool").getItem(k).cast("string"))
      // nested path fallback: a non-flattened json_parser stores nested
      // objects as serialized JSON under the head key (JsonExprs put);
      // the reference keeps real map[string]any entries that field refs
      // traverse — read through the serialized value to match
      if (keys.length == 1) flat
      else coalesce(flat,
        get_json_object(col("attributes_string").getItem(keys.head),
          jsonPath(keys.tail)))
    case Resource(keys) => col("resources_string").getItem(attrKey(keys))
    case Top(n) => col(n).cast("string")
    case AttrsRoot | ResourceRoot =>
      throw new IllegalArgumentException("cannot read whole attributes/resource as string")
  }

  /** Go-style `%v` for float64: integral values print without decimals. */
  private def stringifyNumber(c: Column): Column =
    when(c.isNotNull,
      when(c === c.cast("long").cast("double"), c.cast("long").cast("string"))
        .otherwise(c.cast("string")))

  /** Read as DOUBLE where available (attributes_number first). */
  def readNumber(f: FieldRef): Column = f match {
    case Attr(keys) =>
      val k = attrKey(keys)
      coalesce(col("attributes_number").getItem(k), col("attributes_string").getItem(k).cast("double"))
    case Top(n) => col(n).cast("double")
    case other => readString(other).cast("double")
  }

  /** Presence under the WRITE-side semantics the move/copy/remove operators
    * gate on (`BodyField.Get/Delete` walk, body_field.go:101-199): a strict
    * object walk where a JSON `null` leaf IS present. The expression
    * language's `exists`/nil tests keep [[exists]]'s get_json_object
    * semantics (expr-lang `body.x == nil` is true for a null leaf).
    */
  def existsStrict(f: FieldRef): Column = f match {
    case BodyPath(keys) => graft.functions.BodyEdit.exists(col("body"), keys)
    case other => exists(other)
  }

  /** Presence test (reference `entry.Get(field)` ok-flag). */
  def exists(f: FieldRef): Column = f match {
    case Body => col("body").isNotNull
    case BodyPath(keys) => bodyJson(keys).isNotNull
    case Attr(keys) =>
      val k = attrKey(keys)
      val flat = map_contains_key(col("attributes_string"), k) ||
        map_contains_key(col("attributes_number"), k) ||
        map_contains_key(col("attributes_bool"), k)
      if (keys.length == 1) flat
      else flat || get_json_object(col("attributes_string").getItem(keys.head),
        jsonPath(keys.tail)).isNotNull
    case Resource(keys) => map_contains_key(col("resources_string"), attrKey(keys))
    case Top(n) => col(n).isNotNull
    case AttrsRoot | ResourceRoot => lit(true)
  }

  /** The dynamic type name of a field value, mirroring expr-lang `type()`:
    * "string" | "float" | "bool" | "nil" (our numbers are all float64,
    * exactly like values that round-tripped JSON in the reference).
    */
  def typeName(f: FieldRef): Column = f match {
    case Attr(keys) =>
      val k = attrKey(keys)
      when(map_contains_key(col("attributes_string"), k), "string")
        .when(map_contains_key(col("attributes_number"), k), "float")
        .when(map_contains_key(col("attributes_bool"), k), "bool")
        .otherwise("nil")
    case Resource(keys) =>
      when(map_contains_key(col("resources_string"), attrKey(keys)), "string").otherwise("nil")
    case Top("severity_number") | Top("trace_flags") | Top("turn_idx") => lit("int")
    case Top("timestamp") | Top("observed_timestamp") => lit("int")
    case f0 => when(readString(f0).isNotNull, "string").otherwise("nil")
  }

  // ---- writes -------------------------------------------------------------

  // codegen kernel, not map_filter: a CodegenFallback HOF here would drag
  // the whole operator-chain projection out of whole-stage codegen
  private def mapWithout(m: Column, key: String): Column =
    graft.functions.MapFilterKeys(m, Seq(key), keep = false)

  private def mapSet(m: Column, key: String, v: Column): Column =
    map_concat(mapWithout(m, key), map(lit(key), v))

  /** All column updates needed to set `f` to string value `v` (removing the
    * key from the other typed maps so a key lives in exactly one).
    */
  def setString(f: FieldRef, v: Column): Seq[(String, Column)] = f match {
    case Attr(keys) =>
      val k = attrKey(keys)
      Seq(
        "attributes_string" -> mapSet(col("attributes_string"), k, v),
        "attributes_number" -> mapWithout(col("attributes_number"), k),
        "attributes_bool" -> mapWithout(col("attributes_bool"), k))
    case Resource(keys) =>
      Seq("resources_string" -> mapSet(col("resources_string"), attrKey(keys), v))
    case Body => Seq("body" -> v)
    case BodyPath(keys) =>
      // string scalar write through the JSON body (BodyField.Set semantics
      // via BodyEdit; the value keeps its string type even if it looks
      // numeric/JSON — Go stores the string value as-is)
      Seq("body" -> graft.functions.BodyEdit.setRaw(col("body"), keys, v))
    case Top(n) => Seq(n -> v.cast(topType(n)))
    case other => throw new IllegalArgumentException(s"cannot set field $other")
  }

  def setNumber(f: FieldRef, v: Column): Seq[(String, Column)] = f match {
    case Attr(keys) =>
      val k = attrKey(keys)
      Seq(
        "attributes_number" -> mapSet(col("attributes_number"), k, v.cast("double")),
        "attributes_string" -> mapWithout(col("attributes_string"), k),
        "attributes_bool" -> mapWithout(col("attributes_bool"), k))
    case Top(n) => Seq(n -> v.cast(topType(n)))
    case BodyPath(keys) =>
      // Go-rendered number (integral values print without decimals) parsed
      // back as a JSON number, so the body JSON carries a number leaf
      Seq("body" -> graft.functions.BodyEdit.set(col("body"), keys,
        stringifyNumber(v.cast("double"))))
    case other => setString(other, v.cast("string"))
  }

  def setBool(f: FieldRef, v: Column): Seq[(String, Column)] = f match {
    case Attr(keys) =>
      val k = attrKey(keys)
      Seq(
        "attributes_bool" -> mapSet(col("attributes_bool"), k, v.cast("boolean")),
        "attributes_string" -> mapWithout(col("attributes_string"), k),
        "attributes_number" -> mapWithout(col("attributes_number"), k))
    case BodyPath(keys) =>
      Seq("body" -> graft.functions.BodyEdit.set(col("body"), keys,
        v.cast("boolean").cast("string")))
    case other => setString(other, v.cast("string"))
  }

  def remove(f: FieldRef): Seq[(String, Column)] = f match {
    case Attr(keys) =>
      val k = attrKey(keys)
      Seq(
        "attributes_string" -> mapWithout(col("attributes_string"), k),
        "attributes_number" -> mapWithout(col("attributes_number"), k),
        "attributes_bool" -> mapWithout(col("attributes_bool"), k))
    case Resource(keys) =>
      Seq("resources_string" -> mapWithout(col("resources_string"), attrKey(keys)))
    case AttrsRoot => Seq(
      "attributes_string" -> map().cast(graft.model.LogSchema.mapSS),
      "attributes_number" -> map().cast(graft.model.LogSchema.mapSD),
      "attributes_bool" -> map().cast(graft.model.LogSchema.mapSB))
    case ResourceRoot => Seq("resources_string" -> map().cast(graft.model.LogSchema.mapSS))
    case Body => Seq("body" -> lit(null).cast("string"))
    case BodyPath(keys) =>
      // no-op (body passes through) when the body is not a JSON object or
      // the path is absent — BodyField.Delete's !exist; operators that must
      // route that to on_error gate on existsStrict
      Seq("body" -> graft.functions.BodyEdit.delete(col("body"), keys))
    case Top(n) => Seq(n -> lit(null).cast(topType(n)))
    case other => throw new IllegalArgumentException(s"cannot remove field $other")
  }

  private def topType(n: String): String = n match {
    case "severity_number" | "trace_flags" | "turn_idx" => "int"
    case "timestamp" | "observed_timestamp" => "long"
    case _ => "string"
  }

  /** Is this top-level column numeric? (single source of truth for the
    * typed-value dispatch in AddOp / copyMove)
    */
  def isNumericTop(n: String): Boolean = topType(n) != "string"

  /** Apply a batch of column updates, optionally gated per-row: when `gate`
    * is false the original column value is kept (the reference's `if:` skip
    * and `on_error: send` pass-the-original-entry semantics,
    * `helper/transformer.go:96-147`).
    */
  def applyUpdates(df: DataFrame, updates: Seq[(String, Column)], gate: Option[Column]): DataFrame = {
    if (updates.isEmpty) return df
    val gated = gate match {
      case Some(g) => updates.map { case (name, c) => name -> when(g, c).otherwise(col(name)) }
      case None => updates
    }
    df.withColumns(gated.toMap)
  }
}
