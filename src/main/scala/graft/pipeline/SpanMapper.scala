package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{AnyKeyContains, GoFormatFloat, MapFilterKeys}

/** The span-mapper processor (`processor/signozspanmapperprocessor/
  * processor.go`): config-driven attribute normalization — groups gated by
  * an `exists_any` key-substring condition, each applying rules that copy or
  * move the FIRST existing source attribute into a target key, in span/log
  * attribute or resource context.
  *
  * Semantics replicated from the reference:
  *  - gate (processor.go:97-127): a group runs when any RESOURCE key
  *    contains one of its resource substrings (evaluated against the
  *    resource attrs AS RECEIVED — `resMatched` is computed per batch
  *    before any rule mutates them, processor.go:75-80) OR any ATTRIBUTE
  *    key contains one of its attribute substrings (evaluated against the
  *    current attr state, i.e. seeing earlier groups' writes);
  *  - rule (processor.go:133-166 applyRule): sources probed in order,
  *    first existing one wins; its value is copied to the target (resource
  *    context when `context: resource`, attrs otherwise), and the source
  *    key is deleted when its action is `move`; no source → no-op;
  *  - `resource.`-prefixed source keys read from resource attrs
  *    (config.go:117-120).
  *
  * Spark-first restatement over the typed-map row model: each rule is a
  * conditional map-update projection (codegen MapFilterKeys + map_concat,
  * no interpreted HOFs), applied sequentially so later rules and groups see
  * earlier writes exactly like the in-place pcommon.Map mutation. Values
  * keep their type when copied attr→attr (a key lives in exactly one typed
  * map); writes into resource context stringify numbers/bools the
  * `pcommon.Value.AsString` way (resource maps are force-stringified
  * everywhere in this engine). One deliberate divergence: the reference
  * mutates the resource map SHARED by all spans under one ResourceSpans, so
  * a resource-context write becomes visible to sibling spans in the same
  * batch — a batch-boundary-dependent effect; here every row sees its own
  * resource view (deterministic, boundary-free).
  */
object SpanMapper {

  /** `resource.`-prefixed keys resolve against resource attrs. */
  final case class Source(key: String, move: Boolean = false) {
    private[SpanMapper] def isResource: Boolean = key.startsWith("resource.")
    private[SpanMapper] def bare: String =
      if (isResource) key.stripPrefix("resource.") else key
  }

  final case class Rule(target: String, sources: Seq[Source],
      toResource: Boolean = false)

  final case class Group(id: String, attrPatterns: Seq[String],
      resPatterns: Seq[String], rules: Seq[Rule])

  private val S = "attributes_string"
  private val N = "attributes_number"
  private val B = "attributes_bool"
  private val R = "resources_string"

  private def without(m: Column, key: String): Column =
    MapFilterKeys(m, Seq(key), keep = false)

  private def put(m: Column, key: String, v: Column): Column =
    map_concat(without(m, key), map(lit(key), v))

  /** Conditional put/remove keeping the non-matching branch the identity. */
  private def gated(gate: Column, updated: Column, current: Column): Column =
    when(gate, updated).otherwise(current)

  /** Apply every group in order. Works on any frame with the typed attr
    * maps + resources_string (spans and logs share the shape).
    */
  def apply(df: DataFrame, groups: Seq[Group]): DataFrame = {
    if (groups.isEmpty) return df
    // the reference evaluates every group's resource condition against the
    // resource attrs as received, before any rule mutates them
    var cur = df.withColumn("__res0", col(R))
    groups.zipWithIndex.foreach { case (g, gi) =>
      val resGate =
        if (g.resPatterns.isEmpty) lit(false)
        else AnyKeyContains(col("__res0"), g.resPatterns)
      val attrGate =
        if (g.attrPatterns.isEmpty) lit(false)
        else AnyKeyContains(col(S), g.attrPatterns) ||
          AnyKeyContains(col(N), g.attrPatterns) ||
          AnyKeyContains(col(B), g.attrPatterns)
      val gateName = s"__gate_$gi"
      cur = cur.withColumn(gateName, resGate || attrGate)
      g.rules.foreach { r => cur = applyRule(cur, col(gateName), r) }
      cur = cur.drop(gateName)
    }
    cur.drop("__res0")
  }

  private def applyRule(df: DataFrame, gate: Column, rule: Rule): DataFrame = {
    // first existing source index (-1 = none); existence per context
    def exists(s: Source): Column =
      if (s.isResource) map_contains_key(col(R), s.bare)
      else map_contains_key(col(S), s.key) ||
        map_contains_key(col(N), s.key) || map_contains_key(col(B), s.key)
    val sel = rule.sources.zipWithIndex.foldRight(lit(-1)) {
      case ((s, i), rest) => when(exists(s), i).otherwise(rest)
    }
    val selected = gate && sel =!= -1

    // the selected source's value in AsString rendering (for resource-
    // context targets; numbers via Go FormatFloat like every stringified
    // value in this engine)
    def asString(s: Source): Column =
      if (s.isResource) col(R).getItem(s.bare)
      else coalesce(col(S).getItem(s.key),
        when(col(N).getItem(s.key).isNotNull, GoFormatFloat(col(N).getItem(s.key))),
        when(col(B).getItem(s.key).isNotNull,
          when(col(B).getItem(s.key), "true").otherwise("false")))

    // per typed map: fold the per-source updates into one conditional chain
    def updatedMap(mapName: String): Column = {
      val m = col(mapName)
      rule.sources.zipWithIndex.foldRight(m) { case ((s, i), rest) =>
        val active = selected && sel === i
        // 1. target write for this map
        val afterTarget: Column =
          if (rule.toResource) {
            if (mapName == R) put(m, rule.target, asString(s)) else m
          } else if (s.isResource) {
            // resource sources are strings; target lands in the string map,
            // evicted from the others
            mapName match {
              case S => put(m, rule.target, col(R).getItem(s.bare))
              case N | B => without(m, rule.target)
              case _ => m
            }
          } else {
            // attr source: the target joins the SAME typed map as the
            // source's value, and leaves the other two
            val srcHere = map_contains_key(col(mapName), s.key)
            mapName match {
              case S | N | B =>
                when(srcHere, put(m, rule.target, col(mapName).getItem(s.key)))
                  .otherwise(without(m, rule.target))
              case _ => m
            }
          }
        // 2. move: delete the source key from its context
        val afterMove: Column =
          if (!s.move) afterTarget
          else if (s.isResource) {
            if (mapName == R) without(afterTarget, s.bare) else afterTarget
          } else mapName match {
            case S | N | B =>
              // guard: a move whose target == source key must keep the
              // just-written target (reference deletes src AFTER the copy,
              // which for target==source removes the value entirely —
              // replicate exactly: delete wins)
              without(afterTarget, s.key)
            case _ => afterTarget
          }
        when(active, afterMove).otherwise(rest)
      }
    }

    df.withColumns(Map(
      S -> gated(selected, updatedMap(S), col(S)),
      N -> gated(selected, updatedMap(N), col(N)),
      B -> gated(selected, updatedMap(B), col(B)),
      R -> gated(selected, updatedMap(R), col(R))))
  }
}
