package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.graftbridge.{GraftBridge => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass map merge kernel.
  *
  * The operator compiler originally expressed "merge parsed keys into a typed
  * attribute map, evicting those keys from the other typed maps" as chains of
  * `map_filter` + `map_concat` + `map_contains_key`. Spark's higher-order
  * functions evaluate their lambdas interpreted, per map entry, per row —
  * profiled as a top-3 cost of the whole pipeline. This expression does the
  * same job in one imperative pass: `result = old - keys(winner) - keys(d1)
  * - keys(d2) ++ winner`.
  *
  * `winner`, `d1`, `d2` may be NULL columns (treated as empty).
  */
final class MapMergeWorker(valueType: DataType) extends Serializable {
  def merge(old: MapData, winner: MapData, d1: MapData, d2: MapData): MapData = {
    if (old == null) return null
    val drop = new java.util.HashSet[UTF8String]()
    def addKeys(m: MapData): Unit = if (m != null) {
      val ks = m.keyArray()
      var i = 0
      while (i < m.numElements()) { drop.add(ks.getUTF8String(i)); i += 1 }
    }
    val n = old.numElements()
    val wn = if (winner == null) 0 else winner.numElements()
    // zero-alloc fast paths for the common empty cases
    if (n == 0 && wn == 0) return old
    if (n == 0) return winner
    addKeys(winner); addKeys(d1); addKeys(d2)
    if (drop.isEmpty && wn == 0) return old

    val keys = new Array[Any](n + wn)
    val vals = new Array[Any](n + wn)
    var out = 0
    val ok = old.keyArray(); val ov = old.valueArray()
    var i = 0
    while (i < n) {
      val k = ok.getUTF8String(i)
      if (!drop.contains(k)) {
        keys(out) = k
        vals(out) = if (ov.isNullAt(i)) null else ov.get(i, valueType)
        out += 1
      }
      i += 1
    }
    if (wn > 0) {
      val wk = winner.keyArray(); val wv = winner.valueArray()
      var j = 0
      while (j < wn) {
        keys(out) = wk.getUTF8String(j)
        vals(out) = if (wv.isNullAt(j)) null else wv.get(j, valueType)
        out += 1
        j += 1
      }
    }
    val k2 = if (out == keys.length) keys else java.util.Arrays.copyOf(keys.asInstanceOf[Array[AnyRef]], out).asInstanceOf[Array[Any]]
    val v2 = if (out == vals.length) vals else java.util.Arrays.copyOf(vals.asInstanceOf[Array[AnyRef]], out).asInstanceOf[Array[Any]]
    new ArrayBasedMapData(new GenericArrayData(k2), new GenericArrayData(v2))
  }
}

/** `merge_maps(old, winner, dropKeysOf1, dropKeysOf2)` — see [[MapMergeWorker]]. */
case class MergeMaps(old: Expression, winner: Expression, d1: Expression, d2: Expression)
    extends Expression {

  private lazy val valueType: DataType =
    old.dataType.asInstanceOf[MapType].valueType
  private lazy val worker = new MapMergeWorker(valueType)

  override def children: Seq[Expression] = Seq(old, winner, d1, d2)
  override def dataType: DataType = MapType(StringType, valueType, valueContainsNull = true)
  override def nullable: Boolean = old.nullable
  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: InternalRow): Any = {
    val o = old.eval(input)
    if (o == null) return null
    worker.merge(
      o.asInstanceOf[MapData],
      winner.eval(input).asInstanceOf[MapData],
      d1.eval(input).asInstanceOf[MapData],
      d2.eval(input).asInstanceOf[MapData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val w = ctx.addReferenceObj("worker", worker, classOf[MapMergeWorker].getName)
    val oC = old.genCode(ctx)
    val wC = winner.genCode(ctx)
    val d1C = d1.genCode(ctx)
    val d2C = d2.genCode(ctx)
    val md = classOf[MapData].getName
    ev.copy(code =
      code"""
        ${oC.code}
        ${wC.code}
        ${d1C.code}
        ${d2C.code}
        boolean ${ev.isNull} = ${oC.isNull};
        $md ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = $w.merge(
            ${oC.value},
            ${wC.isNull} ? null : ${wC.value},
            ${d1C.isNull} ? null : ${d1C.value},
            ${d2C.isNull} ? null : ${d2C.value});
        }""")
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MergeMaps =
    copy(old = newChildren(0), winner = newChildren(1), d1 = newChildren(2), d2 = newChildren(3))
}

object MergeMaps {
  def apply(old: Column, winner: Column, d1: Column, d2: Column): Column =
    ExpressionUtils.column(MergeMaps(
      ExpressionUtils.expression(old), ExpressionUtils.expression(winner),
      ExpressionUtils.expression(d1), ExpressionUtils.expression(d2)))
}

/** Sorted-key compact JSON of a MAP<STRING,STRING> — what Go's
  * `json.Marshal` emits for the resource labels column
  * (`exporter/clickhouselogsexporter/exporter.go:656-661`), byte-for-byte
  * incl. the escapeHTML default ([[JsonCanon.quote]]).
  *
  * Replaces `to_json(map_from_entries(array_sort(map_entries(m), <lambda>)))`:
  * ArraySort-with-comparator is a HigherOrderFunction = CodegenFallback, and
  * ONE fallback expression kicks the ENTIRE enclosing projection out of
  * whole-stage codegen — the exporter's final projection (fingerprint,
  * ids, record sizes, everything) was silently running interpreted because
  * of this single labels column.
  */
object MapSortedJsonKernel extends Serializable {
  def toJson(m: MapData): UTF8String = {
    if (m == null) return null
    val n = m.numElements()
    if (n == 0) return UTF8String.fromString("{}")
    val keys = m.keyArray()
    val vals = m.valueArray()
    val idx = Array.range(0, n)
    // keys compare as UTF8String (UTF-8 BYTE order — what Go's json.Marshal
    // sorts by); java.lang.String '<' is UTF-16 code-unit order and diverges
    // on supplementary-plane keys (e.g. emoji)
    val ks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { ks(i) = keys.getUTF8String(i); i += 1 }
    // insertion sort on the (small) resource map
    i = 1
    while (i < n) {
      val ki = ks(idx(i))
      val ii = idx(i)
      var j = i - 1
      while (j >= 0 && ks(idx(j)).compareTo(ki) > 0) { idx(j + 1) = idx(j); j -= 1 }
      idx(j + 1) = ii
      i += 1
    }
    val sb = new java.lang.StringBuilder(n * 24)
    sb.append('{')
    i = 0
    while (i < n) {
      if (i > 0) sb.append(',')
      val k = idx(i)
      sb.append(JsonCanon.quote(ks(k).toString)).append(':')
      if (vals.isNullAt(k)) sb.append("null")
      else sb.append(JsonCanon.quote(vals.getUTF8String(k).toString))
      i += 1
    }
    sb.append('}')
    UTF8String.fromString(sb.toString)
  }
}

/** `map_sorted_json(map)` — see [[MapSortedJsonKernel]]; NULL for NULL. */
case class MapSortedJson(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    MapSortedJsonKernel.toJson(input.asInstanceOf[MapData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, input =>
      s"graft.functions.MapSortedJsonKernel$$.MODULE$$.toJson($input)")
  override protected def withNewChildInternal(newChild: Expression): MapSortedJson =
    copy(child = newChild)
}

object MapSortedJson {
  def apply(c: Column): Column =
    ExpressionUtils.column(MapSortedJson(ExpressionUtils.expression(c)))
}

/** One typed map -> an array of tag-attribute rows
  * `struct(tag_key, tag_type, tag_data_type, string_value, number_value)` —
  * the codegen replacement for `transform(map_entries(m), <struct lambda>)`
  * in the exporter's tagRows: `transform` is a CodegenFallback HOF and one
  * of them de-codegens the whole tag projection. A NULL map yields an empty
  * array (the concat() null-propagation guard, built in).
  *
  * `mode`: 0 = string values (string_value = v), 1 = double values
  * (number_value = v), 2 = boolean values (both value columns NULL — the
  * exporter emits bool tags as type-only rows).
  */
final class TagRowsWorker(tagType: String, dataType: String, mode: Int)
    extends Serializable {
  private val tagTypeU = UTF8String.fromString(tagType)
  private val dataTypeU = UTF8String.fromString(dataType)

  def rows(m: MapData): GenericArrayData = {
    if (m == null) return new GenericArrayData(Array.empty[Any])
    val n = m.numElements()
    val keys = m.keyArray()
    val vals = m.valueArray()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val sv: Any =
        if (mode == 0 && !vals.isNullAt(i)) vals.getUTF8String(i) else null
      val nv: Any =
        if (mode == 1 && !vals.isNullAt(i)) java.lang.Double.valueOf(vals.getDouble(i))
        else null
      out(i) = InternalRow(keys.getUTF8String(i), tagTypeU, dataTypeU, sv, nv)
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class MapToTagRows(child: Expression, tagType: String, dataTypeName: String,
    mode: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types._
  private lazy val worker = new TagRowsWorker(tagType, dataTypeName, mode)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("tag_key", StringType, nullable = false),
    StructField("tag_type", StringType, nullable = false),
    StructField("tag_data_type", StringType, nullable = false),
    StructField("string_value", StringType),
    StructField("number_value", DoubleType))), containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    worker.rows(child.eval(input).asInstanceOf[MapData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val w = ctx.addReferenceObj("worker", worker, classOf[TagRowsWorker].getName)
    val c = child.genCode(ctx)
    val gad = classOf[GenericArrayData].getName
    ev.copy(code =
      code"""
        ${c.code}
        $gad ${ev.value} = $w.rows(${c.isNull} ? null : ${c.value});
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MapToTagRows =
    copy(child = newChild)
}

object MapToTagRows {
  def apply(m: Column, tagType: String, dataType: String, mode: Int): Column =
    ExpressionUtils.column(MapToTagRows(
      ExpressionUtils.expression(m), tagType, dataType, mode))
}

/** Keep-or-drop map entries by a CONSTANT key set — the codegen replacement
  * for `map_filter(m, k => k.isin(...))` (a CodegenFallback HOF; one of
  * them de-codegens the enclosing projection). Fast path: when filtering
  * drops nothing (the usual case — e.g. removing an absent key), the input
  * MapData is returned as-is, zero allocation.
  */
final class MapFilterKeysWorker(keys: Array[String], keep: Boolean,
    valueType: DataType) extends Serializable {
  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](keys.length * 2)
    keys.foreach(k => s.add(UTF8String.fromString(k)))
    s
  }
  def filter(m: MapData): MapData = {
    if (m == null) return null
    val n = m.numElements()
    val ks = m.keyArray()
    var matches = 0
    var i = 0
    while (i < n) {
      if (set.contains(ks.getUTF8String(i))) matches += 1
      i += 1
    }
    val kept = if (keep) matches else n - matches
    if (kept == n) return m // nothing filtered out
    val vs = m.valueArray()
    val outK = new Array[Any](kept)
    val outV = new Array[Any](kept)
    var o = 0
    i = 0
    while (i < n) {
      val in = set.contains(ks.getUTF8String(i))
      if (in == keep) {
        outK(o) = ks.getUTF8String(i)
        outV(o) = if (vs.isNullAt(i)) null else vs.get(i, valueType)
        o += 1
      }
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(outK), new GenericArrayData(outV))
  }
}

case class MapFilterKeys(child: Expression, keys: Seq[String], keep: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  private lazy val worker = new MapFilterKeysWorker(keys.toArray, keep,
    child.dataType.asInstanceOf[MapType].valueType)
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(input: Any): Any =
    worker.filter(input.asInstanceOf[MapData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("worker", worker, classOf[MapFilterKeysWorker].getName)
    defineCodeGen(ctx, ev, input => s"$w.filter($input)")
  }
  override protected def withNewChildInternal(newChild: Expression): MapFilterKeys =
    copy(child = newChild)
}

object MapFilterKeys {
  def apply(m: Column, keys: Seq[String], keep: Boolean): Column =
    ExpressionUtils.column(MapFilterKeys(
      ExpressionUtils.expression(m), keys, keep))
}

/** Grok typed-capture conversion: a MAP<STRING,STRING> whose keys are all
  * declared numeric captures -> MAP<STRING,DOUBLE>, parsing `int`-typed
  * keys with integral semantics (non-integral -> null, like the non-ANSI
  * string->long cast) and `float`-typed keys as doubles. Replaces the
  * `transform_values(map_filter(...), <when-chain cast lambda>)` pair —
  * both CodegenFallback HOFs.
  */
final class MapGrokNumericWorker(intKeys: Array[String]) extends Serializable {
  @transient private lazy val ints: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](intKeys.length * 2)
    intKeys.foreach(k => s.add(UTF8String.fromString(k)))
    s
  }
  def convert(m: MapData): MapData = {
    if (m == null) return null
    val n = m.numElements()
    val ks = m.keyArray()
    val vs = m.valueArray()
    val outK = new Array[Any](n)
    val outV = new Array[Any](n)
    var i = 0
    while (i < n) {
      val k = ks.getUTF8String(i)
      outK(i) = k
      outV(i) =
        if (vs.isNullAt(i)) null
        else {
          val v = vs.getUTF8String(i)
          if (ints.contains(k)) {
            val w = new UTF8String.LongWrapper
            if (v.toLong(w)) java.lang.Double.valueOf(w.value.toDouble) else null
          } else {
            // double parse with cast semantics: trim + Java parse, null on fail
            try java.lang.Double.valueOf(v.toString.trim.toDouble)
            catch { case _: NumberFormatException => null }
          }
        }
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(outK), new GenericArrayData(outV))
  }
}

case class MapGrokNumeric(child: Expression, intKeys: Seq[String])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  private lazy val worker = new MapGrokNumericWorker(intKeys.toArray)
  override def dataType: DataType =
    MapType(StringType, org.apache.spark.sql.types.DoubleType, valueContainsNull = true)
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(input: Any): Any =
    worker.convert(input.asInstanceOf[MapData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("worker", worker, classOf[MapGrokNumericWorker].getName)
    defineCodeGen(ctx, ev, input => s"$w.convert($input)")
  }
  override protected def withNewChildInternal(newChild: Expression): MapGrokNumeric =
    copy(child = newChild)
}

object MapGrokNumeric {
  def apply(m: Column, intKeys: Seq[String]): Column =
    ExpressionUtils.column(MapGrokNumeric(
      ExpressionUtils.expression(m), intKeys))
}

/** Drop NULL-valued entries from a MAP<STRING,STRING> — the codegen
  * replacement for `map_filter(m, (k, v) => v.isNotNull)` (a CodegenFallback
  * HOF) in the enrich stage's attach maps, where unmatched lookup columns
  * materialize as null values. Fast path: a map with no null values is
  * returned as-is, zero allocation.
  */
object MapDropNullValuesKernel extends Serializable {
  def drop(m: MapData): MapData = {
    if (m == null) return null
    val n = m.numElements()
    val vs = m.valueArray()
    var nulls = 0
    var i = 0
    while (i < n) { if (vs.isNullAt(i)) nulls += 1; i += 1 }
    if (nulls == 0) return m
    val ks = m.keyArray()
    val outK = new Array[Any](n - nulls)
    val outV = new Array[Any](n - nulls)
    var o = 0
    i = 0
    while (i < n) {
      if (!vs.isNullAt(i)) {
        outK(o) = ks.getUTF8String(i)
        outV(o) = vs.getUTF8String(i)
        o += 1
      }
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(outK), new GenericArrayData(outV))
  }
}

case class MapDropNullValues(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(input: Any): Any =
    MapDropNullValuesKernel.drop(input.asInstanceOf[MapData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, input =>
      s"graft.functions.MapDropNullValuesKernel$$.MODULE$$.drop($input)")
  override protected def withNewChildInternal(newChild: Expression): MapDropNullValues =
    copy(child = newChild)
}

object MapDropNullValues {
  def apply(m: Column): Column =
    ExpressionUtils.column(MapDropNullValues(ExpressionUtils.expression(m)))
}

/** Force-stringify the three typed attribute maps into ONE MAP<STRING,STRING>
  * (the resource-attrs-at-the-sink rule): numbers print Go-%v style —
  * integral doubles without decimals, everything else Double.toString (what
  * the double->string cast emits) — and booleans as true/false. Replaces
  * `map_concat(strings, transform_values(numbers, ...),
  * transform_values(bools, ...))`: `transform_values` is a CodegenFallback
  * HOF and one of them de-codegens the whole ingest projection. NULL typed
  * maps are treated as empty; a NULL value inside a map stays NULL.
  */
object StringifyTypedMapsKernel extends Serializable {
  private val TRUE = UTF8String.fromString("true")
  private val FALSE = UTF8String.fromString("false")
  def stringify(strings: MapData, numbers: MapData, bools: MapData): MapData = {
    val ns = if (strings == null) 0 else strings.numElements()
    val nn = if (numbers == null) 0 else numbers.numElements()
    val nb = if (bools == null) 0 else bools.numElements()
    if (nn == 0 && nb == 0) {
      if (strings != null) return strings
      return new ArrayBasedMapData(new GenericArrayData(new Array[Any](0)),
        new GenericArrayData(new Array[Any](0)))
    }
    val outK = new Array[Any](ns + nn + nb)
    val outV = new Array[Any](ns + nn + nb)
    var o = 0
    if (ns > 0) {
      val ks = strings.keyArray(); val vs = strings.valueArray()
      var i = 0
      while (i < ns) {
        outK(o) = ks.getUTF8String(i)
        outV(o) = if (vs.isNullAt(i)) null else vs.getUTF8String(i)
        o += 1; i += 1
      }
    }
    if (nn > 0) {
      val ks = numbers.keyArray(); val vs = numbers.valueArray()
      var i = 0
      while (i < nn) {
        outK(o) = ks.getUTF8String(i)
        outV(o) =
          if (vs.isNullAt(i)) null
          else {
            val d = vs.getDouble(i)
            val l = d.toLong
            if (l.toDouble == d) UTF8String.fromString(java.lang.Long.toString(l))
            else UTF8String.fromString(java.lang.Double.toString(d))
          }
        o += 1; i += 1
      }
    }
    if (nb > 0) {
      val ks = bools.keyArray(); val vs = bools.valueArray()
      var i = 0
      while (i < nb) {
        outK(o) = ks.getUTF8String(i)
        outV(o) =
          if (vs.isNullAt(i)) null
          else if (vs.getBoolean(i)) TRUE else FALSE
        o += 1; i += 1
      }
    }
    new ArrayBasedMapData(new GenericArrayData(outK), new GenericArrayData(outV))
  }
}

case class StringifyTypedMaps(strings: Expression, numbers: Expression,
    bools: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(strings, numbers, bools)
  override def dataType: DataType = MapType(StringType, StringType, valueContainsNull = true)
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any =
    StringifyTypedMapsKernel.stringify(
      strings.eval(input).asInstanceOf[MapData],
      numbers.eval(input).asInstanceOf[MapData],
      bools.eval(input).asInstanceOf[MapData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val sC = strings.genCode(ctx)
    val nC = numbers.genCode(ctx)
    val bC = bools.genCode(ctx)
    val md = classOf[MapData].getName
    ev.copy(code =
      code"""
        ${sC.code}
        ${nC.code}
        ${bC.code}
        boolean ${ev.isNull} = false;
        $md ${ev.value} = graft.functions.StringifyTypedMapsKernel$$.MODULE$$.stringify(
          ${sC.isNull} ? null : ${sC.value},
          ${nC.isNull} ? null : ${nC.value},
          ${bC.isNull} ? null : ${bC.value});""")
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): StringifyTypedMaps =
    copy(strings = newChildren(0), numbers = newChildren(1), bools = newChildren(2))
}

object StringifyTypedMaps {
  def apply(strings: Column, numbers: Column, bools: Column): Column =
    ExpressionUtils.column(StringifyTypedMaps(
      ExpressionUtils.expression(strings), ExpressionUtils.expression(numbers),
      ExpressionUtils.expression(bools)))
}

/** Key-substring gate kernel: true when any key of the map CONTAINS one of
  * the configured substrings (plain substring, no globs) — the spanmapper
  * processor's `exists_any` condition (signozspanmapperprocessor/
  * processor.go:112-127 matchesAny). A NULL map matches nothing. Expressed
  * as a kernel (not `exists(map_keys(...))`) so the gate stays inside
  * whole-stage codegen like every other map op here.
  */
final class AnyKeyContainsWorker(subs: Array[String]) extends Serializable {
  @transient private lazy val pats: Array[UTF8String] =
    subs.map(UTF8String.fromString)
  def matches(m: MapData): Boolean = {
    if (m == null || pats.isEmpty) return false
    val n = m.numElements()
    val ks = m.keyArray()
    var i = 0
    while (i < n) {
      val k = ks.getUTF8String(i)
      var j = 0
      while (j < pats.length) {
        if (k.contains(pats(j))) return true
        j += 1
      }
      i += 1
    }
    false
  }
}

case class AnyKeyContains(child: Expression, subs: Seq[String])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types.BooleanType
  private lazy val worker = new AnyKeyContainsWorker(subs.toArray)

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    worker.matches(child.eval(input).asInstanceOf[MapData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val w = ctx.addReferenceObj("worker", worker, classOf[AnyKeyContainsWorker].getName)
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.value} = $w.matches(${c.isNull} ? null : ${c.value});
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): AnyKeyContains =
    copy(child = newChild)
}

object AnyKeyContains {
  def apply(m: Column, subs: Seq[String]): Column =
    ExpressionUtils.column(AnyKeyContains(ExpressionUtils.expression(m), subs))
}

/** Key-normalizing map transform: strip ASCII spaces from every key, then
  * apply exact renames — the codegen replacement for
  * `transform_keys(m, (k, _) => when(...)...)` (a CodegenFallback HOF) in
  * the firehose cwmetrics dimension normalization
  * (`cwmetricstream/metricsbuilder.go` normaliseAttributeName +
  * ToSemConvAttributeKey). Space (0x20) never occurs inside a UTF-8
  * multi-byte sequence, so a byte filter is charset-safe. Fast path: no
  * spaces and no rename hits returns the input map unchanged.
  */
final class MapRenameKeysWorker(renames: Array[Array[String]]) extends Serializable {
  @transient private lazy val table: java.util.HashMap[UTF8String, UTF8String] = {
    val t = new java.util.HashMap[UTF8String, UTF8String](renames.length * 2)
    renames.foreach(r => t.put(UTF8String.fromString(r(0)), UTF8String.fromString(r(1))))
    t
  }
  private def normalize(k: UTF8String): UTF8String = {
    val bytes = k.getBytes
    var spaces = 0
    var i = 0
    while (i < bytes.length) { if (bytes(i) == 0x20) spaces += 1; i += 1 }
    val stripped =
      if (spaces == 0) k
      else {
        val out = new Array[Byte](bytes.length - spaces)
        var o = 0
        i = 0
        while (i < bytes.length) {
          if (bytes(i) != 0x20) { out(o) = bytes(i); o += 1 }
          i += 1
        }
        UTF8String.fromBytes(out)
      }
    val renamed = table.get(stripped)
    if (renamed != null) renamed else stripped
  }
  def rename(m: MapData): MapData = {
    if (m == null) return null
    val n = m.numElements()
    val ks = m.keyArray()
    // fast path: nothing changes
    var changed = false
    var i = 0
    while (i < n && !changed) {
      val k = ks.getUTF8String(i)
      if (normalize(k) ne k) changed = true
      i += 1
    }
    if (!changed) return m
    val vs = m.valueArray()
    val outK = new Array[Any](n)
    val outV = new Array[Any](n)
    i = 0
    while (i < n) {
      outK(i) = normalize(ks.getUTF8String(i))
      outV(i) = if (vs.isNullAt(i)) null else vs.getUTF8String(i)
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(outK), new GenericArrayData(outV))
  }
}

case class MapRenameKeys(child: Expression, renames: Seq[(String, String)])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  private lazy val worker =
    new MapRenameKeysWorker(renames.map(r => Array(r._1, r._2)).toArray)
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(input: Any): Any =
    worker.rename(input.asInstanceOf[MapData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("worker", worker, classOf[MapRenameKeysWorker].getName)
    defineCodeGen(ctx, ev, input => s"$w.rename($input)")
  }
  override protected def withNewChildInternal(newChild: Expression): MapRenameKeys =
    copy(child = newChild)
}

object MapRenameKeys {
  def apply(m: Column, renames: Seq[(String, String)]): Column =
    ExpressionUtils.column(MapRenameKeys(ExpressionUtils.expression(m), renames))
}
