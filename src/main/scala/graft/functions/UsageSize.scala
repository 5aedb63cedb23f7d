package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.graftbridge.{GraftBridge => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Go `encoding/json` float64 rendering (encode.go floatEncoder): shortest
  * round-trip decimal, `'f'` format unless `abs < 1e-6 || abs >= 1e21`
  * (then `'g'`), with json's exponent cleanup (`e-07` -> `e-7`). Integral
  * doubles render without a fraction (`5.0` -> `"5"`), exactly how an int64
  * attribute marshals — which is why the typed-split engine can size raw
  * attribute maps without tracking int-vs-double. Returns null for NaN/Inf
  * (Go json.Marshal errors on non-finite floats; the metering sizer then
  * records size 0 for the whole map — json.go SizeOfMapStringAny).
  */
object GoJsonFloatKernel extends Serializable {
  def format(d: Double): UTF8String = {
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) return null
    val abs = math.abs(d)
    if (abs != 0.0 && (abs < 1e-6 || abs >= 1e21)) {
      // 'g' branch. Java's shortest repr is already exponent-form here
      // (Java switches at >=1e7 / <1e-3, both inside this range).
      val s = java.lang.Double.toString(d)
      val ei = s.indexOf('E')
      var mant = s.substring(0, ei)
      if (mant.endsWith(".0")) mant = mant.substring(0, mant.length - 2)
      val exp = Integer.parseInt(s.substring(ei + 1))
      // strconv pads single-digit exponents (e-07) and json strips the pad
      // back off; |exp| here is always >= 7 so the net result is unpadded
      val es = if (exp >= 0) "e+" + exp else "e-" + (-exp)
      UTF8String.fromString(mant + es)
    } else GoFormatFloatKernel.format(d)
  }
}

/** Go-JSON serialization of a raw (typed) attribute map, reconstructed from
  * this engine's typed split: what `json.Marshal(record.Attributes().AsRaw())`
  * yields in the logs exporter's usage sizer (clickhouselogsexporter/
  * exporter.go:719) and the meter connector's logs sizer (pkg/metering/
  * json.go:46-68 SizeOfMapStringAny) — keys sorted in byte order (Go sorts
  * map keys), Go string escaping (HTML escapes on), numbers via
  * [[GoJsonFloatKernel]], bools bare. Returns null when any number is
  * NaN/Inf (json.Marshal error => the sizer counts 0 bytes for the map).
  *
  * Precision caveat (documented divergence): int64 attributes beyond 2^53
  * lose their exact decimal form in the double-typed split, so their
  * marshaled width can differ from the reference's.
  */
object TypedAttrsGoJsonKernel extends Serializable {
  private val EMPTY = UTF8String.fromString("{}")

  def toJson(strings: MapData, numbers: MapData, bools: MapData): UTF8String =
    toJson(strings, numbers, bools, false)

  /** `dropNonFinite=true` models the traces sizer's `IsValidFloat` filter
    * (pkg/metering/json.go:104-107: NaN/Inf numbers are silently dropped
    * before marshal); `false` models json.Marshal's error (-> null).
    */
  def toJson(strings: MapData, numbers: MapData, bools: MapData,
      dropNonFinite: Boolean): UTF8String = {
    val ns = if (strings == null) 0 else strings.numElements()
    val nn = if (numbers == null) 0 else numbers.numElements()
    val nb = if (bools == null) 0 else bools.numElements()
    val n = ns + nn + nb
    if (n == 0) return EMPTY
    val keys = new Array[UTF8String](n)
    val vals = new Array[String](n)
    var o = 0
    if (ns > 0) {
      val ks = strings.keyArray(); val vs = strings.valueArray()
      var i = 0
      while (i < ns) {
        keys(o) = ks.getUTF8String(i)
        vals(o) = if (vs.isNullAt(i)) "null" else JsonCanon.quote(vs.getUTF8String(i).toString)
        o += 1; i += 1
      }
    }
    if (nn > 0) {
      val ks = numbers.keyArray(); val vs = numbers.valueArray()
      var i = 0
      while (i < nn) {
        if (vs.isNullAt(i)) { keys(o) = ks.getUTF8String(i); vals(o) = "null"; o += 1 }
        else {
          val f = GoJsonFloatKernel.format(vs.getDouble(i))
          if (f == null) {
            if (!dropNonFinite) return null // marshal error parity
            // IsValidFloat filter: entry silently dropped
          } else { keys(o) = ks.getUTF8String(i); vals(o) = f.toString; o += 1 }
        }
        i += 1
      }
    }
    if (nb > 0) {
      val ks = bools.keyArray(); val vs = bools.valueArray()
      var i = 0
      while (i < nb) {
        keys(o) = ks.getUTF8String(i)
        vals(o) = if (vs.isNullAt(i)) "null" else if (vs.getBoolean(i)) "true" else "false"
        o += 1; i += 1
      }
    }
    val m = o // entries actually kept (dropNonFinite may have skipped some)
    if (m == 0) return EMPTY
    // insertion sort by key bytes (attr maps are small)
    val idx = Array.range(0, m)
    var i = 1
    while (i < m) {
      val ii = idx(i)
      val ki = keys(ii)
      var j = i - 1
      while (j >= 0 && keys(idx(j)).compareTo(ki) > 0) { idx(j + 1) = idx(j); j -= 1 }
      idx(j + 1) = ii
      i += 1
    }
    val sb = new java.lang.StringBuilder(m * 24)
    sb.append('{')
    i = 0
    while (i < m) {
      if (i > 0) sb.append(',')
      val k = idx(i)
      sb.append(JsonCanon.quote(keys(k).toString)).append(':').append(vals(k))
      i += 1
    }
    sb.append('}')
    UTF8String.fromString(sb.toString)
  }
}

/** Byte size of Go `json.Marshal([]string)` — brackets + per-element Go
  * quoting + commas. The traces billing sizer feeds the pre-serialized
  * per-event JSON strings through this (pkg/metering/json.go:180-188
  * SizeOfEvents over schema.Event strings), so each element is quoted AGAIN
  * (its inner quotes escape to `\"`). An empty slice sizes 2 ("[]") and is
  * then dropped by the `TotalSizeIfKeyExistsAndValueIsMapOrSlice <= 2` rule.
  */
object JsonStringArraySizeKernel extends Serializable {
  def size(arr: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    if (arr == null) return 0L
    val n = arr.numElements()
    if (n == 0) return 2L
    var total = 2L + (n - 1) // brackets + commas
    var i = 0
    while (i < n) {
      val s = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      if (s == null) total += 4 // json "null"
      else total += UTF8String.fromString(JsonCanon.quote(s.toString)).numBytes()
      i += 1
    }
    total
  }
}

case class JsonStringArraySize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    JsonStringArraySizeKernel.size(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        long ${ev.value} = graft.functions.JsonStringArraySizeKernel$$.MODULE$$.size(
          ${c.isNull} ? null : ${c.value});
        boolean ${ev.isNull} = false;""")
  }
  override protected def withNewChildInternal(newChild: Expression): JsonStringArraySize =
    copy(child = newChild)
}

object JsonStringArraySize {
  def apply(c: Column): Column =
    ExpressionUtils.column(JsonStringArraySize(ExpressionUtils.expression(c)))
}

case class TypedAttrsGoJson(strings: Expression, numbers: Expression,
    bools: Expression, dropNonFinite: Boolean = false) extends Expression {
  override def children: Seq[Expression] = Seq(strings, numbers, bools)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any =
    TypedAttrsGoJsonKernel.toJson(
      strings.eval(input).asInstanceOf[MapData],
      numbers.eval(input).asInstanceOf[MapData],
      bools.eval(input).asInstanceOf[MapData], dropNonFinite)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val sC = strings.genCode(ctx)
    val nC = numbers.genCode(ctx)
    val bC = bools.genCode(ctx)
    val u = classOf[UTF8String].getName
    ev.copy(code =
      code"""
        ${sC.code}
        ${nC.code}
        ${bC.code}
        $u ${ev.value} = graft.functions.TypedAttrsGoJsonKernel$$.MODULE$$.toJson(
          ${sC.isNull} ? null : ${sC.value},
          ${nC.isNull} ? null : ${nC.value},
          ${bC.isNull} ? null : ${bC.value}, $dropNonFinite);
        boolean ${ev.isNull} = ${ev.value} == null;""")
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TypedAttrsGoJson =
    copy(strings = newChildren(0), numbers = newChildren(1), bools = newChildren(2))
}

object TypedAttrsGoJson {
  def apply(strings: Column, numbers: Column, bools: Column): Column =
    ExpressionUtils.column(TypedAttrsGoJson(
      ExpressionUtils.expression(strings), ExpressionUtils.expression(numbers),
      ExpressionUtils.expression(bools)))
  def apply(strings: Column, numbers: Column, bools: Column,
      dropNonFinite: Boolean): Column =
    ExpressionUtils.column(TypedAttrsGoJson(
      ExpressionUtils.expression(strings), ExpressionUtils.expression(numbers),
      ExpressionUtils.expression(bools), dropNonFinite))
}
