package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.graftbridge.{GraftBridge => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Driver-side analysis of a regex with named capture groups.
  *
  * The reference's `regex_parser` matches an RE2 pattern with `(?P<name>...)`
  * named groups and emits a `map[name -> captured string]`
  * (`stanza/operator/operators/regex/parser.go:30-67`; match semantics =
  * leftmost search, all named groups present with "" for non-participating
  * groups, no-match is an error).
  *
  * Java's `Pattern` forbids `_` in group names (fixtures use
  * `k8s_namespace_name` etc.) and uses `(?<name>)` syntax, so instead of
  * relying on Java named groups we rewrite every named group to a plain
  * capturing group at the driver and track `name -> group index` ourselves.
  */
object RegexNamedGroups {

  /** Result of scanning a pattern: the rewritten (names-stripped) Java regex
    * and the capture-group names by index (1-based; None = unnamed group).
    */
  final case class Scanned(javaPattern: String, namesByIndex: Seq[Option[String]]) {
    def names: Seq[String] = namesByIndex.flatten
    require(names.distinct.size == names.size, s"duplicate group names in pattern")
  }

  /** Scan an RE2/Java pattern: count capturing groups, collect names, strip
    * name syntax (`(?P<n>` and `(?<n>` -> `(`). Handles escapes and character
    * classes; `(?<=` / `(?<!` lookbehinds are left untouched and not counted.
    */
  def scan(pattern: String): Scanned = {
    val out = new StringBuilder
    val names = scala.collection.mutable.ArrayBuffer.empty[Option[String]]
    var i = 0
    var inClass = false
    val n = pattern.length
    while (i < n) {
      val c = pattern.charAt(i)
      if (c == '\\' && i + 1 < n) { out.append(c).append(pattern.charAt(i + 1)); i += 2 }
      else if (inClass) { if (c == ']') inClass = false; out.append(c); i += 1 }
      else if (c == '[') { inClass = true; out.append(c); i += 1 }
      else if (c == '(') {
        if (i + 1 < n && pattern.charAt(i + 1) == '?') {
          val isP = i + 2 < n && pattern.charAt(i + 2) == 'P' && i + 3 < n && pattern.charAt(i + 3) == '<'
          val isAngle = i + 2 < n && pattern.charAt(i + 2) == '<' &&
            i + 3 < n && pattern.charAt(i + 3) != '=' && pattern.charAt(i + 3) != '!'
          if (isP || isAngle) {
            val start = i + (if (isP) 4 else 3)
            val end = pattern.indexOf('>', start)
            require(end > start, s"malformed named group at offset $i in: $pattern")
            names += Some(pattern.substring(start, end))
            out.append('(')
            i = end + 1
          } else { out.append(c); i += 1 } // non-capturing / lookaround: not counted
        } else {
          names += None
          out.append(c)
          i += 1
        }
      } else { out.append(c); i += 1 }
    }
    Scanned(out.toString, names.toSeq)
  }

  def namedGroupCount(pattern: String): Int = scan(pattern).names.size
}

/** Serializable per-task matcher: compiled once, reused across rows. */
final class NamedGroupMatcher(val pattern: String) extends Serializable {
  @transient private lazy val scanned = RegexNamedGroups.scan(pattern)
  @transient private lazy val compiled = Pattern.compile(scanned.javaPattern)
  @transient private lazy val keyArray: Array[UTF8String] = {
    // keys are emitted in group-index order, mirroring SubexpNames iteration
    scanned.namesByIndex.flatten.map(UTF8String.fromString).toArray
  }
  @transient private lazy val namedIdx: Array[Int] =
    scanned.namesByIndex.zipWithIndex.collect { case (Some(_), i) => i + 1 }.toArray

  /** Leftmost match; null if no match (caller maps that to the error path).
    * All named groups are present; non-participating groups get "".
    */
  def extract(input: UTF8String): MapData = {
    if (input == null) return null
    val m = compiled.matcher(input.toString)
    if (!m.find()) return null
    val vals = new Array[Any](namedIdx.length)
    var i = 0
    while (i < namedIdx.length) {
      val g = m.group(namedIdx(i))
      vals(i) = UTF8String.fromString(if (g == null) "" else g)
      i += 1
    }
    new ArrayBasedMapData(
      new GenericArrayData(keyArray.asInstanceOf[Array[Any]]),
      new GenericArrayData(vals))
  }
}

/** `regex_extract_groups(str)` -> `MAP<STRING,STRING>` of all named capture
  * groups of a constant pattern; NULL when the pattern does not match (or the
  * input is NULL). Codegen-friendly: generated code calls the shared
  * per-task matcher, keeping the surrounding stage in whole-stage codegen.
  */
case class RegexExtractNamedGroups(child: Expression, pattern: String)
    extends UnaryExpression {

  require(RegexNamedGroups.namedGroupCount(pattern) > 0,
    s"regex pattern must contain at least one named group: $pattern")

  private lazy val matcher = new NamedGroupMatcher(pattern)

  override def dataType: DataType = MapType(StringType, StringType, valueContainsNull = true)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    matcher.extract(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("matcher", matcher, classOf[NamedGroupMatcher].getName)
    nullSafeCodeGen(ctx, ev, input =>
      s"""
         |${ev.value} = $m.extract($input);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): RegexExtractNamedGroups =
    copy(child = newChild)
}

object RegexExtractNamedGroups {
  /** Column API: extract all named groups of `pattern` from `c`. */
  def apply(c: Column, pattern: String): Column =
    ExpressionUtils.column(RegexExtractNamedGroups(ExpressionUtils.expression(c), pattern))
}
