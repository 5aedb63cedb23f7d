package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Small string kernels shared by operators and expressions. */
object TextKernels {

  /** Unquote a fully double-quoted string, else return it unchanged —
    * the semantics of the reference's `Unquote` (`utils/utils.go:95-102`,
    * Go `strconv.Unquote` best-effort at the JSON-parser call site,
    * `operators/json/parser.go:43-47`). Handles the escape sequences JSON
    * round-trips produce: `\" \\ \n \t \r`.
    */
  def unquote(c: Column): Column = {
    val stripped = c.substr(lit(2), length(c) - 2)
    val unescaped =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(stripped, "\\\\\"", "\""),
              "\\\\n", "\n"),
            "\\\\t", "\t"),
          "\\\\r", "\r"),
        "\\\\\\\\", "\\\\")
    when(c.rlike("^\"(?s).*\"$"), unescaped).otherwise(c)
  }

  /** Cheap JSON-object shape check usable in codegen'd predicates — the
    * gate the `normalize` operator uses before attempting a body parse
    * (`operators/normalize/transformer.go:45-142`; validity itself is
    * enforced by `from_json` returning NULL on malformed input).
    */
  def looksLikeJsonObject(c: Column): Column =
    c.isNotNull && c.rlike("^\\s*\\{(?s).*\\}\\s*$")
}

/** Counts elements of a string array that are members of a constant set —
  * the codegen replacement for `size(filter(arr, w => w.isin(set)))`:
  * `filter` is a HigherOrderFunction (CodegenFallback), and one fallback
  * expression excludes the whole enclosing projection from whole-stage
  * codegen (the quality/language-ID projections were running interpreted
  * because of it). Null elements never match (same as isin).
  */
final class CountInSetWorker(items: Array[String]) extends Serializable {
  @transient private lazy val set: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String] = {
    val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](items.length * 2)
    items.foreach(i => s.add(org.apache.spark.unsafe.types.UTF8String.fromString(i)))
    s
  }
  def count(arr: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    if (arr == null) return 0
    var n = 0
    var i = 0
    val len = arr.numElements()
    while (i < len) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }
}

/** `count_in_set(array<string>)` -> INT (0 for NULL input). */
case class CountInSet(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    items: Seq[String])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  private lazy val worker = new CountInSetWorker(items.toArray)
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    worker.count(child.eval(input)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val w = ctx.addReferenceObj("worker", worker, classOf[CountInSetWorker].getName)
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        int ${ev.value} = $w.count(${c.isNull} ? null : ${c.value});
      """, isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): CountInSet =
    copy(child = newChild)
}

object CountInSet {
  def apply(c: Column, items: Seq[String]): Column =
    org.apache.spark.sql.graftbridge.GraftBridge.column(
      CountInSet(org.apache.spark.sql.graftbridge.GraftBridge.expression(c), items))
}
