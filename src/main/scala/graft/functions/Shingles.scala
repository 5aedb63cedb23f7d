package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{GraftBridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass distinct word-n-gram shingles.
  *
  * Semantically identical to the composed column form in TextOps.shingles —
  * `array_distinct(CASE WHEN size(split(trim(text),'\s+')) >= n THEN
  * transform(sequence(1, size-n+1), i -> concat_ws(' ', slice(toks,i,n)))
  * ELSE array(concat_ws(' ', toks)) END)` — and therefore to the DuckDB
  * oracle replica, but computed in ONE codegen call. The composed form runs
  * through interpreted higher-order `transform`/`slice` lambdas that
  * re-evaluate `split(trim(text))` per shingle position: measured 3.4 s for
  * a 5 000-doc explode at sf0.1 vs ~0.1 s for this kernel (round-6 probe).
  *
  * Exact-replication notes:
  *  - Spark's `trim` strips ASCII space (0x20) ONLY — so does this kernel
  *    (`UTF8String.trim()` underneath, not Java's `String.trim`);
  *  - `split(s, "\\s+")` has limit -1: a leading tab/newline after the
  *    space-trim yields a leading "" token, which the column form keeps —
  *    so does this kernel;
  *  - `array_distinct` keeps first-occurrence order — so does the
  *    LinkedHashSet here.
  */
object ShinglesKernel extends Serializable {
  private val WS = java.util.regex.Pattern.compile("\\s+")

  def shingles(input: UTF8String, n: Int): GenericArrayData = {
    if (input == null) return null
    // UTF8String.trim() == Catalyst trim: strips 0x20 only
    val s = input.trim().toString
    val toks = WS.split(s, -1)
    val seen = new java.util.LinkedHashSet[String]()
    if (toks.length >= n) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j <= toks.length - n) {
        sb.setLength(0)
        var t = 0
        while (t < n) {
          if (t > 0) sb.append(' ')
          sb.append(toks(j + t))
          t += 1
        }
        seen.add(sb.toString)
        j += 1
      }
    } else {
      val sb = new java.lang.StringBuilder
      var t = 0
      while (t < toks.length) {
        if (t > 0) sb.append(' ')
        sb.append(toks(t))
        t += 1
      }
      seen.add(sb.toString)
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }
}

/** `shingle_array(text, n)` -> array<string> of distinct n-gram shingles. */
case class ShingleArray(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    ShinglesKernel.shingles(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, input =>
      s"graft.functions.ShinglesKernel$$.MODULE$$.shingles($input, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}

object ShingleArray {
  def apply(c: Column, n: Int): Column =
    ExpressionUtils.column(ShingleArray(ExpressionUtils.expression(c), n))
}
