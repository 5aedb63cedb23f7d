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

/** Single-pass token-window md5 array (round 6): for a doc with tokens
  * t1..tn, emits md5hex(concat_ws(' ', t_i..t_{i+w-1})) for every position
  * i — the windows [[graft.ops.Dedup.tokenWindowRows]] previously built via
  * `transform(sequence(1, n-w+1), i -> md5(concat_ws(' ', slice(t, i, w))))`,
  * whose interpreted per-position `slice` copies made the pass O(tokens²)
  * array work per document (15-20 s scaleup rows at 500k docs). Docs with
  * fewer than `w` tokens yield an EMPTY array (the caller's
  * `size(tokens) >= w` filter semantics). Same trim/split contract as
  * [[ShinglesKernel]].
  */
object WindowHashKernel extends Serializable {
  private val WS = java.util.regex.Pattern.compile("\\s+")
  private val HEX = "0123456789abcdef".toCharArray

  private def md5hex(md: java.security.MessageDigest, s: String): UTF8String = {
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Byte](32)
    var i = 0
    while (i < d.length) {
      out(i * 2) = HEX((d(i) >> 4) & 0xf).toByte
      out(i * 2 + 1) = HEX(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def windows(input: UTF8String, w: Int): GenericArrayData = {
    if (input == null) return null
    val toks = WS.split(input.trim().toString, -1)
    if (toks.length < w) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Any](toks.length - w + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - w) {
      sb.setLength(0)
      var t = 0
      while (t < w) {
        if (t > 0) sb.append(' ')
        sb.append(toks(i + t))
        t += 1
      }
      out(i) = md5hex(md, sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `window_hashes(text, w)` -> array<string> of per-position window md5s. */
case class WindowHashes(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    WindowHashKernel.windows(input.asInstanceOf[UTF8String], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, input =>
      s"graft.functions.WindowHashKernel$$.MODULE$$.windows($input, $w)")
  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)
}

object WindowHashes {
  def apply(c: Column, w: Int): Column =
    ExpressionUtils.column(WindowHashes(ExpressionUtils.expression(c), w))
}
