package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.{GraftBridge => ExpressionUtils}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** GZIP decompression for receiver payloads. The firehose cwlogs receiver
  * gunzips every delivered record before parsing
  * (`receiver/signozawsfirehosereceiver/internal/unmarshaler/cwlog/
  * unmarshaler.go:44-50` via `compression.Unzip`); a record that fails to
  * unzip is skipped (logged) — mirrored here as NULL so the adapter's filter
  * drops it.
  */
object GunzipKernel extends Serializable {
  def gunzip(bytes: Array[Byte]): Array[Byte] = {
    if (bytes == null) return null
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val out = new java.io.ByteArrayOutputStream(math.max(64, bytes.length * 4))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } catch { case _: java.io.IOException => null }
  }
}

/** `gunzip(binary)` -> binary; NULL on corrupt input. */
case class Gunzip(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    GunzipKernel.gunzip(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"""
         |${ev.value} = graft.functions.GunzipKernel$$.MODULE$$.gunzip($input);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)
  override protected def withNewChildInternal(newChild: Expression): Gunzip =
    copy(child = newChild)
}

object Gunzip {
  def apply(c: Column): Column =
    ExpressionUtils.column(Gunzip(ExpressionUtils.expression(c)))
}
