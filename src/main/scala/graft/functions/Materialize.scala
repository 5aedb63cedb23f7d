package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.{GraftBridge => ExpressionUtils}
import org.apache.spark.sql.types.DataType

/** Identity pass-through that pins its child to ONE evaluation per row.
  *
  * Catalyst's `CollapseProject` / filter pushdown inline an aliased
  * expression into every downstream reference; when the alias is an
  * expensive per-row kernel (the quality-score composite: several
  * `regexp_extract_all` passes + a split) referenced by a CASE ladder AND
  * a pushed-down filter, the inlining multiplies the kernel 3-5× per row
  * (measured 5.4× on epochMix at 500 k docs — TmpProbe 2026-08-20).
  * Marking the wrapper non-deterministic makes those rules leave the
  * producing projection in place — the value is computed once and every
  * consumer reads the materialized column. Runtime is a no-op: eval and
  * codegen delegate straight to the child, so the projection stays inside
  * whole-stage codegen.
  *
  * Semantics caveat (why this is safe here): the child IS deterministic —
  * the flag only disables duplication-style optimizations. Use only in
  * `select`/`withColumn` position (the analyzer rejects non-deterministic
  * expressions in aggregation keys / join conditions, which is fine: the
  * barrier belongs on projected scalar columns).
  */
case class Materialize(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Materialize =
    copy(child = newChild)

  override def prettyName: String = "materialize_once"
}

object Materialize {
  def apply(c: Column): Column =
    ExpressionUtils.column(Materialize(ExpressionUtils.expression(c)))
}
