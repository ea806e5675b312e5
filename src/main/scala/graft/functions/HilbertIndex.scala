package graft.functions

import graft.core.Cells
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of (ix, iy) at a fixed order — the range-partitioning
  * key mandated by the north_rule ("explicit range partitioning on
  * Hilbert-sorted cell IDs"). Codegen emits a static call into the same
  * scala implementation used driver-side, so executor and planner agree. */
case class HilbertIndex(left: Expression, right: Expression, order: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(ix: Any, iy: Any): Any =
    Cells.hilbertIndex(ix.asInstanceOf[Long], iy.asInstanceOf[Long], order)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.core.Cells.hilbertIndex($a, $b, $order)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HilbertIndex =
    copy(left = l, right = r)

  override def prettyName: String = "hilbert_index"
}

object HilbertIndex {
  def column(ix: Column, iy: Column, order: Int): Column =
    GraftSqlBridge.column(HilbertIndex(
      GraftSqlBridge.expression(ix), GraftSqlBridge.expression(iy), order))
}
