package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Sub-rectangle extraction from a row-major ts x ts packed tile:
  * rows [r0, r1] x cols [c0, c1] (tile-local, inclusive) of `data`.
  * Powers the tile-warp gather, which ships each destination tile only the
  * source window it will actually read instead of whole tiles. A
  * transform/flatten/slice HOF chain expresses the same loop but runs
  * interpreted per element — this is the shuffle-write hot path, so it gets
  * a codegen Expression (static call into the shared JIT'd kernel). */
case class SliceGrid(data: Expression, r0: Expression, r1: Expression,
                     c0: Expression, c1: Expression, ts: Int) extends Expression {

  override def children: Seq[Expression] = Seq(data, r0, r1, c0, c1)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = children.exists(_.nullable)

  override def eval(input: InternalRow): Any = {
    val d = data.eval(input); val a = r0.eval(input); val b = r1.eval(input)
    val c = c0.eval(input); val e = c1.eval(input)
    if (d == null || a == null || b == null || c == null || e == null) null
    else graft.ops.TileWarp.sliceGrid(d.asInstanceOf[ArrayData], ts,
      a.asInstanceOf[Long], b.asInstanceOf[Long],
      c.asInstanceOf[Long], e.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val d = data.genCode(ctx); val a = r0.genCode(ctx); val b = r1.genCode(ctx)
    val c = c0.genCode(ctx); val e = c1.genCode(ctx)
    ev.copy(code =
      code"""
        |${d.code}
        |${a.code}
        |${b.code}
        |${c.code}
        |${e.code}
        |boolean ${ev.isNull} = ${d.isNull} || ${a.isNull} || ${b.isNull} ||
        |  ${c.isNull} || ${e.isNull};
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        |if (!${ev.isNull}) {
        |  ${ev.value} = graft.ops.TileWarp.sliceGrid(${d.value}, $ts,
        |    ${a.value}, ${b.value}, ${c.value}, ${e.value});
        |}
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SliceGrid =
    copy(data = newChildren(0), r0 = newChildren(1), r1 = newChildren(2),
         c0 = newChildren(3), c1 = newChildren(4))

  override def prettyName: String = "slice_grid"
}

object SliceGrid {
  def column(data: Column, r0: Column, r1: Column, c0: Column, c1: Column,
             ts: Int): Column =
    GraftSqlBridge.column(SliceGrid(
      GraftSqlBridge.expression(data), GraftSqlBridge.expression(r0),
      GraftSqlBridge.expression(r1), GraftSqlBridge.expression(c0),
      GraftSqlBridge.expression(c1), ts))
}
