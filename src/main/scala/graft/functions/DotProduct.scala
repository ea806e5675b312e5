package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Sequential dot product of two numeric arrays, accumulated in double in
  * element order (bit-identical to DuckDB's list_dot_product over DOUBLE[]
  * and to the HOF formulation aggregate(zip_with(...))) — but fully
  * code-generated: the HOF version is interpreted per element and was the
  * dominant cost of every ANN/embedding query. */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    // Strict like DuckDB list_dot_product: mismatched lengths are an error,
    // not a silent truncation (a truncated dot masks corrupt embeddings).
    if (aa.numElements() != bb.numElements())
      throw new IllegalArgumentException(
        s"dot_product: array lengths differ (${aa.numElements()} vs ${bb.numElements()})")
    val n = aa.numElements()
    var sum = 0.0
    var i = 0
    (elemType(left), elemType(right)) match {
      case (FloatType, FloatType) =>
        while (i < n) { sum += aa.getFloat(i).toDouble * bb.getFloat(i).toDouble; i += 1 }
      case (DoubleType, DoubleType) =>
        while (i < n) { sum += aa.getDouble(i) * bb.getDouble(i); i += 1 }
      case (FloatType, DoubleType) =>
        while (i < n) { sum += aa.getFloat(i).toDouble * bb.getDouble(i); i += 1 }
      case (DoubleType, FloatType) =>
        while (i < n) { sum += aa.getDouble(i) * bb.getFloat(i).toDouble; i += 1 }
      case (lt, rt) => throw new IllegalArgumentException(s"dot over $lt/$rt unsupported")
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(dt: DataType, arr: String, i: String): String = dt match {
      case FloatType => s"((double) $arr.getFloat($i))"
      case DoubleType => s"$arr.getDouble($i)"
      case dt0 => throw new IllegalArgumentException(s"dot over $dt0 unsupported")
    }
    val lt = elemType(left); val rt = elemType(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "dot_product: array lengths differ (" + $a.numElements() + " vs " + $b.numElements() + ")");
         |}
         |int $n = $a.numElements();
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += ${getter(lt, a, i)} * ${getter(rt, b, i)};
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

object DotProduct {
  def column(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
