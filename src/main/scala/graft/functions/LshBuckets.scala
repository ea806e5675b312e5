package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All nTables random-hyperplane LSH bucket ids of an embedding in ONE
  * static kernel call (index = table id). Inlining the hyperplanes as
  * per-row literal arrays (nTables x nPlanes x dim CreateArray literals,
  * duplicated on both sides of the candidate self-join) generated methods
  * far past the JIT's compile threshold, so the hot loop ran as interpreted
  * bytecode — ~30x slower end-to-end. The kernel shares the exact
  * double-arithmetic of DotProduct/list_dot_product (element order,
  * float->double widening), so oracle SQL built from [[AnnOps.bucketSql]]
  * stays bit-identical. */
case class LshBuckets(child: Expression, nPlanes: Int, nTables: Int, dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(e: Any): Any =
    LshBuckets.buckets(e.asInstanceOf[ArrayData], nPlanes, nTables, dim, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LshBuckets.buckets($c, $nPlanes, $nTables, $dim, $isFloat)")

  override protected def withNewChildInternal(c: Expression): LshBuckets =
    copy(child = c)

  override def prettyName: String = "lsh_buckets"
}

object LshBuckets {

  /** (nPlanes, nTables, dim) -> flat hyperplane matrix
    * [table][plane * dim + d], cached per executor. */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()

  private def planes(nPlanes: Int, nTables: Int, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((nPlanes, nTables, dim), { key =>
      val (np, nt, d0) = key
      Array.tabulate(nt) { t =>
        val flat = new Array[Double](np * d0)
        var j = 0
        while (j < np) {
          var d = 0
          while (d < d0) {
            // same integer derivation as AnnOps.hyperplanes
            flat(j * d0 + d) = (((j * 73 + d * 179 + t * 1009 + 11) % 97) - 48) / 48.0
            d += 1
          }
          j += 1
        }
        flat
      }
    })

  /** Bucket id per table: bit j = sign(dot(v, hp_j)), dot accumulated in
    * double in element order (bit-identical to DotProduct / DuckDB
    * list_dot_product over the same plane literals). */
  def buckets(emb: ArrayData, nPlanes: Int, nTables: Int, dim: Int,
              isFloat: Boolean): ArrayData = {
    val hp = planes(nPlanes, nTables, dim)
    val n = math.min(dim, emb.numElements())
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      val flat = hp(t)
      var bk = 0L
      var j = 0
      while (j < nPlanes) {
        var sum = 0.0
        var d = 0
        val base = j * dim
        while (d < n) {
          val v = if (isFloat) emb.getFloat(d).toDouble else emb.getDouble(d)
          sum += v * flat(base + d)
          d += 1
        }
        if (sum > 0.0) bk |= (1L << j)
        j += 1
      }
      out(t) = bk
      t += 1
    }
    new GenericArrayData(out)
  }

  def column(emb: Column, nPlanes: Int, nTables: Int, dim: Int): Column =
    GraftSqlBridge.column(LshBuckets(
      GraftSqlBridge.expression(emb), nPlanes, nTables, dim))
}
