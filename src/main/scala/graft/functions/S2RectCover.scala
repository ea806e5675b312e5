package graft.functions

import graft.core.Cells
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The sliver-free S2 cover of a lon/lat bbox in ONE static kernel call.
  *
  * The first (pure-Column) formulation of the st-rect cover evaluated the
  * 4-corner face/u/v CASE chains as inlined Catalyst expression trees,
  * duplicated across the hull/fallback union branches — the generated code
  * blew past the JIT compile threshold and ran interpreted, 4x SLOWER than
  * the 81-sample lattice it was meant to replace (the exact failure mode
  * of round 2's unrolled LSH planes, BASELINE.md). This kernel is the
  * LshBuckets fix applied again: one compiled static call per row computes
  * the corner geometry, picks the exact st-rect hull on a single cube face
  * (or the distinct lattice when the bbox straddles faces / a 90° meridian)
  * and returns the packed cell array; the caller just explodes it.
  *
  * Arithmetic is the SCALAR mirror of Cells.s2CellIdColumn — the same
  * java.lang.Math trig the codegen'd Column form calls and the same
  * ROUND(,9) floor guard — so the DuckDB oracle built from
  * DocOps.geomCellCoverS2RectSql stays bit-identical. */
case class S2RectCover(lonMin: Expression, latMin: Expression,
                       lonMax: Expression, latMax: Expression,
                       level: Int, samples: Int)
    extends QuaternaryExpression {

  override def first: Expression = lonMin
  override def second: Expression = latMin
  override def third: Expression = lonMax
  override def fourth: Expression = latMax

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    S2RectCover.cells(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double], level, samples)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.functions.S2RectCover.cells($a, $b, $c, $d, $level, $samples)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): S2RectCover =
    copy(lonMin = f, latMin = s, lonMax = t, latMax = q)

  override def prettyName: String = "s2_rect_cover"
}

object S2RectCover {

  private def stIdx(u: Double, level: Int): Long = {
    val n = 1L << level
    math.min(n - 1, math.max(0L, math.floor(Cells.r9Public(Cells.s2St(u) * n)).toLong))
  }

  def cells(lonMin: Double, latMin: Double, lonMax: Double, latMax: Double,
            level: Int, samples: Int): ArrayData = {
    val c1 = Cells.s2FaceUv(lonMin, latMin)
    val c2 = Cells.s2FaceUv(lonMax, latMin)
    val c3 = Cells.s2FaceUv(lonMin, latMax)
    val c4 = Cells.s2FaceUv(lonMax, latMax)
    val sameFace = c2._1 == c1._1 && c3._1 == c1._1 && c4._1 == c1._1
    val no90 = math.floor(lonMin / 90.0) == math.floor(lonMax / 90.0)
    if (sameFace && no90) {
      val f = c1._1.toLong
      val uLo = math.min(math.min(c1._2, c2._2), math.min(c3._2, c4._2))
      val uHi = math.max(math.max(c1._2, c2._2), math.max(c3._2, c4._2))
      val vLo = math.min(math.min(c1._3, c2._3), math.min(c3._3, c4._3))
      val vHi = math.max(math.max(c1._3, c2._3), math.max(c3._3, c4._3))
      val s0 = stIdx(uLo, level); val s1 = stIdx(uHi, level)
      val t0 = stIdx(vLo, level); val t1 = stIdx(vHi, level)
      val out = new Array[Long](((s1 - s0 + 1) * (t1 - t0 + 1)).toInt)
      var i = 0
      var si = s0
      while (si <= s1) {
        var ti = t0
        while (ti <= t1) {
          out(i) = (((f << (2 * level)) | Cells.morton(si, ti)) << 5) | level.toLong
          i += 1
          ti += 1
        }
        si += 1
      }
      new GenericArrayData(out)
    } else {
      // multi-face / meridian-spanning fallback: the distinct sample lattice
      val k = (samples - 1).toDouble
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      var i = 0
      while (i < samples) {
        var j = 0
        while (j < samples) {
          val lon = lonMin + (lonMax - lonMin) * (i / k)
          val lat = latMin + (latMax - latMin) * (j / k)
          seen.add(Cells.s2CellId(lon, lat, level))
          j += 1
        }
        i += 1
      }
      val out = new Array[Long](seen.size())
      val it = seen.iterator()
      var n = 0
      while (it.hasNext) { out(n) = it.next(); n += 1 }
      new GenericArrayData(out)
    }
  }

  def column(lonMin: Column, latMin: Column, lonMax: Column, latMax: Column,
             level: Int, samples: Int): Column =
    GraftSqlBridge.column(S2RectCover(
      GraftSqlBridge.expression(lonMin), GraftSqlBridge.expression(latMin),
      GraftSqlBridge.expression(lonMax), GraftSqlBridge.expression(latMax),
      level, samples))
}
