package graft.functions

import graft.core.Cells
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
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
  * Cells.StEps floor guard — so the DuckDB oracle built from
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

  private def stIdx(u: Double, level: Int): Long = Cells.s2StIdx(u, level)

  /** Corner face/u/v with NO allocation: the generic Tuple3 that
    * Cells.s2FaceUv returns boxes both doubles, and at 4 corners/row x
    * millions of rows/task the boxing garbage alone stalled the whole JVM
    * in GC (round-4 stage metrics: the S2 stage burned 4-8x the GC of the
    * quadtree stage at near-equal CPU). Results land in `fuv` as
    * (face, u, v) primitives. */
  private def faceUv(lonDeg: Double, latDeg: Double, fuv: Array[Double]): Unit = {
    val lon = lonDeg * graft.core.Projection.D2R
    val lat = latDeg * graft.core.Projection.D2R
    val cl = math.cos(lat)
    val x = cl * math.cos(lon)
    val y = cl * math.sin(lon)
    val z = math.sin(lat)
    val ax = math.abs(x); val ay = math.abs(y); val az = math.abs(z)
    if (ax >= ay && ax >= az) {
      if (x > 0) { fuv(0) = 0; fuv(1) = y / x; fuv(2) = z / x }
      else { fuv(0) = 3; fuv(1) = z / x; fuv(2) = y / x }
    } else if (ay >= az) {
      if (y > 0) { fuv(0) = 1; fuv(1) = -x / y; fuv(2) = z / y }
      else { fuv(0) = 4; fuv(1) = z / y; fuv(2) = -x / y }
    } else {
      if (z > 0) { fuv(0) = 2; fuv(1) = -x / z; fuv(2) = -y / z }
      else { fuv(0) = 5; fuv(1) = -y / z; fuv(2) = -x / z }
    }
  }

  def cells(lonMin: Double, latMin: Double, lonMax: Double, latMax: Double,
            level: Int, samples: Int): ArrayData = {
    val fuv = new Array[Double](3)
    faceUv(lonMin, latMin, fuv)
    val f1 = fuv(0); val u1 = fuv(1); val v1 = fuv(2)
    faceUv(lonMax, latMin, fuv)
    val f2 = fuv(0); val u2 = fuv(1); val v2 = fuv(2)
    faceUv(lonMin, latMax, fuv)
    val f3 = fuv(0); val u3 = fuv(1); val v3 = fuv(2)
    faceUv(lonMax, latMax, fuv)
    val f4 = fuv(0); val u4 = fuv(1); val v4 = fuv(2)
    val sameFace = f2 == f1 && f3 == f1 && f4 == f1
    val no90 = math.floor(lonMin / 90.0) == math.floor(lonMax / 90.0)
    if (sameFace && no90) {
      val f = f1.toLong
      val uLo = math.min(math.min(u1, u2), math.min(u3, u4))
      val uHi = math.max(math.max(u1, u2), math.max(u3, u4))
      val vLo = math.min(math.min(v1, v2), math.min(v3, v4))
      val vHi = math.max(math.max(v1, v2), math.max(v3, v4))
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
      // UnsafeArrayData: the codegen'd consumer writes it out without the
      // per-row Generic->Unsafe conversion copy
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
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
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
    }
  }

  def column(lonMin: Column, latMin: Column, lonMax: Column, latMax: Column,
             level: Int, samples: Int): Column =
    GraftSqlBridge.column(S2RectCover(
      GraftSqlBridge.expression(lonMin), GraftSqlBridge.expression(latMin),
      GraftSqlBridge.expression(lonMax), GraftSqlBridge.expression(latMax),
      level, samples))
}
