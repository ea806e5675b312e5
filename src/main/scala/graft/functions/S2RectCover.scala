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
  * the corner geometry and picks the exact st-rect hull — on a single cube
  * face directly, or piecewise after splitting the lon range at 45°
  * multiples when the bbox straddles faces or a face-centre meridian (the
  * distinct sample lattice remains only as the polar-cap fallback) — and
  * returns the packed cell array; the caller just explodes it.
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

  /** Equatorial face of the 45°-octant with index k = floor(lon/45):
    * octave classes {7,0}→face 0 (centre 0°), {1,2}→1 (90°), {3,4}→3
    * (180°), {5,6}→4 (−90°). */
  private def expectedFace(k: Long): Long = {
    val km = ((k % 8) + 8) % 8
    if (km == 0 || km == 7) 0L
    else if (km <= 2) 1L
    else if (km <= 4) 3L
    else 4L
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
      // EXACT multi-piece split (round-4, VERDICT r3 #8): cut the lon range
      // at every multiple of 45° — cube-face boundaries AND face centres —
      // so each piece lies on ONE equatorial face on one side of its centre
      // meridian, where u = tan(λrel) is lon-monotone and sec(λrel) is
      // monotone over the piece, putting all four u/v extremes at piece
      // corners. Each piece then gets the same exact st-rect hull as the
      // single-face path; the union (deduped — adjacent pieces can share a
      // boundary cell column) is the exact cover. A piece whose corners do
      // not agree on one equatorial face (polar involvement, exact-boundary
      // ties) drops the whole box to the total lattice fallback — the only
      // inputs that still sample are polar-cap / high-latitude
      // face-straddlers, where the corner-extreme argument genuinely fails.
      val k0 = math.floor(lonMin / 45.0).toLong
      val k1 = math.floor(lonMax / 45.0).toLong
      var exact = k1 - k0 <= 8 && lonMin >= -180.0 && lonMax <= 180.0
      // primitive accumulation (cross-piece dupes removed by one sort+dedup
      // at the end): a boxed LinkedHashSet here would re-create, for every
      // straddling row, the allocation pressure the corner path's faceUv
      // rewrite removed
      var buf = new Array[Long](64)
      var bn = 0
      def push(v: Long): Unit = {
        if (bn == buf.length) buf = java.util.Arrays.copyOf(buf, bn * 2)
        buf(bn) = v; bn += 1
      }
      var k = k0
      while (exact && k <= k1) {
        val a = math.max(lonMin, k * 45.0)
        val b = math.min(lonMax, (k + 1) * 45.0)
        if (a < b) {
          // the piece's face follows from its octant alone (a corner landing
          // EXACTLY on a face boundary would tie-break onto the neighbour
          // face, so corner-agreement is the wrong gate); u/v are then the
          // fixed-face formulas over the corner xyz, and the only remaining
          // validity condition is that no corner is polar-dominated
          val f = expectedFace(k)
          var uLo = Double.MaxValue; var uHi = Double.MinValue
          var vLo = Double.MaxValue; var vHi = Double.MinValue
          var c = 0
          while (exact && c < 4) {
            val lon = (if ((c & 1) == 0) a else b) * graft.core.Projection.D2R
            val lat = (if (c < 2) latMin else latMax) * graft.core.Projection.D2R
            val cl = math.cos(lat)
            val x = cl * math.cos(lon)
            val y = cl * math.sin(lon)
            val z = math.sin(lat)
            val horiz = if (f == 0L || f == 3L) x else y
            if (math.abs(horiz) >= math.abs(z)) {
              val (u, v) =
                if (f == 0L) (y / x, z / x)
                else if (f == 1L) (-x / y, z / y)
                else if (f == 3L) (z / x, y / x)
                else (z / y, -x / y) // f == 4
              uLo = math.min(uLo, u); uHi = math.max(uHi, u)
              vLo = math.min(vLo, v); vHi = math.max(vHi, v)
            } else exact = false // polar-dominated corner: lattice
            c += 1
          }
          if (exact) {
            val s0 = stIdx(uLo, level); val s1 = stIdx(uHi, level)
            val t0 = stIdx(vLo, level); val t1 = stIdx(vHi, level)
            var si = s0
            while (si <= s1) {
              var ti = t0
              while (ti <= t1) {
                push((((f << (2 * level)) | Cells.morton(si, ti)) << 5) | level.toLong)
                ti += 1
              }
              si += 1
            }
          }
        }
        k += 1
      }
      if (!exact || bn == 0) {
        // total fallback: the distinct sample lattice
        bn = 0
        val kk = (samples - 1).toDouble
        var i = 0
        while (i < samples) {
          var j = 0
          while (j < samples) {
            val lon = lonMin + (lonMax - lonMin) * (i / kk)
            val lat = latMin + (latMax - latMin) * (j / kk)
            push(Cells.s2CellId(lon, lat, level))
            j += 1
          }
          i += 1
        }
      }
      java.util.Arrays.sort(buf, 0, bn)
      var w = 0
      var r = 0
      while (r < bn) {
        if (w == 0 || buf(r) != buf(w - 1)) { buf(w) = buf(r); w += 1 }
        r += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
        java.util.Arrays.copyOf(buf, w))
    }
  }

  def column(lonMin: Column, latMin: Column, lonMax: Column, latMax: Column,
             level: Int, samples: Int): Column =
    GraftSqlBridge.column(S2RectCover(
      GraftSqlBridge.expression(lonMin), GraftSqlBridge.expression(latMin),
      GraftSqlBridge.expression(lonMax), GraftSqlBridge.expression(latMax),
      level, samples))
}
