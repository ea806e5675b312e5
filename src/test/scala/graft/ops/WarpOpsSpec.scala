package graft.ops

import graft.SparkTestBase
import graft.core._
import org.apache.spark.sql.functions._

class WarpOpsSpec extends SparkTestBase {

  def modis: GridRef = Synth.modisGrid
  def src: Raster = Raster(Synth.pixels(spark, modis), modis)

  def synth(r: Long, c: Long, seed: Long = 12345L): Long =
    if ((r * 53 + c * 97) % 101 == 0) -28672L
    else (r * 7919L + c * 104729L + seed) % 19997L - 9999L

  /** Pure-Scala nearest warp (reference path): dst centre -> lon/lat -> src
    * px -> floor. Used as the executor-independent expected value. */
  def expectedNearest(dst: GridRef, r: Int, c: Int): Long = {
    val dx = dst.transform.a * (c + 0.5) + dst.transform.c
    val dy = dst.transform.e * (r + 0.5) + dst.transform.f
    val (sx, sy) = Crs.reprojectPoint(dx, dy, dst.crs, modis.crs)
    val px = (sx - modis.transform.c) / modis.transform.a
    val py = (sy - modis.transform.f) / modis.transform.e
    val sc = math.floor(BigDecimal(px).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble).toLong
    val sr = math.floor(BigDecimal(py).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble).toLong
    if (sr < 0 || sr >= modis.height || sc < 0 || sc >= modis.width) -28672L
    else synth(sr, sc)
  }

  test("reproject nearest to WGS84: engine == pure-Scala reference path") {
    val dst = GridRef.suggestedWarpOutput(modis, Crs.WGS84)
    val out = WarpOps.reprojectNearest(src, dst).df
      .filter(col("row") % 17 === 0 && col("col") % 13 === 0)
      .select("row", "col", "value").collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt) -> r.getLong(2)).toMap
    assert(out.nonEmpty)
    out.foreach { case ((r, c), v) =>
      assert(v == expectedNearest(dst, r, c), s"pixel ($r,$c)")
    }
  }

  test("reproject_match onto the fixture UTM grid (golden transform) matches reference path") {
    val dst = Synth.matchUtmGrid
    val out = WarpOps.reprojectNearest(src, dst).df
      .filter(col("row") % 11 === 0 && col("col") % 7 === 0)
      .select("row", "col", "value").collect()
    assert(out.length > 100)
    out.foreach { r =>
      val (rr, cc, v) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2))
      assert(v == expectedNearest(dst, rr, cc), s"pixel ($rr,$cc)")
    }
  }

  /** first dst pixel whose 2x2 source neighbourhood is fully interior. */
  def interiorDstPixel(dst: GridRef): (Int, Int) = {
    (0 until dst.height).iterator.flatMap { r =>
      (0 until dst.width).iterator.map(c => (r, c))
    }.find { case (r, c) =>
      val dx = dst.transform.a * (c + 0.5) + dst.transform.c
      val dy = dst.transform.e * (r + 0.5) + dst.transform.f
      val (sx, sy) = Crs.reprojectPoint(dx, dy, dst.crs, modis.crs)
      val px = (sx - modis.transform.c) / modis.transform.a - 0.5
      val py = (sy - modis.transform.f) / modis.transform.e - 0.5
      px >= 1 && px < 198 && py >= 1 && py < 198
    }.get
  }

  test("bilinear interior matches hand-computed 2x2 weighting") {
    val dst = Synth.matchUtmGrid
    val (tr, tc) = interiorDstPixel(dst)
    val out = WarpOps.reprojectBilinear(src, dst).df
      .filter(col("row") === tr && col("col") === tc).collect()(0)
    // pure-scala recompute
    val dx = dst.transform.a * (tc + 0.5) + dst.transform.c
    val dy = dst.transform.e * (tr + 0.5) + dst.transform.f
    val (sx, sy) = Crs.reprojectPoint(dx, dy, dst.crs, modis.crs)
    def r9(v: Double) = BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val px = r9((sx - modis.transform.c) / modis.transform.a) - 0.5
    val py = r9((sy - modis.transform.f) / modis.transform.e) - 0.5
    val c0 = math.floor(px).toLong; val r0 = math.floor(py).toLong
    val wx = px - c0; val wy = py - r0
    val vs = Seq((0, 0), (0, 1), (1, 0), (1, 1)).map { case (dr, dc) =>
      val (r, c) = (r0 + dr, c0 + dc)
      if (r < 0 || r >= 200 || c < 0 || c >= 200) -28672L else synth(r, c)
    }
    val v = out.getDouble(4)
    if (vs.contains(-28672L)) assert(v == -28672.0)
    else {
      val exp = (1 - wy) * ((1 - wx) * vs(0) + wx * vs(1)) + wy * ((1 - wx) * vs(2) + wx * vs(3))
      assert(math.abs(v - exp) < 1e-9, s"$v vs $exp")
    }
  }

  test("cubic interior matches hand-computed 4x4 Keys weighting") {
    val dst = Synth.matchUtmGrid
    // first dst pixel whose 4x4 neighbourhood is fully interior
    val (tr, tc) = (0 until dst.height).iterator.flatMap { r =>
      (0 until dst.width).iterator.map(c => (r, c))
    }.find { case (r, c) =>
      val dx = dst.transform.a * (c + 0.5) + dst.transform.c
      val dy = dst.transform.e * (r + 0.5) + dst.transform.f
      val (sx, sy) = Crs.reprojectPoint(dx, dy, dst.crs, modis.crs)
      val px = (sx - modis.transform.c) / modis.transform.a - 0.5
      val py = (sy - modis.transform.f) / modis.transform.e - 0.5
      px >= 2 && px < 197 && py >= 2 && py < 197
    }.get
    val out = WarpOps.reprojectCubic(src, dst).df
      .filter(col("row") === tr && col("col") === tc).collect()(0)
    val dx = dst.transform.a * (tc + 0.5) + dst.transform.c
    val dy = dst.transform.e * (tr + 0.5) + dst.transform.f
    val (sx, sy) = Crs.reprojectPoint(dx, dy, dst.crs, modis.crs)
    def r9(v: Double) = BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val px = r9((sx - modis.transform.c) / modis.transform.a) - 0.5
    val py = r9((sy - modis.transform.f) / modis.transform.e) - 0.5
    val c0 = math.floor(px).toLong; val r0 = math.floor(py).toLong
    val tx = px - c0; val ty = py - r0
    def w(t: Double, off: Int): Double = {
      val a = -0.5
      off match {
        case -1 => ((a * (t + 1) - 5 * a) * (t + 1) + 8 * a) * (t + 1) - 4 * a
        case 0  => ((a + 2) * t - (a + 3)) * t * t + 1
        case 1  => ((a + 2) * (1 - t) - (a + 3)) * (1 - t) * (1 - t) + 1
        case 2  => (a * (2 - t) - 5 * a) * (2 - t) * (2 - t) + 8 * a * (2 - t) - 4 * a
      }
    }
    val vs = (for (dr <- -1 to 2; dc <- -1 to 2) yield {
      val (r, c) = (r0 + dr, c0 + dc)
      (dr, dc) -> (if (r < 0 || r >= 200 || c < 0 || c >= 200) -28672L else synth(r, c))
    }).toMap
    val v = out.getDouble(4)
    if (vs.values.exists(_ == -28672L)) assert(v == -28672.0)
    else {
      val exp = (-1 to 2).map { dr =>
        w(ty, dr) * (-1 to 2).map(dc => w(tx, dc) * vs((dr, dc))).sum
      }.sum
      assert(math.abs(v - exp) < 1e-6, s"$v vs $exp")
      // Keys weights partition unity: constant field stays constant
      assert(math.abs((-1 to 2).map(w(tx, _)).sum - 1.0) < 1e-12)
      assert(math.abs((-1 to 2).map(w(ty, _)).sum - 1.0) < 1e-12)
    }
  }

  test("rotated-grid reproject_match (both directions) matches pure-affine path") {
    import graft.Queries
    val rot = Queries.rotatedGrid; val sq = Queries.squaredGrid
    def r9(v: Double) = BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def expected(srcG: GridRef, dstG: GridRef, r: Int, c: Int): Long = {
      val (x, y) = dstG.transform(c + 0.5, r + 0.5)
      val inv = srcG.transform.invert
      val px = r9(inv.a * x + inv.b * y + inv.c)
      val py = r9(inv.d * x + inv.e * y + inv.f)
      val sc = math.floor(px).toLong; val sr = math.floor(py).toLong
      if (sr < 0 || sr >= srcG.height || sc < 0 || sc >= srcG.width) -28672L
      else synth(sr, sc)
    }
    val r2s = WarpOps.reprojectNearest(
      Raster(Synth.pixelsFull(spark, rot), rot), sq)
    assert(r2s.grid == sq) // reference asserts transform preservation
    r2s.df.filter(col("row") % 9 === 0 && col("col") % 7 === 0)
      .select("row", "col", "value").collect().foreach { q =>
        assert(q.getLong(2) == expected(rot, sq, q.getLong(0).toInt, q.getLong(1).toInt),
          s"rot->sq pixel (${q.getLong(0)},${q.getLong(1)})")
      }
    val s2r = WarpOps.reprojectNearest(
      Raster(Synth.pixelsFull(spark, sq), sq), rot)
    assert(s2r.grid == rot)
    // destination is rotated: x/y are the 2D (xc, yc) coordinate arrays
    val sample = s2r.df.filter(col("row") === 10 && col("col") === 20).collect()(0)
    assert(sample.getDouble(2) == 1.0 * 20.5 + 0.2 * 10.5 + 0.0) // xc
    assert(sample.getDouble(3) == 10.5)                          // yc
    s2r.df.filter(col("row") % 9 === 0 && col("col") % 7 === 0)
      .select("row", "col", "value").collect().foreach { q =>
        assert(q.getLong(2) == expected(sq, rot, q.getLong(0).toInt, q.getLong(1).toInt),
          s"sq->rot pixel (${q.getLong(0)},${q.getLong(1)})")
      }
  }

  test("resample average 4x: block mean of non-nodata, 50x50 output") {
    val out = WarpOps.resampleAverage(src, 4)
    assert(out.grid.width == 50 && out.grid.height == 50)
    assert(math.abs(out.grid.resX - 4 * modis.transform.a) < 1e-9)
    val v = out.df.filter(col("row") === 3 && col("col") === 7)
      .select("value").collect()(0).getDouble(0)
    val block = for (r <- 12L to 15L; c <- 28L to 31L; x = synth(r, c) if x != -28672L) yield x
    assert(math.abs(v - block.sum.toDouble / block.size) < 1e-12)
  }

  test("downsample kernel zoo matches pure-Scala block computation") {
    def blockVals(r0: Long, c0: Long): Seq[Long] =
      (for (r <- r0 * 4 until r0 * 4 + 4; c <- c0 * 4 until c0 * 4 + 4;
            v = synth(r, c) if v != -28672L) yield v).toSeq
    def pctl(vs: Seq[Long], q: Double): Double = {
      val s = vs.sorted
      val pos = (s.size - 1) * q
      val lo = pos.toInt; val f = pos - lo
      if (lo + 1 >= s.size) s(lo).toDouble
      else s(lo) + (s(lo + 1) - s(lo)) * f
    }
    val testBlocks = Seq((3L, 7L), (0L, 0L), (12L, 44L))
    for (m <- Seq("min", "max", "sum")) {
      val out = WarpOps.resampleDown(src, 4, m).df.collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
      testBlocks.foreach { case (r0, c0) =>
        val vs = blockVals(r0, c0)
        val exp = m match {
          case "min" => vs.min; case "max" => vs.max; case "sum" => vs.sum
        }
        assert(out((r0, c0)) == exp, s"$m block ($r0,$c0)")
      }
    }
    for ((m, q) <- Seq("med" -> 0.5, "q1" -> 0.25, "q3" -> 0.75)) {
      val out = WarpOps.resampleDown(src, 4, m).df.collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
      testBlocks.foreach { case (r0, c0) =>
        assert(out((r0, c0)) == pctl(blockVals(r0, c0), q), s"$m block ($r0,$c0)")
      }
    }
    val rms = WarpOps.resampleDown(src, 4, "rms").df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    testBlocks.foreach { case (r0, c0) =>
      val vs = blockVals(r0, c0)
      val exp = math.sqrt(vs.map(v => v * v).sum.toDouble / vs.size)
      assert(rms((r0, c0)) == exp, s"rms block ($r0,$c0)")
    }
    val mode = WarpOps.resampleMode(src, 4).df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(mode.size == 2500)
    testBlocks.foreach { case (r0, c0) =>
      val vs = blockVals(r0, c0)
      val maxN = vs.groupBy(identity).map(_._2.size).max
      val exp = vs.groupBy(identity).filter(_._2.size == maxN).keys.min
      assert(mode((r0, c0)) == exp, s"mode block ($r0,$c0)")
    }
  }

  test("lanczos upsample matches pure-Scala kernel; gauss renormalizes at edges/nodata") {
    // lanczos: interior dst pixel, compute expected from the same phase table
    val phases = WarpOps.lanczosPhases(2)
    val out = WarpOps.upsampleLanczos(src, 2).df
      .filter("row IN (101, 40) AND col IN (77, 256)").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    for ((dr, dc) <- Seq((101L, 77L), (40L, 256L), (101L, 256L), (40L, 77L))) {
      val (bR, wR) = phases((dr % 2).toInt); val (bC, wC) = phases((dc % 2).toInt)
      val r0 = dr / 2 + bR; val c0 = dc / 2 + bC
      val vals = for (i <- 0 until 6) yield
        (for (j <- 0 until 6) yield synth(r0 + i - 2, c0 + j - 2)).toSeq
      val exp =
        if (vals.flatten.exists(_ == -28672L)) -28672.0
        else (0 until 6).map(i => wR(i) * (0 until 6).map(j => wC(j) * vals(i)(j)).reduce(_ + _)).reduce(_ + _)
      assert(out((dr, dc)) == exp, s"dst ($dr,$dc)")
    }
    // gauss: interior block = full 16-sum over the binomial kernel; nodata
    // taps drop out with weight renormalization, never poisoning the block
    val g = WarpOps.resampleGauss(src).df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    assert(g.size == 100 * 100)
    for ((dr, dc) <- Seq((5L, 9L), (0L, 0L), (99L, 99L), (37L, 81L))) {
      var num = 0L; var den = 0L
      for (i <- -1 to 1; j <- -1 to 1) {
        val r = 2 * dr + i; val c = 2 * dc + j
        if (r >= 0 && r < 200 && c >= 0 && c < 200) {
          val v = synth(r, c)
          if (v != -28672L) { val w = (2 - math.abs(i)) * (2 - math.abs(j)); num += w * v; den += w }
        }
      }
      val exp = if (den == 0) -28672.0 else num.toDouble / den.toDouble
      assert(g((dr, dc)) == exp, s"gauss dst ($dr,$dc)")
    }
  }

  test("reproject kwargs: resolution XOR shape/transform guard, sizing honored") {
    val r = src
    intercept[IllegalArgumentException] { // raster_array.py:260-261 semantics
      WarpOps.reproject(r, graft.core.Crs.WGS84,
        resolution = Some((0.01, 0.01)), shape = Some((10, 10)))
    }
    val byRes = WarpOps.reproject(r, graft.core.Crs.WGS84, resolution = Some((0.004, 0.004)))
    assert(byRes.grid.transform.a == 0.004 && byRes.grid.transform.e == -0.004)
    val byShape = WarpOps.reproject(r, graft.core.Crs.WGS84, shape = Some((90, 110)))
    assert(byShape.grid.height == 90 && byShape.grid.width == 110)
    assert(byShape.df.count() == 90L * 110)
    val t = graft.core.Affine.northUp(-94.0, 45.3, 0.005, 0.005)
    val byT = WarpOps.reproject(r, graft.core.Crs.WGS84,
                                transform = Some(t), shape = Some((40, 50)))
    assert(byT.grid.transform == t && byT.grid.height == 40 && byT.grid.width == 50)
  }

  test("warp column math: TM forward columns agree with scalar Karney code") {
    import spark.implicits._
    val pts = Seq((-94.2, 44.9), (-93.0, 45.4), (-92.1, 45.9), (-95.5, 44.1))
    val df = pts.toDF("lon", "lat")
    val tm = Crs.utm(15, north = true)
    val (xc, yc) = WarpOps.forwardColumns(tm, col("lon"), col("lat"))
    val rows = df.select(xc.as("x"), yc.as("y")).collect()
    pts.zip(rows).foreach { case ((lon, lat), row) =>
      val (ex, ey) = tm.proj.forward(lon, lat)
      assert(math.abs(row.getDouble(0) - ex) < 1e-6, s"x for $lon,$lat")
      assert(math.abs(row.getDouble(1) - ey) < 1e-6, s"y for $lon,$lat")
    }
  }
}
