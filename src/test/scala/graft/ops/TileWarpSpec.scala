package graft.ops

import graft.SparkTestBase
import graft.core._
import org.apache.spark.sql.functions._

class TileWarpSpec extends SparkTestBase {

  def modis: GridRef = Synth.modisGrid

  test("tile-native nearest warp == exploded pixel warp (value-identical)") {
    val src = Raster(Synth.pixels(spark, modis), modis)
    val dst = GridRef.suggestedWarpOutput(modis, Crs.WGS84)
    val pixelPath = WarpOps.reprojectNearest(src, dst).df
      .select("row", "col", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val tilePath = TileWarp.toPixels(
        TileWarp.reprojectNearestTiles(src, dst, ts = 40), dst, ts = 40)
      .select("row", "col", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(tilePath.size == pixelPath.size,
      s"row counts differ: tile ${tilePath.size} vs pixel ${pixelPath.size}")
    var diffs = 0
    pixelPath.foreach { case (k, v) =>
      if (tilePath(k) != v) diffs += 1
    }
    assert(diffs == 0, s"$diffs pixels differ between tile and pixel warp paths")
  }

  test("tile-native bilinear warp == exploded bilinear (bit-identical doubles)") {
    val src = Raster(Synth.pixels(spark, modis), modis)
    val dst = GridRef.suggestedWarpOutput(modis, Crs.WGS84)
    val pixelPath = WarpOps.reprojectBilinear(src, dst).df
      .select("row", "col", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val tilePath = TileWarp.toPixels(
        TileWarp.reprojectBilinearTiles(src, dst, ts = 40), dst, ts = 40, asLong = false)
      .select("row", "col", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(tilePath.size == pixelPath.size)
    var diffs = 0
    pixelPath.foreach { case (k, v) =>
      // bit-exact comparison: the kernels must share every double op
      if (java.lang.Double.doubleToLongBits(tilePath(k)) !=
          java.lang.Double.doubleToLongBits(v)) diffs += 1
    }
    assert(diffs == 0, s"$diffs pixels differ between tile and pixel bilinear paths")
  }

  test("tile-native cubic warp == exploded cubic (bit-identical doubles)") {
    val src = Raster(Synth.pixels(spark, modis), modis)
    val dst = GridRef.suggestedWarpOutput(modis, Crs.WGS84)
    val pixelPath = WarpOps.reprojectCubic(src, dst).df
      .select("row", "col", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val tilePath = TileWarp.toPixels(
        TileWarp.reprojectCubicTiles(src, dst, ts = 40), dst, ts = 40, asLong = false)
      .select("row", "col", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(tilePath.size == pixelPath.size)
    var diffs = 0
    pixelPath.foreach { case (k, v) =>
      if (java.lang.Double.doubleToLongBits(tilePath(k)) !=
          java.lang.Double.doubleToLongBits(v)) diffs += 1
    }
    assert(diffs == 0, s"$diffs pixels differ between tile and pixel cubic paths")
  }

  test("tile-native cubic_spline warp == exploded cubic_spline (bit-identical)") {
    val src = Raster(Synth.pixels(spark, modis), modis)
    val dst = GridRef.suggestedWarpOutput(modis, Crs.WGS84)
    val pixelPath = WarpOps.reprojectCubicSpline(src, dst).df
      .select("row", "col", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val tilePath = TileWarp.toPixels(
        TileWarp.reprojectCubicSplineTiles(src, dst, ts = 40), dst, ts = 40, asLong = false)
      .select("row", "col", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(tilePath.size == pixelPath.size)
    var diffs = 0
    pixelPath.foreach { case (k, v) =>
      if (java.lang.Double.doubleToLongBits(tilePath(k)) !=
          java.lang.Double.doubleToLongBits(v)) diffs += 1
    }
    assert(diffs == 0, s"$diffs pixels differ between tile and pixel cubic_spline paths")
  }

  test("tile warp gathers source tiles via an equi-join (no cartesian)") {
    val src = Raster(Synth.pixels(spark, modis), modis)
    val dst = GridRef.suggestedWarpOutput(modis, Crs.WGS84)
    val plan = TileWarp.reprojectNearestTiles(src, dst, ts = 40)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"tile gather must be an equi-join:\n$plan")
  }

  test("identity-CRS tile warp (pure resample path) also matches") {
    // dst = same CRS, half resolution, offset origin: exercises the
    // aligned/affine fast case of the scalar mirror
    val src = Raster(Synth.pixels(spark, modis), modis)
    val dst = modis.copy(
      transform = modis.transform.compose(Affine.scale(2.0, 2.0)),
      width = 100, height = 100)
    val pixelPath = WarpOps.reprojectNearest(src, dst).df
      .select("row", "col", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val tilePath = TileWarp.toPixels(
        TileWarp.reprojectNearestTiles(src, dst, ts = 20), dst, ts = 20)
      .select("row", "col", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(tilePath == pixelPath)
  }
}
