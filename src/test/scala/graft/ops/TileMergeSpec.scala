package graft.ops

import graft.SparkTestBase
import graft.core._
import org.apache.spark.sql.functions._

class TileMergeSpec extends SparkTestBase {

  def modis: GridRef = Synth.modisGrid
  val modisB: GridRef = Synth.modisGrid.copy(
    transform = Synth.modisGrid.transform.windowed(50, 30))

  test("tile-native merge == exploded merge for every method") {
    val a = Raster(Synth.pixels(spark, modis), modis)
    val b = Raster(Synth.pixels(spark, modisB, seed = 777L), modisB)
    val packedA = TileWarp.pack(a, 40)
    val packedB = TileWarp.pack(b, 40)
    for (method <- Seq("first", "last", "min", "max", "sum", "count")) {
      val expected = MergeOps.merge(Seq(a, b), method).df
        .select("row", "col", "value").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val (tiles, dst) = TileMerge.mergeTiles(
        Seq(packedA -> modis, packedB -> modisB), method, 40)
      val got = TileWarp.toPixels(tiles, dst, 40)
        .select("row", "col", "value").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got.size == expected.size, s"$method: row counts differ")
      var diffs = 0
      expected.foreach { case (k, v) => if (got(k) != v) diffs += 1 }
      assert(diffs == 0, s"$method: $diffs pixels differ")
    }
  }

  test("composed tile-native merge->warp == exploded merge->warp (partial union tiles)") {
    val a = Raster(Synth.pixels(spark, modis), modis)
    val b = Raster(Synth.pixels(spark, modisB, seed = 777L), modisB)
    val ts = 40
    // exploded reference path
    val merged = MergeOps.merge(Seq(a, b), "first")
    val dst = GridRef.suggestedWarpOutput(merged.grid, Crs.WGS84)
    val expected = WarpOps.reprojectNearest(merged, dst).df
      .select("row", "col", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // tile-native composition: packed tiles flow merge -> warp directly
    val (mergedTiles, mergedGrid) = TileMerge.mergeTiles(
      Seq(TileWarp.pack(a, ts) -> modis, TileWarp.pack(b, ts) -> modisB), "first", ts)
    assert(mergedGrid == merged.grid)
    val got = TileWarp.toPixels(
        TileWarp.reprojectNearestPacked(
          mergedTiles.toDF().withColumnRenamed("tile_row", "st_row")
            .withColumnRenamed("tile_col", "st_col"),
          mergedGrid, dst, ts), dst, ts)
      .select("row", "col", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.size == expected.size)
    var diffs = 0
    expected.foreach { case (k, v) => if (got(k) != v) diffs += 1 }
    assert(diffs == 0, s"$diffs pixels differ in the composed tile pipeline")
  }

  test("tile merge plans no cartesian product") {
    val a = Raster(Synth.pixels(spark, modis), modis)
    val b = Raster(Synth.pixels(spark, modisB, seed = 777L), modisB)
    val (tiles, _) = TileMerge.mergeTiles(
      Seq(TileWarp.pack(a, 40) -> modis, TileWarp.pack(b, 40) -> modisB), "first", 40)
    val plan = tiles.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
  }
}
