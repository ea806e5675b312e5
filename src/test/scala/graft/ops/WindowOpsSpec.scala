package graft.ops

import graft.SparkTestBase
import graft.core._
import org.apache.spark.sql.functions._

class WindowOpsSpec extends SparkTestBase {

  lazy val modis: Raster = Raster(Synth.pixels(spark, Synth.modisGrid), Synth.modisGrid)

  // constants from reference test_integration_rioxarray.py:339-344
  val goldenBox = Bounds(-7272967.195874103, 5048602.8438240355,
                         -7272503.8831575755, 5049066.156540562)

  test("clip_box golden bbox -> 3x3 window with golden transform") {
    val clipped = WindowOps.clipBox(modis, goldenBox, allowOneDimensionalRaster = true)
    assert(clipped.grid.width == 3 && clipped.grid.height == 3)
    assert(clipped.df.count() == 9)
    // new origin = original transform shifted by (4, 4) pixels
    val t = clipped.grid.transform
    assert(math.abs(t.c - (-7274009.649486291 + 4 * 231.6563582639536)) < 1e-6)
    // values preserved from source (row 4..6, col 4..6 of the value fn)
    val vals = clipped.df.orderBy("row", "col").select("value").collect().map(_.getLong(0))
    val expected = for (r <- 4 to 6; c <- 4 to 6) yield
      if ((r * 53 + c * 97) % 101 == 0) -28672L
      else (r * 7919L + c * 104729L + 12345L) % 19997L - 9999L
    assert(vals.toSeq == expected)
  }

  test("clip_box raises OneDimensionalRaster for sub-pixel box, auto_expand recovers") {
    val tiny = Bounds(-7272967.19, 5049066.15, -7272967.18, 5049066.156)
    intercept[OneDimensionalRaster] { WindowOps.clipBox(modis, tiny) }
    val expanded = WindowOps.clipBox(modis, tiny, autoExpand = true)
    assert(expanded.grid.width >= 2 && expanded.grid.height >= 2)
  }

  test("clip_box raises NoDataInBounds outside the raster") {
    intercept[NoDataInBounds] {
      WindowOps.clipBox(modis, Bounds(0, 0, 1000, 1000))
    }
  }

  test("clip -> pad_box(original bounds) -> identity roundtrip (ref :266-331)") {
    val box = Bounds(-7271694.0, 5017500.0, -7237000.0, 5045000.0)
    val clipped = WindowOps.clipBox(modis, box)
    val padded = WindowOps.padBox(clipped, Synth.modisGrid.bounds)
    assert(padded.grid.width == 200 && padded.grid.height == 200, s"grid ${padded.grid}")
    val t = padded.grid.transform; val t0 = Synth.modisGrid.transform
    assert(math.abs(t.c - t0.c) < 1e-6 && math.abs(t.f - t0.f) < 1e-6)
    assert(padded.df.count() == 40000)
    // second clip returns exactly the clipped region values
    val reclipped = WindowOps.clipBox(Raster(padded.df, padded.grid), box)
    assert(reclipped.grid == clipped.grid)
    val a = reclipped.df.orderBy("row", "col").select("value").collect().map(_.getLong(0))
    val b = clipped.df.orderBy("row", "col").select("value").collect().map(_.getLong(0))
    assert(a.sameElements(b))
    // pad ring is nodata
    val ringCnt = padded.df.filter(col("value") === -28672L).count()
    assert(ringCnt >= (40000 - clipped.grid.width.toLong * clipped.grid.height))
  }

  test("isel_window ≡ manual filter (ref :2591-2598)") {
    val w = PixelWindow(10, 60, 5, 45)
    val sub = WindowOps.iselWindow(modis, w)
    assert(sub.grid.height == 50 && sub.grid.width == 40)
    assert(sub.df.count() == 2000)
    val direct = modis.df.filter(col("row") >= 10 && col("row") < 60 &&
                                 col("col") >= 5 && col("col") < 45).count()
    assert(direct == 2000)
  }

  test("window filter is pushed into the range generator (no shuffle, pruned scan)") {
    val clipped = WindowOps.clipBox(modis, goldenBox, allowOneDimensionalRaster = true)
    val plan = clipped.df.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"clip plan must be shuffle-free:\n$plan")
  }
}
