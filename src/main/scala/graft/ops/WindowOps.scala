package graft.ops

import graft.core._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A raster as a distributed pixel table plus its grid sidecar.
  * Pixel schema: (row: long, col: long, x: double, y: double, value: long|double). */
final case class Raster(df: DataFrame, grid: GridRef)

/** Window/selection operators — the reference's isel_window / slice_xy /
  * clip_box / pad_xy / pad_box family (rioxarray/rioxarray.py:854-949,
  * rioxarray/raster_array.py:493-761).
  *
  * Design: the window is computed driver-side as a pure function of
  * (bounds, transform) — the "planner-side rewrite" of SURVEY.md §4 — and
  * becomes a literal Catalyst Filter on (row, col). Catalyst pushes it into
  * the scan/generator, so only matching tiles/row-groups are ever read:
  * the distributed analog of the reference's lazy windowed reads. No shuffle
  * is introduced by any operator in this file.
  */
object WindowOps {

  /** Integer-window subset (isel_window, rioxarray.py:854-904): filter to
    * the window, rebase (row, col) to the window origin, shift transform. */
  def iselWindow(r: Raster, w: PixelWindow): Raster = {
    val clamped = w.intersect(PixelWindow(0, r.grid.height, 0, r.grid.width))
    val df = r.df
      .filter(col("row") >= clamped.rowStart && col("row") < clamped.rowStop &&
              col("col") >= clamped.colStart && col("col") < clamped.colStop)
      .withColumn("row", col("row") - clamped.rowStart)
      .withColumn("col", col("col") - clamped.colStart)
    Raster(df, r.grid.windowed(clamped))
  }

  /** Label-based slice honoring descending y (slice_xy, rioxarray.py:906-949):
    * selects pixels whose centres fall within [min, max] on each axis. */
  def sliceXy(r: Raster, b: Bounds): Raster = {
    val g = r.grid
    // pixel-centre containment -> integer window (pure driver-side math)
    val c0 = math.ceil((b.minx - g.transform.c) / g.transform.a - 0.5).toInt
    val c1 = math.floor((b.maxx - g.transform.c) / g.transform.a - 0.5).toInt
    val r0 = math.ceil((b.maxy - g.transform.f) / g.transform.e - 0.5).toInt
    val r1 = math.floor((b.miny - g.transform.f) / g.transform.e - 0.5).toInt
    iselWindow(r, PixelWindow(math.max(0, r0), math.min(g.height, r1 + 1),
                              math.max(0, c0), math.min(g.width, c1 + 1)))
  }

  /** clip_box (raster_array.py:628-761): window-from-bounds with
    * floor(start)/ceil(stop) >= 0, auto-expand retry by half-resolution when
    * the result collapses to <=1 pixel, and the reference's error semantics. */
  def clipBox(r: Raster, b: Bounds, autoExpand: Boolean = false,
              autoExpandLimit: Int = 3,
              allowOneDimensionalRaster: Boolean = false): Raster = {
    val g = r.grid
    var bounds = b
    var w = g.windowFromBounds(bounds)
    var attempts = 0
    while (autoExpand && attempts < autoExpandLimit && !w.isEmpty &&
           (w.width <= 1 || w.height <= 1)) {
      bounds = Bounds(bounds.minx - math.abs(g.resX) / 2.0,
                      bounds.miny - math.abs(g.resY) / 2.0,
                      bounds.maxx + math.abs(g.resX) / 2.0,
                      bounds.maxy + math.abs(g.resY) / 2.0)
      w = g.windowFromBounds(bounds)
      attempts += 1
    }
    if (w.isEmpty)
      throw new NoDataInBounds(s"No data found in bounds $b (clip_box)")
    if ((w.width == 1 || w.height == 1) && !allowOneDimensionalRaster)
      throw new OneDimensionalRaster(
        "At least one of the clipped raster x,y coordinates has only one point. " +
        "Set allowOneDimensionalRaster=true or use autoExpand=true")
    iselWindow(r, w)
  }

  /** clip_box with bounds given in another CRS (raster_array.py:694-716):
    * densified transform_bounds into the raster's CRS first, with the
    * reference's antimeridian guard — a geographic raster whose transformed
    * bounds wrap (minx > maxx) cannot be expressed as one window. The
    * transform is pure driver-side planner math; the data path is exactly
    * [[clipBox]] (literal pushed-down window filter, no shuffle). */
  def clipBoxCrs(r: Raster, b: Bounds, boundsCrs: Crs,
                 autoExpand: Boolean = false, autoExpandLimit: Int = 3,
                 allowOneDimensionalRaster: Boolean = false): Raster = {
    val native =
      if (boundsCrs == r.grid.crs) b
      else {
        val nb = GridRef.transformBounds(b, boundsCrs, r.grid.crs)
        if (r.grid.crs.isGeographic && nb.minx > nb.maxx)
          throw new RioSparkException(
            "Transformed bounds crossed the antimeridian. Transform your " +
            "bounds manually and clip with the bounding box(es) desired.")
        nb
      }
    clipBox(r, native, autoExpand, autoExpandLimit, allowOneDimensionalRaster)
  }

  /** pad_xy (raster_array.py:493-571): extend coord ranges by whole pixels
    * (numpy.arange length semantics: n = ceil((stop-start)/step)) until the
    * requested pixel-CENTRE bounds are covered; fill with nodata/constant.
    *
    * Implementation is shuffle-free: existing pixels are re-indexed by a
    * projection; the pad ring is generated from spark.range + filter and
    * unioned in (union of two narrow plans, no exchange). */
  final case class PadCounts(rowsBefore: Long, rowsAfter: Long,
                             colsBefore: Long, colsAfter: Long)

  /** Pure pad-size computation (numpy.arange length semantics,
    * n = ceil((stop-start)/step), mirroring raster_array.py:536-557). */
  def padCounts(g: GridRef, b: Bounds): PadCounts = {
    val resX = math.abs(g.resX); val resY = math.abs(g.resY)
    val topC = g.yCoord(0); val botC = g.yCoord(g.height - 1)
    val leftC = g.xCoord(0); val rightC = g.xCoord(g.width - 1)

    // numpy arange length, with a 1e-7-pixel guard so that bounds that are an
    // exact whole-pixel multiple away (the clip->pad->clip roundtrip,
    // test_integration_rioxarray.py:266-331) don't gain a phantom row/col
    // from floating-point drift in the affine arithmetic.
    def arangeLen(start: Double, stop: Double, step: Double): Long =
      math.max(0L, math.ceil((stop - start) / step - 1e-7).toLong)

    val rowsBefore = if (topC + resY < b.maxy)
      math.max(0L, arangeLen(botC, b.maxy, resY) - g.height) else 0L
    val rowsAfter = if (botC - resY > b.miny)
      math.max(0L, arangeLen(topC + rowsBefore * resY, b.miny, -resY) - (g.height + rowsBefore)) else 0L
    val colsBefore = if (leftC - resX > b.minx)
      math.max(0L, arangeLen(rightC, b.minx, -resX) - g.width) else 0L
    val colsAfter = if (rightC + resX < b.maxx)
      math.max(0L, arangeLen(leftC - colsBefore * resX, b.maxx, resX) - (g.width + colsBefore)) else 0L
    PadCounts(rowsBefore, rowsAfter, colsBefore, colsAfter)
  }

  /** Grid of the padded raster for given pad counts. */
  def paddedGrid(g: GridRef, pc: PadCounts): GridRef = g.copy(
    transform = g.transform.windowed(-pc.colsBefore.toDouble, -pc.rowsBefore.toDouble),
    width = (g.width + pc.colsBefore + pc.colsAfter).toInt,
    height = (g.height + pc.rowsBefore + pc.rowsAfter).toInt)

  def padXy(r: Raster, b: Bounds, constantValue: Option[Double] = None): Raster = {
    val pc = padCounts(r.grid, b)
    padPixels(r, pc.rowsBefore, pc.rowsAfter, pc.colsBefore, pc.colsAfter, constantValue)
  }

  /** pad_box (raster_array.py:573-626): pad_xy with bounds expanded by
    * half a resolution (pixel-edge semantics). */
  def padBox(r: Raster, b: Bounds, constantValue: Option[Double] = None): Raster = {
    val resX = math.abs(r.grid.resX); val resY = math.abs(r.grid.resY)
    padXy(r, Bounds(b.minx - resX / 2.0, b.miny - resY / 2.0,
                    b.maxx + resX / 2.0, b.maxy + resY / 2.0), constantValue)
  }

  private def padPixels(r: Raster, rowsBefore: Long, rowsAfter: Long,
                        colsBefore: Long, colsAfter: Long,
                        constantValue: Option[Double]): Raster = {
    if (rowsBefore == 0 && rowsAfter == 0 && colsBefore == 0 && colsAfter == 0) return r
    val g = r.grid
    val newH = g.height + rowsBefore + rowsAfter
    val newW = g.width + colsBefore + colsAfter
    val newGrid = paddedGrid(g, PadCounts(rowsBefore, rowsAfter, colsBefore, colsAfter))
    val fill = constantValue.getOrElse(g.nodata)

    // x/y are re-derived from the new grid for every pixel so the padded
    // raster has one single coordinate definition (coords == affine(grid)).
    val shifted = r.df
      .withColumn("row", col("row") + rowsBefore)
      .withColumn("col", col("col") + colsBefore)
      .withColumn("x", Synth.xColumn(newGrid, col("col")))
      .withColumn("y", Synth.yColumn(newGrid, col("row")))

    val spark = r.df.sparkSession
    val isLongValued = r.df.schema("value").dataType.typeName == "long"
    val ring = spark.range(newH * newW)
      .withColumn("row", expr(s"id div $newW"))
      .withColumn("col", col("id") % newW)
      .drop("id")
      .filter(col("row") < rowsBefore || col("row") >= rowsBefore + g.height ||
              col("col") < colsBefore || col("col") >= colsBefore + g.width)
      .withColumn("x", Synth.xColumn(newGrid, col("col")))
      .withColumn("y", Synth.yColumn(newGrid, col("row")))
      .withColumn("value", if (isLongValued) lit(fill.toLong) else lit(fill))

    Raster(shifted.unionByName(ring.select(shifted.columns.map(col).toSeq: _*)), newGrid)
  }
}
