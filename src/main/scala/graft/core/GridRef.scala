package graft.core

/** Integer pixel window: rows [rowStart, rowStop), cols [colStart, colStop). */
final case class PixelWindow(rowStart: Int, rowStop: Int, colStart: Int, colStop: Int) {
  def height: Int = rowStop - rowStart
  def width: Int = colStop - colStart
  def isEmpty: Boolean = height <= 0 || width <= 0
  def intersect(o: PixelWindow): PixelWindow = PixelWindow(
    math.max(rowStart, o.rowStart), math.min(rowStop, o.rowStop),
    math.max(colStart, o.colStart), math.min(colStop, o.colStop))
}

/** Bounds (minx, miny, maxx, maxy). */
final case class Bounds(minx: Double, miny: Double, maxx: Double, maxy: Double) {
  def union(o: Bounds): Bounds =
    Bounds(math.min(minx, o.minx), math.min(miny, o.miny),
           math.max(maxx, o.maxx), math.max(maxy, o.maxy))
  def intersects(o: Bounds): Boolean =
    minx <= o.maxx && o.minx <= maxx && miny <= o.maxy && o.miny <= maxy
}

/** The geospatial sidecar of one raster grid — the Spark analog of the
  * reference's accessor metadata (CRS, transform, shape, nodata; see
  * rioxarray/rioxarray.py:63-77 and SURVEY.md §1.2). Broadcast-sized. */
final case class GridRef(crs: Crs, transform: Affine, width: Int, height: Int,
                         nodata: Double,
                         attrs: Map[String, String] = Map.empty,
                         dtype: String = "float64") {

  /** Pixel-edge bounds (left, bottom, right, top) — north-up grids.
    * Mirrors semantics of rioxarray.py:793-852. */
  def bounds: Bounds = {
    val (left, top) = transform(0, 0)
    val (right, bottom) = transform(width, height)
    Bounds(math.min(left, right), math.min(top, bottom),
           math.max(left, right), math.max(top, bottom))
  }

  def resX: Double = transform.a
  def resY: Double = transform.e

  /** x coordinate of pixel-centre for column c (rectilinear grids). */
  def xCoord(c: Int): Double = transform.a * (c + 0.5) + transform.c
  /** y coordinate of pixel-centre for row r. */
  def yCoord(r: Int): Double = transform.e * (r + 0.5) + transform.f

  /** Window covering georeferenced bounds; floor(start)/ceil(stop),
    * clamped at 0 — the reference's clip_box window math
    * (rioxarray/raster_array.py:719-728, rioxarray.py:854-904). */
  def windowFromBounds(b: Bounds, clampToGrid: Boolean = true): PixelWindow = {
    // account for sign of resolutions: x increases with col (a>0 in fixtures),
    // y decreases with row (e<0).
    val c0 = (b.minx - transform.c) / transform.a
    val c1 = (b.maxx - transform.c) / transform.a
    val r0 = (b.maxy - transform.f) / transform.e
    val r1 = (b.miny - transform.f) / transform.e
    val colStart = math.max(0, math.floor(math.min(c0, c1))).toInt
    val colStop = math.max(0, math.ceil(math.max(c0, c1))).toInt
    val rowStart = math.max(0, math.floor(math.min(r0, r1))).toInt
    val rowStop = math.max(0, math.ceil(math.max(r0, r1))).toInt
    val w = PixelWindow(rowStart, rowStop, colStart, colStop)
    if (clampToGrid) w.intersect(PixelWindow(0, height, 0, width)) else w
  }

  /** Grid for an integer sub-window: shifted origin, same resolution
    * (isel_window semantics, rioxarray.py:854-904). */
  def windowed(w: PixelWindow): GridRef =
    copy(transform = transform.windowed(w.colStart, w.rowStart),
         width = w.width, height = w.height)

  /** Transform densified bounds to another CRS — semantics of
    * rioxarray.py:951-980 / rasterio.warp.transform_bounds. */
  def transformBounds(to: Crs, densifyPts: Int = 21): Bounds =
    GridRef.transformBounds(bounds, crs, to, densifyPts)
}

object GridRef {

  def transformBounds(b: Bounds, from: Crs, to: Crs, densifyPts: Int = 21): Bounds = {
    if (from == to) return b
    var minx = Double.PositiveInfinity; var miny = Double.PositiveInfinity
    var maxx = Double.NegativeInfinity; var maxy = Double.NegativeInfinity
    val n = math.max(1, densifyPts)
    var i = 0
    while (i <= n) {
      val t = i.toDouble / n
      val xs = b.minx + t * (b.maxx - b.minx)
      val ys = b.miny + t * (b.maxy - b.miny)
      // four edges of the ring
      val pts = Array((xs, b.miny), (xs, b.maxy), (b.minx, ys), (b.maxx, ys))
      var j = 0
      while (j < 4) {
        val (px, py) = Crs.reprojectPoint(pts(j)._1, pts(j)._2, from, to)
        if (px < minx) minx = px; if (px > maxx) maxx = px
        if (py < miny) miny = py; if (py > maxy) maxy = py
        j += 1
      }
      i += 1
    }
    Bounds(minx, miny, maxx, maxy)
  }

  /** Destination grid for a warp: re-implementation of GDAL's
    * GDALSuggestedWarpOutput sampling scheme (21 points per source edge,
    * square pixels sized so the destination diagonal pixel count matches
    * the source diagonal) as used by rasterio.warp.calculate_default_transform
    * and the reference's _make_dst_affine (_spatial_utils.py:380-420).
    * Derived from public GDAL alg documentation; validated against the
    * reference golden MODIS_ARRAY_UTM_GDAL361 transform. */
  def suggestedWarpOutput(src: GridRef, dstCrs: Crs,
                          resolution: Option[(Double, Double)] = None,
                          shape: Option[(Int, Int)] = None): GridRef = {
    val nSteps = 21
    var minx = Double.PositiveInfinity; var miny = Double.PositiveInfinity
    var maxx = Double.NegativeInfinity; var maxy = Double.NegativeInfinity
    var tlx = 0.0; var tly = 0.0; var brx = 0.0; var bry = 0.0
    var iStep = 0
    while (iStep < nSteps) {
      val r = if (iStep == nSteps - 1) 1.0 else iStep.toDouble / (nSteps - 1)
      val pts = Array(
        (r * src.width, 0.0),               // top edge
        (r * src.width, src.height.toDouble), // bottom edge
        (0.0, r * src.height),              // left edge
        (src.width.toDouble, r * src.height)) // right edge
      var j = 0
      while (j < 4) {
        val (gx, gy) = src.transform(pts(j)._1, pts(j)._2)
        val (px, py) = Crs.reprojectPoint(gx, gy, src.crs, dstCrs)
        if (iStep == 0 && j == 0) {
          // (0*W, 0) = top-left corner is the first sample
        }
        if (px < minx) minx = px; if (px > maxx) maxx = px
        if (py < miny) miny = py; if (py > maxy) maxy = py
        j += 1
      }
      iStep += 1
    }
    // transformed TL and BR corners for the diagonal distance
    locally {
      val (gx0, gy0) = src.transform(0, 0)
      val p0 = Crs.reprojectPoint(gx0, gy0, src.crs, dstCrs)
      val (gx1, gy1) = src.transform(src.width, src.height)
      val p1 = Crs.reprojectPoint(gx1, gy1, src.crs, dstCrs)
      tlx = p0._1; tly = p0._2; brx = p1._1; bry = p1._2
    }

    (resolution, shape) match {
      case (Some((rx, ry)), _) =>
        val w = math.ceil((maxx - minx) / rx).toInt
        val h = math.ceil((maxy - miny) / ry).toInt
        GridRef(dstCrs, Affine.northUp(minx, maxy, rx, ry), w, h, src.nodata)
      case (_, Some((h, w))) =>
        val rx = (maxx - minx) / w
        val ry = (maxy - miny) / h
        GridRef(dstCrs, Affine.northUp(minx, maxy, rx, ry), w, h, src.nodata)
      case _ =>
        val dx = brx - tlx; val dy = bry - tly
        val diag = math.sqrt(dx * dx + dy * dy)
        val srcDiag = math.sqrt(src.width.toDouble * src.width + src.height.toDouble * src.height)
        val pixel = diag / srcDiag
        val nPixels = ((maxx - minx) / pixel + 0.5).toInt
        val nLines = ((maxy - miny) / pixel + 0.5).toInt
        GridRef(dstCrs, Affine.northUp(minx, maxy, pixel, pixel), nPixels, nLines, src.nodata)
    }
  }
}
