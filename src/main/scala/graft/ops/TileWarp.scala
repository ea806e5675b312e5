package graft.ops

import graft.core._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Tile-native warp kernel — the packed-array execution path for
  * [[WarpOps.reprojectNearest]] (reference: rasterio.warp.reproject's
  * per-block C kernel, raster_array.py:198-309).
  *
  * The row-per-pixel warp join ships ~40 B/pixel through the shuffle
  * (row, col, src_row, src_col, value + join machinery). This path ships
  * ~8 B/pixel: sources are packed once into dense per-tile double arrays,
  * each destination tile computes (from boundary samples, as Column math)
  * the rectangle of source tiles it reads, gathers exactly those via ONE
  * equi-join on the tile key, and a typed mapGroups evaluates the inverse
  * projection per destination pixel against the gathered arrays — the
  * distributed analog of GDAL's per-block warp with a source window.
  * At 100 TB this is the same single shuffle as the pixel path but ~5x
  * fewer shuffled bytes, and the tile key doubles as the partition key so
  * the gather co-locates with a Hilbert/tile-bucketed source layout.
  *
  * Cover rule: source pixel extent per dst tile is estimated from a 3x3
  * boundary sample grid (corners + edge midpoints + centre) and expanded by
  * [[CoverMarginPx]] source pixels. Exact for locally-monotone projections
  * at practical tile sizes (the five fixture projections are smooth and
  * near-affine across a tile); TileWarpSpec asserts bit-equality with the
  * exploded pixel path on the fixture warp. */
object TileWarp {

  val CoverMarginPx = 2L

  /** One gathered source fragment: the sub-rectangle of tile
    * (st_row, st_col) starting at tile-local (lr0, lc0), `w` columns wide,
    * row-major in `frag`. */
  final case class SrcFrag(st_row: Long, st_col: Long, lr0: Int, lc0: Int,
                           w: Int, frag: Array[Double])
  final case class Gathered(dt_row: Long, dt_col: Long, tiles: Array[SrcFrag])
  final case class DstTile(tile_row: Long, tile_col: Long, data: Array[Double])

  /** Row-major sub-rectangle [r0..r1] x [c0..c1] (inclusive, tile-local) of
    * a ts x ts packed tile. Called from the SliceGrid codegen. */
  def sliceGrid(data: org.apache.spark.sql.catalyst.util.ArrayData, ts: Int,
                r0: Long, r1: Long, c0: Long, c1: Long):
      org.apache.spark.sql.catalyst.util.ArrayData = {
    val h = (r1 - r0 + 1).toInt; val w = (c1 - c0 + 1).toInt
    val out = new Array[Double](h * w)
    var i = 0; var r = r0.toInt
    while (r <= r1) {
      var c = c0.toInt
      while (c <= c1) { out(i) = data.getDouble(r * ts + c); i += 1; c += 1 }
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Pack a dense pixel raster into per-tile double arrays (one shuffle:
    * the tile groupBy). v1 packs full tiles only, like TileIO.writeTiles. */
  def pack(r: Raster, ts: Int): DataFrame = {
    val g = r.grid
    require(g.width % ts == 0 && g.height % ts == 0,
      s"v1 packs full tiles only: ${g.width}x${g.height} vs tile $ts")
    r.df
      .withColumn("st_row", expr(s"row div $ts"))
      .withColumn("st_col", expr(s"col div $ts"))
      .withColumn("local_idx", (col("row") % ts) * ts + (col("col") % ts))
      .groupBy("st_row", "st_col")
      .agg(array_sort(collect_list(struct(col("local_idx"),
        col("value").cast("double").as("v")))).as("cells"))
      .withColumn("data", transform(col("cells"), c => c.getField("v")))
      .drop("cells")
  }

  /** Scalar mirror of WarpOps.srcPixelColumns (same op order; same
    * all-IEEE 1e-9-pixel quantization — Quantize9.quant is the single
    * shared kernel, so tiled and pixel paths are bit-identical by
    * construction and the per-pixel BigDecimal cost is gone). */
  private def srcPixelScalar(src: GridRef, dst: GridRef,
                             dRow: Long, dCol: Long): (Double, Double) = {
    val t = dst.transform
    val (dx, dy) =
      if (t.isRectilinear)
        (t.a * (dCol.toDouble + 0.5) + t.c, t.e * (dRow.toDouble + 0.5) + t.f)
      else
        (t.a * (dCol.toDouble + 0.5) + t.b * (dRow.toDouble + 0.5) + t.c,
         t.d * (dCol.toDouble + 0.5) + t.e * (dRow.toDouble + 0.5) + t.f)
    val (sx, sy) =
      if (src.crs == dst.crs) (dx, dy)
      else {
        val (lon, lat) = dst.crs.proj.inverse(dx, dy)
        src.crs.proj.forward(lon, lat)
      }
    def r9(v: Double) = graft.functions.Quantize9.quant(v)
    val s = src.transform
    if (s.isRectilinear) (r9((sx - s.c) / s.a), r9((sy - s.f) / s.e))
    else {
      val inv = s.invert
      (r9(inv.a * sx + inv.b * sy + inv.c), r9(inv.d * sx + inv.e * sy + inv.f))
    }
  }

  /** Nearest-neighbour inverse warp over packed tiles. Returns dst tiles
    * (tile_row, tile_col, data); [[toPixels]] explodes back for comparison
    * with the pixel path. `ts` must divide the source dims; the destination
    * is covered with partial edge tiles (nodata-padded). */
  def reprojectNearestTiles(srcR: Raster, dst: GridRef, ts: Int): Dataset[DstTile] =
    reprojectNearestPacked(pack(srcR, ts), srcR.grid, dst, ts)

  /** Warp from an ALREADY-PACKED tile table (st_row, st_col, data) — the
    * at-rest TileIO layout; the pack shuffle is a one-time layout cost, not
    * part of the warp. */
  def reprojectNearestPacked(srcTiles: DataFrame, src: GridRef,
                             dst: GridRef, ts: Int): Dataset[DstTile] =
    warpPacked(srcTiles, src, dst, ts, CoverMarginPx,
      (tr, tc, tiles) => renderTile(tr, tc, tiles, src, dst, ts, dst.nodata.toLong))

  /** Bilinear over packed tiles: same gather, +1 source pixel of cover
    * margin (the 2x2 neighbourhood halo — SURVEY §7.4 risk 5: the halo is
    * not a separate exchange, it rides the fragment sub-rectangles), and a
    * render kernel that mirrors WarpOps.reprojectBilinear's weight
    * arithmetic term-for-term (bit-identical output, TileWarpSpec). */
  def reprojectBilinearTiles(srcR: Raster, dst: GridRef, ts: Int): Dataset[DstTile] =
    warpPacked(pack(srcR, ts), srcR.grid, dst, ts, CoverMarginPx + 2,
      (tr, tc, tiles) => renderTileKernel(tr, tc, tiles, srcR.grid, dst, ts,
        dst.nodata, taps = 0 to 1,
        (t, off) => if (off == 0) 1.0 - t else t))

  /** Cubic (Keys a=-0.5) over packed tiles: 4x4 neighbourhood halo via +3
    * cover margin; weights share WarpOps' exact literal/op-order (scalar
    * sibling), so output is bit-identical to the exploded cubic. */
  def reprojectCubicTiles(srcR: Raster, dst: GridRef, ts: Int): Dataset[DstTile] =
    warpPacked(pack(srcR, ts), srcR.grid, dst, ts, CoverMarginPx + 3,
      (tr, tc, tiles) => renderTileKernel(tr, tc, tiles, srcR.grid, dst, ts,
        dst.nodata, taps = -1 to 2,
        (t, off) => WarpOps.cubicWeightScalar(t, off)))

  /** cubic_spline over packed tiles: identical 4x4 gather/halo as cubic,
    * B-spline smoothing weights (the scalar sibling of
    * WarpOps.reprojectCubicSpline) — bit-identical to the exploded path. */
  def reprojectCubicSplineTiles(srcR: Raster, dst: GridRef, ts: Int): Dataset[DstTile] =
    warpPacked(pack(srcR, ts), srcR.grid, dst, ts, CoverMarginPx + 3,
      (tr, tc, tiles) => renderTileKernel(tr, tc, tiles, srcR.grid, dst, ts,
        dst.nodata, taps = -1 to 2,
        (t, off) => WarpOps.cubicSplineWeightScalar(t, off)))

  /** Shared separable-kernel render: taps x taps gather around
    * (floor(p-0.5)), weight(t, off) per axis, any missing/nodata tap ->
    * nodata, interp = sum_dr wy*(sum_dc wx*v) in tap order (the exploded
    * paths' exact fold order). */
  private def renderTileKernel(dtRow: Long, dtCol: Long, tiles: Array[SrcFrag],
                               src: GridRef, dst: GridRef, ts: Int, nodata: Double,
                               taps: Range,
                               weight: (Double, Int) => Double): Array[Double] = {
    val out = Array.fill(ts * ts)(nodata)
    if (tiles.isEmpty) return out
    val tr0 = tiles.map(_.st_row).min; val tr1 = tiles.map(_.st_row).max
    val tc0 = tiles.map(_.st_col).min; val tc1 = tiles.map(_.st_col).max
    val lut = Array.ofDim[SrcFrag]((tr1 - tr0 + 1).toInt, (tc1 - tc0 + 1).toInt)
    tiles.foreach(t => lut((t.st_row - tr0).toInt)((t.st_col - tc0).toInt) = t)
    def fetch(sr: Long, sc: Long): Double = {
      if (sr < 0 || sr >= src.height || sc < 0 || sc >= src.width) return Double.NaN
      val str = Math.floorDiv(sr, ts); val stc = Math.floorDiv(sc, ts)
      if (str < tr0 || str > tr1 || stc < tc0 || stc > tc1) return Double.NaN
      val f = lut((str - tr0).toInt)((stc - tc0).toInt)
      if (f == null) return Double.NaN
      val lr = Math.floorMod(sr, ts).toInt - f.lr0
      val lc = Math.floorMod(sc, ts).toInt - f.lc0
      if (lr < 0 || lc < 0 || lc >= f.w || lr >= f.frag.length / f.w) Double.NaN
      else f.frag(lr * f.w + lc)
    }
    var v = 0
    while (v < ts) {
      val r = dtRow * ts + v
      if (r < dst.height) {
        var u = 0
        while (u < ts) {
          val c = dtCol * ts + u
          if (c < dst.width) {
            val (pxv, pyv) = srcPixelScalar(src, dst, r, c)
            val fx = pxv - 0.5; val fy = pyv - 0.5
            val c0 = math.floor(fx).toLong; val r0 = math.floor(fy).toLong
            val tx = fx - math.floor(fx); val ty = fy - math.floor(fy)
            var bad = false
            val vals = taps.map { dr => taps.map { dc =>
              val x = fetch(r0 + dr, c0 + dc)
              if (x.isNaN || x == nodata) bad = true
              x
            }}
            if (!bad)
              out(v * ts + u) = taps.zipWithIndex.map { case (dr, i) =>
                weight(ty, dr) * taps.zipWithIndex.map { case (dc, j) =>
                  weight(tx, dc) * vals(i)(j)
                }.reduce(_ + _)
              }.reduce(_ + _)
          }
          u += 1
        }
      }
      v += 1
    }
    out
  }

  private def warpPacked(srcTiles: DataFrame, src: GridRef,
                         dst: GridRef, ts: Int, marginPx: Long,
                         render: (Long, Long, Array[SrcFrag]) => Array[Double]):
      Dataset[DstTile] = {
    val spark = srcTiles.sparkSession
    import spark.implicits._
    val nTx = (dst.width + ts - 1) / ts
    val nTy = (dst.height + ts - 1) / ts

    // 3x3 boundary samples per dst tile, as generated Column math
    val samples = Seq(0, ts / 2, ts - 1)
    val offsets = samples.flatMap(v => samples.map(u =>
      struct(lit(v.toLong).as("dv"), lit(u.toLong).as("du"))))
    val dstTiles = spark.range(nTx.toLong * nTy)
      .select(expr(s"id div $nTx").as("dt_row"), (col("id") % nTx).as("dt_col"))
    val sampled = dstTiles
      .select(col("*"), explode(array(offsets: _*)).as("o"))
      .withColumn("drow", least(col("dt_row") * ts + col("o.dv"), lit(dst.height.toLong - 1)))
      .withColumn("dcol", least(col("dt_col") * ts + col("o.du"), lit(dst.width.toLong - 1)))
    val (px, py) = WarpOps.srcPixelColumns(src, dst, col("drow"), col("dcol"))
    // per dst tile: source pixel window (sampled extremes + margin, clamped),
    // then the covering source tiles, each carrying its tile-local sub-rect
    val cover = sampled
      .withColumn("sc", floor(px)).withColumn("sr", floor(py))
      .groupBy("dt_row", "dt_col")
      .agg(min("sr").as("r_min"), max("sr").as("r_max"),
           min("sc").as("c_min"), max("sc").as("c_max"))
      .withColumn("rlo", greatest(col("r_min") - marginPx, lit(0L)))
      .withColumn("rhi", least(col("r_max") + marginPx, lit(src.height.toLong - 1)))
      .withColumn("clo", greatest(col("c_min") - marginPx, lit(0L)))
      .withColumn("chi", least(col("c_max") + marginPx, lit(src.width.toLong - 1)))
      // (sequence over rlo div ts .. rhi div ts naturally reaches the last
      // PARTIAL source tile when the grid is not a tile multiple — padded
      // cells are never read because sr/sc are grid-bounds-checked)
      .filter(col("rlo") <= col("rhi") && col("clo") <= col("chi"))
      .select(col("dt_row"), col("dt_col"), col("rlo"), col("rhi"), col("clo"), col("chi"),
        explode(expr(s"sequence(rlo div $ts, rhi div $ts)")).as("st_row"))
      .select(col("*"),
        explode(expr(s"sequence(clo div $ts, chi div $ts)")).as("st_col"))
      .withColumn("lr0", greatest(col("rlo") - col("st_row") * ts, lit(0L)))
      .withColumn("lr1", least(col("rhi") - col("st_row") * ts, lit(ts.toLong - 1)))
      .withColumn("lc0", greatest(col("clo") - col("st_col") * ts, lit(0L)))
      .withColumn("lc1", least(col("chi") - col("st_col") * ts, lit(ts.toLong - 1)))

    // ship only the needed sub-rectangle of each source tile (SliceGrid is
    // the codegen'd cut); the gather groupBy is the single data shuffle
    val gathered = cover.join(srcTiles, Seq("st_row", "st_col"))
      .select(col("dt_row"), col("dt_col"), col("st_row"), col("st_col"),
        col("lr0").cast("int").as("lr0"), col("lc0").cast("int").as("lc0"),
        (col("lc1") - col("lc0") + 1).cast("int").as("w"),
        graft.functions.SliceGrid.column(col("data"), col("lr0"), col("lr1"),
          col("lc0"), col("lc1"), ts).as("frag"))
      .groupBy("dt_row", "dt_col")
      .agg(collect_list(struct(col("st_row"), col("st_col"), col("lr0"),
        col("lc0"), col("w"), col("frag"))).as("tiles"))
      .as[Gathered]

    // dst tiles whose cover found no src tiles at all still need emitting
    val covered = gathered.map { gth =>
      DstTile(gth.dt_row, gth.dt_col, render(gth.dt_row, gth.dt_col, gth.tiles))
    }
    val empty = dstTiles.join(gathered.select("dt_row", "dt_col"),
        Seq("dt_row", "dt_col"), "left_anti")
      .as[(Long, Long)]
      .map { case (tr, tc) => DstTile(tr, tc, render(tr, tc, Array.empty)) }
    covered.unionByName(empty)
  }

  private def renderTile(dtRow: Long, dtCol: Long, tiles: Array[SrcFrag],
                         src: GridRef, dst: GridRef, ts: Int,
                         nodata: Long): Array[Double] = {
    val out = Array.fill(ts * ts)(nodata.toDouble)
    if (tiles.isEmpty) return out
    // dense rectangular LUT over the gathered tile range — O(1) unboxed
    // lookup per pixel (a hash map of boxed tuple keys dominated the kernel)
    val tr0 = tiles.map(_.st_row).min; val tr1 = tiles.map(_.st_row).max
    val tc0 = tiles.map(_.st_col).min; val tc1 = tiles.map(_.st_col).max
    val lut = Array.ofDim[SrcFrag]((tr1 - tr0 + 1).toInt, (tc1 - tc0 + 1).toInt)
    tiles.foreach(t => lut((t.st_row - tr0).toInt)((t.st_col - tc0).toInt) = t)
    var v = 0
    while (v < ts) {
      val r = dtRow * ts + v
      if (r < dst.height) {
        var u = 0
        while (u < ts) {
          val c = dtCol * ts + u
          if (c < dst.width) {
            val (pxv, pyv) = srcPixelScalar(src, dst, r, c)
            val sc = math.floor(pxv).toLong
            val sr = math.floor(pyv).toLong
            if (sr >= 0 && sr < src.height && sc >= 0 && sc < src.width) {
              val str = Math.floorDiv(sr, ts); val stc = Math.floorDiv(sc, ts)
              if (str >= tr0 && str <= tr1 && stc >= tc0 && stc <= tc1) {
                val f = lut((str - tr0).toInt)((stc - tc0).toInt)
                if (f != null) {
                  val lr = Math.floorMod(sr, ts).toInt - f.lr0
                  val lc = Math.floorMod(sc, ts).toInt - f.lc0
                  if (lr >= 0 && lc >= 0 && lc < f.w && lr < f.frag.length / f.w)
                    out(v * ts + u) = f.frag(lr * f.w + lc)
                }
              }
            }
          }
          u += 1
        }
      }
      v += 1
    }
    out
  }

  /** Explode dst tiles back to the (row, col, x, y, value) pixel schema
    * (comparison/compat path; production consumers keep the packed form). */
  def toPixels(tiles: Dataset[DstTile], dst: GridRef, ts: Int,
               asLong: Boolean = true): DataFrame = {
    tiles.toDF()
      .select(col("tile_row"), col("tile_col"), posexplode(col("data")).as(Seq("i", "dvalue")))
      .withColumn("row", col("tile_row") * ts + expr(s"i div $ts"))
      .withColumn("col", col("tile_col") * ts + col("i") % ts)
      .filter(col("row") < dst.height && col("col") < dst.width)
      .withColumn("x", Synth.xColumn(dst, col("col")))
      .withColumn("y", Synth.yColumn(dst, col("row")))
      .withColumn("value", if (asLong) col("dvalue").cast("long") else col("dvalue"))
      .select("row", "col", "x", "y", "value")
  }
}
