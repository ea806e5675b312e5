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

  final case class SrcTile(st_row: Long, st_col: Long, data: Array[Double])
  final case class Gathered(dt_row: Long, dt_col: Long, tiles: Array[SrcTile])
  final case class DstTile(tile_row: Long, tile_col: Long, data: Array[Double])

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
    * 1e-9-pixel HALF_UP rounding as Spark's round(_, 9)). */
  private def srcPixelScalar(src: GridRef, dst: GridRef,
                             dRow: Long, dCol: Long): (Double, Double) = {
    val dx = dst.transform.a * (dCol.toDouble + 0.5) + dst.transform.c
    val dy = dst.transform.e * (dRow.toDouble + 0.5) + dst.transform.f
    val (sx, sy) =
      if (src.crs == dst.crs) (dx, dy)
      else {
        val (lon, lat) = dst.crs.proj.inverse(dx, dy)
        src.crs.proj.forward(lon, lat)
      }
    def r9(v: Double) = BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    (r9((sx - src.transform.c) / src.transform.a),
     r9((sy - src.transform.f) / src.transform.e))
  }

  /** Nearest-neighbour inverse warp over packed tiles. Returns dst tiles
    * (tile_row, tile_col, data); [[toPixels]] explodes back for comparison
    * with the pixel path. `ts` must divide the source dims; the destination
    * is covered with partial edge tiles (nodata-padded). */
  def reprojectNearestTiles(srcR: Raster, dst: GridRef, ts: Int): Dataset[DstTile] = {
    val spark = srcR.df.sparkSession
    import spark.implicits._
    val src = srcR.grid
    val srcTiles = pack(srcR, ts)
    val nTx = (dst.width + ts - 1) / ts
    val nTy = (dst.height + ts - 1) / ts
    val nodata = dst.nodata.toLong

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
    val cover = sampled
      .withColumn("sc", floor(px)).withColumn("sr", floor(py))
      .groupBy("dt_row", "dt_col")
      .agg(min("sr").as("r_min"), max("sr").as("r_max"),
           min("sc").as("c_min"), max("sc").as("c_max"))
      // margin, clamp to the source grid, then to covering tile indices
      .withColumn("t_r0", greatest(floor((col("r_min") - CoverMarginPx) / ts), lit(0L)))
      .withColumn("t_r1", least(floor((col("r_max") + CoverMarginPx) / ts), lit((src.height / ts - 1).toLong)))
      .withColumn("t_c0", greatest(floor((col("c_min") - CoverMarginPx) / ts), lit(0L)))
      .withColumn("t_c1", least(floor((col("c_max") + CoverMarginPx) / ts), lit((src.width / ts - 1).toLong)))
      .filter(col("t_r0") <= col("t_r1") && col("t_c0") <= col("t_c1"))
      .select(col("dt_row"), col("dt_col"),
        explode(expr("sequence(t_r0, t_r1)")).as("st_row"), col("t_c0"), col("t_c1"))
      .select(col("dt_row"), col("dt_col"), col("st_row"),
        explode(expr("sequence(t_c0, t_c1)")).as("st_col"))

    val gathered = cover.join(srcTiles, Seq("st_row", "st_col"))
      .groupBy("dt_row", "dt_col")
      .agg(collect_list(struct(col("st_row"), col("st_col"), col("data"))).as("tiles"))
      .as[Gathered]

    // dst tiles whose cover found no src tiles at all still need emitting
    val covered = gathered.map { gth =>
      val byTile = gth.tiles.map(t => (t.st_row, t.st_col) -> t.data).toMap
      DstTile(gth.dt_row, gth.dt_col,
        renderTile(gth.dt_row, gth.dt_col, byTile, src, dst, ts, nodata))
    }
    val empty = dstTiles.join(gathered.select("dt_row", "dt_col"),
        Seq("dt_row", "dt_col"), "left_anti")
      .as[(Long, Long)]
      .map { case (tr, tc) =>
        DstTile(tr, tc, renderTile(tr, tc, Map.empty, src, dst, ts, nodata))
      }
    covered.unionByName(empty)
  }

  private def renderTile(dtRow: Long, dtCol: Long,
                         byTile: Map[(Long, Long), Array[Double]],
                         src: GridRef, dst: GridRef, ts: Int,
                         nodata: Long): Array[Double] = {
    val out = Array.fill(ts * ts)(nodata.toDouble)
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
              byTile.get((Math.floorDiv(sr, ts), Math.floorDiv(sc, ts))).foreach { d =>
                out(v * ts + u) = d((Math.floorMod(sr, ts) * ts + Math.floorMod(sc, ts)).toInt)
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
  def toPixels(tiles: Dataset[DstTile], dst: GridRef, ts: Int): DataFrame = {
    tiles.toDF()
      .select(col("tile_row"), col("tile_col"), posexplode(col("data")).as(Seq("i", "dvalue")))
      .withColumn("row", col("tile_row") * ts + expr(s"i div $ts"))
      .withColumn("col", col("tile_col") * ts + col("i") % ts)
      .filter(col("row") < dst.height && col("col") < dst.width)
      .withColumn("x", Synth.xColumn(dst, col("col")))
      .withColumn("y", Synth.yColumn(dst, col("row")))
      .withColumn("value", col("dvalue").cast("long"))
      .select("row", "col", "x", "y", "value")
  }
}
