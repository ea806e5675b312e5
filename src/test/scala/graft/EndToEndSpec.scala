package graft

import graft.core._
import graft.ops._
import graft.sources.TileIO
import org.apache.spark.sql.functions._

/** Capstone composition: the full user journey — decorate with CF
  * metadata, persist through the DSv2 store (un-clustered write, the
  * extensions rule plans the shuffle), re-open windowed, then run
  * clip_box -> reproject -> merge -> zonal stats — and prove the
  * disk-roundtripped pipeline is row-identical to the pure in-memory one.
  * This is the "a rioxarray user could switch" claim as one executable
  * assertion. */
class EndToEndSpec extends SparkTestBase {

  test("capstone: store -> windowed read -> clip -> reproject -> merge -> zonal == in-memory") {
    val g = Synth.modisGrid
    val dir = java.nio.file.Files.createTempDirectory("graft-e2e").toString + "/cap"
    val mem = Raster(Synth.pixels(spark, g), g)

    // CF-decorated store via the self-distributing DSv2 write
    val decorated = graft.ops.Conventions.writeCfAttrs(mem)
    decorated.df.write.format("graft").mode("overwrite")
      .option("crs", g.crs.key).option("transform", g.transform.toGdal)
      .option("width", g.width.toString).option("height", g.height.toString)
      .option("nodata", g.nodata.toString).option("tile_size", "50")
      .option("attrs", graft.core.Json.obj(decorated.grid.attrs))
      .save(dir)

    // re-open: grid (incl. CF attrs) from the sidecar, pixels via DSv2
    val (g2, _) = TileIO.readGrid(spark, dir)
    assert(g2.attrs.contains("spatial_ref:GeoTransform"), "CF attrs must survive the store")
    assert(graft.ops.Conventions.readCfGrid(g2.attrs, g2.width, g2.height, g2.nodata)
      .exists(_.transform == g.transform))
    val disk = Raster(spark.read.format("graft").load(dir), g2.copy(attrs = Map.empty))

    def pipeline(r: Raster): (Raster, Map[String, (Long, Long)]) = {
      val clipped = WindowOps.clipBox(r, Queries.largeClip)
      val rep = WarpOps.reprojectNearest(clipped,
        GridRef.suggestedWarpOutput(clipped.grid, Crs.WGS84))
      val other = {
        val og = rep.grid.copy(transform = rep.grid.transform.windowed(10, 10))
        Raster(Synth.pixels(spark, og, seed = 777L), og)
      }
      val merged = MergeOps.merge(Seq(rep, other), "first")
      val zones = Queries.zonalGeoms.take(1).map { case (id, w) =>
        id -> Geometry.parseWkt(w) }
      // zonal over the ORIGINAL clipped raster (native CRS geometry fixture)
      val stats = VectorOps.zonalStats(clipped, zones).collect()
        .map(row => row.getString(0) -> (row.getLong(1), row.getLong(2))).toMap
      (merged, stats)
    }

    val (memOut, memStats) = pipeline(mem)
    val (diskOut, diskStats) = pipeline(disk)
    assert(memOut.grid == diskOut.grid)
    val a = memOut.df.collect().map(_.toSeq).toSet
    val b = diskOut.df.collect().map(_.toSeq).toSet
    assert(a == b, "disk-roundtripped pipeline must be row-identical to in-memory")
    assert(a.nonEmpty)
    assert(memStats == diskStats && memStats.nonEmpty)
  }
}
