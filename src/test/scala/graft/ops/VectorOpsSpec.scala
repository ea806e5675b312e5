package graft.ops

import graft.SparkTestBase
import graft.Queries
import graft.core._
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkTestBase {

  def modis: GridRef = Synth.modisGrid
  def px: Raster = Raster(Synth.pixels(spark, modis), modis)
  lazy val geom: Geom = Queries.clipGeom

  def synth(r: Long, c: Long): Long =
    if ((r * 53 + c * 97) % 101 == 0) -28672L
    else (r * 7919L + c * 104729L + 12345L) % 19997L - 9999L

  test("WKT parse/serialize roundtrip") {
    val g = Geometry.parseWkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")
    assert(g.polygons.head.shell.size == 4 && g.polygons.head.holes.head.size == 4)
    assert(g.contains(1.0, 1.0))          // in shell
    assert(!g.contains(3.0, 3.0))         // in hole
    assert(!g.contains(11.0, 5.0))        // outside
    val re = Geometry.parseWkt(Geometry.toWkt(g))
    assert(re.contains(1.0, 1.0) && !re.contains(3.0, 3.0))
    val mp = Geometry.parseWkt("MULTIPOLYGON (((0 0, 5 0, 5 5, 0 5, 0 0)), ((10 10, 15 10, 15 15, 10 15, 10 10)))")
    assert(mp.contains(1, 1) && mp.contains(12, 12) && !mp.contains(7, 7))
  }

  test("containsColumn == pure-Scala ray casting for every pixel centre") {
    val marked = px.df.withColumn("inside",
      VectorOps.containsColumn(geom, col("x"), col("y")))
      .filter(col("row") % 5 === 0 && col("col") % 5 === 0)
      .select("row", "col", "x", "y", "inside").collect()
    assert(marked.count(_.getBoolean(4)) > 50)
    marked.foreach { r =>
      val exp = geom.contains(r.getDouble(2), r.getDouble(3))
      assert(r.getBoolean(4) == exp, s"pixel (${r.getLong(0)},${r.getLong(1)})")
    }
  }

  test("clipGeom(drop) crops to the data window of the mask and masks outside") {
    val clipped = VectorOps.clipGeom(px, geom, drop = true)
    // pure-scala window
    var r0 = Int.MaxValue; var r1 = -1; var c0 = Int.MaxValue; var c1 = -1
    for (r <- 0 until 200; c <- 0 until 200) {
      val x = modis.transform.a * (c + 0.5) + modis.transform.c
      val y = modis.transform.e * (r + 0.5) + modis.transform.f
      if (geom.contains(x, y)) {
        if (r < r0) r0 = r; if (r > r1) r1 = r
        if (c < c0) c0 = c; if (c > c1) c1 = c
      }
    }
    assert(clipped.grid.height == r1 - r0 + 1 && clipped.grid.width == c1 - c0 + 1)
    val t = clipped.grid.transform
    assert(math.abs(t.c - (modis.transform.c + c0 * modis.transform.a)) < 1e-6)
    // masked values: inside keeps synth value, outside nodata
    val sample = clipped.df.filter(col("row") % 7 === 0 && col("col") % 7 === 0).collect()
    sample.foreach { row =>
      val (rr, cc) = (row.getLong(0) + r0, row.getLong(1) + c0)
      val x = modis.transform.a * (cc + 0.5) + modis.transform.c
      val y = modis.transform.e * (rr + 0.5) + modis.transform.f
      val exp = if (geom.contains(x, y)) synth(rr, cc) else -28672L
      assert(row.getLong(4) == exp, s"pixel ($rr,$cc)")
    }
  }

  test("clipGeom(invert) masks the inside instead") {
    val inv = VectorOps.clipGeom(px, geom, drop = false, invert = true)
    assert(inv.grid == modis)
    val in = inv.df.filter(col("row") === 100 && col("col") === 100).collect()(0)
    val x = in.getDouble(2); val y = in.getDouble(3)
    if (geom.contains(x, y)) assert(in.getLong(4) == -28672L)
  }

  test("zonalStats matches per-zone brute force") {
    val geoms = Queries.zonalGeoms.map { case (id, w) => id -> Geometry.parseWkt(w) }
    val stats = VectorOps.zonalStats(px, geoms).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    geoms.foreach { case (id, g) =>
      var n = 0L; var s = 0L
      for (r <- 0 until 200; c <- 0 until 200) {
        val x = modis.transform.a * (c + 0.5) + modis.transform.c
        val y = modis.transform.e * (r + 0.5) + modis.transform.f
        val v = synth(r, c)
        if (v != -28672L && g.contains(x, y)) { n += 1; s += v }
      }
      assert(stats(id) == ((n, s)), s"zone $id")
    }
  }

  test("pip join broadcasts the edge side (no cartesian, no sort-merge)") {
    val geoms = Queries.zonalGeoms.map { case (id, w) => id -> Geometry.parseWkt(w) }
    val plan = VectorOps.pipJoin(px.df, geoms).queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"expected broadcast join:\n$plan")
    assert(!plan.contains("CartesianProduct"), "must not be a cartesian product")
  }
}
