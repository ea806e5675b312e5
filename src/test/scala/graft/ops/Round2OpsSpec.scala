package graft.ops

import graft.{Queries, SparkTestBase}
import graft.ann.AnnOps
import graft.core._
import org.apache.spark.sql.functions._

/** Round-2 operators: total interpolate_na, all_touched clip, 500-vertex
  * edge-table clip, clip_box(crs=), mask_and_scale, merge_datasets,
  * banded embedding pairs, cell-join kNN promotion. */
class Round2OpsSpec extends SparkTestBase {

  def modis: GridRef = Synth.modisGrid
  def px: Raster = Raster(Synth.pixels(spark, modis), modis)

  def synth(r: Long, c: Long, seed: Long = 12345L): Long =
    if ((r * 53 + c * 97) % 101 == 0) -28672L
    else (r * 7919L + c * 104729L + seed) % 19997L - 9999L

  test("interpolate_na fills a hole wider than 2x bucket (ring escalation is total)") {
    val g = modis.copy(width = 60, height = 60)
    val inHole = (r: Long, c: Long) => r >= 18 && r < 42 && c >= 18 && c < 42
    val holed = Synth.pixels(spark, g).withColumn("value",
      when(col("row") >= 18 && col("row") < 42 &&
           col("col") >= 18 && col("col") < 42, lit(-28672L)).otherwise(col("value")))
    val filled = InterpolateOps.interpolateNaNearest(Raster(holed, g), bucket = 4)
    assert(filled.df.count() == 3600, "every pixel must survive")
    assert(filled.df.filter(col("value") === -28672L).count() == 0, "no nodata left")

    def holedVal(r: Long, c: Long): Long = if (inHole(r, c)) -28672L else synth(r, c)
    val got = filled.df.select("row", "col", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // deep-hole pixels: nearest valid neighbour is 10+ pixels away (> 2x bucket)
    for ((mr, mc) <- Seq((30L, 30L), (29L, 31L), (28L, 28L), (31L, 29L))) {
      var best = (Long.MaxValue, Long.MaxValue, Long.MaxValue, 0L)
      for (r <- 0L until 60L; c <- 0L until 60L) {
        val v = holedVal(r, c)
        if (v != -28672L) {
          val d2 = (mr - r) * (mr - r) + (mc - c) * (mc - c)
          if (d2 < best._1 || (d2 == best._1 && (r < best._2 || (r == best._2 && c < best._3))))
            best = (d2, r, c, v)
        }
      }
      assert(best._1 > 64L, "fixture sanity: the hole must defeat the first ring")
      assert(got((mr, mc)) == best._4, s"deep-hole pixel ($mr,$mc)")
    }
  }

  // pure-Scala mirror of the all-touched predicate (centre-in OR any edge
  // intersects the closed pixel square)
  private def touchesScala(g: Geom, cx: Double, cy: Double, hx: Double, hy: Double): Boolean = {
    if (g.contains(cx, cy)) return true
    g.edges.exists { case (x1, y1, x2, y2) =>
      val bbox = math.max(x1, x2) >= cx - hx && math.min(x1, x2) <= cx + hx &&
                 math.max(y1, y2) >= cy - hy && math.min(y1, y2) <= cy + hy
      def f(px: Double, py: Double): Double = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
      val s = Seq(f(cx - hx, cy - hy), f(cx + hx, cy - hy), f(cx - hx, cy + hy), f(cx + hx, cy + hy))
      val oneSide = s.forall(_ > 0) || s.forall(_ < 0)
      bbox && !oneSide
    }
  }

  test("all_touched clip keeps a strict superset of centre-PIP and matches the geometric test") {
    val geom = Queries.clipGeom
    val hx = math.abs(modis.resX) / 2.0; val hy = math.abs(modis.resY) / 2.0
    val centre = VectorOps.clipGeom(px, geom, drop = false)
      .df.filter(col("value") =!= -28672L).count()
    val touchedR = VectorOps.clipGeom(px, geom, drop = false, allTouched = true)
    val touched = touchedR.df.filter(col("value") =!= -28672L).count()
    assert(touched > centre, s"all_touched ($touched) must exceed centre-PIP ($centre)")
    // sampled pixels match the pure-Scala predicate
    val sample = touchedR.df.filter(col("row") % 3 === 0 && col("col") % 3 === 0)
      .select("row", "col", "x", "y", "value").collect()
    sample.foreach { r =>
      val exp = if (touchesScala(geom, r.getDouble(2), r.getDouble(3), hx, hy))
        synth(r.getLong(0), r.getLong(1)) else -28672L
      assert(r.getLong(4) == exp, s"pixel (${r.getLong(0)},${r.getLong(1)})")
    }
  }

  test("500-vertex clip routes through the edge-table PIP join and matches ray casting") {
    val geom = Queries.manyVertexGeom
    assert(geom.edges.size >= 500)
    val clipped = VectorOps.clipGeom(px, geom, drop = false)
    val plan = clipped.df.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    val sample = clipped.df.filter(col("row") % 5 === 1 && col("col") % 5 === 2)
      .select("row", "col", "x", "y", "value").collect()
    assert(sample.nonEmpty)
    sample.foreach { r =>
      val exp = if (geom.contains(r.getDouble(2), r.getDouble(3)))
        synth(r.getLong(0), r.getLong(1)) else -28672L
      assert(r.getLong(4) == exp, s"pixel (${r.getLong(0)},${r.getLong(1)})")
    }
  }

  test("500-vertex all_touched clip routes through the edge-table join and matches the geometric test") {
    val geom = Queries.manyVertexGeom
    assert(geom.edges.size > VectorOps.EdgeUnrollLimit)
    val hx = math.abs(modis.resX) / 2.0; val hy = math.abs(modis.resY) / 2.0
    val clipped = VectorOps.clipGeom(px, geom, drop = false, allTouched = true)
    val sample = clipped.df.filter(col("row") % 5 === 1 && col("col") % 5 === 2)
      .select("row", "col", "x", "y", "value").collect()
    assert(sample.nonEmpty)
    sample.foreach { r =>
      val exp = if (touchesScala(geom, r.getDouble(2), r.getDouble(3), hx, hy))
        synth(r.getLong(0), r.getLong(1)) else -28672L
      assert(r.getLong(4) == exp, s"pixel (${r.getLong(0)},${r.getLong(1)})")
    }
    // strict superset of the centre-PIP clip on the same geometry
    val centre = VectorOps.clipGeom(px, geom, drop = false)
      .df.filter(col("value") =!= -28672L).count()
    assert(clipped.df.filter(col("value") =!= -28672L).count() > centre)
  }

  test("clipBoxCrs equals clipBox of the driver-transformed bounds") {
    val wgs = Queries.clipCrsWgsBounds
    val native = GridRef.transformBounds(wgs, Crs.WGS84, Crs.MODIS_SINU)
    val a = WindowOps.clipBoxCrs(px, wgs, Crs.WGS84)
    val b = WindowOps.clipBox(px, native)
    assert(a.grid == b.grid)
    val sa = a.df.agg(count(lit(1)), sum("value")).collect()(0)
    val sb = b.df.agg(count(lit(1)), sum("value")).collect()(0)
    assert(sa == sb)
  }

  test("maskAndScale decodes value*scale+offset and masks nodata to NULL") {
    val d = MetadataOps.maskAndScale(px, 0.125, 100.0).df
    val nNod = px.df.filter(col("value") === -28672L).count()
    assert(d.filter(col("value").isNull).count() == nNod)
    val sample = d.filter(col("value").isNotNull)
      .filter(col("row") % 11 === 0 && col("col") % 11 === 0)
      .select("row", "col", "value").collect()
    sample.foreach { r =>
      val exp = synth(r.getLong(0), r.getLong(1)) * 0.125 + 100.0
      assert(r.getDouble(2) == exp, s"pixel (${r.getLong(0)},${r.getLong(1)})")
    }
  }

  test("mergeDatasets == per-variable merge_arrays (same union grid, same values)") {
    val dsA = Queries.datasetPixels(spark, modis, Queries.dsVarSeeds)
    val modisB = Queries.modisB
    val dsB = Queries.datasetPixels(spark, modisB, Queries.dsVarSeedsB)
    val (m, dst) = MergeOps.mergeDatasets(Seq(dsA -> modis, dsB -> modisB),
      Queries.dsVarNames, "first")
    assert(dst.width == 250 && dst.height == 230)
    Queries.dsVarNames.foreach { v =>
      val seedA = Queries.dsVarSeeds.toMap.apply(v)
      val seedB = Queries.dsVarSeedsB.toMap.apply(v)
      val single = MergeOps.merge(Seq(
        Raster(Synth.pixels(spark, modis, seedA), modis),
        Raster(Synth.pixels(spark, modisB, seedB), modisB)), "first").df
      val expect = single.agg(count(lit(1)), sum("value")).collect()(0)
      val actual = m.filter(col("var_name") === v)
        .agg(count(lit(1)), sum("value")).collect()(0)
      assert(actual == expect, s"variable $v")
    }
  }

  test("cosinePairsBanded: subset of brute pairs, no cartesian, measured recall") {
    val e = Queries.embeddings(spark, "/root/testdata/sf0.001")
    val banded = AnnOps.cosinePairsBanded(e, 0.4)
    val plan = banded.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"banded pairs must equi-join:\n$plan")
    val brute = AnnOps.cosinePairs(e, 0.4).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = banded.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(brute), "banded pairs must be exact on candidates")
    if (brute.nonEmpty) {
      val recall = got.size.toDouble / brute.size
      info(f"banded near-dup recall vs brute: $recall%.2f (${got.size}/${brute.size})")
      assert(recall > 0.3, s"recall $recall too low for 8x4 LSH")
    }
  }
}
