package graft.ops

import graft.SparkTestBase
import graft.core._
import org.apache.spark.sql.functions._

class MergeOpsSpec extends SparkTestBase {

  def modis: GridRef = Synth.modisGrid
  def full: Raster = Raster(Synth.pixels(spark, modis), modis)

  /** 2x2 quadrant split of the MODIS grid (mirrors the structure of
    * reference test_integration_merge.py:14-56). */
  def quadrants: Seq[Raster] = {
    val h2 = modis.height / 2; val w2 = modis.width / 2
    Seq(
      PixelWindow(0, h2, 0, w2), PixelWindow(0, h2, w2, modis.width),
      PixelWindow(h2, modis.height, 0, w2), PixelWindow(h2, modis.height, w2, modis.width)
    ).map(w => WindowOps.iselWindow(full, w))
  }

  test("2x2 split re-merged (first) is the identity: shape, transform, values") {
    val merged = MergeOps.merge(quadrants, "first")
    assert(merged.grid.width == 200 && merged.grid.height == 200)
    val t = merged.grid.transform; val t0 = modis.transform
    assert(math.abs(t.a - t0.a) < 1e-9 && math.abs(t.c - t0.c) < 1e-6 &&
           math.abs(t.f - t0.f) < 1e-6)
    // exact value identity with the unsplit raster (sum + sample compare)
    val s1 = merged.df.agg(sum("value")).collect()(0).getLong(0)
    val s0 = full.df.agg(sum("value")).collect()(0).getLong(0)
    assert(s1 == s0, s"merged sum $s1 != original $s0")
    assert(merged.df.count() == 40000)
  }

  test("merge with res=(300,300) yields the reference golden shape 155x155") {
    // golden shape from test_integration_merge.py:113-151
    val merged = MergeOps.merge(quadrants, "first", res = Some((300.0, 300.0)))
    assert(merged.grid.width == 155 && merged.grid.height == 155,
      s"got ${merged.grid.width}x${merged.grid.height}")
  }

  test("overlap precedence: sum == A+B, first == A, last == B, count == 2 in overlap") {
    val a = full
    val bGrid = modis.copy(transform = modis.transform.windowed(50, 30))
    val b = Raster(Synth.pixels(spark, bGrid, seed = 777L), bGrid)
    val dst = MergeOps.unionGrid(Seq(modis, bGrid))
    assert(dst.width == 250 && dst.height == 230)

    val sum = MergeOps.merge(Seq(a, b), "sum").df
    val first = MergeOps.merge(Seq(a, b), "first").df
    val last = MergeOps.merge(Seq(a, b), "last").df
    val count = MergeOps.merge(Seq(a, b), "count").df

    // pick an overlap pixel: dst (row 100, col 100) = A(100,100) + B(70,50)
    def vAt(df: org.apache.spark.sql.DataFrame, r: Int, c: Int): Long =
      df.filter(col("row") === r && col("col") === c).select("value").collect()(0).getLong(0)
    def synth(r: Long, c: Long, seed: Long): Long =
      if ((r * 53 + c * 97) % 101 == 0) -28672L
      else (r * 7919L + c * 104729L + seed) % 19997L - 9999L
    val vA = synth(100, 100, 12345L); val vB = synth(70, 50, 777L)
    assume(vA != -28672L && vB != -28672L)
    assert(vAt(sum, 100, 100) == vA + vB)
    assert(vAt(first, 100, 100) == vA)
    assert(vAt(last, 100, 100) == vB)
    assert(vAt(count, 100, 100) == 2L)
    // outside both -> nodata (corner of dst not covered by A or B)
    assert(vAt(first, 0, 249) == -28672L)
  }

  test("merge is a single-shuffle plan (one Exchange before the aggregate)") {
    val merged = MergeOps.merge(quadrants, "first")
    val plan = merged.df.queryExecution.executedPlan.toString()
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected <=1 hash exchange, got $exchanges:\n$plan")
  }
}
