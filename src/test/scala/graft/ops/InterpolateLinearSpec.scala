package graft.ops

import graft.SparkTestBase
import graft.core._
import org.apache.spark.sql.functions._

/** interpolate_na(linear): the deterministic fixed-diagonal local
  * triangulation (InterpolateOps.interpolateNaLinear) against an
  * INDEPENDENT plain-Scala brute-force mirror — full quadrant scans and
  * the barycentric formulas re-derived here, not shared with the
  * implementation — over a wide hole (escalation past several bucket
  * doublings), plus the two semantic pins: the isolated-pixel diamond
  * resolves to (N+S)/2 under the fixed NW–SE diagonal, and pixels with
  * no containing triangle keep nodata (the convex-hull analog of
  * scipy.griddata's fill_value, raster_array.py:920-928). */
class InterpolateLinearSpec extends SparkTestBase {

  private val nd = -28672L

  def synth(r: Long, c: Long, seed: Long = 12345L): Long =
    if ((r * 53 + c * 97) % 101 == 0) nd
    else (r * 7919L + c * 104729L + seed) % 19997L - 9999L

  /** Brute-force mirror: quadrant-nearest by full scan, fixed NW-SE
    * diagonal, exact Long determinants, one double division. */
  private def brute(value: (Long, Long) => Long, w: Long, h: Long)(
      mr: Long, mc: Long): Double = {
    // quadrant winners by (d2, r, c): 0=NW 1=NE 2=SW 3=SE
    val win = Array.fill[Option[(Long, Long, Long)]](4)(None)
    val bestKey = Array.fill[(Long, Long, Long)](4)((Long.MaxValue, Long.MaxValue, Long.MaxValue))
    for (r <- 0L until h; c <- 0L until w) {
      val v = value(r, c)
      if (v != nd) {
        val q = (if (r <= mr) 0 else 2) + (if (c <= mc) 0 else 1)
        val d2 = (mr - r) * (mr - r) + (mc - c) * (mc - c)
        val key = (d2, r, c)
        if (Ordering[(Long, Long, Long)].lt(key, bestKey(q))) {
          bestKey(q) = key; win(q) = Some((r, c, v))
        }
      }
    }
    def orient(a: (Long, Long), b: (Long, Long), c: (Long, Long)): Long =
      (b._2 - a._2) * (c._1 - a._1) - (b._1 - a._1) * (c._2 - a._2) // (row,col): x=col,y=row
    def tri(p1: Option[(Long, Long, Long)], p2: Option[(Long, Long, Long)],
            p3: Option[(Long, Long, Long)]): Option[Double] =
      for {
        a <- p1; b <- p2; c <- p3
        den = orient((a._1, a._2), (b._1, b._2), (c._1, c._2))
        if den != 0
        wa = orient((mr, mc), (b._1, b._2), (c._1, c._2))
        wb = orient((a._1, a._2), (mr, mc), (c._1, c._2))
        wc = orient((a._1, a._2), (b._1, b._2), (mr, mc))
        if (den > 0 && wa >= 0 && wb >= 0 && wc >= 0) ||
           (den < 0 && wa <= 0 && wb <= 0 && wc <= 0)
      } yield (wa.toDouble * a._3 + wb.toDouble * b._3 + wc.toDouble * c._3) / den.toDouble
    tri(win(0), win(1), win(3)) // T1 = (NW, NE, SE)
      .orElse(tri(win(0), win(3), win(2))) // T2 = (NW, SE, SW)
      .getOrElse(nd.toDouble)
  }

  test("linear fill over a 24x24 hole matches the brute-force mirror at every missing pixel") {
    val g = Synth.modisGrid.copy(width = 60, height = 60)
    def holedVal(r: Long, c: Long): Long =
      if (r >= 18 && r < 42 && c >= 18 && c < 42) nd else synth(r, c)
    val holed = Synth.pixels(spark, g).withColumn("value",
      when(col("row") >= 18 && col("row") < 42 &&
           col("col") >= 18 && col("col") < 42, lit(nd)).otherwise(col("value")))
    val filled = InterpolateOps.interpolateNaLinear(Raster(holed, g), bucket = 4)
    assert(filled.df.count() == 3600, "every pixel must survive")
    val got = filled.df.select("row", "col", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    var checked = 0
    for (r <- 0L until 60L; c <- 0L until 60L if holedVal(r, c) == nd) {
      val expect = brute(holedVal, 60, 60)(r, c)
      assert(got((r, c)) == expect, s"missing pixel ($r,$c)") // bit-exact
      checked += 1
    }
    assert(checked > 600, s"fixture sanity: wide hole plus scatter ($checked)")
    // the interior of a hole this wide is enclosed on all sides: filled
    assert(got((30L, 30L)) != nd.toDouble, "deep-hole pixel interpolates")
    // valid pixels pass through as exact doubles
    assert(got((0L, 1L)) == synth(0L, 1L).toDouble)
  }

  test("isolated pixel resolves the cocircular diamond to (N+S)/2 — the fixed NW-SE diagonal") {
    val g = Synth.modisGrid.copy(width = 20, height = 20)
    // one missing pixel at (10,10), everything else valid with chosen values
    def v(r: Long, c: Long): Long = if (r == 10 && c == 10) nd else 100 * r + c
    val df = Synth.pixels(spark, g).withColumn("value",
      expr(s"CASE WHEN row = 10 AND col = 10 THEN ${nd}L ELSE 100*row + col END"))
    val filled = InterpolateOps.interpolateNaLinear(Raster(df, g), bucket = 4)
    val got = filled.df.filter(col("row") === 10 && col("col") === 10)
      .select("value").collect()(0).getDouble(0)
    // quadrant winners are the axis neighbours: N=(9,10) NW, E=(10,11) NE,
    // S=(11,10) SW, SE=(11,11); p sits on the NW-SW edge of T2 -> (N+S)/2
    val n = v(9, 10).toDouble; val s = v(11, 10).toDouble
    assert(got == (n + s) / 2.0, s"got $got, want ${(n + s) / 2.0}")
    assert(got == brute(v, 20, 20)(10, 10))
  }

  test("pixels outside the enclosing point set keep nodata (convex-hull analog)") {
    val g = Synth.modisGrid.copy(width = 30, height = 30)
    // valid data only in the lower-right 10x10 block: pixels strictly above/
    // left of it have at least two empty quadrants -> no triangle -> nodata
    def v(r: Long, c: Long): Long = if (r >= 20 && c >= 20) 7L * r + c else nd
    val df = Synth.pixels(spark, g).withColumn("value",
      expr(s"CASE WHEN row >= 20 AND col >= 20 THEN 7*row + col ELSE ${nd}L END"))
    val filled = InterpolateOps.interpolateNaLinear(Raster(df, g), bucket = 4)
    val got = filled.df.select("row", "col", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.size == 900)
    // a pixel up-left of all data: every triangle needs an SE-only spread
    assert(got((5L, 5L)) == nd.toDouble, "unenclosed pixel keeps nodata")
    assert(got((0L, 29L)) == nd.toDouble, "top-right: NW/NE empty")
    // inside the valid block nothing changed
    assert(got((25L, 25L)) == (7L * 25 + 25).toDouble)
    // and every pixel agrees with the brute mirror (hull rule included)
    for (r <- 0L until 30L; c <- 0L until 30L if v(r, c) == nd)
      assert(got((r, c)) == brute(v, 30, 30)(r, c), s"($r,$c)")
  }
}
