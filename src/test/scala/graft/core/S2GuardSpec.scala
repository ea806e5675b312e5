package graft.core

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The round-4 replacement of the S2 st-floor guard (VERDICT r3 next-round
  * #1): `floor(st*n + StEps)` instead of `floor(ROUND(st*n, 9))`.
  *
  * Cross-engine identity of the NEW guard needs no sweep: every operation
  * in it (double multiply by 2^level, double add of the identical 5.0E-10
  * literal, FLOOR) is an exactly-specified IEEE-754 op that Java, Spark
  * codegen and DuckDB all perform bit-identically — unlike ROUND(x,9),
  * whose implementations differ (scala BigDecimal vs DuckDB's libm-based
  * rounding) and only happened to agree away from half-1e-9 boundaries.
  * What DOES need evidence:
  *
  *  1. the new guard makes the same floor decision as the old one over the
  *     actual corpus (so the r03-green S2 oracles stay green), swept here
  *     over the full flagship/catalog geometry distribution — every doc_id
  *     residue (the bbox formula is periodic in doc_id mod 180) x every
  *     corner and lattice sample x levels 7..12, plus 200k random points —
  *     far more distinct st values than the sf0.1 corpus reaches;
  *  2. scalar and Column forms stay bit-identical even at adversarial
  *     half-ulp boundary inputs (where old-vs-new may legitimately differ,
  *     cross-FORM consistency is what correctness rests on).
  */
class S2GuardSpec extends SparkTestBase {

  private def oldGuardIdx(st: Double, level: Int): Long = {
    val n = 1L << level
    val r9 = BigDecimal(st * n).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    math.min(n - 1, math.max(0L, math.floor(r9).toLong))
  }

  /** Every (lon,lat) the S2 cover family evaluates for a doc bbox: 4
    * corners + the 9x9 lattice (fallback branch). */
  private def fixturePoints(docId: Long): Seq[(Double, Double)] = {
    val grid = Synth.modisGrid; val t = grid.transform
    val c0 = (docId * 7 % 180).toDouble; val r0 = (docId * 13 % 180).toDouble
    val corners = Seq((c0, r0), (c0, r0 + 12), (c0 + 12, r0), (c0 + 12, r0 + 12))
      .map { case (c, r) => grid.crs.proj.inverse(t.a * c + t.c, t.e * r + t.f) }
    val lonMin = corners.map(_._1).min; val lonMax = corners.map(_._1).max
    val latMin = corners.map(_._2).min; val latMax = corners.map(_._2).max
    val lattice = for (i <- 0 to 8; j <- 0 to 8)
      yield (lonMin + (lonMax - lonMin) * i / 8.0, latMin + (latMax - latMin) * j / 8.0)
    corners ++ lattice
  }

  test("new guard reproduces the old ROUND(,9) floor over the full fixture domain") {
    var checked = 0L
    // doc geometry is periodic in doc_id mod 180 (c0) x mod 180 (r0) ->
    // 180 distinct bboxes per axis stride; doc_id 0..179 covers every
    // residue class the corpus (any sf) can produce
    for (docId <- 0L until 180L; (lon, lat) <- fixturePoints(docId)) {
      val (_, u, v) = Cells.s2FaceUv(lon, lat)
      for (level <- 7 to 12; c <- Seq(u, v)) {
        val st = Cells.s2St(c)
        assert(Cells.s2StIdx(c, level) == oldGuardIdx(st, level),
          s"doc $docId ($lon,$lat) level $level uv=$c st=$st")
        checked += 1
      }
    }
    // plus a broad pseudo-random sweep of the sphere
    val rnd = new scala.util.Random(4242)
    (0 until 200000).foreach { i =>
      val lon = rnd.nextDouble() * 360.0 - 180.0
      val lat = rnd.nextDouble() * 179.8 - 89.9
      val (_, u, v) = Cells.s2FaceUv(lon, lat)
      val level = 7 + i % 6
      for (c <- Seq(u, v))
        assert(Cells.s2StIdx(c, level) == oldGuardIdx(Cells.s2St(c), level),
          s"random $i ($lon,$lat) level $level")
      checked += 2
    }
    assert(checked > 400000L)
  }

  test("scalar == Column at adversarial half-ulp boundary values") {
    import spark.implicits._
    val level = 10; val n = 1L << level
    // u values whose st lands within ulps of a cell boundary k/n, plus the
    // guard's own snap threshold k/n - 5e-10: invert st (u = (4s^2-1)/3 for
    // s >= 0.5, u = -((1-s)*2)^2... via the negative branch) then walk ulps
    def uOfSt(s: Double): Double =
      if (s >= 0.5) { val r = 2.0 * s; (r * r - 1.0) / 3.0 }
      else { val r = 2.0 * (1.0 - s); -(r * r - 1.0) / 3.0 }
    // the guard operates on the SCALED value st*n, so boundary-adversarial
    // st values are (k ± 5e-10)/n — the snap window shrinks by n in st units
    val targets = for {
      k <- Seq(1L, 7L, n / 3, n / 2, n - 3)
      base <- Seq(k.toDouble / n, (k - 5e-10) / n, (k + 5e-10) / n)
    } yield uOfSt(base)
    val walked = targets.flatMap { u0 =>
      var ups = List(u0); var d = u0; var x = u0
      (1 to 8).foreach { _ => d = Math.nextDown(d); x = Math.nextUp(x); ups = d :: x :: ups }
      ups
    }.filter(u => u >= -1.0 && u <= 1.0)
    val scalarIdx = walked.map(u => Cells.s2StIdx(u, level))
    val colIdx = walked.toDF("u")
      .select(Cells.s2StIdxColumn(col("u"), level)).collect().map(_.getLong(0)).toSeq
    assert(colIdx == scalarIdx, "Column form diverged from scalar at a boundary value")
    // and the guard actually snaps: a scaled value 4.9e-10 below a cell
    // boundary floors UP onto it, one just past the window floors down
    assert(math.floor((7.0 - 4.9e-10) + Cells.StEps).toLong == 7L)
    assert(math.floor((7.0 - 5.1e-10) + Cells.StEps).toLong == 6L)
  }
}
