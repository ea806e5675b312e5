package graft

import graft.core.{Hex, Synth}

/** Scratch microbench for the hex cover hot path (round-5 diagnosis, not
  * part of the suite): quantifies per-doc SAT candidate counts under the
  * old integer ±1 margin vs the exact ±2/3 fractional margin, cover
  * cells/doc, and — the S2-saga lesson — the JOIN FAN-OUT (assignment
  * rows/doc) per res against the flagship tile grid.
  * Run: Test/runMain graft.HexProbe */
object HexProbe {
  def main(args: Array[String]): Unit = {
    val grid = Synth.modisGrid
    val t = grid.transform
    def bbox(id: Long): (Double, Double, Double, Double) = {
      val c0 = (id * 7 % 180).toDouble; val r0 = (id * 13 % 180).toDouble
      val xMin = t.a * c0 + t.c; val xMax = t.a * (c0 + 12) + t.c
      val yMax = t.e * r0 + t.f; val yMin = t.e * (r0 + 12) + t.f
      val corners = Seq((xMin, yMin), (xMin, yMax), (xMax, yMin), (xMax, yMax))
        .map { case (x, y) => grid.crs.proj.inverse(x, y) }
      (corners.map(_._1).min, corners.map(_._2).min,
       corners.map(_._1).max, corners.map(_._2).max)
    }
    val sq3 = math.sqrt(3.0)

    // tile grid of the flagship join (DocOps.spatialTileAssignments*)
    val tileGridN = 8
    val tilePx = grid.width / tileGridN

    for (res <- Seq(4, 5, 6, 7)) {
      val sz = Hex.size(res)
      val co = Hex.cosT(res); val si = Hex.sinT(res)
      def axf(lon: Double, lat: Double): (Double, Double) = {
        val x = co * lon + si * lat; val y = -si * lon + co * lat
        ((sq3 / 3.0 * x - 1.0 / 3.0 * y) / sz, (2.0 / 3.0 * y) / sz)
      }
      def coverCells(id: Long): Seq[(Long, Long)] = {
        val (lo, la, hi, lb) = bbox(id)
        val cs = Seq(axf(lo, la), axf(hi, la), axf(lo, lb), axf(hi, lb))
        val (q0, q1) = (math.ceil(cs.map(_._1).min - 0.67).toLong,
                        math.floor(cs.map(_._1).max + 0.67).toLong)
        val (r0, r1) = (math.ceil(cs.map(_._2).min - 0.67).toLong,
                        math.floor(cs.map(_._2).max + 0.67).toLong)
        val rcx = (lo + hi) / 2.0; val rcy = (la + lb) / 2.0
        val hw = (hi - lo) / 2.0; val hh = (lb - la) / 2.0
        for {
          hq <- q0 to q1; hr <- r0 to r1
          lx = sz * (sq3 * hq + sq3 / 2.0 * hr); ly = sz * 1.5 * hr
          cx = co * lx - si * ly; cy = si * lx + co * ly
          dx = cx - rcx; dy = cy - rcy
          if !(math.abs(dx) > Hex.supportX(res) + hw) &&
             !(math.abs(dy) > Hex.supportY(res) + hh) &&
             Hex.normalAngles(res).forall { a =>
               val ux = math.cos(a); val uy = math.sin(a)
               math.abs(dx * ux + dy * uy) <=
                 Hex.apothem(res) + hw * math.abs(ux) + hh * math.abs(uy)
             }
        } yield (hq, hr)
      }
      def candCount(id: Long, frac: Boolean): Long = {
        val (lo, la, hi, lb) = bbox(id)
        val cs = Seq(axf(lo, la), axf(hi, la), axf(lo, lb), axf(hi, lb))
        if (frac) {
          val nq = math.floor(cs.map(_._1).max + 0.67).toLong - math.ceil(cs.map(_._1).min - 0.67).toLong + 1
          val nr = math.floor(cs.map(_._2).max + 0.67).toLong - math.ceil(cs.map(_._2).min - 0.67).toLong + 1
          nq * nr
        } else {
          val nq = math.ceil(cs.map(_._1).max).toLong + 1 - (math.floor(cs.map(_._1).min).toLong - 1) + 1
          val nr = math.ceil(cs.map(_._2).max).toLong + 1 - (math.floor(cs.map(_._2).min).toLong - 1) + 1
          nq * nr
        }
      }

      // tile-centre cells at this res
      val tileCells = (0 until tileGridN * tileGridN).map { tid =>
        val pr = (tid / tileGridN) * tilePx + tilePx / 2.0
        val pc = (tid % tileGridN) * tilePx + tilePx / 2.0
        val x = t.a * pc + t.c; val y = t.e * pr + t.f
        val (lon, lat) = grid.crs.proj.inverse(x, y)
        Hex.axial(lon, lat, res)
      }
      val tilesPerCell = tileCells.groupBy(identity).view.mapValues(_.size).toMap

      var candOld = 0L; var candNew = 0L; var cover = 0L; var assign = 0L
      val n = 100000L
      var id = 0L
      while (id < n) {
        candOld += candCount(id, frac = false)
        candNew += candCount(id, frac = true)
        val cells = coverCells(id)
        cover += cells.size
        assign += cells.map(c => tilesPerCell.getOrElse(c, 0)).sum
        id += 1
      }
      println(f"res $res: cand/doc old=${candOld.toDouble / n}%.2f new=${candNew.toDouble / n}%.2f " +
        f"cover/doc=${cover.toDouble / n}%.2f assign/doc=${assign.toDouble / n}%.2f " +
        f"distinctTileCells=${tilesPerCell.size} (hex diam=${sq3 * Hex.size(res)}%.4f deg)")
    }
  }
}
