package graft

import graft.core.{Cells, Synth}

/** Scratch microbench for the S2 cover kernel hot path (round-4 diagnosis,
  * not part of the suite): times S2RectCover.cells over the flagship
  * fixture's bbox distribution and quantifies the join fan-out per level.
  * Run: Test/runMain graft.S2Probe */
object S2Probe {
  def main(args: Array[String]): Unit = {
    val grid = Synth.modisGrid
    val t = grid.transform
    val n = 2000000
    def bbox(id: Long): (Double, Double, Double, Double) = {
      val c0 = (id * 7 % 180).toDouble; val r0 = (id * 13 % 180).toDouble
      val xMin = t.a * c0 + t.c; val xMax = t.a * (c0 + 12) + t.c
      val yMax = t.e * r0 + t.f; val yMin = t.e * (r0 + 12) + t.f
      val corners = Seq((xMin, yMin), (xMin, yMax), (xMax, yMin), (xMax, yMax))
        .map { case (x, y) => grid.crs.proj.inverse(x, y) }
      (corners.map(_._1).min, corners.map(_._2).min,
       corners.map(_._1).max, corners.map(_._2).max)
    }

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name: $sec%.2f s (${n / sec}%.0f /s) [sink=$r]")
    }
    (0L until 200000L).foreach { id =>
      val (lo, la, hi, lb) = bbox(id)
      graft.functions.S2RectCover.cells(lo, la, hi, lb, 7, 9)
    }
    for (level <- Seq(7, 10, 11, 12)) {
      time(s"kernel level $level") {
        var acc = 0L; var id = 0L
        while (id < n) {
          val (lo, la, hi, lb) = bbox(id)
          acc += graft.functions.S2RectCover.cells(lo, la, hi, lb, level, 9).numElements()
          id += 1
        }
        acc
      }
    }

    // join fan-out per level: cover cells/doc (sampled), distinct tile-centre
    // cells, resulting assignment rows (cover rows x tiles-per-cell)
    val tileGridN = 8
    val tilePx = grid.width / tileGridN
    for (level <- Seq(7, 8, 9, 10, 11, 12)) {
      val tileCells = (0 until tileGridN * tileGridN).map { tid =>
        val pr = (tid / tileGridN) * tilePx + tilePx / 2.0
        val pc = (tid % tileGridN) * tilePx + tilePx / 2.0
        val x = t.a * pc + t.c; val y = t.e * pr + t.f
        val (lon, lat) = grid.crs.proj.inverse(x, y)
        Cells.s2CellId(lon, lat, level)
      }
      val tilesPerCell = tileCells.groupBy(identity).view.mapValues(_.size).toMap
      var coverRows = 0L; var assignRows = 0L
      var id = 0L
      while (id < 100000) {
        val (lo, la, hi, lb) = bbox(id)
        val cells = graft.functions.S2RectCover.cells(lo, la, hi, lb, level, 9)
        coverRows += cells.numElements()
        var i = 0
        while (i < cells.numElements()) {
          assignRows += tilesPerCell.getOrElse(cells.getLong(i), 0)
          i += 1
        }
        id += 1
      }
      println(f"level $level%2d: distinctTileCells=${tilesPerCell.size}%4d " +
        f"coverCells/doc=${coverRows / 100000.0}%.2f assignRows/doc=${assignRows / 100000.0}%.1f " +
        f"-> est assignments at 2M docs = ${assignRows * 20}%,d")
    }
  }
}
