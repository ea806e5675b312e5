package graft.ops

import graft.core._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Tile-native merge kernel — packed-array execution path for
  * [[MergeOps.merge]] over grid-ALIGNED sources (the common mosaic case;
  * non-conforming inputs go through TileWarp/inverse-resample first, as in
  * the reference's merge.py:150-161).
  *
  * Each source tile is dst-indexed by its integer offset and lands in at
  * most 4 destination tiles; the overlap sub-rectangles are cut by the
  * codegen'd SliceGrid and shipped as fragments — the shuffle carries each
  * source pixel exactly ONCE (vs once per pixel ROW in the exploded path),
  * keyed by destination tile. One groupBy; precedence/aggregation painted
  * per tile in a typed mapGroups:
  *   first = lowest-rank non-nodata wins, last = highest,
  *   min/max/sum/count accumulate. Spec-proven equal to MergeOps.merge. */
object TileMerge {

  final case class MergeFrag(dr0: Int, dc0: Int, w: Int, rank: Int,
                             frag: Array[Double])
  final case class GatheredM(dt_row: Long, dt_col: Long, frags: Array[MergeFrag])

  /** Merge packed sources onto the union grid. `sources` are
    * (packed tiles (st_row, st_col, data), grid); all tiles ts x ts and all
    * grids aligned to the union grid (same res, whole-pixel offsets). */
  def mergeTiles(sources: Seq[(DataFrame, GridRef)], method: String,
                 ts: Int): (Dataset[TileWarp.DstTile], GridRef) = {
    require(sources.nonEmpty)
    val dst = MergeOps.unionGrid(sources.map(_._2))
    val spark = sources.head._1.sparkSession
    import spark.implicits._
    val nodata = dst.nodata.toLong
    val nTx = (dst.width + ts - 1) / ts
    val nTy = (dst.height + ts - 1) / ts

    // fragments: each source tile split across the <=4 dst tiles it covers
    val frags = sources.zipWithIndex.map { case ((tiles, g), rank) =>
      val off = MergeOps.alignedOffset(g, dst)
      require(off.isDefined,
        "mergeTiles requires grid-aligned sources (inverse-resample first, merge.py:150-161)")
      val (ro, co) = off.get
      val base = tiles
        // dst pixel range of this src tile
        .withColumn("p_r0", col("st_row") * ts + ro)
        .withColumn("p_c0", col("st_col") * ts + co)
        .select(col("data"), col("p_r0"), col("p_c0"),
          explode(expr(s"sequence(p_r0 div $ts, (p_r0 + ${ts - 1}) div $ts)")).as("dt_row"))
        .select(col("*"),
          explode(expr(s"sequence(p_c0 div $ts, (p_c0 + ${ts - 1}) div $ts)")).as("dt_col"))
        .filter(col("dt_row") >= 0 && col("dt_row") < nTy &&
                col("dt_col") >= 0 && col("dt_col") < nTx)
        // overlap rect in dst pixel coords
        .withColumn("o_r0", greatest(col("p_r0"), col("dt_row") * ts))
        .withColumn("o_r1", least(col("p_r0") + (ts - 1), col("dt_row") * ts + (ts - 1),
                                  lit(dst.height.toLong - 1)))
        .withColumn("o_c0", greatest(col("p_c0"), col("dt_col") * ts))
        .withColumn("o_c1", least(col("p_c0") + (ts - 1), col("dt_col") * ts + (ts - 1),
                                  lit(dst.width.toLong - 1)))
        .filter(col("o_r0") <= col("o_r1") && col("o_c0") <= col("o_c1"))
      base.select(col("dt_row"), col("dt_col"),
        (col("o_r0") - col("dt_row") * ts).cast("int").as("dr0"),
        (col("o_c0") - col("dt_col") * ts).cast("int").as("dc0"),
        (col("o_c1") - col("o_c0") + 1).cast("int").as("w"),
        lit(rank).as("rank"),
        graft.functions.SliceGrid.column(col("data"),
          col("o_r0") - col("p_r0"), col("o_r1") - col("p_r0"),
          col("o_c0") - col("p_c0"), col("o_c1") - col("p_c0"), ts).as("frag"))
    }.reduce(_ unionByName _)

    val gathered = frags.groupBy("dt_row", "dt_col")
      .agg(collect_list(struct(col("dr0"), col("dc0"), col("w"), col("rank"),
        col("frag"))).as("frags"))
      .as[GatheredM]

    val painted = gathered.map { gth =>
      TileWarp.DstTile(gth.dt_row, gth.dt_col,
        paint(gth.frags, method, ts, nodata))
    }
    // dst tiles covered by no source at all -> all-nodata
    val allTiles = spark.range(nTx.toLong * nTy)
      .select(expr(s"id div $nTx").as("dt_row"), (col("id") % nTx).as("dt_col"))
    val emptyFill = fillValue(method, nodata)
    val empty = allTiles.join(gathered.select("dt_row", "dt_col"),
        Seq("dt_row", "dt_col"), "left_anti")
      .as[(Long, Long)]
      .map { case (tr, tc) =>
        TileWarp.DstTile(tr, tc, Array.fill(ts * ts)(emptyFill))
      }
    (painted.unionByName(empty), dst)
  }

  /** Per-tile paint: precedence/aggregation over fragments, mirroring
    * MergeOps.merge's min_by/max_by/min/max/sum/count over non-nodata
    * contributions (empty pixels -> nodata). */
  /** Empty-pixel value: `count` is never null in the exploded path (the
    * skeleton row makes count(value) = 0), every other method falls back to
    * nodata. */
  private def fillValue(method: String, nodata: Long): Double =
    if (method == "count") 0.0 else nodata.toDouble

  private def paint(frags: Array[MergeFrag], method: String, ts: Int,
                    nodata: Long): Array[Double] = {
    val out = Array.fill(ts * ts)(fillValue(method, nodata))
    method match {
      case "first" | "last" =>
        // paint in overwrite order: for "first" higher ranks go first so
        // lower ranks overwrite; for "last" the reverse
        val ordered =
          if (method == "first") frags.sortBy(f => -f.rank)
          else frags.sortBy(f => f.rank)
        ordered.foreach { f =>
          val h = f.frag.length / f.w
          var r = 0
          while (r < h) {
            var c = 0
            while (c < f.w) {
              val v = f.frag(r * f.w + c)
              if (v != nodata.toDouble) out((f.dr0 + r) * ts + (f.dc0 + c)) = v
              c += 1
            }
            r += 1
          }
        }
      case "min" | "max" | "sum" | "count" =>
        val acc = new Array[Double](ts * ts)
        val cnt = new Array[Long](ts * ts)
        frags.foreach { f =>
          val h = f.frag.length / f.w
          var r = 0
          while (r < h) {
            var c = 0
            while (c < f.w) {
              val v = f.frag(r * f.w + c)
              if (v != nodata.toDouble) {
                val i = (f.dr0 + r) * ts + (f.dc0 + c)
                if (cnt(i) == 0) acc(i) = v
                else method match {
                  case "min" => if (v < acc(i)) acc(i) = v
                  case "max" => if (v > acc(i)) acc(i) = v
                  case _     => acc(i) += v
                }
                cnt(i) += 1
              }
              c += 1
            }
            r += 1
          }
        }
        var i = 0
        while (i < ts * ts) {
          if (cnt(i) > 0) out(i) = if (method == "count") cnt(i).toDouble else acc(i)
          i += 1
        }
      case m => throw new IllegalArgumentException(s"unsupported merge method $m")
    }
    out
  }
}
