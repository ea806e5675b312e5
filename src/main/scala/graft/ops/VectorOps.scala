package graft.ops

import graft.core._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raster<->vector operators: clip-by-geometry (the reference's
  * rio.clip, raster_array.py:763-861) and zonal statistics.
  *
  * Semantics: pixel-centre point-in-polygon, even-odd rule — what the
  * reference gets from rasterio.features.geometry_mask with
  * all_touched=False (rioxarray/_spatial_utils.py:468-503).
  *
  * Two executor-side formulations, both 100% Catalyst builtins (no UDF, no
  * CodegenFallback — the predicate stays inside WholeStageCodegen):
  *
  *  1. `containsColumn`: for one literal geometry, the crossing test is
  *     unrolled into a boolean Column chain (one term per edge). Used for
  *     masks where the geometry set is tiny (clip).
  *  2. `pipJoin`: geometry edges become a broadcast side of an equi-less
  *     join; crossings are counted per (pixel, geometry) with a map-side
  *     partial aggregate. Used when many geometries participate (zonal
  *     stats over a geometry table). The bbox pre-filter plays the role of
  *     the cell-cover prune and is pushed into the scan.
  *
  * At cluster scale, both sides are first pruned by cell cover
  * (Cells.coverBounds on the geometry bbox -> cell_id IN (...) partition
  * filter) so only tiles near geometry are read at all.
  */
object VectorOps {

  /** Even-odd crossing count as a literal-unrolled Column (identical
    * arithmetic to the SQL oracle: px < x1 + (py-y1)*dx/dy). */
  def containsColumn(g: Geom, px: Column, py: Column): Column = {
    val crossings: Seq[Column] = g.edges.map { case (x1, y1, x2, y2) =>
      val dx = x2 - x1; val dy = y2 - y1
      val cond = (lit(y1) > py) =!= (lit(y2) > py) &&
        (px < lit(x1) + (py - lit(y1)) * lit(dx) / lit(dy))
      when(cond, 1).otherwise(0)
    }
    (crossings.reduce(_ + _) % 2) === 1
  }

  /** Same predicate in DuckDB SQL over pixel expressions pxE/pyE. */
  def containsSql(g: Geom, pxE: String, pyE: String): String = {
    val terms = g.edges.map { case (x1, y1, x2, y2) =>
      val dx = x2 - x1; val dy = y2 - y1
      s"(CASE WHEN (($y1 > $pyE) != ($y2 > $pyE)) AND " +
        s"($pxE < $x1 + (($pyE) - $y1) * $dx / $dy) THEN 1 ELSE 0 END)"
    }
    s"((${terms.mkString(" + ")}) % 2) = 1"
  }

  /** all_touched=True geometric test (raster_array.py:768,837 →
    * rasterio.features.geometry_mask(all_touched=True)): include a pixel when
    * its closed SQUARE (centre ± half-resolution) intersects the polygon —
    * i.e. centre inside, OR any polygon edge intersects the rectangle
    * (segment-AABB: bboxes overlap AND the 4 rect corners are not strictly on
    * one side of the segment's supporting line). Equivalent to GDAL's
    * supercover edge walk + interior fill up to exact-boundary tie
    * conventions. All arithmetic is literal/affine-exact (no libm), so the
    * SQL mirror is bit-identical. */
  def touchesColumn(g: Geom, px: Column, py: Column, hx: Double, hy: Double): Column = {
    val edgeHit: Column = g.edges.map { case (x1, y1, x2, y2) =>
      val bbox = lit(math.max(x1, x2)) >= px - hx && lit(math.min(x1, x2)) <= px + hx &&
                 lit(math.max(y1, y2)) >= py - hy && lit(math.min(y1, y2)) <= py + hy
      def f(cx: Column, cy: Column): Column =
        lit(x2 - x1) * (cy - lit(y1)) - lit(y2 - y1) * (cx - lit(x1))
      val s1 = f(px - hx, py - hy); val s2 = f(px + hx, py - hy)
      val s3 = f(px - hx, py + hy); val s4 = f(px + hx, py + hy)
      val oneSide = (s1 > 0 && s2 > 0 && s3 > 0 && s4 > 0) ||
                    (s1 < 0 && s2 < 0 && s3 < 0 && s4 < 0)
      bbox && !oneSide
    }.reduce(_ || _)
    containsColumn(g, px, py) || edgeHit
  }

  /** Same all-touched predicate in DuckDB SQL. */
  def touchesSql(g: Geom, pxE: String, pyE: String, hx: Double, hy: Double): String = {
    val edgeTerms = g.edges.map { case (x1, y1, x2, y2) =>
      def f(cxE: String, cyE: String): String =
        s"(${x2 - x1} * (($cyE) - $y1) - ${y2 - y1} * (($cxE) - $x1))"
      val s1 = f(s"($pxE) - $hx", s"($pyE) - $hy"); val s2 = f(s"($pxE) + $hx", s"($pyE) - $hy")
      val s3 = f(s"($pxE) - $hx", s"($pyE) + $hy"); val s4 = f(s"($pxE) + $hx", s"($pyE) + $hy")
      s"(${math.max(x1, x2)} >= ($pxE) - $hx AND ${math.min(x1, x2)} <= ($pxE) + $hx" +
        s" AND ${math.max(y1, y2)} >= ($pyE) - $hy AND ${math.min(y1, y2)} <= ($pyE) + $hy" +
        s" AND NOT (($s1 > 0 AND $s2 > 0 AND $s3 > 0 AND $s4 > 0)" +
        s" OR ($s1 < 0 AND $s2 < 0 AND $s3 < 0 AND $s4 < 0)))"
    }
    s"((${containsSql(g, pxE, pyE)}) OR ${edgeTerms.mkString(" OR ")})"
  }

  /** DuckDB edge table for ONE geometry as zipped UNNEST arrays — the
    * oracle analog of [[geomEdgesDf]] for geometries whose unrolled
    * predicate would exceed the SQL binder's expression depth (DuckDB caps
    * nested binary ops at 128). ::DOUBLE[] keeps literals out of DECIMAL. */
  def edgesUnnestSql(g: Geom): String = {
    def arr(f: ((Double, Double, Double, Double)) => Double): String =
      g.edges.map(f).mkString("[", ", ", "]::DOUBLE[]")
    s"""SELECT UNNEST(${arr(_._1)}) AS x1, UNNEST(${arr(_._2)}) AS y1,
       |  UNNEST(${arr(_._3)}) AS x2, UNNEST(${arr(_._4)}) AS y2,
       |  UNNEST(${arr(e => e._3 - e._1)}) AS dx, UNNEST(${arr(e => e._4 - e._2)}) AS dy""".stripMargin
  }

  /** Edge table for a geometry set: (geom_id, x1, y1, x2, y2, dx, dy) plus
    * bbox columns for pre-filtering. Small -> broadcast. */
  def geomEdgesDf(spark: SparkSession, geoms: Seq[(String, Geom)]): DataFrame = {
    import spark.implicits._
    geoms.flatMap { case (id, g) =>
      val bb = g.bbox
      g.edges.map { case (x1, y1, x2, y2) =>
        (id, x1, y1, x2, y2, x2 - x1, y2 - y1, bb.minx, bb.miny, bb.maxx, bb.maxy)
      }
    }.toDF("geom_id", "x1", "y1", "x2", "y2", "dx", "dy",
           "bminx", "bminy", "bmaxx", "bmaxy")
  }

  /** Relational PIP join: returns pixels annotated with the geom_id of the
    * geometry containing their centre (inner semantics: outside pixels drop).
    * Plan shape: bbox-pruned pixels  ⨝(broadcast) edges -> partial-agg
    * crossing count per (pixel, geom) -> odd filter. One shuffle (the
    * count aggregate), map-side combined. */
  def pipJoin(pixels: DataFrame, geoms: Seq[(String, Geom)],
              px: String = "x", py: String = "y"): DataFrame = {
    val spark = pixels.sparkSession
    val edges = geomEdgesDf(spark, geoms)
    val bbox = geoms.map(_._2.bbox).reduce(_ union _)
    val pruned = pixels.filter(
      col(px) >= bbox.minx && col(px) <= bbox.maxx &&
      col(py) >= bbox.miny && col(py) <= bbox.maxy)
    val crossing = (col("y1") > col(py)) =!= (col("y2") > col(py)) &&
      (col(px) < col("x1") + (col(py) - col("y1")) * col("dx") / col("dy"))
    val keys = pixels.columns.map(col).toSeq
    // r6: the crossing predicate IS the join condition, so only the
    // (pixel, edge) pairs that actually contribute a crossing flow into the
    // aggregate (guide §2.3: aggregate fewer rows — previously every pruned
    // pixel carried ALL |edges| rows into the hash aggregate and summed
    // 0/1 indicators). count(*) over crossing rows == the old
    // sum(when(crossing,1)) bit-for-bit, and a (pixel, geom) with zero
    // crossings is outside either way (absent group == even count).
    pruned
      .join(broadcast(edges),
        col(px) >= col("bminx") && col(px) <= col("bmaxx") &&
        col(py) >= col("bminy") && col(py) <= col("bmaxy") && crossing)
      .groupBy(keys :+ col("geom_id"): _*)
      .agg(count(lit(1)).as("crossings"))
      .filter(col("crossings") % 2 === 1)
      .drop("crossings")
  }

  /** Relational all_touched test for ONE geometry — the edge-table sibling
    * of [[touchesColumn]], used above [[EdgeUnrollLimit]] where the unrolled
    * chain would blow the JVM 64KB codegen method limit. Broadcast edge
    * cross-join (one geometry, |edges| rows); per (pixel, edge) the
    * centre-crossing and square-vs-segment tests are evaluated, then one
    * map-side-combined aggregate ORs the hits and counts the crossings.
    * Arithmetic is identical to touchesColumn, so results are bit-equal. */
  def touchesJoin(pixels: DataFrame, g: Geom,
                  hx: Double, hy: Double,
                  px: String = "x", py: String = "y"): DataFrame = {
    val spark = pixels.sparkSession
    val edges = geomEdgesDf(spark, Seq(("__g", g)))
    val bb = g.bbox
    val pruned = pixels.filter(
      col(px) >= bb.minx - hx && col(px) <= bb.maxx + hx &&
      col(py) >= bb.miny - hy && col(py) <= bb.maxy + hy)
    val crossing = (col("y1") > col(py)) =!= (col("y2") > col(py)) &&
      (col(px) < col("x1") + (col(py) - col("y1")) * col("dx") / col("dy"))
    def f(cx: Column, cy: Column): Column =
      col("dx") * (cy - col("y1")) - col("dy") * (cx - col("x1"))
    val s1 = f(col(px) - hx, col(py) - hy); val s2 = f(col(px) + hx, col(py) - hy)
    val s3 = f(col(px) - hx, col(py) + hy); val s4 = f(col(px) + hx, col(py) + hy)
    val bboxHit = greatest(col("x1"), col("x2")) >= col(px) - hx &&
      least(col("x1"), col("x2")) <= col(px) + hx &&
      greatest(col("y1"), col("y2")) >= col(py) - hy &&
      least(col("y1"), col("y2")) <= col(py) + hy
    val oneSide = (s1 > 0 && s2 > 0 && s3 > 0 && s4 > 0) ||
                  (s1 < 0 && s2 < 0 && s3 < 0 && s4 < 0)
    val edgeHit = bboxHit && !oneSide
    val keys = pixels.columns.map(col).toSeq
    // r6: join on (crossing OR edgeHit) instead of a cross join — only
    // contributing (pixel, edge) rows reach the aggregate (guide §2.3).
    // The per-row indicators are unchanged, so the aggregated crossing
    // count and hit flag are bit-identical; a pixel joining no edge had
    // crossings=0/hit=0 and was filtered out before too.
    pruned.join(broadcast(edges), crossing || edgeHit)
      .groupBy(keys: _*)
      .agg(sum(when(crossing, 1).otherwise(0)).as("crossings"),
           max(when(edgeHit, 1).otherwise(0)).as("hit"))
      .filter(col("crossings") % 2 === 1 || col("hit") === 1)
      .drop("crossings", "hit")
  }

  /** clip (raster_array.py:763-861): mask pixels outside the geometry to
    * nodata (or inside, when invert), optionally crop to the mask's data
    * window (drop=True -> get_data_window + isel_window,
    * _spatial_utils.py:492-499). */
  /** Above this edge count the unrolled boolean chain risks the JVM 64KB
    * codegen method limit (and its compile time); clip switches to the
    * edge-table [[pipJoin]] formulation, which scales to arbitrary vertex
    * counts (edges are data, not code). */
  val EdgeUnrollLimit = 64

  def clipGeom(r: Raster, g: Geom, drop: Boolean = true,
               invert: Boolean = false, allTouched: Boolean = false): Raster = {
    val isLong = r.df.schema("value").dataType.typeName == "long"
    val nod: Column = if (isLong) lit(r.grid.nodata.toLong) else lit(r.grid.nodata)

    val (masked, kept) =
      if (g.edges.size > EdgeUnrollLimit) {
        // relational PIP: crossing counts via broadcast edge join; inside
        // pixels come back as keys and mark the mask through a (row,col)
        // equi-join (the only added shuffle, AQE-planned). all_touched gets
        // the same treatment via touchesJoin — no unrolled cliff either way.
        val base = r.df.select("row", "col", "x", "y")
        val insideDf =
          if (allTouched)
            touchesJoin(base, g, math.abs(r.grid.resX) / 2.0, math.abs(r.grid.resY) / 2.0)
          else pipJoin(base, Seq(("__clip", g)))
        val inside = insideDf.select(col("row"), col("col"), lit(1).as("_in"))
        val flagged = r.df.join(inside, Seq("row", "col"), "left")
        val kp = if (invert) col("_in").isNull else col("_in").isNotNull
        (flagged.withColumn("value", when(kp, col("value")).otherwise(nod)).drop("_in"),
         flagged.filter(kp).drop("_in"))
      } else {
        val inside =
          if (allTouched)
            touchesColumn(g, col("x"), col("y"),
              math.abs(r.grid.resX) / 2.0, math.abs(r.grid.resY) / 2.0)
          else containsColumn(g, col("x"), col("y"))
        val kp = if (invert) !inside else inside
        (r.df.withColumn("value", when(kp, col("value")).otherwise(nod)),
         r.df.filter(kp))
      }

    if (!drop) return Raster(masked, r.grid)

    // data window of the mask (one tiny driver action, like the reference's
    // get_data_window on the rasterized mask)
    val ext = kept
      .agg(min("row").as("r0"), max("row").as("r1"),
           min("col").as("c0"), max("col").as("c1"))
      .collect()(0)
    if (ext.isNullAt(0))
      throw new NoDataInBounds("No data found in geometry clip")
    val w = PixelWindow(ext.getLong(0).toInt, ext.getLong(1).toInt + 1,
                        ext.getLong(2).toInt, ext.getLong(3).toInt + 1)
    WindowOps.iselWindow(Raster(masked, r.grid), w)
  }

  /** Zonal statistics: per-geometry aggregates over non-nodata pixels whose
    * centre falls inside the geometry. count/sum/min/max are exact and
    * order-independent (oracle-safe). */
  def zonalStats(r: Raster, geoms: Seq[(String, Geom)]): DataFrame = {
    val joined = pipJoin(r.df, geoms)
    val isLong = r.df.schema("value").dataType.typeName == "long"
    val nod: Column = if (isLong) lit(r.grid.nodata.toLong) else lit(r.grid.nodata)
    // mean/std from exact integer moments (sum, sum of squares): both engines
    // run the identical double expression over identical integers, so the
    // results are bit-exact with no accumulation-order dependence.
    val n = count(lit(1))
    val s1 = sum("value")
    val s2 = sum(col("value") * col("value"))
    joined.filter(col("value") =!= nod)
      .groupBy("geom_id")
      .agg(n.as("n_pixels"),
           s1.as("sum_value"),
           min("value").as("min_value"),
           max("value").as("max_value"),
           (s1.cast("double") / n).as("mean_value"),
           sqrt((s2.cast("double") - s1.cast("double") * s1.cast("double") / n) / n)
             .as("std_value"))
  }
}
