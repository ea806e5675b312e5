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
    pruned
      .join(broadcast(edges),
        col(px) >= col("bminx") && col(px) <= col("bmaxx") &&
        col(py) >= col("bminy") && col(py) <= col("bmaxy"))
      .groupBy(keys :+ col("geom_id"): _*)
      .agg(sum(when(crossing, 1).otherwise(0)).as("crossings"))
      .filter(col("crossings") % 2 === 1)
      .drop("crossings")
  }

  /** clip (raster_array.py:763-861): mask pixels outside the geometry to
    * nodata (or inside, when invert), optionally crop to the mask's data
    * window (drop=True -> get_data_window + isel_window,
    * _spatial_utils.py:492-499). */
  def clipGeom(r: Raster, g: Geom, drop: Boolean = true,
               invert: Boolean = false): Raster = {
    val inside = containsColumn(g, col("x"), col("y"))
    val keep = if (invert) !inside else inside
    val isLong = r.df.schema("value").dataType.typeName == "long"
    val nod: Column = if (isLong) lit(r.grid.nodata.toLong) else lit(r.grid.nodata)
    val masked = r.df.withColumn("value", when(keep, col("value")).otherwise(nod))

    if (!drop) return Raster(masked, r.grid)

    // data window of the mask (one tiny driver action, like the reference's
    // get_data_window on the rasterized mask)
    val ext = r.df.filter(keep)
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
    joined.filter(col("value") =!= nod)
      .groupBy("geom_id")
      .agg(count(lit(1)).as("n_pixels"),
           sum("value").as("sum_value"),
           min("value").as("min_value"),
           max("value").as("max_value"))
  }
}
