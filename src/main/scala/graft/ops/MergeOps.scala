package graft.ops

import graft.core._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-raster spatial mosaic — the reference's merge_arrays
  * (rioxarray/merge.py:89-223, rasterio.merge semantics): output grid is the
  * union of input bounds at the first input's resolution, overlap precedence
  * by `method`: first | last | min | max | sum | count (over non-nodata
  * contributions; pixels covered by nothing are nodata).
  *
  * Distributed formulation: each source's pixels are re-indexed onto the
  * destination grid by a pure *integer* offset (inputs are grid-aligned;
  * non-conforming inputs are reprojected first, as the reference does at
  * merge.py:150-161). All contributions plus a generated destination
  * skeleton are unioned and reduced in ONE hash aggregate:
  *   first -> min_by(value, source_rank), last -> max_by, min/max/sum/count
  * The skeleton rows carry rank = Long.MaxValue and NULL value so empty
  * pixels survive the aggregate and fall back to nodata; Catalyst partial
  * aggregation makes the reduce map-side combinable — a single shuffle
  * regardless of source count, which is the property that matters at
  * 100 TB (rasterio's windowed sequential copy is inherently single-node).
  */
object MergeOps {

  /** Union grid at the first input's resolution (or an explicit one);
    * ceil-sized like rasterio.merge. */
  def unionGrid(grids: Seq[GridRef], res: Option[(Double, Double)] = None,
                boundsOverride: Option[Bounds] = None): GridRef = {
    require(grids.nonEmpty)
    val g0 = grids.head
    require(grids.forall(_.crs == g0.crs), "merge inputs must share CRS (reproject first)")
    val b = boundsOverride.getOrElse(grids.map(_.bounds).reduce(_ union _))
    val (rx, ry) = res.getOrElse((math.abs(g0.resX), math.abs(g0.resY)))
    // 1e-7-pixel guard: an extent that is a whole-pixel multiple must not
    // gain a phantom row/col from fp drift (see WindowOps.padCounts)
    val w = math.ceil((b.maxx - b.minx) / rx - 1e-7).toInt
    val h = math.ceil((b.maxy - b.miny) / ry - 1e-7).toInt
    GridRef(g0.crs, Affine.northUp(b.minx, b.maxy, rx, ry), w, h, g0.nodata)
  }

  /** Integer pixel offset of a source grid inside the destination grid when
    * grid-aligned (same res, whole-pixel offset); None otherwise. */
  def alignedOffset(src: GridRef, dst: GridRef): Option[(Long, Long)] = {
    val sameRes = math.abs(src.transform.a - dst.transform.a) < 1e-9 &&
                  math.abs(src.transform.e - dst.transform.e) < 1e-9
    if (!sameRes) return None
    val colOff = (src.transform.c - dst.transform.c) / dst.transform.a
    val rowOff = (src.transform.f - dst.transform.f) / dst.transform.e
    val co = math.round(colOff); val ro = math.round(rowOff)
    if (math.abs(colOff - co) < 1e-6 && math.abs(rowOff - ro) < 1e-6) Some((ro, co))
    else None
  }

  def merge(sources: Seq[Raster], method: String = "first",
            res: Option[(Double, Double)] = None,
            boundsOverride: Option[Bounds] = None): Raster = {
    require(sources.nonEmpty)
    val dst = unionGrid(sources.map(_.grid), res, boundsOverride)
    val spark = sources.head.df.sparkSession
    val nodata = dst.nodata.toLong

    // contributions: (row, col, value, rank), non-nodata only, dst-indexed.
    // Grid-aligned source -> pure integer re-index (no data motion at all);
    // non-aligned -> inverse nearest resample onto the dst sub-window that
    // covers the source footprint (the reference's on-the-fly
    // reproject-to-shape read, merge.py:49-86).
    val contribs = sources.zipWithIndex.map { case (r, rank) =>
      val dstIndexed = alignedOffset(r.grid, dst) match {
        case Some((ro, co)) =>
          r.df.select((col("row") + ro).as("row"), (col("col") + co).as("col"),
                      col("value").cast("long").as("value"))
        case None =>
          val win = dst.windowFromBounds(r.grid.bounds)
          WarpOps.inverseSampleNearest(r, dst, win)
      }
      dstIndexed
        .filter(col("value") =!= nodata)
        .withColumn("rank", lit(rank.toLong))
        .filter(col("row") >= 0 && col("row") < dst.height &&
                col("col") >= 0 && col("col") < dst.width)
    }.reduce(_ unionByName _)

    val skeleton = spark.range(dst.width.toLong * dst.height)
      .select(expr(s"id div ${dst.width}").as("row"), (col("id") % dst.width).as("col"),
              lit(null).cast("long").as("value"), lit(Long.MaxValue).as("rank"))

    val agg: Column = method match {
      case "first" => min_by(col("value"), col("rank"))
      case "last"  => max_by(col("value"), when(col("value").isNull, Long.MinValue).otherwise(col("rank")))
      case "min"   => min(col("value"))
      case "max"   => max(col("value"))
      case "sum"   => sum(col("value"))
      case "count" => count(col("value"))
      case m => throw new IllegalArgumentException(s"unsupported merge method $m")
    }

    val merged = contribs.unionByName(skeleton)
      .groupBy("row", "col")
      .agg(coalesce(agg, lit(nodata)).as("value"))
      .withColumn("x", Synth.xColumn(dst, col("col")))
      .withColumn("y", Synth.yColumn(dst, col("row")))
      .select("row", "col", "x", "y", "value")
    Raster(merged, dst)
  }

  /** merge_datasets (rioxarray/merge.py:226-291): merge multi-variable
    * inputs, each a (var_name, row, col, x, y, value) table + grid. The
    * reference loops data_vars and merges each separately; here `var_name`
    * simply joins the aggregate key, so ANY number of variables costs the
    * same ONE union + ONE map-side-combined shuffle as the single-variable
    * merge — the per-variable loop disappears into the hash key. */
  def mergeDatasets(sources: Seq[(DataFrame, GridRef)], varNames: Seq[String],
                    method: String = "first"): (DataFrame, GridRef) = {
    require(sources.nonEmpty && varNames.nonEmpty)
    val dst = unionGrid(sources.map(_._2))
    val spark = sources.head._1.sparkSession
    val nodata = dst.nodata.toLong

    val contribs = sources.zipWithIndex.map { case ((df, g), rank) =>
      val dstIndexed = alignedOffset(g, dst) match {
        case Some((ro, co)) =>
          df.select(col("var_name"), (col("row") + ro).as("row"),
                    (col("col") + co).as("col"), col("value").cast("long").as("value"))
        case None =>
          // non-aligned: per-variable inverse resample (variables are schema,
          // not data — the loop is over a literal list, not a collect)
          val win = dst.windowFromBounds(g.bounds)
          varNames.map { v =>
            WarpOps.inverseSampleNearest(
                Raster(df.filter(col("var_name") === v)
                  .select("row", "col", "x", "y", "value"), g), dst, win)
              .select(lit(v).as("var_name"), col("row"), col("col"), col("value"))
          }.reduce(_ unionByName _)
      }
      dstIndexed
        .filter(col("value") =!= nodata)
        .withColumn("rank", lit(rank.toLong))
        .filter(col("row") >= 0 && col("row") < dst.height &&
                col("col") >= 0 && col("col") < dst.width)
    }.reduce(_ unionByName _)

    val skeleton = spark.range(dst.width.toLong * dst.height)
      .select(expr(s"id div ${dst.width}").as("row"), (col("id") % dst.width).as("col"),
              explode(array(varNames.map(lit): _*)).as("var_name"))
      .select(col("var_name"), col("row"), col("col"),
              lit(null).cast("long").as("value"), lit(Long.MaxValue).as("rank"))

    val agg: Column = method match {
      case "first" => min_by(col("value"), col("rank"))
      case "last"  => max_by(col("value"), when(col("value").isNull, Long.MinValue).otherwise(col("rank")))
      case "min"   => min(col("value"))
      case "max"   => max(col("value"))
      case "sum"   => sum(col("value"))
      case "count" => count(col("value"))
      case m => throw new IllegalArgumentException(s"unsupported merge method $m")
    }

    val merged = contribs.unionByName(skeleton)
      .groupBy("var_name", "row", "col")
      .agg(coalesce(agg, lit(nodata)).as("value"))
      .withColumn("x", Synth.xColumn(dst, col("col")))
      .withColumn("y", Synth.yColumn(dst, col("row")))
      .select("var_name", "row", "col", "x", "y", "value")
    (merged, dst)
  }

  /** DuckDB oracle for [[mergeDatasets]]; `srcSqls` produce
    * (var_name, row, col, value) on the dst index. */
  def mergeDatasetsSql(dst: GridRef, srcSqls: Seq[String], varNames: Seq[String],
                       method: String): String = {
    val nodata = dst.nodata.toLong
    val ranked = srcSqls.zipWithIndex.map { case (s, r) =>
      s"SELECT var_name, row, col, value, CAST($r AS BIGINT) AS rank FROM ($s) WHERE value <> $nodata" +
        s" AND row >= 0 AND row < ${dst.height} AND col >= 0 AND col < ${dst.width}"
    }
    val varsSql = varNames.map(v => s"SELECT '$v' AS var_name").mkString(" UNION ALL ")
    val skeleton =
      s"""SELECT v.var_name, CAST(i // ${dst.width} AS BIGINT) AS row,
         |  CAST(i % ${dst.width} AS BIGINT) AS col,
         |  CAST(NULL AS BIGINT) AS value, ${Long.MaxValue} AS rank
         |FROM generate_series(0, ${dst.width.toLong * dst.height - 1}) t(i), ($varsSql) v""".stripMargin
    val aggE = method match {
      case "first" => "arg_min(value, rank)"
      case "last"  => "arg_max(value, CASE WHEN value IS NULL THEN " + Long.MinValue + " ELSE rank END)"
      case "min"   => "min(value)"
      case "max"   => "max(value)"
      case "sum"   => "CAST(sum(value) AS BIGINT)"
      case "count" => "count(value)"
    }
    val t = dst.transform
    s"""WITH contribs AS (${(ranked :+ skeleton).mkString("\nUNION ALL\n")})
       |SELECT var_name, row, col,
       |  ${t.a}*(CAST(col AS DOUBLE) + 0.5) + ${t.c} AS x,
       |  ${t.e}*(CAST(row AS DOUBLE) + 0.5) + ${t.f} AS y,
       |  COALESCE($aggE, $nodata) AS value
       |FROM contribs GROUP BY var_name, row, col ORDER BY var_name, row, col""".stripMargin
  }

  /** DuckDB oracle fragment: same union + single-aggregate formulation.
    * `srcSqls` are SELECTs producing (row, col, value) on the dst index. */
  def mergeSql(dst: GridRef, srcSqls: Seq[String], method: String): String = {
    val nodata = dst.nodata.toLong
    val ranked = srcSqls.zipWithIndex.map { case (s, r) =>
      s"SELECT row, col, value, CAST($r AS BIGINT) AS rank FROM ($s) WHERE value <> $nodata" +
        s" AND row >= 0 AND row < ${dst.height} AND col >= 0 AND col < ${dst.width}"
    }
    val skeleton =
      s"""SELECT CAST(i // ${dst.width} AS BIGINT) AS row,
         |  CAST(i % ${dst.width} AS BIGINT) AS col,
         |  CAST(NULL AS BIGINT) AS value, ${Long.MaxValue} AS rank
         |FROM generate_series(0, ${dst.width.toLong * dst.height - 1}) t(i)""".stripMargin
    val aggE = method match {
      case "first" => "arg_min(value, rank)"
      case "last"  => "arg_max(value, CASE WHEN value IS NULL THEN " + Long.MinValue + " ELSE rank END)"
      case "min"   => "min(value)"
      case "max"   => "max(value)"
      // CAST: DuckDB sum(BIGINT) widens to HUGEINT; Spark stays LongType.
      // Without the cast the driver's value-hash diverges on equal numbers.
      case "sum"   => "CAST(sum(value) AS BIGINT)"
      case "count" => "count(value)"
    }
    val t = dst.transform
    s"""WITH contribs AS (${(ranked :+ skeleton).mkString("\nUNION ALL\n")})
       |SELECT row, col,
       |  ${t.a}*(CAST(col AS DOUBLE) + 0.5) + ${t.c} AS x,
       |  ${t.e}*(CAST(row AS DOUBLE) + 0.5) + ${t.f} AS y,
       |  COALESCE($aggE, $nodata) AS value
       |FROM contribs GROUP BY row, col ORDER BY row, col""".stripMargin
  }
}
