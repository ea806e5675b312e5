package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic raster/document generation.
  *
  * The reference ships binary fixture rasters (MODIS_ARRAY.nc etc.) whose
  * pixel values are not derivable from code; per FIXTURES.md §1.1 we keep the
  * *grid geometry* of those fixtures exact and generate pixel values from a
  * seeded integer value function that is reproducible both in Spark and in
  * ANSI SQL (the DuckDB oracle), so every operator output is checkable.
  *
  * Everything is generated distributively from `spark.range` — no driver-side
  * loops, no data movement; generation parallelism scales linearly with
  * partition count, which is what makes the same code valid at 100 TB.
  */
object Synth {

  /** MODIS_ARRAY fixture grid (FIXTURES.md §1.1; constants from
    * reference test_integration_merge.py:37-50). */
  val modisGrid: GridRef = GridRef(
    Crs.MODIS_SINU,
    Affine(231.6563582639536, 0.0, -7274009.649486291,
           0.0, -231.65635826374404, 5050108.61015275),
    width = 200, height = 200, nodata = -28672.0)

  /** UTM match-grid fixture (MODIS_ARRAY_MATCH_UTM_GDAL361 golden). */
  val matchUtmGrid: GridRef = GridRef(
    Crs.utm(15, north = true),
    Affine(386.6512267236268, 0.0, 485124.8828918401,
           0.0, -386.6512267236231, 5029200.758624835),
    width = 120, height = 120, nodata = -28672.0)

  /** Integer value function; whole expression mirrored in SQL oracles:
    * v = ((row*7919 + col*104729 + seed) % 19997) - 9999, with nodata
    * where (row*53 + col*97) % 101 == 0. */
  def valueColumn(row: Column, col: Column, nodata: Long, seed: Long = 12345L): Column =
    when((row * 53L + col * 97L) % 101L === 0L, lit(nodata))
      .otherwise((row * 7919L + col * 104729L + seed) % 19997L - 9999L)

  /** Same value function in ANSI SQL (DuckDB) over arbitrary row/col
    * expressions. */
  def valueSql(nodata: Long, seed: Long = 12345L,
               rowE: String = "row", colE: String = "col"): String =
    s"CASE WHEN (($rowE)*53 + ($colE)*97) % 101 = 0 THEN $nodata " +
      s"ELSE (($rowE)*7919 + ($colE)*104729 + $seed) % 19997 - 9999 END"

  /** Pixel-centre coordinate expressions (mirrors affine_to_coords,
    * reference _spatial_utils.py:92-126). */
  def xColumn(g: GridRef, col: Column): Column =
    lit(g.transform.a) * (col.cast("double") + 0.5d) + lit(g.transform.c)
  def yColumn(g: GridRef, row: Column): Column =
    lit(g.transform.e) * (row.cast("double") + 0.5d) + lit(g.transform.f)

  def xSql(g: GridRef): String = s"${g.transform.a}*(CAST(col AS DOUBLE) + 0.5) + ${g.transform.c}"
  def ySql(g: GridRef): String = s"${g.transform.e}*(CAST(row AS DOUBLE) + 0.5) + ${g.transform.f}"

  /** Full-affine (rotated/sheared) pixel-centre coordinates — the 2D
    * xc/yc coordinate arrays of the reference's non-rectilinear grids
    * (_spatial_utils.py:118-142). Rectilinear grids keep the 2-term
    * [[xColumn]]/[[yColumn]] forms (their oracle texts are paired). */
  def xColumnFull(g: GridRef, colC: Column, rowC: Column): Column =
    lit(g.transform.a) * (colC.cast("double") + 0.5d) +
      lit(g.transform.b) * (rowC.cast("double") + 0.5d) + lit(g.transform.c)
  def yColumnFull(g: GridRef, colC: Column, rowC: Column): Column =
    lit(g.transform.d) * (colC.cast("double") + 0.5d) +
      lit(g.transform.e) * (rowC.cast("double") + 0.5d) + lit(g.transform.f)

  def xSqlFull(g: GridRef, colE: String = "col", rowE: String = "row"): String =
    s"${g.transform.a}*(CAST($colE AS DOUBLE) + 0.5) + ${g.transform.b}*(CAST($rowE AS DOUBLE) + 0.5) + ${g.transform.c}"
  def ySqlFull(g: GridRef, colE: String = "col", rowE: String = "row"): String =
    s"${g.transform.d}*(CAST($colE AS DOUBLE) + 0.5) + ${g.transform.e}*(CAST($rowE AS DOUBLE) + 0.5) + ${g.transform.f}"

  /** Dense pixel table over a full (possibly rotated) affine. */
  def pixelsFull(spark: SparkSession, g: GridRef, seed: Long = 12345L): DataFrame = {
    spark.range(g.width.toLong * g.height)
      .withColumn("row", expr(s"id div ${g.width}"))
      .withColumn("col", col("id") % g.width)
      .drop("id")
      .withColumn("x", xColumnFull(g, col("col"), col("row")))
      .withColumn("y", yColumnFull(g, col("col"), col("row")))
      .withColumn("value", valueColumn(col("row"), col("col"), g.nodata.toLong, seed))
  }

  def pixelsFullSql(g: GridRef, seed: Long = 12345L): String =
    s"""SELECT row, col,
       |  ${xSqlFull(g)} AS x,
       |  ${ySqlFull(g)} AS y,
       |  ${valueSql(g.nodata.toLong, seed)} AS value
       |FROM (SELECT CAST(i // ${g.width} AS BIGINT) AS row,
       |             CAST(i % ${g.width} AS BIGINT) AS col
       |      FROM generate_series(0, ${g.width.toLong * g.height - 1}) t(i))""".stripMargin

  /** Dense pixel table of one synthetic raster:
    * (row: long, col: long, x: double, y: double, value: long).
    * Fully parallel generation; `parallelism` controls initial partitioning
    * (at scale: one partition per tile-row stripe). */
  def pixels(spark: SparkSession, g: GridRef, seed: Long = 12345L,
             parallelism: Int = 0): DataFrame = {
    val n = g.width.toLong * g.height
    val base = if (parallelism > 0) spark.range(0L, n, 1L, parallelism) else spark.range(n)
    base
      .withColumn("row", expr(s"id div ${g.width}"))  // integer div: exact at any scale
      .withColumn("col", col("id") % g.width)
      .drop("id")
      .withColumn("x", xColumn(g, col("col")))
      .withColumn("y", yColumn(g, col("row")))
      .withColumn("value", valueColumn(col("row"), col("col"), g.nodata.toLong, seed))
  }

  /** SQL (DuckDB) generator equivalent to [[pixels]]. */
  def pixelsSql(g: GridRef, seed: Long = 12345L): String =
    s"""SELECT row, col,
       |  ${xSql(g)} AS x,
       |  ${ySql(g)} AS y,
       |  ${valueSql(g.nodata.toLong, seed)} AS value
       |FROM (SELECT CAST(i // ${g.width} AS BIGINT) AS row,
       |             CAST(i % ${g.width} AS BIGINT) AS col
       |      FROM generate_series(0, ${g.width.toLong * g.height - 1}) t(i))""".stripMargin
}
