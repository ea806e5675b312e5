package graft.ops

import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-band rasters: the (band, y, x) third dimension of the reference's
  * data model (rioxarray.py:689-720) and its band_as_variable pivot
  * (_io.py:850-900). A multi-band raster is the pixel table plus a `band`
  * column; band_as_variable pivots bands into per-variable columns. */
object BandOps {

  /** 3D synthetic pixels: (band, row, col, x, y, value); per-band seeds. */
  def pixels3d(spark: SparkSession, g: GridRef, bands: Int,
               seed: Long = 12345L): DataFrame = {
    val n = g.width.toLong * g.height * bands
    spark.range(n)
      .withColumn("band", expr(s"id div ${g.width.toLong * g.height}"))
      .withColumn("rem", col("id") % (g.width.toLong * g.height))
      .withColumn("row", expr(s"rem div ${g.width}"))
      .withColumn("col", col("rem") % g.width)
      .drop("id", "rem")
      .withColumn("x", Synth.xColumn(g, col("col")))
      .withColumn("y", Synth.yColumn(g, col("row")))
      .withColumn("value",
        Synth.valueColumn(col("row"), col("col"), g.nodata.toLong, seed) + col("band") * 31L)
  }

  def pixels3dSql(g: GridRef, bands: Int, seed: Long = 12345L): String =
    s"""SELECT band, row, col,
       |  ${Synth.xSql(g)} AS x, ${Synth.ySql(g)} AS y,
       |  (${Synth.valueSql(g.nodata.toLong, seed)}) + band * 31 AS value
       |FROM (SELECT CAST(i // ${g.width.toLong * g.height} AS BIGINT) AS band,
       |             CAST((i % ${g.width.toLong * g.height}) // ${g.width} AS BIGINT) AS row,
       |             CAST(i % ${g.width} AS BIGINT) AS col
       |      FROM generate_series(0, ${g.width.toLong * g.height * bands - 1}) t(i))""".stripMargin

  /** band_as_variable: pivot bands to columns band_0..band_{n-1}. */
  def bandAsVariable(px3: DataFrame, bands: Int): DataFrame = {
    val aggs = (0 until bands).map { b =>
      max(when(col("band") === b, col("value"))).as(s"band_$b")
    }
    px3.groupBy("row", "col", "x", "y").agg(aggs.head, aggs.tail: _*)
  }

  def bandAsVariableSql(srcSql: String, bands: Int): String = {
    val aggs = (0 until bands).map { b =>
      s"max(CASE WHEN band = $b THEN value END) AS band_$b"
    }.mkString(", ")
    s"""SELECT row, col, x, y, $aggs
       |FROM ($srcSql) GROUP BY row, col, x, y ORDER BY row, col""".stripMargin
  }
}
