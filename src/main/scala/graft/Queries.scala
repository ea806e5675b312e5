package graft

import graft.core._
import graft.ops._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Query catalog: every operator exposed through SparkEntry.queries gets a
  * Spark implementation here and (where ANSI-SQL-expressible) a DuckDB
  * oracle in [[Oracles]]. Column names/types are aligned pairwise. */
object Queries {

  val modis: GridRef = Synth.modisGrid

  /** clip_box golden bbox — constants from reference
    * test_integration_rioxarray.py:339-344. */
  val goldenClip: Bounds = Bounds(-7272967.195874103, 5048602.8438240355,
                                  -7272503.8831575755, 5049066.156540562)
  /** A larger box exercising real pruning (inner 120x150-ish region). */
  val largeClip: Bounds = Bounds(-7271694.0, 5017500.0, -7237000.0, 5045000.0)
  /** slice_xy bounds (pixel-centre selection). */
  val sliceBounds: Bounds = Bounds(-7271578.0, 5031000.0, -7250000.0, 5045475.0)

  val iselWin: PixelWindow = PixelWindow(10, 60, 5, 45)

  def modisPixels(spark: SparkSession): Raster =
    Raster(Synth.pixels(spark, modis), modis)

  // ---- spatial window family -------------------------------------------

  def qClipBox(spark: SparkSession, sfDir: String): DataFrame = {
    val r = WindowOps.clipBox(modisPixels(spark), goldenClip,
                              allowOneDimensionalRaster = true)
    r.df.select("row", "col", "x", "y", "value").orderBy("row", "col")
  }

  def qClipBoxLarge(spark: SparkSession, sfDir: String): DataFrame = {
    val r = WindowOps.clipBox(modisPixels(spark), largeClip)
    r.df.select("row", "col", "x", "y", "value").orderBy("row", "col")
  }

  def qIselWindow(spark: SparkSession, sfDir: String): DataFrame = {
    val r = WindowOps.iselWindow(modisPixels(spark), iselWin)
    r.df.select("row", "col", "x", "y", "value").orderBy("row", "col")
  }

  def qSliceXy(spark: SparkSession, sfDir: String): DataFrame = {
    val r = WindowOps.sliceXy(modisPixels(spark), sliceBounds)
    r.df.select("row", "col", "x", "y", "value").orderBy("row", "col")
  }

  /** clip -> pad_box back to the original bounds (the §2.5 roundtrip). */
  def qPadBox(spark: SparkSession, sfDir: String): DataFrame = {
    val clipped = WindowOps.clipBox(modisPixels(spark), largeClip)
    val padded = WindowOps.padBox(clipped, modis.bounds)
    padded.df.select("row", "col", "x", "y", "value").orderBy("row", "col")
  }

  // ---- relational demos over the provided TPC-H-ish tables --------------

  def qLineitemAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"),          // integral doubles: exact
           count(lit(1)).as("n_rows"),
           max(col("l_extendedprice")).as("max_price"),   // order-independent
           min(col("l_discount")).as("min_disc"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  def qJoinBroadcast(spark: SparkSession, sfDir: String): DataFrame = {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
    // customers is the small dim: broadcast it, no shuffle of orders
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), max(col("o_totalprice")).as("max_total"))
      .orderBy("c_mktsegment")
  }

  // ---- oracle SQL --------------------------------------------------------

  object Oracles {
    private def px: String = Synth.pixelsSql(modis)

    /** DuckDB re-statement of GridRef.windowFromBounds (floor/ceil, clamp). */
    private def winSql(g: GridRef, b: Bounds): String = {
      val t = g.transform
      s"""SELECT GREATEST(0, CAST(FLOOR((${b.minx} - ${t.c})/${t.a}) AS BIGINT)) AS cs,
         |  GREATEST(0, CAST(CEIL((${b.maxx} - ${t.c})/${t.a}) AS BIGINT)) AS cstop,
         |  GREATEST(0, CAST(FLOOR((${b.maxy} - ${t.f})/${t.e}) AS BIGINT)) AS rs,
         |  GREATEST(0, CAST(CEIL((${b.miny} - ${t.f})/${t.e}) AS BIGINT)) AS rstop""".stripMargin
    }

    def clipBox(b: Bounds): String =
      s"""WITH px AS ($px), win AS (${winSql(modis, b)})
         |SELECT px.row - win.rs AS row, px.col - win.cs AS col, x, y, value
         |FROM px, win
         |WHERE px.row >= win.rs AND px.row < LEAST(win.rstop, ${modis.height})
         |  AND px.col >= win.cs AND px.col < LEAST(win.cstop, ${modis.width})
         |ORDER BY row, col""".stripMargin

    def iselWindow(w: PixelWindow): String =
      s"""WITH px AS ($px)
         |SELECT row - ${w.rowStart} AS row, col - ${w.colStart} AS col, x, y, value
         |FROM px
         |WHERE row >= ${w.rowStart} AND row < ${w.rowStop}
         |  AND col >= ${w.colStart} AND col < ${w.colStop}
         |ORDER BY row, col""".stripMargin

    /** pad_box oracle: the padded raster re-generated directly on the new
      * grid; original-region pixels keep source values, ring is nodata. */
    def padBox(newGrid: GridRef, rowsBefore: Long, colsBefore: Long,
               innerH: Int, innerW: Int, innerRow0: Long, innerCol0: Long): String = {
      val t = newGrid.transform
      val srcRow = s"row - $rowsBefore + $innerRow0"
      val srcCol = s"col - $colsBefore + $innerCol0"
      s"""SELECT row, col,
         |  ${t.a}*(CAST(col AS DOUBLE) + 0.5) + ${t.c} AS x,
         |  ${t.e}*(CAST(row AS DOUBLE) + 0.5) + ${t.f} AS y,
         |  CASE WHEN row >= $rowsBefore AND row < ${rowsBefore + innerH}
         |        AND col >= $colsBefore AND col < ${colsBefore + innerW}
         |       THEN ${Synth.valueSql(newGrid.nodata.toLong, rowE = srcRow, colE = srcCol)}
         |       ELSE ${newGrid.nodata.toLong} END AS value
         |FROM (SELECT CAST(i // ${newGrid.width} AS BIGINT) AS row,
         |             CAST(i % ${newGrid.width} AS BIGINT) AS col
         |      FROM generate_series(0, ${newGrid.width.toLong * newGrid.height - 1}) g(i)) t
         |ORDER BY row, col""".stripMargin
    }

    val lineitemAgg: String =
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |  count(*) AS n_rows, max(l_extendedprice) AS max_price,
        |  min(l_discount) AS min_disc
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

    val joinBroadcast: String =
      """SELECT c_mktsegment, count(*) AS n_orders, max(o_totalprice) AS max_total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin
  }
}
