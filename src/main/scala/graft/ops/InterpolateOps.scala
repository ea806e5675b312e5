package graft.ops

import graft.core._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** interpolate_na (nearest) — fill nodata pixels with the value of the
  * nearest valid pixel (the reference's scipy.griddata 'nearest' path,
  * raster_array.py:863-966). Distance is squared pixel distance (exact
  * integer arithmetic), ties broken by (row, col) — deterministic and
  * mirrored in the SQL oracle.
  *
  * Distributed shape: valid pixels are bucketed on a BxB pixel grid; each
  * missing pixel probes its 3x3 bucket ring via an equi-join. A winner at
  * distance <= B is provably global (any pixel outside the ring is at
  * Chebyshev distance >= B+1, so its d2 > B^2 — ties included). Pixels not
  * settled at B escalate to bucket 2B, 4B, ... (log rounds, each a plain
  * equi-join over the geometrically-shrinking remainder), so EVERY missing
  * pixel fills — matching the reference's scipy.griddata, which interpolates
  * the whole grid (raster_array.py:895-915) — without ever paying a
  * cross-join. linear/cubic variants need global triangulation — documented
  * out of scope for v1 (SURVEY §7.4). */
object InterpolateOps {

  def interpolateNaNearest(r: Raster, bucket: Int = 4): Raster = {
    val nodata = r.grid.nodata.toLong
    val maxDim = math.max(r.grid.width, r.grid.height)
    val validBase = r.df.filter(col("value") =!= nodata)
      .select(col("row").as("v_row"), col("col").as("v_col"), col("value").as("v_value"))
    if (validBase.isEmpty) return r // nothing to interpolate from

    val ringOffsets = array((-1 to 1).flatMap(dr => (-1 to 1).map(dc =>
      struct(lit(dr.toLong).as("dr"), lit(dc.toLong).as("dc")))): _*)

    def round(remaining: DataFrame, b: Int): (DataFrame, DataFrame) = {
      val valid = validBase
        .withColumn("b_r", expr(s"v_row div $b"))
        .withColumn("b_c", expr(s"v_col div $b"))
      val probes = remaining
        .withColumn("m_br", expr(s"row div $b"))
        .withColumn("m_bc", expr(s"col div $b"))
        .select(col("*"), explode(ringOffsets).as("o"))
        .withColumn("b_r", col("m_br") + col("o.dr"))
        .withColumn("b_c", col("m_bc") + col("o.dc"))
        .drop("o", "m_br", "m_bc")
      val cand = probes.join(valid, Seq("b_r", "b_c"))
        .withColumn("d2", (col("row") - col("v_row")) * (col("row") - col("v_row")) +
                          (col("col") - col("v_col")) * (col("col") - col("v_col")))
      val w = Window.partitionBy("row", "col").orderBy(col("d2"), col("v_row"), col("v_col"))
      val winners = cand.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      // b >= maxDim: every pixel is in bucket (0,0), the ring saw ALL valid
      // pixels, so the winner is global regardless of distance.
      val settled =
        if (b >= maxDim) winners
        else winners.filter(col("d2") <= b.toLong * b)
      val filled = settled.select(col("row"), col("col"), col("x"), col("y"),
                                  col("v_value").as("value"))
      val unsettled = remaining.join(
        settled.select("row", "col"), Seq("row", "col"), "left_anti")
      (filled, unsettled)
    }

    var remaining = r.df.filter(col("value") === nodata)
      .select(col("row"), col("col"), col("x"), col("y")).persist()
    var out = r.df.filter(col("value") =!= nodata)
    var b = bucket
    while (!remaining.isEmpty) {
      val (filled, unsettled) = round(remaining, b)
      val next = unsettled.persist()
      next.count() // materialize before unpersisting the parent
      out = out.unionByName(filled)
      remaining.unpersist()
      remaining = next
      b = math.min(b.toLong * 2, maxDim.toLong).toInt max 1
    }
    remaining.unpersist()
    Raster(out, r.grid)
  }

  /** SQL oracle: brute-force nearest over all valid pixels (exact). */
  def interpolateNaSql(srcSql: String, g: GridRef): String = {
    val nodata = g.nodata.toLong
    s"""WITH px AS ($srcSql),
       |valid AS (SELECT row AS v_row, col AS v_col, value AS v_value
       |          FROM px WHERE value <> $nodata),
       |missing AS (SELECT row, col, x, y FROM px WHERE value = $nodata),
       |cand AS (
       |  SELECT m.row, m.col, m.x, m.y, v.v_value,
       |    row_number() OVER (PARTITION BY m.row, m.col
       |      ORDER BY (m.row - v.v_row) * (m.row - v.v_row)
       |             + (m.col - v.v_col) * (m.col - v.v_col), v.v_row, v.v_col) AS rk
       |  FROM missing m, valid v)
       |SELECT row, col, x, y, value FROM px WHERE value <> $nodata
       |UNION ALL
       |SELECT row, col, x, y, v_value AS value FROM cand WHERE rk = 1
       |ORDER BY row, col""".stripMargin
  }
}
