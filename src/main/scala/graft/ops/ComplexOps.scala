package graft.ops

import graft.core._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Complex-valued pixel compute.
  *
  * The reference's complex surface is the dtype map (rioxarray `_io.py:
  * 493-501`: GDAL cint16/cint32/cfloat32/cfloat64 read as numpy
  * complex64/128) — storage plus numpy pass-through. This engine models a
  * complex raster as TWO REAL CHANNELS sharing one grid — the same shape
  * the DSv2 dataset store (`var_name` re/im), the dataset merge and the
  * dataset warp already handle — so windowing/clip/merge/reproject of
  * complex data need no new operators. What numpy provides implicitly
  * (complex arithmetic over the channels) is provided here as codegen'd
  * Column forms, all oracle-expressible:
  *
  *  - channel values are the engine's integral synthetic/stored reals, so
  *    re*re + im*im is EXACT in doubles (|v| < 2^14 ⇒ products < 2^28,
  *    sums < 2^29 ≪ 2^53) and `sqrt` is a single correctly-rounded IEEE
  *    operation in both engines (JVM `Math.sqrt` and DuckDB both expose
  *    the IEEE 754 correctly-rounded square root) — magnitude is
  *    bit-identical across engines with no guard needed;
  *  - the conjugate product (the cross-power spectrum of phase
  *    correlation) is all-integer, exact by construction;
  *  - `phase` (atan2) is NOT correctly rounded across libms — it is
  *    spec-gated against a scalar mirror, never put in a DuckDB oracle
  *    (same rule as the trig in the hex SAT kernel).
  *
  * All forms are single-projection map-only Columns: at 100 TB they fuse
  * into the scan's WholeStageCodegen with zero shuffle.
  */
object ComplexOps {

  /** Synthetic complex raster: one map-only projection computing both
    * channels from (row, col) — no join, no second scan. The nodata mask
    * is channel-independent by construction (the mask gate ignores the
    * seed), so `re = nodata ⇔ im = nodata`. */
  def complexPixels(spark: SparkSession, g: GridRef, seedRe: Long,
                    seedIm: Long, parallelism: Int = 0): DataFrame = {
    val n = g.width.toLong * g.height
    val base =
      if (parallelism > 0) spark.range(0L, n, 1L, parallelism) else spark.range(n)
    base
      .withColumn("row", expr(s"id div ${g.width}"))
      .withColumn("col", col("id") % g.width)
      .drop("id")
      .withColumn("x", Synth.xColumn(g, col("col")))
      .withColumn("y", Synth.yColumn(g, col("row")))
      .withColumn("re", Synth.valueColumn(col("row"), col("col"), g.nodata.toLong, seedRe))
      .withColumn("im", Synth.valueColumn(col("row"), col("col"), g.nodata.toLong, seedIm))
  }

  /** DuckDB mirror of [[complexPixels]]. */
  def complexPixelsSql(g: GridRef, seedRe: Long, seedIm: Long): String =
    s"""SELECT row, col,
       |  ${Synth.xSql(g)} AS x,
       |  ${Synth.ySql(g)} AS y,
       |  ${Synth.valueSql(g.nodata.toLong, seedRe)} AS re,
       |  ${Synth.valueSql(g.nodata.toLong, seedIm)} AS im
       |FROM (SELECT CAST(i // ${g.width} AS BIGINT) AS row,
       |             CAST(i % ${g.width} AS BIGINT) AS col
       |      FROM generate_series(0, ${g.width.toLong * g.height - 1}) t(i))""".stripMargin

  /** Magnitude |z| = sqrt(re² + im²); masked pixels keep the (real-valued)
    * nodata, matching the reference's real-nodata-on-complex-dtype rule
    * (`ensureNodataDtype` accepts real nodata for c* dtypes). */
  def magnitude(re: Column, im: Column, nodata: Long): Column =
    when(re === nodata, lit(nodata.toDouble))
      .otherwise(sqrt((re * re + im * im).cast("double")))

  /** Conjugate product a · conj(b) — the cross-power spectrum kernel of
    * phase correlation (the classic raster coregistration use of complex
    * pixels). All-integer, exact. Returns (re, im) expressions. */
  def conjProduct(aRe: Column, aIm: Column, bRe: Column, bIm: Column): (Column, Column) =
    (aRe * bRe + aIm * bIm, aIm * bRe - aRe * bIm)

  /** Phase angle atan2(im, re) — deterministic within one JVM (StrictMath
    * contract via Math.atan2's 2-ulp bound is NOT cross-engine stable), so
    * spec-gated only; never used in a DuckDB oracle. */
  def phase(re: Column, im: Column): Column = atan2(im.cast("double"), re.cast("double"))

  /** Rebuild the (re, im) channel frame from a two-variable dataset store
    * read (`var_name` in {reVar, imVar}) — one hash aggregate on the tile
    * key; the channels were co-written tile-clustered so AQE plans this as
    * a near-local aggregate. */
  def fromVars(ds: DataFrame, reVar: String = "re", imVar: String = "im"): DataFrame =
    ds.filter(col("var_name").isin(reVar, imVar))
      .groupBy("row", "col")
      .agg(max(when(col("var_name") === reVar, col("value"))).as("re"),
           max(when(col("var_name") === imVar, col("value"))).as("im"))
}
