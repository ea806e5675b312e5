package graft.ops

import graft.SparkTestBase
import graft.core._
import graft.sources.TileIO
import org.apache.spark.sql.functions._

/** Complex-valued pixel compute (ComplexOps): algebra identities on exact
  * integers, scalar mirrors for the non-oracle-safe phase, and the
  * two-variable (re/im) dataset store round-trip with a complex dtype —
  * the compute layer over the reference's complex dtype surface
  * (_io.py:493-501). */
class ComplexOpsSpec extends SparkTestBase {

  private val g = Synth.modisGrid
  private val nd = g.nodata.toLong

  test("cross-power satisfies |a.conj(b)|^2 == |a|^2 * |b|^2 exactly; " +
       "magnitude and phase match scalar mirrors") {
    val c = ComplexOps.complexPixels(spark, g, 12345L, 777L)
      .withColumn("b_re", Synth.valueColumn(col("row"), col("col"), nd, 4242L))
      .withColumn("b_im", Synth.valueColumn(col("row"), col("col"), nd, 991L))
      .filter(col("re") =!= nd)
    val (cpRe, cpIm) = ComplexOps.conjProduct(
      col("re"), col("im"), col("b_re"), col("b_im"))
    val checked = c.select(
      col("re"), col("im"), col("b_re"), col("b_im"),
      cpRe.as("cp_re"), cpIm.as("cp_im"),
      ComplexOps.magnitude(col("re"), col("im"), nd).as("mag"),
      ComplexOps.phase(col("re"), col("im")).as("ph"))
    // all-Long identity: products < 2^57, sums < 2^58 — no overflow
    val bad = checked.filter(
      col("cp_re") * col("cp_re") + col("cp_im") * col("cp_im") =!=
        (col("re") * col("re") + col("im") * col("im")) *
        (col("b_re") * col("b_re") + col("b_im") * col("b_im")))
    assert(bad.count() == 0, "conjugate-product magnitude identity violated")

    // scalar mirrors over the full unmasked corpus
    val rows = checked.collect()
    assert(rows.length > 35000)
    rows.foreach { r =>
      val (re, im) = (r.getLong(0), r.getLong(1))
      val mag = r.getDouble(6); val ph = r.getDouble(7)
      assert(mag == math.sqrt((re * re + im * im).toDouble),
        s"magnitude mirror at re=$re im=$im")
      assert(ph == math.atan2(im.toDouble, re.toDouble),
        s"phase mirror at re=$re im=$im")
    }
  }

  test("masked pixels keep real nodata through magnitude; mask is " +
       "channel-independent by construction") {
    val c = ComplexOps.complexPixels(spark, g, 12345L, 777L)
    val masked = c.filter(col("re") === nd)
    assert(masked.count() > 0)
    assert(masked.filter(col("im") =!= nd).count() == 0,
      "re/im nodata masks must coincide")
    val magNd = c.select(col("re"),
        ComplexOps.magnitude(col("re"), col("im"), nd).as("mag"))
      .filter(col("re") === nd)
    assert(magNd.filter(col("mag") =!= nd.toDouble).count() == 0)
  }

  test("complex raster round-trips through the two-variable dataset store " +
       "with dtype cfloat64 and real nodata") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cplx").toString + "/c1"
    val c = ComplexOps.complexPixels(spark, g, 12345L, 777L)
    val ds = c.selectExpr("'re' AS var_name", "row", "col", "x", "y", "re AS value")
      .unionByName(
        c.selectExpr("'im' AS var_name", "row", "col", "x", "y", "im AS value"))
    ds.write.format("graft").mode("overwrite")
      .option("dataset", "true")
      .option("crs", g.crs.key).option("transform", g.transform.toGdal)
      .option("width", "200").option("height", "200")
      .option("nodata", "-28672.0").option("dtype", "cfloat64")
      .option("tile_size", "50")
      .save(dir)
    val (back, grid) = TileIO.readDatasetPixels(spark, dir)
    assert(grid.dtype == "cfloat64", s"dtype must survive the store: ${grid.dtype}")
    assert(grid.nodata == -28672.0)
    val rebuilt = ComplexOps.fromVars(back)
    val direct = c.select("row", "col", "re", "im")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val got = rebuilt.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got.size == 200 * 200 && got == direct)
  }
}
