package graft.core

import graft.{Queries, SparkTestBase}
import graft.ops.{MetadataOps, WarpOps}
import graft.ops.Raster

/** GCP/RPC georeferencing: solver correctness (incl. the GDAL golden from
  * the reference's homography test), metadata storage-shape roundtrips, and
  * warp spot checks against scalar-side math. */
class GeolocSpec extends SparkTestBase {

  /** Scalar mirror of Synth.valueColumn (seed 12345, modis nodata). */
  private def synthValue(r: Long, c: Long): Long =
    if ((r * 53 + c * 97) % 101 == 0) -28672L
    else (r * 7919L + c * 104729L + 12345L) % 19997L - 9999L

  private val refGcps = Seq( // reference test_integration_rioxarray.py:1196-1211
    Gcp(row = 0, col = 0, x = 156113, y = 2818720),
    Gcp(row = 0, col = 800, x = 338353, y = 2785790),
    Gcp(row = 800, col = 800, x = 297939, y = 2618518),
    Gcp(row = 800, col = 0, x = 115698, y = 2651448))

  test("homography GCP fit + suggested output reproduces the GDAL golden") {
    // expected values from the reference golden (GDAL >= 3.11 homography
    // branch, test_integration_rioxarray.py:1185-1233): 1027x923, square
    // pixel 216.8587081056465, origin (115698, 2818720)
    val h = Geoloc.fitAuto(refGcps)
    refGcps.foreach { g => // 4 points -> exact interpolation
      val (x, y) = h(g.col, g.row)
      assert(math.abs(x - g.x) < 1e-6 && math.abs(y - g.y) < 1e-6, g)
    }
    val crs = Crs.utm(18, north = true)
    val dst = Geoloc.suggestedWarpOutputGcp(800, 800, h, crs, crs, -28672.0)
    assert(dst.width == 1027 && dst.height == 923)
    assert(math.abs(dst.transform.a - 216.8587081056465) < 1e-9)
    assert(math.abs(dst.transform.e + 216.8587081056465) < 1e-9)
    assert(math.abs(dst.transform.c - 115698.0) < 1e-6)
    assert(math.abs(dst.transform.f - 2818720.0) < 1e-6)
  }

  test("homography inverse roundtrips and least-squares affine recovers an exact affine") {
    val h = Geoloc.fitHomography(refGcps)
    val hi = h.invert
    for ((c, r) <- Seq((12.5, 700.0), (400.0, 400.0), (799.0, 1.0))) {
      val (x, y) = h(c, r)
      val (c2, r2) = hi(x, y)
      assert(math.abs(c2 - c) < 1e-6 && math.abs(r2 - r) < 1e-6)
    }
    // 6 GCPs sampled from a known affine -> LSQ must recover it exactly
    val a = Affine(231.5, 3.2, -7274009.0, -1.8, -231.5, 5050108.0)
    val pts = Seq((0.0, 0.0), (100.0, 10.0), (10.0, 150.0), (200.0, 200.0),
                  (50.0, 120.0), (170.0, 30.0))
    val gcps = pts.map { case (c, r) => val (x, y) = a(c, r); Gcp(r, c, x, y) }
    val fit = Geoloc.fitAffine(gcps)
    fit.toSeq.zip(a.toSeq).foreach { case (got, exp) =>
      assert(math.abs(got - exp) < 1e-6 * math.max(1.0, math.abs(exp)))
    }
  }

  test("RPC ground->image / image->ground roundtrip (Newton inverse)") {
    val rpc = Queries.rpcFixture
    for ((row, col) <- Seq((0.0, 0.0), (13.0, 177.0), (200.0, 200.0), (99.5, 0.5))) {
      val (lon, lat) = rpc.imageToGround(row, col, height = 0.0)
      val (r2, c2) = rpc.groundToImage(lon, lat, height = 0.0)
      assert(math.abs(r2 - row) < 1e-8 && math.abs(c2 - col) < 1e-8, s"($row,$col)")
    }
  }

  test("write_gcps/get_gcps roundtrip in the reference GeoJSON storage shape") {
    val r0 = Raster(Synth.pixels(spark, Synth.modisGrid), Synth.modisGrid)
    val withG = MetadataOps.writeGcps(r0, refGcps.map(_.copy(z = 12.5, id = "g1", info = "i")),
                                      Crs.utm(18, north = true))
    val json = withG.grid.attrs("gcps")
    val parsed = Json.parse(json)
    assert(parsed.get("type").asText() == "FeatureCollection")
    val f0 = parsed.get("features").get(0)
    assert(f0.get("properties").has("row") && f0.get("properties").has("col") &&
           f0.get("properties").has("id") && f0.get("properties").has("info"))
    assert(f0.get("geometry").get("type").asText() == "Point")
    val back = MetadataOps.getGcps(withG).get
    back.zip(refGcps).foreach { case (b, o) =>
      assert(b.row == o.row && b.col == o.col && b.x == o.x && b.y == o.y && b.z == 12.5)
    }
    assert(MetadataOps.getGcps(r0).isEmpty)
  }

  test("write_rpcs/get_rpcs roundtrip preserves every coefficient") {
    val r0 = Raster(Synth.pixels(spark, Synth.modisGrid), Synth.modisGrid)
    val withR = MetadataOps.writeRpcs(r0, Queries.rpcFixture)
    val back = MetadataOps.getRpcs(withR).get
    assert(back.lineOff == Queries.rpcFixture.lineOff)
    assert(back.lineNum.sameElements(Queries.rpcFixture.lineNum))
    assert(back.sampDen.sameElements(Queries.rpcFixture.sampDen))
    assert(back.heightScale == Queries.rpcFixture.heightScale)
    assert(MetadataOps.getRpcs(r0).isEmpty)
  }

  test("GCP warp output matches scalar-side homography sampling (spot pixels)") {
    val src = Raster(Synth.pixels(spark, Synth.modisGrid), Synth.modisGrid)
    val out = WarpOps.reprojectGcpNearest(src, Queries.gcpFixture,
                                          Queries.gcpCrs, Queries.gcpCrs)
    val h = Geoloc.fitAuto(Queries.gcpFixture)
    val hi = h.invert
    val got = out.df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(got.size == out.grid.width.toLong * out.grid.height)
    val t = out.grid.transform
    var checked = 0
    for ((dr, dc) <- Seq((0L, 0L), (57L, 123L), (150L, 30L), (200L, 200L))) {
      val gx = t.a * (dc + 0.5) + t.c; val gy = t.e * (dr + 0.5) + t.f
      val (pc, pr) = hi(gx, gy)
      val sc = math.floor(BigDecimal(pc).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble).toLong
      val sr = math.floor(BigDecimal(pr).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble).toLong
      val exp =
        if (sr >= 0 && sr < 200 && sc >= 0 && sc < 200) synthValue(sr, sc)
        else -28672L
      if (got.contains((dr, dc))) { assert(got((dr, dc)) == exp, s"dst ($dr,$dc)"); checked += 1 }
    }
    assert(checked >= 3)
  }

  test("RPC warp covers the grid and nodata appears only outside the image footprint") {
    val src = Raster(Synth.pixels(spark, Synth.modisGrid), Synth.modisGrid)
    val out = WarpOps.reprojectRpcNearest(src, Queries.rpcFixture, Queries.rpcDst)
    val n = out.df.count()
    assert(n == Queries.rpcDst.width.toLong * Queries.rpcDst.height)
    // centre of the grid must be sampled from inside the image
    val rpc = Queries.rpcFixture
    val t = Queries.rpcDst.transform
    val midR = Queries.rpcDst.height / 2; val midC = Queries.rpcDst.width / 2
    val lon = t.a * (midC + 0.5) + t.c; val lat = t.e * (midR + 0.5) + t.f
    val (srow, scol) = rpc.groundToImage(lon, lat, 0.0)
    assert(srow > 0 && srow < 200 && scol > 0 && scol < 200)
    val mid = out.df.filter(s"row = $midR AND col = $midC").collect()(0).getLong(4)
    val exp = synthValue(math.floor(srow).toLong, math.floor(scol).toLong)
    assert(mid == exp)
  }

  test("order-2/3 GCP polynomial: exact recovery, inverse fit, warp shape") {
    // order-2 fit over GCPs generated from an exact quadratic recovers it
    val fwd2 = Geoloc.fitPoly(graft.Queries.gcpPolyFixture, 2)
    val expX = Array(156113.0, 911.2, -164.65, 0.085, -0.05, 0.02)
    val expY = Array(2818720.0, -164.65, -836.36, 0.03, 0.04, -0.06)
    fwd2.cx.zip(expX).foreach { case (g, e) =>
      assert(math.abs(g - e) <= 1e-6 * math.max(1.0, math.abs(e)), s"$g vs $e") }
    fwd2.cy.zip(expY).foreach { case (g, e) =>
      assert(math.abs(g - e) <= 1e-6 * math.max(1.0, math.abs(e)), s"$g vs $e") }
    // order-3 fit over a cubic-generated set recovers the cubic exactly
    def cub(u: Double, v: Double) =
      (10.0 + 2.0 * u + 3.0 * v + 0.01 * u * u + 0.02 * u * v + 0.03 * v * v
        + 1e-4 * u * u * u + 2e-4 * u * u * v + 3e-4 * u * v * v + 4e-4 * v * v * v,
       -5.0 + 1.5 * u - 2.5 * v + 0.04 * u * u - 0.01 * u * v + 0.02 * v * v
        - 2e-4 * u * u * u + 1e-4 * u * u * v - 3e-4 * u * v * v + 2e-4 * v * v * v)
    val cubGcps = for (i <- 0 to 3; j <- 0 to 3) yield {
      val (x, y) = cub(i * 10.0, j * 10.0)
      Gcp(row = j * 10.0, col = i * 10.0, x = x, y = y)
    }
    val fwd3 = Geoloc.fitPoly(cubGcps, 3)
    for (i <- 0 to 30; j <- 0 to 30) {
      val (ex, ey) = cub(i.toDouble, j.toDouble)
      val (gx, gy) = fwd3(i.toDouble, j.toDouble)
      assert(math.abs(gx - ex) < 1e-6 && math.abs(gy - ey) < 1e-6, s"cubic at ($i,$j)")
    }
    // the order-3 fit over the (quadratic-generated) fixture is now
    // FULL-RANK — a 4x4 grid gives four distinct values per axis — and
    // reproduces the quadratic field (cubic coefficients collapse to ~0);
    // the original 3-column fixture made u³ linearly dependent on u²/u over
    // the sample set and the order-3 normal equations exactly singular
    val fwd3fx = Geoloc.fitPoly(graft.Queries.gcpPolyFixture, 3)
    for (c <- 0 to 20; r <- 0 to 20) {
      val (ex, ey) = fwd2(c * 10.0, r * 10.0)
      val (gx3, gy3) = fwd3fx(c * 10.0, r * 10.0)
      assert(math.abs(gx3 - ex) < 1e-4 && math.abs(gy3 - ey) < 1e-4,
        s"order-3 fixture fit at ($c,$r)")
    }
    // the swapped (inverse) fit composes with the forward to near-identity
    // over the whole image for the mildly-curved fixture
    val inv2 = Geoloc.fitPoly(graft.Queries.gcpPolyFixture, 2, swap = true)
    var worst = 0.0
    for (c <- 0 to 20; r <- 0 to 20) {
      val (gx, gy) = fwd2(c * 10.0, r * 10.0)
      val (bc, br) = inv2(gx, gy)
      worst = math.max(worst, math.max(math.abs(bc - c * 10.0), math.abs(br - r * 10.0)))
    }
    assert(worst < 0.5, s"inverse-fit residual $worst px")
    // the distributed warp produces the full destination grid
    val src = graft.ops.Raster(Synth.pixels(spark, Synth.modisGrid), Synth.modisGrid)
    val out = graft.ops.WarpOps.reprojectGcpPolyNearest(
      src, graft.Queries.gcpPolyFixture, graft.Queries.gcpCrs,
      graft.Queries.gcpCrs, order = 2)
    assert(out.df.count() == out.grid.width.toLong * out.grid.height)
    assert(out.grid.width > 100 && out.grid.height > 100)
  }
}
