package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Golden-constant tests against the reference suite.
  * Constants cited from /root/reference/test/integration/
  * test_integration_rioxarray.py and test_integration_merge.py, plus
  * GeoTransform strings embedded in the golden netCDF compare files. */
class ProjSpec extends AnyFunSuite {

  // MODIS_ARRAY grid (test_integration_merge.py:37-50, FIXTURES.md §1.1)
  val modisT = Affine(231.6563582639536, 0.0, -7274009.649486291,
                      0.0, -231.65635826374404, 5050108.61015275)
  val modis = GridRef(Crs.MODIS_SINU, modisT, 200, 200, -28672.0)

  test("modis bounds match reference (test_integration_merge.py:30-33)") {
    val b = modis.bounds
    assert(math.abs(b.minx - -7274009.6494863) < 1e-6)
    assert(math.abs(b.miny - 5003777.3385) < 1e-4)
    assert(math.abs(b.maxx - -7227678.3778335) < 1e-6)
    assert(math.abs(b.maxy - 5050108.6101528) < 1e-6)
  }

  test("transform_bounds to mercator golden (test_integration_rioxarray.py:952-967)") {
    val merc = Crs.parse("+proj=merc +lon_0=0 +k=1 +x_0=0 +y_0=0 +ellps=WGS84 +datum=WGS84 +units=m +no_defs")
    val b = modis.transformBounds(merc, densifyPts = 100)
    assert(math.abs(b.minx - -10374232.525903117) < 1e-6, s"minx ${b.minx}")
    assert(math.abs(b.miny - 5591295.917919335) < 1e-6, s"miny ${b.miny}")
    assert(math.abs(b.maxx - -10232919.684719983) < 1e-6, s"maxx ${b.maxx}")
    assert(math.abs(b.maxy - 5656912.314724255) < 1e-6, s"maxy ${b.maxy}")
  }

  test("suggestedWarpOutput modis->utm15 matches golden MODIS_ARRAY_UTM_GDAL361") {
    val utm15 = Crs.parse("+datum=WGS84 +no_defs +proj=utm +units=m +zone=15")
    val dst = GridRef.suggestedWarpOutput(modis, utm15)
    val t = dst.transform
    assert(math.abs(t.a - 388.5942472830014) < 1e-6, s"a ${t.a}")
    assert(math.abs(t.c - 484874.54569851706) < 1e-6, s"c ${t.c}")
    assert(math.abs(t.e - -388.5942472830014) < 1e-6, s"e ${t.e}")
    assert(math.abs(t.f - 5029316.395716385) < 1e-6, s"f ${t.f}")
  }

  test("clip_box window from fixture bbox is the 3x3 at (4..6, 4..6)") {
    // bbox constants from test_integration_rioxarray.py:339-344
    val b = Bounds(-7272967.195874103, 5048602.8438240355,
                   -7272503.8831575755, 5049066.156540562)
    val w = modis.windowFromBounds(b)
    assert(w == PixelWindow(4, 7, 4, 7))
    val g = modis.windowed(w)
    assert(math.abs(g.xCoord(0) - -7272967.195874103) < 1e-6)
    assert(math.abs(g.yCoord(0) - 5049066.156540562) < 1e-6)
  }

  test("TM forward/inverse roundtrip to sub-mm") {
    val tm = TransverseMercator(lon0Deg = -93)
    for (lat <- Seq(-70.0, -45.0, -10.0, 0.0, 10.0, 45.4, 70.0);
         lon <- Seq(-96.0, -93.0, -90.0, -88.5)) {
      val (x, y) = tm.forward(lon, lat)
      val (lon2, lat2) = tm.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-9, s"lon $lon $lat -> $lon2")
      assert(math.abs(lat2 - lat) < 1e-9, s"lat $lon $lat -> $lat2")
    }
  }

  test("TM central meridian scale and false easting") {
    val tm = TransverseMercator(lon0Deg = -93)
    val (x, _) = tm.forward(-93.0, 42.0)
    assert(math.abs(x - 500000.0) < 1e-6)
  }

  test("mercator/sinusoidal/webmercator roundtrips") {
    val projs: Seq[Projection] = Seq(MercatorProj(), Sinusoidal(6371007.181), WebMercator)
    for (p <- projs; lat <- Seq(-60.0, -5.0, 0.0, 30.0, 62.0); lon <- Seq(-170.0, -93.0, 0.0, 45.0)) {
      val (x, y) = p.forward(lon, lat)
      val (lon2, lat2) = p.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9, s"$p $lon $lat")
    }
  }

  test("affine invert/compose") {
    val inv = modisT.invert
    val id = modisT.compose(inv)
    assert(math.abs(id.a - 1) < 1e-12 && math.abs(id.c) < 1e-6 && math.abs(id.f) < 1e-6)
    val (x, y) = modisT(4.5, 6.5)
    val (c, r) = inv(x, y)
    assert(math.abs(c - 4.5) < 1e-9 && math.abs(r - 6.5) < 1e-9)
  }

  test("estimate_utm_crs picks 326xx/327xx by hemisphere") {
    assert(Crs.estimateUtmCrs(-94, 40, -92, 46).key == "epsg:32615")
    assert(Crs.estimateUtmCrs(-52, -30, -50, -20).key == "epsg:32722")
  }

  test("wkt parse of fixture UTM files") {
    val c = Crs.fromWkt("""PROJCS["UTM Zone 15, Northern Hemisphere",GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]]],PROJECTION["Transverse_Mercator"],PARAMETER["latitude_of_origin",0],PARAMETER["central_meridian",-93],PARAMETER["scale_factor",0.9996],PARAMETER["false_easting",500000],PARAMETER["false_northing",0],UNIT["Meter",1]]""")
    assert(c.key == "epsg:32615")
  }
}
