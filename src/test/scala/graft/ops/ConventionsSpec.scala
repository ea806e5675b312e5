package graft.ops

import graft.SparkTestBase
import graft.core._
import graft.ops.Conventions._
import graft.sources.TileIO

/** Conventions layer: CF import/export roundtrips against reference-shaped
  * attribute dicts (rioxarray/_convention/cf.py), set_options scoping,
  * grid_mapping conflict semantics, dtype-nodata defaulting. */
class ConventionsSpec extends SparkTestBase {

  def modis: GridRef = Synth.modisGrid
  def raster: Raster = Raster(Synth.pixels(spark, modis), modis)

  test("GeoTransform matches the reference's golden strings (GDAL order)") {
    // test_integration_rioxarray.py:2916 / :2936
    assert(Affine(3.0, 0.0, 425047.0, 0.0, -3.0, 4615780.0).toGdal ==
      "425047.0 3.0 0.0 4615780.0 0.0 -3.0")
    assert(Affine(14.0, 9.0, 305827.0, 9.0, -14.0, 5223236.0).toGdal ==
      "305827.0 14.0 9.0 5223236.0 9.0 -14.0")
    // fromGdal inverts exactly
    assert(Affine.fromGdal("305827.0 14.0 9.0 5223236.0 9.0 -14.0") ==
      Affine(14.0, 9.0, 305827.0, 9.0, -14.0, 5223236.0))
  }

  test("CF export/import roundtrips crs + transform through a plain attr map") {
    for (crs <- Seq(Crs.MODIS_SINU, Crs.WGS84, Crs.WEB_MERCATOR,
                    Crs.utm(15, north = true),
                    Crs.parse("+proj=tmerc +lon_0=9 +k=0.9996 +x_0=500000 +y_0=0"),
                    Crs.parse("+proj=merc +lon_0=0 +k=1"))) {
      val g = modis.copy(crs = crs)
      val attrs = CfConvention.exportAttrs(g)
      // reference shape: spatial_ref + crs_wkt + GeoTransform on the
      // grid-mapping coordinate, grid_mapping pointing at it
      assert(attrs.contains("spatial_ref:spatial_ref"))
      assert(attrs.contains("spatial_ref:crs_wkt"))
      assert(attrs("grid_mapping") == "spatial_ref")
      assert(attrs("spatial_ref:GeoTransform") == g.transform.toGdal)
      val re = readCfGrid(attrs, g.width, g.height, g.nodata)
      assert(re.isDefined, s"no grid back for $crs")
      assert(re.get.transform == g.transform)
      assert(re.get.crs.proj == crs.proj, s"proj mismatch for $crs: ${re.get.crs}")
    }
  }

  test("CF import falls back to grid-mapping parameter attrs when wkt absent") {
    val g = modis
    val attrs = CfConvention.exportAttrs(g) -
      "spatial_ref:spatial_ref" - "spatial_ref:crs_wkt"
    val crs = CfConvention.importCrs(attrs)
    assert(crs.isDefined && crs.get.proj == Crs.MODIS_SINU.proj)
  }

  test("set_options: export_grid_mapping=false trims to wkt-only, scoped restore") {
    val before = Conventions.options
    val attrs = withOptions(GraftOptions(exportGridMapping = false)) {
      CfConvention.exportAttrs(modis)
    }
    assert(!attrs.contains("spatial_ref:grid_mapping_name"))
    assert(attrs.contains("spatial_ref:crs_wkt"))
    assert(Conventions.options == before, "options must restore on exit")
    intercept[IllegalArgumentException] { GraftOptions(convention = "nope") }
  }

  test("read_spatial_dimensions: names first, then CF axis/standard_name attrs") {
    assert(CfConvention.readSpatialDimensions(Seq("y", "x", "value"), Map.empty)
      .contains(("y", "x")))
    assert(CfConvention.readSpatialDimensions(Seq("latitude", "longitude"), Map.empty)
      .contains(("latitude", "longitude")))
    val attrs = Map("east:axis" -> "X", "north:standard_name" -> "latitude")
    assert(CfConvention.readSpatialDimensions(Seq("north", "east"), attrs)
      .contains(("north", "east")))
    assert(CfConvention.readSpatialDimensions(Seq("a", "b"), Map.empty).isEmpty)
  }

  test("write_coordinate_system: projected vs geographic attr sets") {
    val proj = writeCoordinateSystem(raster)
    assert(proj.grid.attrs("x:standard_name") == "projection_x_coordinate")
    assert(proj.grid.attrs("y:units") == "metre")
    val geo = writeCoordinateSystem(
      Raster(raster.df, modis.copy(crs = Crs.WGS84)))
    assert(geo.grid.attrs("x:units") == "degrees_east")
    assert(geo.grid.attrs("y:standard_name") == "latitude")
  }

  test("grid_mapping: default, per-var value, multi-var conflict error") {
    assert(gridMapping(raster) == "spatial_ref")
    val r2 = MetadataOps.updateAttrs(raster, Map("grid_mapping" -> "crs_def"))
    assert(gridMapping(r2) == "crs_def")
    assert(gridMappingOf(Map(
      "nir" -> Map("grid_mapping" -> "crs_def"),
      "red" -> Map.empty[String, String])) == "crs_def")
    intercept[MultipleGridMappings] {
      gridMappingOf(Map(
        "nir" -> Map("grid_mapping" -> "a"),
        "red" -> Map("grid_mapping" -> "b")))
    }
  }

  test("dtype-default nodata matches the reference table (_spatial_utils.py:28-45)") {
    assert(DtypeNodata.default("uint8") == 255.0)
    assert(DtypeNodata.default("int16") == -32768.0)
    assert(DtypeNodata.default("uint16") == 65535.0)
    assert(DtypeNodata.default("int32") == -2147483648.0)
    assert(DtypeNodata.default("uint32") == 4294967295.0)
    assert(DtypeNodata.default("int8") == -128.0)
    assert(DtypeNodata.default("float32").isNaN && DtypeNodata.default("float64").isNaN)
    intercept[IllegalArgumentException] { DtypeNodata.default("cint16") } // None in ref
    intercept[IllegalArgumentException] { DtypeNodata.default("bogus") }
    // write_nodata defaulting: explicit wins, else dtype default
    assert(DtypeNodata.writeNodataDefault(raster, "int16").grid.nodata == -32768.0)
    assert(DtypeNodata.writeNodataDefault(raster, "int16", Some(-7.0)).grid.nodata == -7.0)
  }

  test("Zarr convention: proj:/spatial: roundtrip, declaration-gated") {
    val g = modis
    var attrs = Map.empty[String, String]
    attrs = ZarrConvention.writeCrsAttrs(attrs, g.crs)
    attrs = ZarrConvention.writeTransformAttrs(attrs, g)
    assert(attrs("zarr_conventions").split(",").toSet == Set("proj:", "spatial:"))
    assert(attrs("spatial:shape") == "200,200")
    assert(attrs("spatial:registration") == "pixel")
    assert(ZarrConvention.readCrs(attrs).exists(_.proj == g.crs.proj))
    assert(ZarrConvention.readTransform(attrs).contains(g.transform))
    assert(ZarrConvention.readSpatialDimensions(attrs).contains(("y", "x")))
    // without the declaration nothing reads (zarr.py convention_check)
    val undeclared = attrs - "zarr_conventions"
    assert(ZarrConvention.readCrs(undeclared).isEmpty)
    assert(ZarrConvention.readTransform(undeclared).isEmpty)
    // dispatcher: zarr markers present -> zarr path; else CF
    val viaDispatch = readGridByConvention(attrs, g.width, g.height, g.nodata)
    assert(viaDispatch.exists(_.transform == g.transform))
    val cfAttrs = CfConvention.exportAttrs(g)
    assert(readGridByConvention(cfAttrs, g.width, g.height, g.nodata)
      .exists(_.transform == g.transform))
  }

  test("CF time decode: units-since strings decode to timestamps and roundtrip") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(0L, 1L, 365L, 18262L).toDF("t")
    val out = df.select(
        CfTime.decodeColumn(col("t"), "days since 1970-01-01").as("ts"))
      .collect().map(_.getTimestamp(0).toInstant.toString)
    assert(out(0) == "1970-01-01T00:00:00Z")
    assert(out(1) == "1970-01-02T00:00:00Z")
    assert(out(2) == "1971-01-01T00:00:00Z")
    assert(out(3) == "2020-01-01T00:00:00Z") // 18262 days since epoch
    // hours with explicit epoch time
    val h = Seq(25L).toDF("t").select(
        CfTime.decodeColumn(col("t"), "hours since 2000-01-01 12:00:00").as("ts"))
      .collect()(0).getTimestamp(0).toInstant.toString
    assert(h == "2000-01-02T13:00:00Z")
    // roundtrip through encode
    val back = Seq(18262L).toDF("t")
      .select(CfTime.decodeColumn(col("t"), "days since 1970-01-01").as("ts"))
      .select(CfTime.encodeColumn(col("ts"), "days since 1970-01-01").as("t"))
      .collect()(0).getDouble(0)
    assert(back == 18262.0)
    // the reference's decode gate
    assert(CfTime.isCfTime("days since 1970-01-01"))
    assert(!CfTime.isCfTime("metre"))
    intercept[IllegalArgumentException] { CfTime.parseUnits("fortnights since 1970-01-01") }
  }

  test("CF timedelta decode (_io.py:705-743 second arm): plural units, no epoch") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // gate: EXACT plural spellings only, and never units with "since"
    assert(CfTime.isCfTimedelta("seconds") && CfTime.isCfTimedelta("days"))
    assert(CfTime.isCfTimedelta("milliseconds") && CfTime.isCfTimedelta("nanoseconds"))
    assert(!CfTime.isCfTimedelta("day") && !CfTime.isCfTimedelta("s"))
    assert(!CfTime.isCfTimedelta("metre") && !CfTime.isCfTimedelta("days since 1970-01-01"))
    // EXACT membership like xarray's `units in TIME_UNITS`: case and
    // whitespace variants do NOT qualify
    assert(!CfTime.isCfTimedelta("Days") && !CfTime.isCfTimedelta(" seconds "))
    // decode: numbers become day-time intervals at the declared unit
    val iv = Seq(90L).toDF("t")
      .select(CfTime.decodeTimedeltaColumn(col("t"), "minutes").as("iv"))
      .collect()(0).get(0)
    assert(iv == java.time.Duration.ofMinutes(90), iv.toString)
    // roundtrip through encode at a different declared unit
    val back = Seq(36L).toDF("t")
      .select(CfTime.decodeTimedeltaColumn(col("t"), "hours").as("iv"))
      .select(CfTime.encodeTimedeltaColumn(col("iv"), "days").as("d"))
      .collect()(0).getDouble(0)
    assert(back == 1.5)
    // dispatcher: datetime arm wins for since-units; timedelta arm follows
    // decode_times when decode_timedelta is unset; explicit false disables
    assert(CfTime.decodeCoord(col("t"), "days since 1970-01-01",
      decodeTimes = true).isDefined)
    assert(CfTime.decodeCoord(col("t"), "seconds", decodeTimes = true).isDefined)
    assert(CfTime.decodeCoord(col("t"), "seconds", decodeTimes = false).isEmpty)
    assert(CfTime.decodeCoord(col("t"), "seconds", decodeTimes = true,
      decodeTimedelta = Some(false)).isEmpty)
    assert(CfTime.decodeCoord(col("t"), "seconds", decodeTimes = false,
      decodeTimedelta = Some(true)).isDefined)
    assert(CfTime.decodeCoord(col("t"), "metre", decodeTimes = true).isEmpty)
  }

  test("rasterio band-attr collapse matches _io.py:657-702 rules") {
    // uniform scales/offsets collapse; nodata -> _FillValue
    val a = MetadataOps.rasterioAttrs(Some(-28672.0),
      scales = Seq(0.1, 0.1), offsets = Seq(5.0, 5.0),
      descriptions = Seq("band", "band"), units = Seq("m"))
    assert(a("_FillValue") == "-28672.0")
    assert(a("scale_factor") == "0.1" && !a.contains("scales"))
    assert(a("add_offset") == "5.0" && !a.contains("offsets"))
    assert(a("long_name") == "band")
    assert(a("units") == "m")
    // differing scales stay per-band and scale_factor is withheld
    val b = MetadataOps.rasterioAttrs(None, scales = Seq(0.1, 0.2),
      offsets = Seq(0.0), descriptions = Seq("nir", "red"),
      units = Seq("m", "ft"))
    assert(b("scales") == "0.1,0.2" && !b.contains("scale_factor"))
    assert(b("add_offset") == "0.0")
    assert(b("long_name") == "nir,red")
    assert(b("units") == "m,ft")
    assert(!b.contains("_FillValue"))
    // truthiness gate (`if any(riods.descriptions)`): all-empty band lists
    // emit NO long_name, and null entries render as empty strings
    val c = MetadataOps.rasterioAttrs(None, descriptions = Seq("", ""))
    assert(!c.contains("long_name"))
    val d = MetadataOps.rasterioAttrs(None, descriptions = Seq(null, "x"))
    assert(d("long_name") == ",x")
  }

  test("Json sidecar escaping: control characters in attr values roundtrip") {
    // a newline in a CF long_name or a tab in multi-line WKT must not
    // produce an unreadable store (ADVICE r3: invalid JSON in _grid)
    val attrs = Map(
      "long_name" -> "first line\nsecond line",
      "wkt" -> "PROJCS[\"x\",\n\tGEOGCS[\"y\"]]",
      "ctrl" -> "bell\u0007end", "quote" -> "a\"b\\c")
    val json = Json.obj(attrs)
    assert(Json.toMap(json) == attrs)
  }

  test("skip_missing_spatial_dims: raise by default, pass-through when set") {
    import org.apache.spark.sql.functions._
    val ds = graft.Queries.datasetPixels(spark, modis, graft.Queries.dsVarSeeds)
      .filter(col("row") < 5 && col("col") < 5)
    val dims = Map("nir" -> Seq("y", "x"), "red" -> Seq("band")) // red lacks y/x
    val ex = intercept[MissingSpatialDimension] {
      mapSpatialVars(ds, dims)(_.withColumn("value", col("value") + 1))
    }
    assert(ex.getMessage.contains("red"))
    val out = withOptions(GraftOptions(skipMissingSpatialDims = true)) {
      mapSpatialVars(ds, dims)(_.withColumn("value", col("value") + 1))
    }.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getLong(5)).toMap
    val in = ds.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getLong(5)).toMap
    in.foreach { case (k @ (v, _, _), value) =>
      if (v == "nir") assert(out(k) == value + 1, s"$k must transform")
      else assert(out(k) == value, s"$k must pass through untouched")
    }
    // all-spatial datasets run whole-frame (no split, no union)
    val all = mapSpatialVars(ds, Map("nir" -> Seq("y", "x"), "red" -> Seq("y", "x")))(
      _.withColumn("value", col("value") + 1))
    assert(all.count() == ds.count())
  }

  test("attrs persist through the tile store: CF export + GCPs survive write/read") {
    import graft.sources.TileIO
    val dir = java.nio.file.Files.createTempDirectory("graft-attrs").toString + "/s"
    val gcps = Seq(
      Gcp(row = 0, col = 0, x = -104.1, y = 45.2, z = 0, id = "1", info = ""),
      Gcp(row = 100, col = 150, x = -103.9, y = 45.0, z = 12.5, id = "2", info = "corner"))
    val decorated = MetadataOps.writeGcps(
      Conventions.writeCfAttrs(
        MetadataOps.writeEncoding(raster, scale = 0.1, offset = 5.0)),
      gcps, Crs.WGS84)
    TileIO.writeTiles(decorated, dir, tileSize = 50)
    val (g2, _) = TileIO.readGrid(spark, dir)
    // the CF grid-mapping attrs, encoding chain and GCPs all round-trip
    assert(g2.attrs("spatial_ref:GeoTransform") == modis.transform.toGdal)
    assert(g2.attrs("encoding:scale_factor") == "0.1")
    val back = MetadataOps.getGcps(Raster(raster.df, g2))
    assert(back.isDefined && back.get == gcps)
    // and the re-opened attrs rebuild the grid through the convention layer
    val re = readCfGrid(g2.attrs, g2.width, g2.height, g2.nodata)
    assert(re.exists(_.transform == modis.transform))
  }

  test("writeCfAttrs + readCfGrid: full raster metadata roundtrip") {
    val written = writeCfAttrs(raster)
    val back = readCfGrid(written.grid.attrs, modis.width, modis.height, modis.nodata)
    assert(back.isDefined)
    assert(back.get.transform == modis.transform)
    assert(back.get.crs.proj == modis.crs.proj)
  }

  test("ensureNodataDtype mirrors _ensure_nodata_dtype coercion failures") {
    import Conventions.DtypeNodata.ensureNodataDtype
    // in-range integral values pass untouched
    assert(ensureNodataDtype(255.0, "uint8") == 255.0)
    assert(ensureNodataDtype(-32768.0, "int16") == -32768.0)
    assert(ensureNodataDtype(0.0, "uint32") == 0.0)
    // the reference's canonical failure: -1 cannot ride a uint8 band
    intercept[IllegalArgumentException] { ensureNodataDtype(-1.0, "uint8") }
    intercept[IllegalArgumentException] { ensureNodataDtype(256.0, "uint8") }
    intercept[IllegalArgumentException] { ensureNodataDtype(0.1, "int16") }
    intercept[IllegalArgumentException] { ensureNodataDtype(Double.NaN, "int32") }
    intercept[IllegalArgumentException] { ensureNodataDtype(1e20, "int64") }
    // float32: NaN and exactly-representable values pass, others fail
    assert(ensureNodataDtype(Double.NaN, "float32").isNaN)
    assert(ensureNodataDtype(0.5, "float32") == 0.5)
    assert(ensureNodataDtype(-28672.0, "float32") == -28672.0)
    intercept[IllegalArgumentException] { ensureNodataDtype(3.7, "float32") }
    // float16: representable values pass (1/2048 steps near 1), others fail
    assert(ensureNodataDtype(0.5, "float16") == 0.5)
    assert(ensureNodataDtype(-65504.0, "float16") == -65504.0) // half max
    intercept[IllegalArgumentException] { ensureNodataDtype(65505.0, "float16") }
    intercept[IllegalArgumentException] { ensureNodataDtype(1.0001, "float16") }
    // float16 SUBNORMALS round-trip exactly (the first halfRoundTrip cut
    // halved every subnormal — round-4 self-review)
    assert(ensureNodataDtype(3.0517578125e-5, "float16") == 3.0517578125e-5) // 2^-15
    assert(ensureNodataDtype(5.960464477539063e-8, "float16")
      == 5.960464477539063e-8) // 2^-24, smallest subnormal
    intercept[IllegalArgumentException] {
      ensureNodataDtype(2.9802322387695312e-8, "float16") } // 2^-25: ties to 0
    // int64/uint64 upper bounds: the float64 images of 2^63 / 2^64 sit ONE
    // PAST the exact maxima (which are not representable), so the bound
    // value itself overflows the dtype and must fail like the reference's
    // astype-and-compare would (round-4 ADVICE); the largest representable
    // doubles BELOW the bounds pass
    intercept[IllegalArgumentException] { ensureNodataDtype(9.223372036854776e18, "int64") }
    intercept[IllegalArgumentException] { ensureNodataDtype(1.8446744073709552e19, "uint64") }
    assert(ensureNodataDtype(9223372036854774784.0, "int64") == 9223372036854774784.0)
    assert(ensureNodataDtype(18446744073709549568.0, "uint64") == 18446744073709549568.0)
    assert(ensureNodataDtype(-9.223372036854776e18, "int64") == -9.223372036854776e18)
    // float16 double-rounding adversary: the double one ULP below the
    // binary16 tie 1 + 1.5/1024 converts float32-exactly ONTO the tie, so
    // the old float-staged conversion rounded it to even (1 + 2/1024) and
    // back-compared unequal for the wrong reason; the direct conversion
    // (one RNE from the 52-bit significand, numpy-verified over 133k
    // values) rounds it down to 1 + 1/1024 — either way non-representable,
    // and the representable neighbours pass exactly
    intercept[IllegalArgumentException] {
      ensureNodataDtype(Math.nextDown(1.00146484375), "float16") }
    assert(ensureNodataDtype(1.0009765625, "float16") == 1.0009765625) // 1+1/1024
    assert(ensureNodataDtype(1.001953125, "float16") == 1.001953125) // 1+2/1024
    // complex dtypes pass real-valued nodata through untouched
    assert(ensureNodataDtype(-1.0, "cint16") == -1.0)
    assert(ensureNodataDtype(Double.NaN, "cfloat32").isNaN)
    // float64 accepts everything
    assert(ensureNodataDtype(-1.7976931348623157e308, "float64") < 0)
  }

  test("dtype rides the tile store schema and gates the DSv2 write") {
    val g = graft.core.Synth.modisGrid.copy(nodata = 255.0, dtype = "uint8")
    val dir = java.nio.file.Files.createTempDirectory("graft-dtype").toString + "/d1"
    // TileIO sidecar roundtrip preserves dtype (and pre-round-4 stores
    // without the column default to float64 — covered by every other spec)
    val vals = graft.core.Synth.pixels(spark,
      g.copy(nodata = 255.0)).withColumn("value",
        org.apache.spark.sql.functions.pmod(org.apache.spark.sql.functions.col("value"),
          org.apache.spark.sql.functions.lit(256L)))
    TileIO.writeTiles(Raster(vals, g), dir, tileSize = 50)
    val (g2, _) = TileIO.readGrid(spark, dir)
    assert(g2.dtype == "uint8" && g2 == g)
    // DSv2 option parity: dtype option rides the write; incompatible
    // explicit nodata is rejected at build time; omitted nodata defaults
    // from the dtype table
    val dir2 = java.nio.file.Files.createTempDirectory("graft-dtype").toString + "/d2"
    def w(nodata: Option[String], dtype: String) = {
      val base = vals.write.format("graft").mode("overwrite")
        .option("crs", g.crs.key).option("transform", g.transform.toGdal)
        .option("width", "200").option("height", "200")
        .option("dtype", dtype).option("tile_size", "50")
      nodata.fold(base)(n => base.option("nodata", n)).save(dir2)
    }
    w(Some("255.0"), "uint8")
    val (g3, _) = TileIO.readGrid(spark, dir2)
    assert(g3.dtype == "uint8" && g3.nodata == 255.0)
    val bad = intercept[Exception] { w(Some("-1"), "uint8") }
    assert(bad.getMessage.contains("Unable to convert nodata value"),
      s"got: ${bad.getMessage}")
    w(None, "uint16") // nodata defaults to 65535 from the dtype table
    val (g4, _) = TileIO.readGrid(spark, dir2)
    assert(g4.dtype == "uint16" && g4.nodata == 65535.0)
    // omitting BOTH nodata and dtype stays a fail-fast build error (the
    // dtype default exists for typed stores, not for silent NaN nodata)
    val none = intercept[Exception] {
      vals.write.format("graft").mode("overwrite")
        .option("crs", g.crs.key).option("transform", g.transform.toGdal)
        .option("width", "200").option("height", "200")
        .option("tile_size", "50").save(dir2)
    }
    assert(none.getMessage.contains("nodata"), s"got: ${none.getMessage}")
  }
}
