package graft.ops

import graft.core._

/** Conventions + engine options layer — the analog of the reference's
  * pluggable metadata conventions and global options:
  *
  *  - [[GraftOptions]]: rioxarray/_options.py:18-109 `set_options`
  *    (export_grid_mapping, skip_missing_spatial_dims, convention) as an
  *    immutable options value with a scoped `withOptions` context form.
  *  - [[CfConvention]]: rioxarray/_convention/cf.py:22-247 — read/write the
  *    CRS (`spatial_ref`/`crs_wkt` attrs), the affine (`GeoTransform` in
  *    GDAL string order), and the spatial-dimension naming, against a plain
  *    attribute map so reference-shaped metadata round-trips through
  *    [[MetadataOps.updateAttrs]] / the grid sidecar.
  *  - `writeCoordinateSystem` (rioxarray.py:446-501): CF axis/standard_name
  *    /units attrs for the x/y coordinates.
  *  - `gridMapping` (rioxarray.py:180-205): resolve the grid-mapping
  *    coordinate name, raising on multi-variable conflicts.
  *  - [[DtypeNodata]]: the GDAL dtype → default-nodata table
  *    (_spatial_utils.py:28-45) driving `write_nodata` defaulting.
  *
  * Everything here is driver-side metadata bookkeeping: zero shuffle, zero
  * data motion, no executor involvement. */
object Conventions {

  val DefaultGridMap = "spatial_ref" // _spatial_utils.py:22 DEFAULT_GRID_MAP

  // ---- set_options (rioxarray/_options.py) -------------------------------

  /** Engine options value (immutable; the reference mutates a module dict). */
  final case class GraftOptions(exportGridMapping: Boolean = true,
                                skipMissingSpatialDims: Boolean = false,
                                convention: String = "cf") {
    require(convention == "cf" || convention == "zarr",
      s"option 'convention' gave an invalid value: '$convention'")
  }

  @volatile private var current = GraftOptions()
  def options: GraftOptions = current
  def setOptions(o: GraftOptions): Unit = current = o

  /** Context-manager form of the reference's `with set_options(...):` —
    * restores the previous options even if `body` throws. */
  def withOptions[A](o: GraftOptions)(body: => A): A = {
    val old = current
    current = o
    try body finally current = old
  }

  // ---- CF convention (rioxarray/_convention/cf.py) ------------------------

  object CfConvention {

    /** write_crs (cf.py:142-204): grid-mapping attrs for a CRS + transform.
      * With export_grid_mapping the CF grid-mapping parameter attrs are
      * included (the engine's analog of pyproj CRS.to_cf()); spatial_ref and
      * crs_wkt always are (GDAL compatibility, cf.py:193-196). */
    def exportAttrs(grid: GridRef,
                    gridMappingName: String = DefaultGridMap): Map[String, String] = {
      val wkt = Crs.toWkt(grid.crs)
      val base = Map(
        s"$gridMappingName:spatial_ref" -> wkt,
        s"$gridMappingName:crs_wkt" -> wkt,
        s"$gridMappingName:GeoTransform" -> grid.transform.toGdal,
        "grid_mapping" -> gridMappingName)
      val cf = if (options.exportGridMapping) cfParams(grid.crs).map {
        case (k, v) => s"$gridMappingName:$k" -> v
      } else Map.empty[String, String]
      base ++ cf
    }

    /** CF grid-mapping parameter attrs per projection (the pyproj to_cf()
      * analog for the projections the engine carries). */
    def cfParams(crs: Crs): Map[String, String] = crs.proj match {
      case LongLat => Map("grid_mapping_name" -> "latitude_longitude")
      case Sinusoidal(r, lon0) => Map(
        "grid_mapping_name" -> "sinusoidal",
        "longitude_of_projection_origin" -> lon0.toString,
        "semi_major_axis" -> r.toString,
        "semi_minor_axis" -> r.toString)
      case t: TransverseMercator => Map(
        "grid_mapping_name" -> "transverse_mercator",
        "longitude_of_central_meridian" -> t.lon0Deg.toString,
        "scale_factor_at_central_meridian" -> t.k0.toString,
        "false_easting" -> t.falseE.toString,
        "false_northing" -> t.falseN.toString)
      case m: MercatorProj => Map(
        "grid_mapping_name" -> "mercator",
        "longitude_of_projection_origin" -> m.lon0Deg.toString,
        "scale_factor_at_projection_origin" -> m.k0.toString)
      case WebMercator => Map(
        "grid_mapping_name" -> "popular_visualisation_mercator")
      case _ => Map.empty
    }

    /** read_crs (cf.py:22-57): spatial_ref first, then crs_wkt, then the CF
      * grid-mapping parameter attrs. */
    def importCrs(attrs: Map[String, String],
                  gridMappingName: String = DefaultGridMap): Option[Crs] = {
      def attr(k: String) = attrs.get(s"$gridMappingName:$k")
      attr("spatial_ref").orElse(attr("crs_wkt")).map(Crs.parse)
        .orElse(fromCfParams(k => attr(k)))
    }

    private def fromCfParams(attr: String => Option[String]): Option[Crs] =
      attr("grid_mapping_name").flatMap {
        case "latitude_longitude" => Some(Crs.WGS84)
        case "sinusoidal" =>
          for (a <- attr("semi_major_axis")) yield
            Crs.parse(s"+proj=sinu +a=$a +b=$a " +
              s"+lon_0=${attr("longitude_of_projection_origin").getOrElse("0")}")
        case "transverse_mercator" =>
          Some(Crs.parse("+proj=tmerc" +
            s" +lon_0=${attr("longitude_of_central_meridian").getOrElse("0")}" +
            s" +k=${attr("scale_factor_at_central_meridian").getOrElse("1")}" +
            s" +x_0=${attr("false_easting").getOrElse("0")}" +
            s" +y_0=${attr("false_northing").getOrElse("0")}"))
        case _ => None
      }

    /** read_transform (cf.py:59-85): the GeoTransform attribute, GDAL string
      * order (c a b f d e). */
    def importTransform(attrs: Map[String, String],
                        gridMappingName: String = DefaultGridMap): Option[Affine] =
      attrs.get(s"$gridMappingName:GeoTransform").map(Affine.fromGdal)

    /** read_spatial_dimensions (cf.py:87-139): standard names first, then CF
      * axis/standard_name coordinate attrs. `dims` are the frame's column
      * names; per-coordinate attrs are looked up as "<dim>:<attr>". Returns
      * (y_dim, x_dim) like the reference. */
    def readSpatialDimensions(dims: Seq[String],
                              attrs: Map[String, String]): Option[(String, String)] = {
      if (dims.contains("x") && dims.contains("y")) return Some(("y", "x"))
      if (dims.contains("longitude") && dims.contains("latitude"))
        return Some(("latitude", "longitude"))
      def a(dim: String, k: String) = attrs.getOrElse(s"$dim:$k", "")
      val x = dims.find(d => a(d, "axis").toUpperCase == "X" ||
        Set("longitude", "projection_x_coordinate")(a(d, "standard_name").toLowerCase))
      val y = dims.find(d => a(d, "axis").toUpperCase == "Y" ||
        Set("latitude", "projection_y_coordinate")(a(d, "standard_name").toLowerCase))
      for (xx <- x; yy <- y) yield (yy, xx)
    }
  }

  // ---- Zarr convention (rioxarray/_convention/zarr.py:18-370) -------------

  /** Zarr geo conventions: CRS under `proj:` (wkt2/code priority,
    * zarr.py:145-155), transform + shape/bbox under `spatial:`
    * (zarr.py:331-370), both gated on a `zarr_conventions` declaration
    * (zarr.py:35-59). Lists serialize as comma-joined strings in the
    * engine's string-attr store. */
  object ZarrConvention {

    private def declared(attrs: Map[String, String], name: String): Boolean =
      attrs.get("zarr_conventions").exists(_.split(",").map(_.trim).contains(name))

    private def declare(attrs: Map[String, String], name: String): Map[String, String] = {
      val cur = attrs.get("zarr_conventions").map(_.split(",").map(_.trim).toSeq)
        .getOrElse(Seq.empty)
      if (cur.contains(name)) attrs
      else attrs + ("zarr_conventions" -> (cur :+ name).mkString(","))
    }

    /** write_crs (zarr.py:303-329): proj:wkt2 + convention declaration. */
    def writeCrsAttrs(attrs: Map[String, String], crs: Crs): Map[String, String] =
      declare(attrs, "proj:") + ("proj:wkt2" -> Crs.toWkt(crs))

    /** write_transform (zarr.py:331-370): spatial:transform as the
      * [a,b,c,d,e,f] xarray row order, plus dimensions/shape/bbox/
      * registration. */
    def writeTransformAttrs(attrs: Map[String, String], grid: GridRef,
                            yDim: String = "y", xDim: String = "x"): Map[String, String] = {
      val t = grid.transform
      val b = grid.bounds
      declare(attrs, "spatial:") ++ Map(
        "spatial:transform" -> Seq(t.a, t.b, t.c, t.d, t.e, t.f).mkString(","),
        "spatial:dimensions" -> s"$yDim,$xDim",
        "spatial:shape" -> s"${grid.height},${grid.width}",
        "spatial:bbox" -> Seq(b.minx, b.miny, b.maxx, b.maxy).mkString(","),
        "spatial:registration" -> "pixel")
    }

    /** read_crs (zarr.py:232-248): wkt2 then code, only when declared. */
    def readCrs(attrs: Map[String, String]): Option[Crs] = {
      if (!declared(attrs, "proj:")) return None
      Seq("proj:wkt2", "proj:code").iterator
        .flatMap(attrs.get)
        .flatMap(v => scala.util.Try(Crs.parse(v)).toOption)
        .nextOption()
    }

    /** read_transform (zarr.py:157-180 + parse_spatial_transform): the
      * 6-element spatial:transform array, only when declared. */
    def readTransform(attrs: Map[String, String]): Option[Affine] = {
      if (!declared(attrs, "spatial:")) return None
      attrs.get("spatial:transform").flatMap { s =>
        val p = s.split(",").map(_.trim)
        if (p.length != 6) None
        else scala.util.Try(Affine(p(0).toDouble, p(1).toDouble, p(2).toDouble,
                                   p(3).toDouble, p(4).toDouble, p(5).toDouble)).toOption
      }
    }

    /** read_spatial_dimensions (zarr convention form): the declared
      * (y, x) dimension names. */
    def readSpatialDimensions(attrs: Map[String, String]): Option[(String, String)] = {
      if (!declared(attrs, "spatial:")) return None
      attrs.get("spatial:dimensions").flatMap { s =>
        s.split(",").map(_.trim) match {
          case Array(y, x) => Some((y, x))
          case _ => None
        }
      }
    }
  }

  /** Convention dispatch (the _convention/_core.py:45-176 dispatcher):
    * explicit option wins; else whichever convention's markers are present
    * (zarr declaration first, like the reference's declared-convention
    * priority); CF is the default. */
  def readGridByConvention(attrs: Map[String, String], width: Int, height: Int,
                           nodata: Double): Option[GridRef] = {
    val useZarr = options.convention match {
      case "zarr" => true
      case _ => attrs.contains("zarr_conventions")
    }
    if (useZarr)
      for (crs <- ZarrConvention.readCrs(attrs); t <- ZarrConvention.readTransform(attrs))
        yield GridRef(crs, t, width, height, nodata)
    else readCfGrid(attrs, width, height, nodata)
  }

  /** Attach reference-shaped CF metadata to a raster's attrs (the engine's
    * write path for a CF export: the sidecar then holds exactly what the
    * reference would put on the spatial_ref coordinate). */
  def writeCfAttrs(r: Raster, gridMappingName: String = DefaultGridMap): Raster =
    MetadataOps.updateAttrs(r, CfConvention.exportAttrs(r.grid, gridMappingName))

  /** Re-open from CF attrs: rebuild crs + transform from the attribute map
    * (roundtrip partner of [[writeCfAttrs]]). */
  def readCfGrid(attrs: Map[String, String], width: Int, height: Int,
                 nodata: Double,
                 gridMappingName: String = DefaultGridMap): Option[GridRef] =
    for {
      crs <- CfConvention.importCrs(attrs, gridMappingName)
      t <- CfConvention.importTransform(attrs, gridMappingName)
    } yield GridRef(crs, t, width, height, nodata)

  // ---- write_coordinate_system (rioxarray.py:446-501) ---------------------

  /** CF coordinate-system attrs for the x/y coordinate columns, namespaced
    * "<dim>:<attr>" in the grid attrs (the engine's coordinate-attr store). */
  def writeCoordinateSystem(r: Raster, xDim: String = "x",
                            yDim: String = "y"): Raster = {
    val attrs: Map[String, String] =
      if (!r.grid.crs.isGeographic) Map(
        s"$xDim:axis" -> "X",
        s"$xDim:long_name" -> "x coordinate of projection",
        s"$xDim:standard_name" -> "projection_x_coordinate",
        s"$xDim:units" -> "metre",
        s"$yDim:axis" -> "Y",
        s"$yDim:long_name" -> "y coordinate of projection",
        s"$yDim:standard_name" -> "projection_y_coordinate",
        s"$yDim:units" -> "metre")
      else Map(
        s"$xDim:axis" -> "X",
        s"$xDim:long_name" -> "longitude",
        s"$xDim:standard_name" -> "longitude",
        s"$xDim:units" -> "degrees_east",
        s"$yDim:axis" -> "Y",
        s"$yDim:long_name" -> "latitude",
        s"$yDim:standard_name" -> "latitude",
        s"$yDim:units" -> "degrees_north")
    MetadataOps.updateAttrs(r, attrs)
  }

  // ---- skip_missing_spatial_dims (raster_dataset.py per-var loops) --------

  class MissingSpatialDimension(msg: String) extends RuntimeException(msg)

  /** Apply a transform to the spatial variables of a dataset frame with the
    * reference's missing-spatial-dims discipline (every RasterDataset
    * per-variable loop, e.g. raster_dataset.py:59-142: a variable whose
    * dims lack y/x raises MissingSpatialDimensionError unless
    * set_options(skip_missing_spatial_dims=True), in which case it is
    * skipped — here: passed through untouched). `varDims` declares each
    * variable's dimension names (the engine's per-var metadata analog);
    * undeclared variables count as spatial. */
  def mapSpatialVars(ds: org.apache.spark.sql.DataFrame,
                     varDims: Map[String, Seq[String]])(
                     f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    def isSpatial(v: String): Boolean = varDims.get(v).forall(dims =>
      CfConvention.readSpatialDimensions(dims, Map.empty).isDefined)
    val nonSpatial = varDims.keys.filterNot(isSpatial).toSeq.sorted
    if (nonSpatial.nonEmpty && !options.skipMissingSpatialDims)
      throw new MissingSpatialDimension(
        s"no x or y dimensions found for variables ${nonSpatial.mkString(", ")}; " +
          "set skip_missing_spatial_dims to skip them")
    if (nonSpatial.isEmpty) f(ds)
    else {
      val spatial = f(ds.filter(!col("var_name").isin(nonSpatial: _*)))
      val skipped = ds.filter(col("var_name").isin(nonSpatial: _*))
      spatial.unionByName(skipped, allowMissingColumns = true)
    }
  }

  // ---- grid_mapping property (rioxarray.py:180-205) -----------------------

  class MultipleGridMappings(msg: String) extends RuntimeException(msg)

  /** Resolve the grid-mapping name for a single raster: its own attr or the
    * default. */
  def gridMapping(r: Raster): String =
    r.grid.attrs.getOrElse("grid_mapping", DefaultGridMap)

  /** Dataset form: each variable may carry its own grid_mapping attr; all
    * present values must agree (rioxarray.py:192-205 raises
    * "Multiple grid mappings exist."). */
  def gridMappingOf(varAttrs: Map[String, Map[String, String]]): String = {
    val found = varAttrs.values.flatMap(_.get("grid_mapping")).toSet
    if (found.size > 1)
      throw new MultipleGridMappings(
        s"Multiple grid mappings exist: ${found.toSeq.sorted.mkString(", ")}")
    found.headOption.getOrElse(DefaultGridMap)
  }

  // ---- CF time decoding (_io.py:705-743 _decode_datetime_cf) --------------

  /** CF datetime coder for a numeric time coordinate column: "units"
    * attrs of the form "<unit> since <epoch>" decode to timestamps
    * (the engine analog of xarray's CFDatetimeCoder over the reference's
    * `time` coordinate; standard/proleptic-gregorian calendar). Pure
    * Column arithmetic — timestamp = epoch + value * unit_seconds — so
    * the decode stays inside codegen on a 10^12-row table. */
  object CfTime {
    private val UnitSeconds: Map[String, Double] = Map(
      "seconds" -> 1.0, "second" -> 1.0, "s" -> 1.0,
      "minutes" -> 60.0, "minute" -> 60.0, "min" -> 60.0,
      "hours" -> 3600.0, "hour" -> 3600.0, "h" -> 3600.0,
      "days" -> 86400.0, "day" -> 86400.0, "d" -> 86400.0)

    /** Parse a CF units string into (secondsPerUnit, epochSeconds). */
    def parseUnits(units: String): (Double, Long) = {
      val parts = units.trim.split("\\s+since\\s+", 2)
      require(parts.length == 2, s"not a CF time units string: '$units'")
      val mult = UnitSeconds.getOrElse(parts(0).trim.toLowerCase,
        throw new IllegalArgumentException(s"unsupported CF time unit '${parts(0)}'"))
      val epochStr = parts(1).trim.replace("T", " ")
      val norm = if (epochStr.contains(" ")) epochStr else s"$epochStr 00:00:00"
      val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-M-d H:m[:s[.SSS]]")
      val ldt = java.time.LocalDateTime.parse(norm, fmt)
      (mult, ldt.toEpochSecond(java.time.ZoneOffset.UTC))
    }

    /** Decode a numeric CF time column to a timestamp Column. */
    def decodeColumn(time: org.apache.spark.sql.Column,
                     units: String): org.apache.spark.sql.Column = {
      val (mult, epoch) = parseUnits(units)
      org.apache.spark.sql.functions.timestamp_seconds(
        time.cast("double") * mult + epoch.toDouble)
    }

    /** Encode back to the numeric coordinate (inverse of decodeColumn). */
    def encodeColumn(ts: org.apache.spark.sql.Column,
                     units: String): org.apache.spark.sql.Column = {
      val (mult, epoch) = parseUnits(units)
      (org.apache.spark.sql.functions.unix_timestamp(ts).cast("double") - epoch) / mult
    }

    /** The reference's decode gate: only coords whose units contain
      * "since" are datetime-decoded (_io.py:718). */
    def isCfTime(units: String): Boolean = units != null && units.contains("since")

    // ---- CF timedeltas (_io.py:705-743 second arm) ------------------------

    /** xarray times.TIME_UNITS — the EXACT plural spellings the reference's
      * timedelta gate membership-tests (`units in times.TIME_UNITS`,
      * _io.py:723-724); bare "day"/"h"/"s" do NOT qualify. */
    private val TimedeltaSeconds: Map[String, Double] = Map(
      "days" -> 86400.0, "hours" -> 3600.0, "minutes" -> 60.0,
      "seconds" -> 1.0, "milliseconds" -> 1e-3, "microseconds" -> 1e-6,
      "nanoseconds" -> 1e-9)

    /** The timedelta decode gate — EXACT membership like the reference's
      * `units in times.TIME_UNITS` (_io.py:723-724): "Days" or " seconds "
      * do NOT qualify, mirroring xarray's case/whitespace-sensitive test. */
    def isCfTimedelta(units: String): Boolean =
      units != null && TimedeltaSeconds.contains(units)

    /** Decode a numeric CF timedelta coordinate ("seconds"/"days"/... with
      * no epoch) to a DayTimeIntervalType Column — the engine analog of
      * CFTimedeltaCoder().decode. Sub-microsecond units round to Spark's
      * microsecond interval precision. */
    def decodeTimedeltaColumn(td: org.apache.spark.sql.Column,
                              units: String): org.apache.spark.sql.Column = {
      val mult = TimedeltaSeconds.getOrElse(units,
        throw new IllegalArgumentException(s"unsupported CF timedelta unit '$units'"))
      val z = org.apache.spark.sql.functions.lit(0)
      org.apache.spark.sql.functions.make_dt_interval(
        z, z, z, td.cast("double") * mult)
    }

    /** Encode back to the numeric coordinate (inverse of
      * decodeTimedeltaColumn): interval fields -> seconds -> units (an
      * ANSI day-time interval has no direct numeric cast). */
    def encodeTimedeltaColumn(iv: org.apache.spark.sql.Column,
                              units: String): org.apache.spark.sql.Column = {
      val mult = TimedeltaSeconds.getOrElse(units,
        throw new IllegalArgumentException(s"unsupported CF timedelta unit '$units'"))
      import org.apache.spark.sql.functions.{date_part, lit}
      // day count cast to double BEFORE the multiplications: date_part
      // yields IntegerType and days*24*60 overflows Int (ANSI exception)
      // for intervals past ~4085 years, which make_dt_interval can build
      val secs = ((date_part(lit("DAY"), iv).cast("double") * 24 +
        date_part(lit("HOUR"), iv)) * 60 +
        date_part(lit("MINUTE"), iv)) * 60 +
        date_part(lit("SECOND"), iv).cast("double")
      secs / mult
    }

    /** The full `_decode_datetime_cf` dispatch for one coordinate: datetime
      * arm first ("since" + decode_times), then the timedelta arm
      * (decode_timedelta, defaulting to decode_times like the reference's
      * `if decode_timedelta is None: decode_timedelta = decode_times`).
      * Returns None when neither gate opens (coord left as numbers). */
    def decodeCoord(c: org.apache.spark.sql.Column, units: String,
                    decodeTimes: Boolean,
                    decodeTimedelta: Option[Boolean] = None):
        Option[org.apache.spark.sql.Column] = {
      val dtd = decodeTimedelta.getOrElse(decodeTimes)
      if (decodeTimes && isCfTime(units)) Some(decodeColumn(c, units))
      else if (dtd && isCfTimedelta(units)) Some(decodeTimedeltaColumn(c, units))
      else None
    }
  }

  // ---- dtype → default nodata (_spatial_utils.py:28-45) -------------------

  object DtypeNodata {
    /** GDAL dtype-name → default nodata used by write_nodata defaulting and
      * reproject's dst-nodata fallback (raster_array.py:409-416). Complex
      * int types have no default (None in the reference → None here). */
    val map: Map[String, Option[Double]] = Map(
      "uint8" -> Some(255.0),
      "uint16" -> Some(65535.0),
      "int16" -> Some(-32768.0),
      "uint32" -> Some(4294967295.0),
      "int32" -> Some(-2147483648.0),
      "float32" -> Some(Double.NaN),
      "float64" -> Some(Double.NaN),
      "cint16" -> None,
      "cint32" -> None,
      "cfloat32" -> Some(Double.NaN),
      "cfloat64" -> Some(Double.NaN),
      "uint64" -> Some(1.8446744073709552e19), // 2^64-1 as double, like numpy
      "int64" -> Some(-9.223372036854776e18),
      "int8" -> Some(-128.0),
      "float16" -> Some(Double.NaN),
      "cfloat16" -> Some(Double.NaN))

    /** Default nodata for a dtype, erroring on dtypes with no default (the
      * reference raises when _NODATA_DTYPE_MAP yields None). */
    def default(dtype: String): Double =
      map.getOrElse(dtype.toLowerCase,
        throw new IllegalArgumentException(s"unknown dtype $dtype"))
        .getOrElse(throw new IllegalArgumentException(
          s"no default nodata for dtype $dtype"))

    /** write_nodata with dtype defaulting: explicit value wins, else the
      * dtype's default. */
    def writeNodataDefault(r: Raster, dtype: String,
                           nodata: Option[Double] = None): Raster =
      MetadataOps.writeNodata(r, nodata.getOrElse(default(dtype)))

    /** Integer-dtype value ranges (as doubles) for nodata coercion checks;
      * the int64/uint64 bounds are the numpy float64 images of the exact
      * bounds, matching the reference's float compare. */
    private val intRange: Map[String, (Double, Double)] = Map(
      "int8" -> (-128.0, 127.0), "uint8" -> (0.0, 255.0),
      "int16" -> (-32768.0, 32767.0), "uint16" -> (0.0, 65535.0),
      "int32" -> (-2147483648.0, 2147483647.0), "uint32" -> (0.0, 4294967295.0),
      "int64" -> (-9.223372036854776e18, 9.223372036854776e18),
      "uint64" -> (0.0, 1.8446744073709552e19))

    /** Dtypes whose upper bound above is the float64 image of 2^63 / 2^64 —
      * one past the exact maximum (2^63-1 and 2^64-1 are not representable
      * as doubles, so they round UP to the excluded power of two). For
      * these the bound itself overflows the dtype: the reference's
      * astype-and-compare coercion would see the value change and raise, so
      * the comparison must be exclusive. The narrower dtypes' maxima are
      * exactly representable and stay inclusive. */
    private val exclusiveHi = Set("int64", "uint64")

    /** IEEE half-precision round-trip of a double — JDK 17 has no
      * Float.float16 yet. The half bits derive DIRECTLY from the 52-bit
      * double significand (one round-to-nearest-even), not via an
      * intermediate `toFloat`: the earlier float-staged version double-
      * rounded, which can disagree with numpy's direct float64→float16
      * conversion when the float32 step lands exactly on a binary16 tie
      * (round-4 ADVICE). */
    private def halfRoundTrip(v: Double): Double = {
      val bits = java.lang.Double.doubleToLongBits(v)
      val sign = ((bits >>> 48) & 0x8000L).toInt
      val absBits = bits & 0x7fffffffffffffffL
      val expField = (absBits >>> 52).toInt // biased, 0..2047
      val unbE = expField - 1023
      val mant52 = absBits & 0xfffffffffffffL
      val h: Int =
        if (expField == 0x7ff) // inf / nan
          sign | 0x7c00 | (if (mant52 != 0L) 0x200 else 0)
        else if (absBits == 0L) sign // signed zero
        else if (unbE >= -14) { // normal-half candidate (incl. overflow)
          // keep the top 10 significand bits; RNE on the remaining 42; the
          // carry ripples into the exponent and saturates to inf at 0x7c00
          // exactly when the value rounds past the max finite half (65504)
          val halfExp = unbE + 15
          if (halfExp >= 0x1f) sign | 0x7c00
          else {
            val m10 = (mant52 >>> 42).toInt
            val roundBit = ((mant52 >>> 41) & 1L).toInt
            val sticky = (mant52 & ((1L << 41) - 1)) != 0L
            val inc = if (roundBit == 1 && (sticky || (m10 & 1) == 1)) 1 else 0
            sign | (((halfExp << 10) | m10) + inc)
          }
        } else if (unbE >= -25) { // subnormal half (and the 2^-25 tie row)
          // shift the 53-bit significand so the result scales by 2^-24;
          // at unbE = -25 the whole significand is remainder: an exact
          // 2^-25 ties to even (zero), anything above rounds to the min
          // subnormal — the IEEE behaviour by construction
          val sig = (1L << 52) | mant52
          val shift = 42 + (-14 - unbE) // 43..53
          val m = (sig >>> shift).toInt
          val rem = sig & ((1L << shift) - 1)
          val half = 1L << (shift - 1)
          sign | (m + (if (rem > half || (rem == half && (m & 1) == 1)) 1 else 0))
        } else sign // < 2^-25: underflow to signed zero
      // half -> double (exact: every half value is a small dyadic rational)
      val s = if (((h >>> 15) & 1) == 1) -1.0 else 1.0
      val e = (h >>> 10) & 0x1f; val m = h & 0x3ff
      if (e == 0x1f) { if (m == 0) s * Double.PositiveInfinity else Double.NaN }
      else if (e == 0) s * Math.scalb(m.toDouble, -24)
      else s * Math.scalb(1.0 + m / 1024.0, e - 15)
    }

    /** The reference's `_ensure_nodata_dtype` (raster_writer.py:121-146):
      * coerce nodata to the write dtype; if the coercion CHANGES the value
      * (and it is not NaN) the write must fail — e.g. nodata -1 cannot ride
      * a uint8 band, 0.1 cannot ride int16, and a double that does not
      * round-trip float32 cannot ride float32. Complex dtypes pass the
      * real-valued nodata through untouched, like the reference. */
    def ensureNodataDtype(nodata: Double, dtype: String): Double = {
      val d = dtype.toLowerCase
      require(map.contains(d), s"unknown dtype $dtype")
      def fail(): Nothing = throw new IllegalArgumentException(
        s"Unable to convert nodata value ($nodata) to new dtype ($d).")
      if (d.startsWith("c")) nodata // complex: real-valued nodata allowed
      else if (d == "float64") nodata
      else if (d == "float32") {
        if (nodata.isNaN) nodata
        else if (nodata.toFloat.toDouble == nodata) nodata else fail()
      } else if (d == "float16") {
        if (nodata.isNaN) nodata
        else if (halfRoundTrip(nodata) == nodata) nodata else fail()
      } else {
        val (lo, hi) = intRange(d)
        if (nodata.isNaN || nodata.isInfinite) fail()
        else if (nodata != math.rint(nodata)) fail() // fractional: truncation changes it
        else if (nodata < lo || (if (exclusiveHi(d)) nodata >= hi else nodata > hi)) fail()
        else nodata
      }
    }
  }
}
