package graft.ops

import graft.core._
import org.apache.spark.sql.functions._

/** Metadata operators — the reference's schema-DDL-like accessor methods
  * (SURVEY §2.6: write_crs rioxarray.py:255-315, write_transform :365-444,
  * write_nodata raster_array.py:90-150, set_spatial_dims :609-644,
  * transform(recalc=True) :413-444). All are GridRef/column-metadata
  * rewrites: driver-side, zero shuffle, zero data motion. */
object MetadataOps {

  /** write_crs: attach/replace the CRS. */
  def writeCrs(r: Raster, crs: Crs): Raster = r.copy(grid = r.grid.copy(crs = crs))

  /** write_transform: replace the affine. */
  def writeTransform(r: Raster, t: Affine): Raster =
    r.copy(grid = r.grid.copy(transform = t))

  /** write_nodata: set the nodata *marker* (no data rewrite, matching the
    * reference's metadata-only semantics). */
  def writeNodata(r: Raster, nodata: Double): Raster =
    r.copy(grid = r.grid.copy(nodata = nodata))

  /** set_nodata(value) + remap: optional eager rewrite of the old marker to
    * the new one (the reference's masked/encoded write path). */
  def remapNodata(r: Raster, newNodata: Double): Raster = {
    val old = r.grid.nodata
    val isLong = r.df.schema("value").dataType.typeName == "long"
    val (o, n) = if (isLong) (lit(old.toLong), lit(newNodata.toLong))
                 else (lit(old), lit(newNodata))
    Raster(r.df.withColumn("value", when(col("value") === o, n).otherwise(col("value"))),
           r.grid.copy(nodata = newNodata))
  }

  /** mask_and_scale read projection (the reference's open_rasterio
    * mask_and_scale=True chain, _io.py:440-451 + encoded-nodata handling,
    * raster_array.py:152-196): nodata-encoded pixels become NULL (the
    * engine's analog of the reference's masked-to-NaN fill — NULL is the
    * relational missing marker and hashes deterministically), everything
    * else decodes as value * scale_factor + add_offset. Pure codegen
    * projection: no shuffle, no data motion. */
  def maskAndScale(r: Raster, scale: Double, offset: Double): Raster = {
    val isLong = r.df.schema("value").dataType.typeName == "long"
    val nod: org.apache.spark.sql.Column =
      if (isLong) lit(r.grid.nodata.toLong) else lit(r.grid.nodata)
    val decoded = r.df.withColumn("value",
      when(col("value") === nod, lit(null).cast("double"))
        .otherwise(col("value") * lit(scale) + lit(offset)))
    Raster(decoded, r.grid.copy(nodata = Double.NaN))
  }

  /** DuckDB mirror of [[maskAndScale]] over a (row,col,x,y,value) source. */
  def maskAndScaleSql(srcSql: String, nodata: Long, scale: Double, offset: Double): String =
    s"""SELECT row, col, x, y,
       |  CASE WHEN value = $nodata THEN CAST(NULL AS DOUBLE)
       |       ELSE value * $scale + $offset END AS value
       |FROM ($srcSql) ORDER BY row, col""".stripMargin

  /** transform(recalc=True): re-derive the affine from the coordinate
    * columns of two neighbouring pixels (rioxarray.py:413-444) — one tiny
    * driver action. */
  def recalcTransform(r: Raster): Affine = {
    val rows = r.df.filter(col("row") < 2 && col("col") < 2)
      .select("row", "col", "x", "y").collect()
      .map(q => ((q.getLong(0), q.getLong(1)), (q.getDouble(2), q.getDouble(3)))).toMap
    val (x00, y00) = rows((0L, 0L))
    val (x01, _) = rows((0L, 1L))
    val (_, y10) = rows((1L, 0L))
    val a = x01 - x00
    val e = y10 - y00
    Affine(a, 0, x00 - a / 2.0, 0, e, y00 - e / 2.0)
  }

  /** set_spatial_dims: rename the spatial dimension columns (the engine's
    * analog of dimension auto-detection override). */
  def setSpatialDims(r: Raster, xDim: String, yDim: String): Raster =
    Raster(r.df.withColumnRenamed("col", xDim).withColumnRenamed("row", yDim), r.grid)

  /** update_attrs / assign_attrs analog (the reference's xarray attrs dict
    * rides on the DataArray; here it rides on the grid sidecar — same
    * broadcast-sized metadata, no data motion). */
  def updateAttrs(r: Raster, kv: Map[String, String]): Raster =
    r.copy(grid = r.grid.copy(attrs = r.grid.attrs ++ kv))

  def dropAttrs(r: Raster, keys: Seq[String]): Raster =
    r.copy(grid = r.grid.copy(attrs = r.grid.attrs -- keys))

  /** Write-encoding metadata (the reference's encoding dict: scale_factor /
    * add_offset / _FillValue survive a write and drive the decode chain on
    * re-open — _io.py:440-451, raster_array.py:152-196). Stored under an
    * "encoding:" namespace so data attrs and encoding never collide. */
  def writeEncoding(r: Raster, scale: Double, offset: Double,
                    fillValue: Option[Double] = None): Raster =
    updateAttrs(r, Map(
      "encoding:scale_factor" -> scale.toString,
      "encoding:add_offset" -> offset.toString) ++
      fillValue.map(v => "encoding:_FillValue" -> v.toString))

  /** Apply the stored encoding (mask_and_scale on re-open). */
  def decodeWithEncoding(r: Raster): Raster = {
    val scale = r.grid.attrs.get("encoding:scale_factor").map(_.toDouble).getOrElse(1.0)
    val offset = r.grid.attrs.get("encoding:add_offset").map(_.toDouble).getOrElse(0.0)
    val fill = r.grid.attrs.get("encoding:_FillValue").map(_.toDouble)
    val base = fill.map(writeNodata(r, _)).getOrElse(r)
    maskAndScale(base, scale, offset)
  }

  /** write_gcps: serialize GroundControlPoints as a GeoJSON FeatureCollection
    * into the grid sidecar — the same storage shape the reference uses on the
    * grid-mapping coordinate (rioxarray.py:982-1030, GeoJSON layout
    * _spatial_utils.py:271-303: properties {id, info, row, col}, Point
    * geometry [x, y, z]). The GCP CRS rides alongside under "gcps_crs". */
  def writeGcps(r: Raster, gcps: Seq[Gcp], gcpCrs: Crs): Raster = {
    val features = gcps.map { g =>
      s"""{"type": "Feature", "properties": {"id": ${Json.str(g.id)}, """ +
        s""""info": ${Json.str(g.info)}, "row": ${Json.num(g.row)}, "col": ${Json.num(g.col)}}, """ +
        s""""geometry": {"type": "Point", "coordinates": [${Json.num(g.x)}, ${Json.num(g.y)}, ${Json.num(g.z)}]}}"""
    }
    val fc = s"""{"type": "FeatureCollection", "features": [${features.mkString(", ")}]}"""
    r.copy(grid = r.grid.copy(attrs =
      r.grid.attrs + ("gcps" -> fc) + ("gcps_crs" -> gcpCrs.key)))
  }

  /** get_gcps: parse the stored FeatureCollection back (rioxarray.py:1032-1064). */
  def getGcps(r: Raster): Option[Seq[Gcp]] =
    r.grid.attrs.get("gcps").map { json =>
      val fc = Json.parse(json)
      val feats = fc.get("features")
      (0 until feats.size()).map { i =>
        val f = feats.get(i); val p = f.get("properties")
        val coords = f.get("geometry").get("coordinates")
        Gcp(row = p.get("row").asDouble(), col = p.get("col").asDouble(),
            x = coords.get(0).asDouble(), y = coords.get(1).asDouble(),
            z = if (coords.size() > 2) coords.get(2).asDouble() else 0.0,
            id = p.get("id").asText(), info = p.get("info").asText())
      }
    }

  /** Per-band attribute collapse — the open-path tag handling of
    * `_get_rasterio_attrs` (rioxarray/_io.py:657-702): nodata becomes
    * _FillValue; scales/offsets collapse to scale_factor/add_offset when
    * uniform across bands and stay as per-band lists otherwise;
    * descriptions collapse to a single long_name when uniform; units
    * passthrough (single or list). Returned as the engine's string attr
    * map (lists comma-joined). */
  def rasterioAttrs(nodata: Option[Double],
                    scales: Seq[Double] = Seq(1.0),
                    offsets: Seq[Double] = Seq(0.0),
                    descriptions: Seq[String] = Seq.empty,
                    units: Seq[String] = Seq.empty): Map[String, String] = {
    val b = Map.newBuilder[String, String]
    nodata.foreach(v => b += ("_FillValue" -> v.toString))
    if (scales.distinct.size > 1) b += ("scales" -> scales.mkString(","))
    else scales.headOption.foreach(s => b += ("scale_factor" -> s.toString))
    if (offsets.distinct.size > 1) b += ("offsets" -> offsets.mkString(","))
    else offsets.headOption.foreach(o => b += ("add_offset" -> o.toString))
    // truthiness gate like the reference's `if any(riods.descriptions)`
    // (_io.py:688): a band list of all-empty strings emits NO long_name, and
    // null entries render as empty strings, not the text "null" (ADVICE r3)
    if (descriptions.exists(d => d != null && d.nonEmpty)) {
      val ds = descriptions.map(d => if (d == null) "" else d)
      if (ds.distinct.size == 1) b += ("long_name" -> ds.head)
      else b += ("long_name" -> ds.mkString(","))
    }
    if (units.exists(u => u != null && u.nonEmpty)) {
      if (units.size == 1) b += ("units" -> units.head)
      else b += ("units" -> units.mkString(","))
    }
    b.result()
  }

  /** write_rpcs: store the RPC dict as JSON (rioxarray.py:1066-1113 — RPC CRS
    * is always EPSG:4326 per the public convention, rioxarray.py:1098). */
  def writeRpcs(r: Raster, rpc: Rpc): Raster =
    r.copy(grid = r.grid.copy(attrs = r.grid.attrs + ("rpcs" -> rpc.toJson)))

  /** get_rpcs (rioxarray.py:1115-1134). */
  def getRpcs(r: Raster): Option[Rpc] = r.grid.attrs.get("rpcs").map(Rpc.fromJson)
}
