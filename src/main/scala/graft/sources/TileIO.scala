package graft.sources

import graft.core._
import graft.ops.{PartitionOps, Raster}
import graft.ops.WarpOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tile-table storage — the engine's analog of the reference's raster
  * read/write (open_rasterio / to_raster, rioxarray/_io.py:1000-1328,
  * raster_writer.py:224-341).
  *
  * A raster persists as a parquet (production: Iceberg) table of fixed-size
  * tiles: (tile_row, tile_col, cell_id, hilbert, h, w, data: array<double>),
  * laid out in Hilbert order of the tile-centre cell so that bbox queries
  * read contiguous ranges and parquet row-group min/max stats prune on
  * (tile_row, tile_col) — the distributed analog of the reference's lazy
  * windowed reads (RasterioArrayWrapper). The grid sidecar is stored as a
  * one-row _grid table next to the tiles. */
object TileIO {

  val CellLevel = 12

  /** Pack a pixel raster into tiles and write. Pixels -> (tile, local idx)
    * -> array_sort'ed struct list -> positional data array; the shuffle is
    * the tile groupBy, then rows are range-partitioned in Hilbert order. */
  def writeTiles(r: Raster, path: String, tileSize: Int): Unit = {
    val g = r.grid
    require(g.width % tileSize == 0 && g.height % tileSize == 0,
      s"v1 packs full tiles only: ${g.width}x${g.height} vs tile $tileSize")
    val tiled = r.df
      .withColumn("tile_row", expr(s"row div $tileSize"))
      .withColumn("tile_col", expr(s"col div $tileSize"))
      .withColumn("local_idx",
        (col("row") % tileSize) * tileSize + (col("col") % tileSize))
      .groupBy("tile_row", "tile_col")
      .agg(array_sort(collect_list(struct(col("local_idx"), col("value").cast("double")
        .as("v")))).as("cells"))
      .withColumn("data", transform(col("cells"), c => c.getField("v")))
      .drop("cells")
      // positional decode in readPixels assumes a dense tile: a sparse input
      // (e.g. post-filter) would silently shift every later pixel to the
      // wrong (row,col). Guard the data column itself (an unreferenced
      // assert column would be pruned by Catalyst) and fail the write.
      .withColumn("data",
        when(size(col("data")) === tileSize * tileSize, col("data"))
          .otherwise(raise_error(concat(
            lit(s"writeTiles: sparse tile (expected ${tileSize * tileSize} pixels, got "),
            size(col("data")), lit(") at tile_row="), col("tile_row"),
            lit(" tile_col="), col("tile_col")))))
    // tile-centre cell id + hilbert layout
    val t = g.transform
    val cx = lit(t.a) * ((col("tile_col") * tileSize) + tileSize / 2.0) + lit(t.c)
    val cy = lit(t.e) * ((col("tile_row") * tileSize) + tileSize / 2.0) + lit(t.f)
    val (lon, lat) = WarpOps.inverseColumns(g.crs, cx, cy)
    val withCell = tiled
      .withColumn("cell_id", Cells.cellIdColumn(lon, lat, CellLevel))
      .withColumn("h", lit(tileSize)).withColumn("w", lit(tileSize))
    PartitionOps.hilbertLayout(withCell, "cell_id", CellLevel, 8)
      .write.mode("overwrite").parquet(path)
    // scan-planning index: ONE footer sweep at write time (production: the
    // ranges come from task commit messages, as in GraftWrite) so every
    // later scan plans from a single `_index` file instead of opening every
    // data-file footer on the driver
    val spark = r.df.sparkSession
    StoreLayout.buildIndexFromFooters(
      spark.sessionState.newHadoopConf(), new org.apache.hadoop.fs.Path(path))
    import spark.implicits._
    // attrs ride along as JSON so CF/Zarr exports, GCPs, RPCs and the
    // encoding chain survive the write/read roundtrip
    Seq((g.crs.key, g.transform.a, g.transform.b, g.transform.c,
         g.transform.d, g.transform.e, g.transform.f,
         g.width, g.height, g.nodata, tileSize, Json.obj(g.attrs), g.dtype))
      .toDF("crs", "ta", "tb", "tc", "td", "te", "tf", "width", "height", "nodata", "tile_size", "attrs", "dtype")
      .write.mode("overwrite").parquet(s"$path/_grid")
  }

  /** Dataset (multi-variable) tile sink — the reference's
    * RasterDataset.rio.to_raster loop (raster_writer.py:224-341, one band
    * per variable): same Hilbert-ordered packing keyed additionally by
    * `var_name`, written with var_name as a partition column so per-variable
    * reads prune whole directories. Input: (var_name, row, col, x, y,
    * value) + shared grid. */
  def writeDatasetTiles(ds: org.apache.spark.sql.DataFrame, g: GridRef,
                        path: String, tileSize: Int): Unit = {
    require(g.width % tileSize == 0 && g.height % tileSize == 0,
      s"v1 packs full tiles only: ${g.width}x${g.height} vs tile $tileSize")
    val tiled = ds
      .withColumn("tile_row", expr(s"row div $tileSize"))
      .withColumn("tile_col", expr(s"col div $tileSize"))
      .withColumn("local_idx",
        (col("row") % tileSize) * tileSize + (col("col") % tileSize))
      .groupBy("var_name", "tile_row", "tile_col")
      .agg(array_sort(collect_list(struct(col("local_idx"), col("value").cast("double")
        .as("v")))).as("cells"))
      .withColumn("data", transform(col("cells"), c => c.getField("v")))
      .drop("cells")
      .withColumn("data",
        when(size(col("data")) === tileSize * tileSize, col("data"))
          .otherwise(raise_error(concat(
            lit(s"writeDatasetTiles: sparse tile (expected ${tileSize * tileSize} pixels, got "),
            size(col("data")), lit(") at var="), col("var_name"),
            lit(" tile_row="), col("tile_row"), lit(" tile_col="), col("tile_col")))))
    val t = g.transform
    val cx = lit(t.a) * ((col("tile_col") * tileSize) + tileSize / 2.0) + lit(t.c)
    val cy = lit(t.e) * ((col("tile_row") * tileSize) + tileSize / 2.0) + lit(t.f)
    val (lon, lat) = WarpOps.inverseColumns(g.crs, cx, cy)
    val withCell = tiled
      .withColumn("cell_id", Cells.cellIdColumn(lon, lat, CellLevel))
      .withColumn("h", lit(tileSize)).withColumn("w", lit(tileSize))
    PartitionOps.hilbertLayout(withCell, "cell_id", CellLevel, 8)
      .write.mode("overwrite").partitionBy("var_name").parquet(path)
    val spark = ds.sparkSession
    StoreLayout.buildIndexFromFooters(
      spark.sessionState.newHadoopConf(), new org.apache.hadoop.fs.Path(path))
    import spark.implicits._
    // attrs ride along as JSON so CF/Zarr exports, GCPs, RPCs and the
    // encoding chain survive the write/read roundtrip
    Seq((g.crs.key, g.transform.a, g.transform.b, g.transform.c,
         g.transform.d, g.transform.e, g.transform.f,
         g.width, g.height, g.nodata, tileSize, Json.obj(g.attrs), g.dtype))
      .toDF("crs", "ta", "tb", "tc", "td", "te", "tf", "width", "height", "nodata", "tile_size", "attrs", "dtype")
      .write.mode("overwrite").parquet(s"$path/_grid")
  }

  /** Windowed multi-variable read; `variables` prunes partition directories
    * (partition filter on var_name reaches the file listing). */
  def readDatasetPixels(spark: SparkSession, path: String,
                        window: Option[PixelWindow] = None,
                        variables: Option[Seq[String]] = None):
      (org.apache.spark.sql.DataFrame, GridRef) = {
    val (g, ts) = readGrid(spark, path)
    val tiles0 = spark.read.parquet(dataDir(spark, path))
    val tiles1 = variables match {
      case Some(vs) => tiles0.filter(col("var_name").isin(vs: _*))
      case None => tiles0
    }
    val pruned = window match {
      case Some(w) => tiles1.filter(
        col("tile_row") >= w.rowStart / ts && col("tile_row") <= (w.rowStop - 1) / ts &&
        col("tile_col") >= w.colStart / ts && col("tile_col") <= (w.colStop - 1) / ts)
      case None => tiles1
    }
    val px = pruned
      .select(col("var_name"), col("tile_row"), col("tile_col"),
        posexplode(col("data")).as(Seq("i", "value")))
      .withColumn("row", col("tile_row") * ts + expr(s"i div $ts"))
      .withColumn("col", col("tile_col") * ts + col("i") % ts)
      .filter(col("row") < g.height && col("col") < g.width)
      .withColumn("x", Synth.xColumn(g, col("col")))
      .withColumn("y", Synth.yColumn(g, col("row")))
      .withColumn("value", col("value").cast("long"))
      .select("var_name", "row", "col", "x", "y", "value")
    val filtered = window match {
      case Some(w) => px.filter(col("row") >= w.rowStart && col("row") < w.rowStop &&
                                col("col") >= w.colStart && col("col") < w.colStop)
      case None => px
    }
    (filtered, g)
  }

  /** Live data directory of a store: the newest committed generation dir
    * for DSv2-written stores (StoreLayout marker protocol), the root for
    * legacy TileIO layouts. */
  def dataDir(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    StoreLayout.dataDir(fs, p).toString
  }

  def readGrid(spark: SparkSession, path: String): (GridRef, Int) = {
    val df = spark.read.parquet(s"${dataDir(spark, path)}/_grid")
    val r = df.collect()(0)
    // attrs column is optional (pre-round-3 stores; the DSv2 sidecar adds it
    // at its own schema version)
    val attrs =
      if (df.schema.fieldNames.contains("attrs") && r.getAs[String]("attrs") != null)
        Json.toMap(r.getAs[String]("attrs"))
      else Map.empty[String, String]
    // dtype column is optional (pre-round-4 stores carry implicit float64)
    val dtype =
      if (df.schema.fieldNames.contains("dtype") && r.getAs[String]("dtype") != null)
        r.getAs[String]("dtype")
      else "float64"
    (GridRef(Crs.parse(r.getAs[String]("crs")),
      Affine(r.getAs[Double]("ta"), r.getAs[Double]("tb"), r.getAs[Double]("tc"),
             r.getAs[Double]("td"), r.getAs[Double]("te"), r.getAs[Double]("tf")),
      r.getAs[Int]("width"), r.getAs[Int]("height"), r.getAs[Double]("nodata"),
      attrs, dtype),
     r.getAs[Int]("tile_size"))
  }

  /** Lazy windowed read: only tiles intersecting `window` are scanned (the
    * tile_row/tile_col predicates reach the parquet row-group stats), then
    * tiles explode back to pixels clipped to the window. */
  def readPixels(spark: SparkSession, path: String,
                 window: Option[PixelWindow] = None): Raster = {
    val (g, ts) = readGrid(spark, path)
    val tiles = spark.read.parquet(dataDir(spark, path))
    val pruned = window match {
      case Some(w) => tiles.filter(
        col("tile_row") >= w.rowStart / ts && col("tile_row") <= (w.rowStop - 1) / ts &&
        col("tile_col") >= w.colStart / ts && col("tile_col") <= (w.colStop - 1) / ts)
      case None => tiles
    }
    val px = pruned
      .select(col("tile_row"), col("tile_col"), posexplode(col("data")).as(Seq("i", "value")))
      .withColumn("row", col("tile_row") * ts + expr(s"i div $ts"))
      .withColumn("col", col("tile_col") * ts + col("i") % ts)
      .filter(col("row") < g.height && col("col") < g.width)
      .withColumn("x", Synth.xColumn(g, col("col")))
      .withColumn("y", Synth.yColumn(g, col("row")))
      .withColumn("value", col("value").cast("long"))
      .select("row", "col", "x", "y", "value")
    val filtered = window match {
      case Some(w) => px.filter(col("row") >= w.rowStart && col("row") < w.rowStop &&
                                col("col") >= w.colStart && col("col") < w.colStop)
      case None => px
    }
    Raster(filtered, g)
  }
}
