package graft.docs

import graft.core._
import graft.ops.WarpOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The interleaved text+media document model (BASELINE.json input_hint):
  *   docs(doc_id, spans: array<struct<kind, text, media_ref, offset>>)
  * with the per-row invariant that the span sequence (kind, text, media_ref,
  * order) is preserved exactly through every operator.
  *
  * Span arrays are carried as opaque nested values — operators derive join
  * keys (geometry, media refs) into *separate* columns and never
  * explode-and-regroup the array itself (SURVEY.md §7.4 hard-part 6), so
  * shuffles cannot reorder spans.
  *
  * Geometry inside text spans is encoded in integer pixel space
  * ("geom:PXPOLY(c0 r0 c1 r1)" over the MODIS grid) so both engines format
  * identical strings; the cover operator maps pixels -> planar -> lon/lat ->
  * quadtree cells with the same Column arithmetic as the raster ops. */
object DocOps {

  val TileGridN = 8 // MODIS 200x200 split as 8x8 tiles of 25px

  /** Build the interleaved spans table from the flat documents table,
    * deterministically: 5 spans per doc —
    *   0: text  (first 40 chars)
    *   1: media (tile_<(doc_id*31) % 64>)
    *   2: text  ("geom:PXPOLY(c0 r0 c1 r1)" 12x12-pixel box from doc_id)
    *   3: media (tile_<(doc_id*17 + 5) % 64>)
    *   4: text  (rest of the text)
    */
  def interleave(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val c0 = (id * 7) % 180
    val r0 = (id * 13) % 180
    val geomTxt = concat(lit("geom:PXPOLY("), c0.cast("string"), lit(" "),
      r0.cast("string"), lit(" "), (c0 + 12).cast("string"), lit(" "),
      (r0 + 12).cast("string"), lit(")"))
    val span = (kind: String, text: Column, ref: Column, off: Int) =>
      struct(lit(kind).as("kind"), text.as("text"), ref.as("media_ref"),
             lit(off).cast("int").as("offset"))
    // all non-text columns (ts, lang, ...) pass through untouched, so the
    // op composes with streaming sources without extra joins
    docs.withColumn("spans", array(
      span("text", substring(col("text"), 1, 40), lit(""), 0),
      span("media", lit(""), concat(lit("tile_"), ((id * 31) % 64).cast("string")), 1),
      span("text", geomTxt, lit(""), 2),
      span("media", lit(""), concat(lit("tile_"), ((id * 17 + 5) % 64).cast("string")), 3),
      span("text", substring(col("text"), 41, 1000000), lit(""), 4)
    )).drop("text")
  }

  /** Flat (exploded, position-preserving) view of the spans — the shape the
    * oracle reproduces; pos comes from posexplode so sequence equality is
    * what is being checked. */
  def flatSpans(docsSpans: DataFrame): DataFrame =
    docsSpans.select(col("doc_id"),
        posexplode(col("spans")).as(Seq("pos", "s")))
      .select(col("doc_id"), col("pos"),
        col("s.kind").as("kind"), col("s.text").as("text"),
        col("s.media_ref").as("media_ref"), col("s.offset").as("offset"))

  /** SQL mirror of interleave+flatten: five UNION ALL arms per position. */
  def flatSpansSql(table: String): String = {
    val c0 = "(doc_id * 7) % 180"; val r0 = "(doc_id * 13) % 180"
    val geomTxt = s"'geom:PXPOLY(' || CAST($c0 AS VARCHAR) || ' ' || CAST($r0 AS VARCHAR) || " +
      s"' ' || CAST($c0 + 12 AS VARCHAR) || ' ' || CAST($r0 + 12 AS VARCHAR) || ')'"
    s"""SELECT doc_id, pos, kind, text, media_ref, "offset" FROM (
       |  SELECT doc_id, 0 AS pos, 'text' AS kind, substr(text, 1, 40) AS text, '' AS media_ref, 0 AS "offset" FROM $table
       |  UNION ALL SELECT doc_id, 1, 'media', '', 'tile_' || CAST((doc_id * 31) % 64 AS VARCHAR), 1 FROM $table
       |  UNION ALL SELECT doc_id, 2, 'text', $geomTxt, '', 2 FROM $table
       |  UNION ALL SELECT doc_id, 3, 'media', '', 'tile_' || CAST((doc_id * 17 + 5) % 64 AS VARCHAR), 3 FROM $table
       |  UNION ALL SELECT doc_id, 4, 'text', substr(text, 41, 1000000), '', 4 FROM $table)
       |ORDER BY doc_id, pos""".stripMargin
  }

  /** doc -> tile assignment via media_ref (plain equi-join on the derived
    * ref column; spans array untouched). Output one row per (doc, media
    * span): doc_id, tile_id, tile_row, tile_col. */
  def tileAssignments(docsSpans: DataFrame): DataFrame = {
    val refs = docsSpans.select(col("doc_id"),
        explode(filter(col("spans"), s => s.getField("kind") === "media")).as("s"))
      .select(col("doc_id"), col("s.media_ref").as("media_ref"),
              col("s.offset").as("offset"))
    refs
      .withColumn("tile_id", regexp_extract(col("media_ref"), "tile_(\\d+)", 1).cast("long"))
      .withColumn("tile_row", expr(s"tile_id div $TileGridN"))
      .withColumn("tile_col", col("tile_id") % TileGridN)
      .select("doc_id", "offset", "tile_id", "tile_row", "tile_col")
  }

  def tileAssignmentsSql(table: String): String =
    s"""SELECT doc_id, "offset", tile_id, tile_id // $TileGridN AS tile_row,
       |  tile_id % $TileGridN AS tile_col
       |FROM (
       |  SELECT doc_id, 1 AS "offset", (doc_id * 31) % 64 AS tile_id FROM $table
       |  UNION ALL SELECT doc_id, 3, (doc_id * 17 + 5) % 64 FROM $table)
       |ORDER BY doc_id, "offset"""".stripMargin

  /** Quadtree cell cover of each document's geometry span: parse the
    * integer pixel box, map the pixel corners through the grid affine and
    * the (sinusoidal) inverse projection to lon/lat, enumerate the level-L
    * cell rectangle. Pure Column arithmetic + one explode; the output
    * (doc_id, cell_id) is the spatial-join key set for doc x tile joins. */
  def geomCellCover(docsSpans: DataFrame, grid: GridRef, level: Int): DataFrame = {
    val geomSpan = element_at(filter(col("spans"),
      s => s.getField("text").startsWith("geom:")), 1).getField("text")
    // single split instead of four regexp extractions (hot path at 10^12 docs)
    val px = docsSpans.select(col("doc_id"), geomSpan.as("g"))
      .withColumn("nums", split(
        substring_index(substring_index(col("g"), "(", -1), ")", 1), " "))
      .withColumn("c0", element_at(col("nums"), 1).cast("double"))
      .withColumn("r0", element_at(col("nums"), 2).cast("double"))
      .withColumn("c1", element_at(col("nums"), 3).cast("double"))
      .withColumn("r1", element_at(col("nums"), 4).cast("double"))
    val t = grid.transform
    // pixel box corners -> planar; y descends with row so (r0 -> maxy).
    // lon depends on BOTH x and y under sinusoidal, so the lon range is the
    // min/max over all four corners (complete-cover requirement).
    val xMin = lit(t.a) * col("c0") + lit(t.c)
    val xMax = lit(t.a) * col("c1") + lit(t.c)
    val yMax = lit(t.e) * col("r0") + lit(t.f)
    val yMin = lit(t.e) * col("r1") + lit(t.f)
    val corners = Seq((xMin, yMin), (xMin, yMax), (xMax, yMin), (xMax, yMax))
      .map { case (x, y) => WarpOps.inverseColumns(grid.crs, x, y) }
    val lonMin = least(corners.map(_._1): _*)
    val lonMax = greatest(corners.map(_._1): _*)
    val latMin = least(corners.map(_._2): _*)
    val latMax = greatest(corners.map(_._2): _*)
    val ix0 = Cells.ixColumn(lonMin, level); val ix1 = Cells.ixColumn(lonMax, level)
    val iy0 = Cells.iyColumn(latMin, level); val iy1 = Cells.iyColumn(latMax, level)
    px.select(col("doc_id"), ix0.as("ix0"), ix1.as("ix1"), iy0.as("iy0"), iy1.as("iy1"))
      .select(col("doc_id"), explode(sequence(col("iy0"), col("iy1"))).as("iy"),
              col("ix0"), col("ix1"))
      .select(col("doc_id"), col("iy"), explode(sequence(col("ix0"), col("ix1"))).as("ix"))
      .select(col("doc_id"),
        shiftleft(Cells.mortonColumn(col("ix"), col("iy"), level), 5)
          .bitwiseOR(lit(level.toLong)).as("cell_id"))
  }

  /** S2-style cell cover of each doc geometry (the north_rule's "H3 AND S2
    * cell covers"): the lon/lat bbox is lattice-sampled `samples` x
    * `samples` and each sample's spherical cell collected DISTINCT. The
    * cover is complete when the lattice step is at most half the minimum
    * cell angular extent (~38.2°/2^level) — callers size (level, samples)
    * from the maximum geometry extent; the fixture uses level 7 / 9 samples
    * for ≤0.8° boxes (step ≤0.1° vs half-min-cell 0.15°). A sliver-free
    * subdivision cover is the production refinement; the lattice keeps the
    * DuckDB oracle exactly mirrorable. */
  def geomCellCoverS2(docsSpans: DataFrame, grid: GridRef, level: Int,
                      samples: Int = 9): DataFrame = {
    val geomSpan = element_at(filter(col("spans"),
      s => s.getField("text").startsWith("geom:")), 1).getField("text")
    val px = docsSpans.select(col("doc_id"), geomSpan.as("g"))
      .withColumn("nums", split(
        substring_index(substring_index(col("g"), "(", -1), ")", 1), " "))
      .withColumn("c0", element_at(col("nums"), 1).cast("double"))
      .withColumn("r0", element_at(col("nums"), 2).cast("double"))
      .withColumn("c1", element_at(col("nums"), 3).cast("double"))
      .withColumn("r1", element_at(col("nums"), 4).cast("double"))
    val t = grid.transform
    val xMin = lit(t.a) * col("c0") + lit(t.c)
    val xMax = lit(t.a) * col("c1") + lit(t.c)
    val yMax = lit(t.e) * col("r0") + lit(t.f)
    val yMin = lit(t.e) * col("r1") + lit(t.f)
    val corners = Seq((xMin, yMin), (xMin, yMax), (xMax, yMin), (xMax, yMax))
      .map { case (x, y) => WarpOps.inverseColumns(grid.crs, x, y) }
    val lonMin = least(corners.map(_._1): _*)
    val lonMax = greatest(corners.map(_._1): _*)
    val latMin = least(corners.map(_._2): _*)
    val latMax = greatest(corners.map(_._2): _*)
    val k = (samples - 1).toDouble
    val lattice = px
      .select(col("doc_id"), lonMin.as("lon_min"), lonMax.as("lon_max"),
              latMin.as("lat_min"), latMax.as("lat_max"))
      .select(col("*"), explode(sequence(lit(0), lit(samples - 1))).as("i"))
      .select(col("*"), explode(sequence(lit(0), lit(samples - 1))).as("j"))
      .select(col("doc_id"),
        (col("lon_min") + (col("lon_max") - col("lon_min")) *
          (col("i").cast("double") / lit(k))).as("lon"),
        (col("lat_min") + (col("lat_max") - col("lat_min")) *
          (col("j").cast("double") / lit(k))).as("lat"))
    lattice
      .select(col("doc_id"), Cells.s2CellIdColumn(col("lon"), col("lat"), level).as("cell_id"))
      .distinct()
  }

  def geomCellCoverS2Sql(table: String, grid: GridRef, level: Int,
                         samples: Int = 9): String = {
    val t = grid.transform
    val (r, lon0) = grid.crs.proj match {
      case Sinusoidal(rr, l0) => (rr, l0)
      case p => throw new IllegalArgumentException(s"oracle supports sinusoidal, got $p")
    }
    def inv(xE: String, yE: String): (String, String) = {
      val lat = s"(($yE) / $r) / ${WarpOps.D2R}"
      val lon = s"(($xE) / ($r * COS(($yE) / $r))) / ${WarpOps.D2R} + $lon0"
      (lon, lat)
    }
    val c0 = s"CAST((doc_id * 7) % 180 AS DOUBLE)"
    val r0 = s"CAST((doc_id * 13) % 180 AS DOUBLE)"
    val c1 = s"($c0 + 12)"; val r1 = s"($r0 + 12)"
    val xMin = s"${t.a} * $c0 + ${t.c}"; val xMax = s"${t.a} * $c1 + ${t.c}"
    val yMax = s"${t.e} * $r0 + ${t.f}"; val yMin = s"${t.e} * $r1 + ${t.f}"
    val corners = Seq((xMin, yMin), (xMin, yMax), (xMax, yMin), (xMax, yMax)).map((inv _).tupled)
    val lonMin = s"LEAST(${corners.map(_._1).mkString(", ")})"
    val lonMax = s"GREATEST(${corners.map(_._1).mkString(", ")})"
    val latMin = s"LEAST(${corners.map(_._2).mkString(", ")})"
    val latMax = s"GREATEST(${corners.map(_._2).mkString(", ")})"
    val k = (samples - 1).toDouble
    val lattice =
      s"""SELECT doc_id,
         |  lon_min + (lon_max - lon_min) * (CAST(i.i AS DOUBLE) / $k) AS lon,
         |  lat_min + (lat_max - lat_min) * (CAST(j.j AS DOUBLE) / $k) AS lat
         |FROM (SELECT doc_id, $lonMin AS lon_min, $lonMax AS lon_max,
         |             $latMin AS lat_min, $latMax AS lat_max FROM $table) b,
         |     generate_series(0, ${samples - 1}) i(i),
         |     generate_series(0, ${samples - 1}) j(j)""".stripMargin
    s"""SELECT DISTINCT doc_id, cell_id FROM (
       |${Cells.s2CellIdSql(lattice, "lon", "lat", level, Seq("doc_id"))}
       |) ORDER BY doc_id, cell_id""".stripMargin
  }

  def geomCellCoverSql(table: String, grid: GridRef, level: Int): String = {
    val t = grid.transform
    val (r, lon0) = grid.crs.proj match {
      case Sinusoidal(rr, l0) => (rr, l0)
      case p => throw new IllegalArgumentException(s"oracle supports sinusoidal, got $p")
    }
    def inv(xE: String, yE: String): (String, String) = {
      val lat = s"(($yE) / $r) / ${WarpOps.D2R}"
      val lon = s"(($xE) / ($r * COS(($yE) / $r))) / ${WarpOps.D2R} + $lon0"
      (lon, lat)
    }
    val c0 = s"CAST((doc_id * 7) % 180 AS DOUBLE)"
    val r0 = s"CAST((doc_id * 13) % 180 AS DOUBLE)"
    val c1 = s"($c0 + 12)"; val r1 = s"($r0 + 12)"
    val xMin = s"${t.a} * $c0 + ${t.c}"; val xMax = s"${t.a} * $c1 + ${t.c}"
    val yMax = s"${t.e} * $r0 + ${t.f}"; val yMin = s"${t.e} * $r1 + ${t.f}"
    val corners = Seq((xMin, yMin), (xMin, yMax), (xMax, yMin), (xMax, yMax)).map((inv _).tupled)
    val lonMin = s"LEAST(${corners.map(_._1).mkString(", ")})"
    val lonMax = s"GREATEST(${corners.map(_._1).mkString(", ")})"
    val latMin = s"LEAST(${corners.map(_._2).mkString(", ")})"
    val latMax = s"GREATEST(${corners.map(_._2).mkString(", ")})"
    val n = 1L << level
    def ixE(lonE: String) =
      s"LEAST(${n - 1}, GREATEST(0, CAST(FLOOR((($lonE) + 180.0)/360.0*$n) AS BIGINT)))"
    def iyE(latE: String) =
      s"LEAST(${n - 1}, GREATEST(0, CAST(FLOOR((($latE) + 90.0)/180.0*$n) AS BIGINT)))"
    val morton = (0 until level).flatMap { b =>
      Seq(s"((ix & ${1L << b}) << $b)", s"((iy & ${1L << b}) << ${b + 1})")
    }.mkString(" | ")
    s"""WITH px AS (
       |  SELECT doc_id, ${ixE(lonMin)} AS ix0, ${ixE(lonMax)} AS ix1,
       |         ${iyE(latMin)} AS iy0, ${iyE(latMax)} AS iy1
       |  FROM $table),
       |cells AS (
       |  SELECT doc_id, unnest(generate_series(iy0, iy1)) AS iy, ix0, ix1 FROM px),
       |cells2 AS (
       |  SELECT doc_id, iy, unnest(generate_series(ix0, ix1)) AS ix FROM cells)
       |SELECT doc_id, (($morton) << 5) | $level AS cell_id
       |FROM cells2 ORDER BY doc_id, cell_id""".stripMargin
  }

  /** SQL mirror of [[spatialTileAssignments]]: tile centre cells computed
    * with the same arithmetic, joined to the cover. */
  def spatialTileAssignmentsSql(table: String, grid: GridRef, level: Int): String = {
    val t = grid.transform
    val (r, lon0) = grid.crs.proj match {
      case Sinusoidal(rr, l0) => (rr, l0)
      case p => throw new IllegalArgumentException(s"oracle supports sinusoidal, got $p")
    }
    val tilePx = grid.width / TileGridN
    val pr = s"(CAST(tid // $TileGridN AS DOUBLE) * $tilePx + ${tilePx / 2.0})"
    val pc = s"(CAST(tid % $TileGridN AS DOUBLE) * $tilePx + ${tilePx / 2.0})"
    val tx = s"(${t.a} * $pc + ${t.c})"
    val ty = s"(${t.e} * $pr + ${t.f})"
    val lat = s"(($ty) / $r) / ${graft.ops.WarpOps.D2R}"
    val lon = s"(($tx) / ($r * COS(($ty) / $r))) / ${graft.ops.WarpOps.D2R} + $lon0"
    s"""WITH cover AS (${geomCellCoverSql(table, grid, level)}),
       |tiles AS (
       |  SELECT tid AS tile_id, ${Cells.cellIdSql(lon, lat, level)} AS cell_id
       |  FROM (SELECT CAST(i AS BIGINT) AS tid
       |        FROM generate_series(0, ${TileGridN * TileGridN - 1}) t(i)))
       |SELECT c.doc_id, t.tile_id, c.cell_id
       |FROM cover c JOIN tiles t ON c.cell_id = t.cell_id
       |ORDER BY doc_id, tile_id""".stripMargin
  }

  /** Spatial doc x tile join: docs' geometry cell covers joined to tile
    * centre cells at the same level -> (doc_id, tile_id) assignments. The
    * tile side is tiny metadata here; at corpus scale both sides are
    * partitioned by Hilbert ranges of cell_id and the join co-locates. */
  def spatialTileAssignments(docsSpans: DataFrame, grid: GridRef, level: Int): DataFrame = {
    val spark = docsSpans.sparkSession
    val cover = geomCellCover(docsSpans, grid, level)
    val tilePx = grid.width / TileGridN
    val tiles = spark.range(TileGridN.toLong * TileGridN)
      .select(col("id").as("tile_id"),
        (expr(s"id div $TileGridN") * tilePx + tilePx / 2.0).as("prow"),
        (col("id") % TileGridN * tilePx + tilePx / 2.0).as("pcol"))
    val t = grid.transform
    val tx = lit(t.a) * col("pcol") + lit(t.c)
    val ty = lit(t.e) * col("prow") + lit(t.f)
    val (lon, lat) = WarpOps.inverseColumns(grid.crs, tx, ty)
    val tileCells = tiles.select(col("tile_id"),
      Cells.cellIdColumn(lon, lat, level).as("cell_id"))
    // (doc_id, tile_id, cell_id) is already unique: cover cells are unique
    // per doc and each tile contributes exactly one centre cell — no
    // distinct needed, so the join output flows straight into downstream
    // aggregates with no extra shuffle.
    cover.join(broadcast(tileCells), "cell_id")
      .select("doc_id", "tile_id", "cell_id")
  }
}
