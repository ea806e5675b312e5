package graft

import graft.core._
import graft.ops._
import Queries._

/** DuckDB oracle-SQL builders for the catalog in [[Queries]] — split out so
  * the query registry and its SQL mirrors stay independently reviewable
  * (each grows every round). Column names/types are aligned pairwise with
  * the Spark queries; the determinism rules (same literal text via
  * Double.toString, same op order, forced DOUBLE) are documented per
  * builder. */
object Oracles {
  private def px: String = Synth.pixelsSql(modis)

  /** q_media_features oracle WITHOUT decoding bytes: the payloads are
    * synthesized from pure integer formulas (MediaOps.synthesize), so
    * DuckDB recomputes every feature from media_id alone — which gates the
    * REAL pipeline (binary BMP/WAV encode -> parse -> feature kernel)
    * against an independent arithmetic model: any codec bug breaks the
    * hash match. */
  def mediaFeatures: String =
    s"""WITH m AS (SELECT i AS media_id FROM generate_series(0, 499) t(i)),
       |imgpx AS (
       |  SELECT m.media_id, (16 + m.media_id % 16) AS w, (16 + m.media_id % 12) AS h, g.i
       |  FROM m, generate_series(0, 866) g(i)
       |  WHERE m.media_id % 2 = 0
       |    AND g.i < (16 + m.media_id % 16) * (16 + m.media_id % 12)),
       |img AS (
       |  SELECT media_id, 'image' AS kind,
       |    CAST(54 + ((w*3 + 3) // 4 * 4) * h AS INTEGER) AS n_bytes,
       |    CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       |    CAST(SUM(((media_id*31 + (i % w)*7 + (i // w)*13) % 16777216) * (i + 1)) AS BIGINT) AS checksum
       |  FROM imgpx GROUP BY media_id, w, h),
       |audpx AS (
       |  SELECT m.media_id, (256 + m.media_id % 128) AS ns, g.i
       |  FROM m, generate_series(0, 382) g(i)
       |  WHERE m.media_id % 2 = 1 AND g.i < (256 + m.media_id % 128)),
       |aud AS (
       |  SELECT media_id, 'audio' AS kind,
       |    CAST(44 + 2 * ns AS INTEGER) AS n_bytes,
       |    CAST(ns AS INTEGER) AS width, CAST(1 AS INTEGER) AS height,
       |    CAST(SUM(((media_id*131 + i*17) % 8192 - 4096) * (i + 1)) AS BIGINT) AS checksum
       |  FROM audpx GROUP BY media_id, ns)
       |SELECT media_id, kind, n_bytes, width, height, checksum FROM img
       |UNION ALL
       |SELECT media_id, kind, n_bytes, width, height, checksum FROM aud
       |ORDER BY media_id""".stripMargin

  /** DuckDB re-statement of GridRef.windowFromBounds (floor/ceil, clamp). */
  private def winSql(g: GridRef, b: Bounds): String = {
    val t = g.transform
    s"""SELECT GREATEST(0, CAST(FLOOR((${b.minx} - ${t.c})/${t.a}) AS BIGINT)) AS cs,
       |  GREATEST(0, CAST(CEIL((${b.maxx} - ${t.c})/${t.a}) AS BIGINT)) AS cstop,
       |  GREATEST(0, CAST(FLOOR((${b.maxy} - ${t.f})/${t.e}) AS BIGINT)) AS rs,
       |  GREATEST(0, CAST(CEIL((${b.miny} - ${t.f})/${t.e}) AS BIGINT)) AS rstop""".stripMargin
  }

  def clipBox(b: Bounds): String =
    s"""WITH px AS ($px), win AS (${winSql(modis, b)})
       |SELECT px.row - win.rs AS row, px.col - win.cs AS col, x, y, value
       |FROM px, win
       |WHERE px.row >= win.rs AND px.row < LEAST(win.rstop, ${modis.height})
       |  AND px.col >= win.cs AND px.col < LEAST(win.cstop, ${modis.width})
       |ORDER BY row, col""".stripMargin

  def iselWindow(w: PixelWindow): String =
    s"""WITH px AS ($px)
       |SELECT row - ${w.rowStart} AS row, col - ${w.colStart} AS col, x, y, value
       |FROM px
       |WHERE row >= ${w.rowStart} AND row < ${w.rowStop}
       |  AND col >= ${w.colStart} AND col < ${w.colStop}
       |ORDER BY row, col""".stripMargin

  /** pad_box oracle: the padded raster re-generated directly on the new
    * grid; original-region pixels keep source values, ring is nodata. */
  def padBox(newGrid: GridRef, rowsBefore: Long, colsBefore: Long,
             innerH: Int, innerW: Int, innerRow0: Long, innerCol0: Long): String = {
    val t = newGrid.transform
    val srcRow = s"row - $rowsBefore + $innerRow0"
    val srcCol = s"col - $colsBefore + $innerCol0"
    s"""SELECT row, col,
       |  ${t.a}*(CAST(col AS DOUBLE) + 0.5) + ${t.c} AS x,
       |  ${t.e}*(CAST(row AS DOUBLE) + 0.5) + ${t.f} AS y,
       |  CASE WHEN row >= $rowsBefore AND row < ${rowsBefore + innerH}
       |        AND col >= $colsBefore AND col < ${colsBefore + innerW}
       |       THEN ${Synth.valueSql(newGrid.nodata.toLong, rowE = srcRow, colE = srcCol)}
       |       ELSE ${newGrid.nodata.toLong} END AS value
       |FROM (SELECT CAST(i // ${newGrid.width} AS BIGINT) AS row,
       |             CAST(i % ${newGrid.width} AS BIGINT) AS col
       |      FROM generate_series(0, ${newGrid.width.toLong * newGrid.height - 1}) g(i)) t
       |ORDER BY row, col""".stripMargin
  }

  private def pxSrcSql: String = s"SELECT row, col, value FROM ($px)"

  def merge(method: String): String = {
    val dst = MergeOps.unionGrid(Seq(modis, modisB))
    val srcA = pxSrcSql
    val srcB = s"SELECT row + 30 AS row, col + 50 AS col, value FROM (${Synth.pixelsSql(modisB, seedB)})"
    MergeOps.mergeSql(dst, Seq(srcA, srcB), method)
  }

  def reprojectNearest: String =
    WarpOps.nearestSinuFromLonLatSql(modis, reprojDst, pxSrcSql)

  def reprojectMatch: String =
    WarpOps.nearestSinuFromTmSql(modis, Synth.matchUtmGrid, pxSrcSql)

  def reprojectBilinear: String =
    WarpOps.bilinearSinuFromLonLatSql(modis, reprojDst, pxSrcSql)

  def reprojectCubic: String =
    WarpOps.cubicSinuFromLonLatSql(modis, reprojDst, pxSrcSql)
  def reprojectCubicSpline: String =
    WarpOps.cubicSplineSinuFromLonLatSql(modis, reprojDst, pxSrcSql)

  def reprojectRotToSq: String = WarpOps.nearestAffineSql(rotatedGrid, squaredGrid,
    s"SELECT row, col, value FROM (${Synth.pixelsFullSql(rotatedGrid)})")
  def reprojectSqToRot: String = WarpOps.nearestAffineSql(squaredGrid, rotatedGrid,
    s"SELECT row, col, value FROM (${Synth.pixelsFullSql(squaredGrid)})")

  def reprojectDs: String =
    WarpOps.nearestSinuDatasetSql(modis, reprojDst,
      dsVarSeeds.map { case (v, seed) =>
        v -> s"SELECT row, col, value FROM (${Synth.pixelsSql(modis, seed)})"
      })

  def reprojectRes: String =
    WarpOps.nearestSinuFromLonLatSql(modis, reprojResDst, pxSrcSql)
  def reprojectShape: String =
    WarpOps.nearestSinuFromLonLatSql(modis, reprojShapeDst, pxSrcSql)

  def mergeRes: String = {
    val dst = MergeOps.unionGrid(Seq(modis, modisB), Some(mergeResRes),
                                 Some(mergeResBounds))
    val srcs = Seq(modis -> pxSrcSql,
                   modisB -> s"SELECT row, col, value FROM (${Synth.pixelsSql(modisB, seedB)})")
      .map { case (g, sql) =>
        WarpOps.inverseSampleNearestSql(g, dst, dst.windowFromBounds(g.bounds), sql)
      }
    MergeOps.mergeSql(dst, srcs, "first")
  }

  def reprojectGcps: String = {
    val h = Geoloc.fitAuto(gcpFixture)
    val dst = Geoloc.suggestedWarpOutputGcp(modis.width, modis.height, h,
                                            gcpCrs, gcpCrs, modis.nodata)
    WarpOps.gcpNearestSql(dst, h.invert, pxSrcSql)
  }

  def reprojectGcpsAffine: String = {
    val h = Geoloc.fitAuto(gcpAffineFixture)
    val dst = Geoloc.suggestedWarpOutputGcp(modis.width, modis.height, h,
                                            gcpCrs, gcpCrs, modis.nodata)
    WarpOps.gcpNearestSql(dst, h.invert, pxSrcSql)
  }

  def reprojectGcpsPoly(order: Int): String = {
    val fwd = Geoloc.fitPoly(gcpPolyFixture, order)
    val inv = Geoloc.fitPoly(gcpPolyFixture, order, swap = true)
    val dst = Geoloc.suggestedWarpOutputGcpFwd(modis.width, modis.height,
      (c, r) => fwd(c, r), gcpCrs, gcpCrs, modis.nodata)
    WarpOps.gcpPolyNearestSql(dst, inv, pxSrcSql)
  }

  def reprojectRpcs: String =
    WarpOps.rpcNearestSql(rpcDst, rpcFixture, 0.0, pxSrcSql)

  def reprojectGeoloc: String = {
    val (r, lon0) = (6371007.181, 0.0)
    val latE = s"(y / $r) / ${WarpOps.D2R}"
    val lonE = s"(x / ($r * COS(y / $r))) / ${WarpOps.D2R} + $lon0"
    val d = WarpOps.dlit(2.0e-4)
    val src =
      s"""SELECT row, col,
         |  ($lonE) + CAST((row * 7 + col * 11) % 13 - 6 AS DOUBLE) * $d AS lon,
         |  ($latE) + CAST((row * 5 + col * 3) % 11 - 5 AS DOUBLE) * $d AS lat,
         |  value
         |FROM (${Synth.pixelsSql(modis)})""".stripMargin
    WarpOps.geolocNearestSql(src, reprojDst)
  }

  def maskScale: String =
    MetadataOps.maskAndScaleSql(px, modis.nodata.toLong, msScale, msOffset)

  def mergeDatasets(method: String): String = {
    val dst = MergeOps.unionGrid(Seq(modis, modisB))
    def varSql(seeds: Seq[(String, Long)], g: GridRef, ro: Long, co: Long): String =
      seeds.map { case (v, s) =>
        s"SELECT '$v' AS var_name, row + $ro AS row, col + $co AS col, value FROM (${Synth.pixelsSql(g, s)})"
      }.mkString("\nUNION ALL\n")
    MergeOps.mergeDatasetsSql(dst,
      Seq(varSql(dsVarSeeds, modis, 0, 0), varSql(dsVarSeedsB, modisB, 30, 50)),
      dsVarNames, method)
  }

  def resampleAverage: String = WarpOps.resampleAverageSql(modis, 4, pxSrcSql)
  def resampleDown(method: String): String =
    WarpOps.resampleDownSql(modis, 4, method, s"SELECT row, col, value FROM ($px)")
  def resampleMode: String =
    WarpOps.resampleModeSql(modis, 4, s"SELECT row, col, value FROM ($px)")
  def resampleLanczos: String = WarpOps.upsampleLanczosSql(modis, 2, pxSrcSql)
  def resampleGauss: String = WarpOps.resampleGaussSql(modis, pxSrcSql)

  def clipGeomDrop: String = {
    val contains = VectorOps.containsSql(clipGeom, "px.x", "px.y")
    val containsI = VectorOps.containsSql(clipGeom, "i.x", "i.y")
    s"""WITH px AS ($px),
       |ext AS (SELECT min(i.row) AS r0, max(i.row) AS r1,
       |               min(i.col) AS c0, max(i.col) AS c1
       |        FROM px i WHERE $containsI)
       |SELECT px.row - ext.r0 AS row, px.col - ext.c0 AS col, px.x, px.y,
       |  CASE WHEN $contains THEN px.value ELSE ${modis.nodata.toLong} END AS value
       |FROM px, ext
       |WHERE px.row >= ext.r0 AND px.row <= ext.r1
       |  AND px.col >= ext.c0 AND px.col <= ext.c1
       |ORDER BY row, col""".stripMargin
  }

  def clipGeomInvert: String = {
    val contains = VectorOps.containsSql(clipGeom, "px.x", "px.y")
    s"""WITH px AS ($px)
       |SELECT px.row, px.col, px.x, px.y,
       |  CASE WHEN NOT ($contains) THEN px.value ELSE ${modis.nodata.toLong} END AS value
       |FROM px ORDER BY row, col""".stripMargin
  }

  def clipGeomAllTouched: String = {
    val hx = math.abs(modis.resX) / 2.0; val hy = math.abs(modis.resY) / 2.0
    val touches = VectorOps.touchesSql(clipGeom, "px.x", "px.y", hx, hy)
    val touchesI = VectorOps.touchesSql(clipGeom, "i.x", "i.y", hx, hy)
    s"""WITH px AS ($px),
       |ext AS (SELECT min(i.row) AS r0, max(i.row) AS r1,
       |               min(i.col) AS c0, max(i.col) AS c1
       |        FROM px i WHERE $touchesI)
       |SELECT px.row - ext.r0 AS row, px.col - ext.c0 AS col, px.x, px.y,
       |  CASE WHEN $touches THEN px.value ELSE ${modis.nodata.toLong} END AS value
       |FROM px, ext
       |WHERE px.row >= ext.r0 AND px.row <= ext.r1
       |  AND px.col >= ext.c0 AND px.col <= ext.c1
       |ORDER BY row, col""".stripMargin
  }

  /** Mask-only clip with the 500-vertex polygon. Mirrors the Spark
    * edge-table PIP join (a 500-term unrolled predicate overflows DuckDB's
    * binder recursion): crossing-count join + odd filter. */
  def clipGeom500: String = {
    s"""WITH px AS ($px),
       |edges AS (${VectorOps.edgesUnnestSql(manyVertexGeom)}),
       |ins AS (
       |  SELECT px.row, px.col
       |  FROM px, edges e
       |  WHERE (e.y1 > px.y) != (e.y2 > px.y)
       |    AND px.x < e.x1 + (px.y - e.y1) * e.dx / e.dy
       |  GROUP BY px.row, px.col
       |  HAVING count(*) % 2 = 1)
       |SELECT px.row, px.col, px.x, px.y,
       |  CASE WHEN ins.row IS NOT NULL THEN px.value ELSE ${modis.nodata.toLong} END AS value
       |FROM px LEFT JOIN ins ON px.row = ins.row AND px.col = ins.col
       |ORDER BY px.row, px.col""".stripMargin
  }

  def zonalStats: String = {
    val zones = zonalGeoms.map { case (id, wkt) =>
      val g = Geometry.parseWkt(wkt)
      s"SELECT '$id' AS geom_id, value FROM px WHERE value <> ${modis.nodata.toLong} AND ${VectorOps.containsSql(g, "px.x", "px.y")}"
    }
    s"""WITH px AS ($px),
       |z AS (${zones.mkString("\nUNION ALL\n")})
       |SELECT geom_id, count(*) AS n_pixels, CAST(sum(value) AS BIGINT) AS sum_value,
       |  min(value) AS min_value, max(value) AS max_value,
       |  CAST(CAST(sum(value) AS BIGINT) AS DOUBLE) / count(*) AS mean_value,
       |  SQRT((CAST(CAST(sum(value*value) AS BIGINT) AS DOUBLE)
       |        - CAST(CAST(sum(value) AS BIGINT) AS DOUBLE) * CAST(CAST(sum(value) AS BIGINT) AS DOUBLE) / count(*)) / count(*)) AS std_value
       |FROM z GROUP BY geom_id ORDER BY geom_id""".stripMargin
  }

  def interpolateNa: String = InterpolateOps.interpolateNaSql(px, modis)

  def interpolateNaLinear: String = InterpolateOps.interpolateNaLinearSql(px, modis)

  def bandPivot: String =
    BandOps.bandAsVariableSql(BandOps.pixels3dSql(bandGrid, 3), 3)

  /** Complex magnitude: re*re + im*im is exact integer arithmetic in
    * BIGINT; the single SQRT is correctly-rounded IEEE in both engines, so
    * no quantization guard is needed (cf. the Quantize9 warp guards, which
    * protect libm trig — sqrt is not libm-variant). */
  def complexAbs: String = {
    val nd = modis.nodata.toLong
    s"""WITH c AS (${ComplexOps.complexPixelsSql(modis, 12345L, 777L)})
       |SELECT row, col,
       |  CASE WHEN re = $nd THEN CAST($nd AS DOUBLE)
       |       ELSE SQRT(CAST(re*re + im*im AS DOUBLE)) END AS value
       |FROM c ORDER BY row, col""".stripMargin
  }

  /** Cross-power spectrum a·conj(b): all-BIGINT, same operand order as the
    * Spark Columns (a_re*b_re + a_im*b_im, a_im*b_re - a_re*b_im). */
  def complexCrossPower: String = {
    val nd = modis.nodata.toLong
    s"""WITH c AS (SELECT row, col,
       |    ${Synth.valueSql(nd, 12345L)} AS a_re,
       |    ${Synth.valueSql(nd, 777L)} AS a_im,
       |    ${Synth.valueSql(nd, 4242L)} AS b_re,
       |    ${Synth.valueSql(nd, 991L)} AS b_im
       |  FROM (SELECT CAST(i // ${modis.width} AS BIGINT) AS row,
       |               CAST(i % ${modis.width} AS BIGINT) AS col
       |        FROM generate_series(0, ${modis.width.toLong * modis.height - 1}) t(i)))
       |SELECT row, col,
       |  a_re*b_re + a_im*b_im AS cp_re,
       |  a_im*b_re - a_re*b_im AS cp_im
       |FROM c WHERE a_re <> $nd ORDER BY row, col""".stripMargin
  }

  def cellIndex: String = {
    val (r, lon0) = (6371007.181, 0.0)
    val latE = s"(y / $r) / ${WarpOps.D2R}"
    val lonE = s"(x / ($r * COS(y / $r))) / ${WarpOps.D2R} + $lon0"
    s"""WITH px AS ($px)
       |SELECT row, col, ${Cells.cellIdSql(lonE, latE, cellLevel)} AS cell_id
       |FROM px WHERE (row*200 + col) % 7 = 0
       |ORDER BY row, col""".stripMargin
  }

  def cellIndexS2: String = {
    val (r, lon0) = (6371007.181, 0.0)
    val latE = s"(y / $r) / ${WarpOps.D2R}"
    val lonE = s"(x / ($r * COS(y / $r))) / ${WarpOps.D2R} + $lon0"
    val src = s"SELECT row, col, x, y FROM ($px) WHERE (row*200 + col) % 7 = 0"
    Cells.s2CellIdSql(src, lonE, latE, cellLevel, Seq("row", "col")) +
      "\nORDER BY row, col"
  }

  def cellIndexHex: String = {
    val (r, lon0) = (6371007.181, 0.0)
    val latE = s"(y / $r) / ${WarpOps.D2R}"
    val lonE = s"(x / ($r * COS(y / $r))) / ${WarpOps.D2R} + $lon0"
    val src = s"SELECT row, col, x, y FROM ($px) WHERE (row*200 + col) % 7 = 0"
    graft.core.Hex.cellIdSql(src, lonE, latE, hexRes, Seq("row", "col")) +
      "\nORDER BY row, col"
  }

  def knn: String = {
    val t = modis.transform
    // CAST(i AS DOUBLE): DuckDB otherwise types `i*4.0` as DECIMAL and the
    // squared distances overflow DECIMAL(38)
    val qSql = s"SELECT i AS q_id, ${t.a}*(10.0 + CAST(i AS DOUBLE)*4.0 + 0.3) + ${t.c} AS qx, " +
      s"${t.e}*(12.0 + CAST(i AS DOUBLE)*4.0 + 0.7) + ${t.f} AS qy FROM generate_series(0, ${nKnnQueries - 1}) t(i)"
    val tSql = s"SELECT i AS t_id, ${t.a}*(CAST(i % 20 AS DOUBLE)*10.0 + 0.25) + ${t.c} AS tx, " +
      s"${t.e}*(CAST(i // 20 AS DOUBLE)*10.0 + 0.75) + ${t.f} AS ty FROM generate_series(0, ${nKnnTargets - 1}) t(i)"
    KnnOps.knnBruteForceSql(qSql, tSql, knnK)
  }

  // --- text / dedup / ann / docs oracles ---

  val embCastSql = "SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings"

  def textQuality: String = graft.text.TextOps.qualityMetricsSql("documents")
  def langId: String = graft.text.TextOps.langIdSql("documents")
  def tokenCount: String = graft.text.TextOps.tokenCountsSql("documents")
  def fingerprint: String =
    s"SELECT doc_id, ${graft.text.TextOps.fingerprintSql("text")} AS fp FROM documents ORDER BY doc_id"
  def dedupExact: String = graft.dedup.DedupOps.exactGroupsSql(dedupCorpusSql)
  def dedupSubstring: String =
    graft.dedup.DedupOps.substringDupWindowsSql(dedupCorpusSql)
  def dedupJaccard: String = graft.dedup.DedupOps.jaccardPairsSql(corpusSliceSql, 0.5)
  def dedupMinhashLsh: String = graft.dedup.DedupOps.lshPairsSql(corpusSliceSql, 16, 4, 0.5)
  def dedupSimhash: String = graft.dedup.DedupOps.simhashPairsSql(dedupCorpusSql, 3)
  def dedupClusters: String = graft.dedup.ClusterOps.dupClustersSql(
    graft.dedup.DedupOps.lshPairsSql(corpusSliceSql, 16, 4, 0.5))
  def dedupCorpus: String = graft.dedup.ClusterOps.dedupedCorpusSql(
    corpusSliceSql, graft.dedup.DedupOps.lshPairsSql(corpusSliceSql, 16, 4, 0.5))
  def decontaminate: String = graft.dedup.DedupOps.contaminatedDocsSql(dedupCorpusSql)
  def sampleStratified: String = graft.text.CurationOps.stratifiedSampleSql("documents")
  def packSequences: String = graft.text.CurationOps.packSequencesSql("documents", 512)
  def repetitionMetrics: String = graft.text.CurationOps.repetitionMetricsSql("documents")
  def domainCap: String = graft.text.CurationOps.domainCapSql("documents", 20)
  def annTopk: String = graft.ann.AnnOps.bruteForceTopKSql(
    s"SELECT * FROM ($embCastSql) WHERE vec_id % 25 = 0", embCastSql, 10)
  def annLsh: String = graft.ann.AnnOps.lshTopKSql(embCastSql, 5)
  def annIvf: String = graft.ann.AnnOps.ivfTopKSql(embCastSql, "vec_id % 25 = 0", 10)
  def embPairs: String = graft.ann.AnnOps.cosinePairsSql(embCastSql, 0.4)
  def embPairsBanded: String = graft.ann.AnnOps.cosinePairsBandedSql(embCastSql, 0.4)
  def docSpans: String = graft.docs.DocOps.flatSpansSql("documents")
  def docTileAssign: String = graft.docs.DocOps.tileAssignmentsSql("documents")
  def docGeomCells: String = graft.docs.DocOps.geomCellCoverSql("documents", modis, docCellLevel)
  def docGeomCellsS2: String = graft.docs.DocOps.geomCellCoverS2Sql("documents", modis, 7)
  def docGeomCellsS2Rect: String =
    graft.docs.DocOps.geomCellCoverS2RectSql("documents", modis, 7)
  def docGeomCellsS2Multiface: String = {
    val lonC = "CASE WHEN doc_id % 7 = 0 THEN 88.0 ELSE CAST((doc_id * 29) % 300 AS DOUBLE) - 150.0 END"
    val latC = "CASE WHEN doc_id % 7 = 0 THEN 80.0 ELSE CAST((doc_id * 11) % 60 AS DOUBLE) - 30.0 END"
    graft.docs.DocOps.s2RectCoverSqlFromBbox(
      s"""SELECT doc_id, ($lonC) - 6.0 AS lon_min, ($lonC) + 6.0 AS lon_max,
         |       ($latC) - 2.0 AS lat_min, ($latC) + 2.0 AS lat_max
         |FROM documents""".stripMargin, 7)
  }
  def docGeomCellsHex: String =
    graft.docs.DocOps.geomCellCoverHexSql("documents", modis, 5)
  def docTileSpatialHex: String =
    graft.docs.DocOps.spatialTileAssignmentsHexSql("documents", modis, 5)
  def docTileSpatialS2: String =
    graft.docs.DocOps.spatialTileAssignmentsS2Sql("documents", modis, 10)
  def docTileSpatial: String = graft.docs.DocOps.spatialTileAssignmentsSql("documents", modis, 12)

  val lineitemAgg: String =
    """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
      |  count(*) AS n_rows, max(l_extendedprice) AS max_price,
      |  min(l_discount) AS min_disc
      |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val joinBroadcast: String =
    """SELECT c_mktsegment, count(*) AS n_orders, max(o_totalprice) AS max_total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin
}
