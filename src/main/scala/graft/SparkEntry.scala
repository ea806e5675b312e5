package graft

import graft.core._
import graft.ops._
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator from SURVEY.md §2 is exposed as a named query;
  * where the semantics are ANSI-SQL-expressible the matching DuckDB oracle
  * is in `oracleSql` (column names aligned pairwise). */
object SparkEntry {

  /** Flagship: golden-bbox clip of the MODIS-grid synthetic raster
    * (SURVEY.md §7.2 minimum end-to-end slice). */
  def entry(spark: SparkSession): DataFrame =
    Queries.qClipBox(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_clip_box" -> (Queries.qClipBox _),
    "q_clip_box_large" -> (Queries.qClipBoxLarge _),
    "q_isel_window" -> (Queries.qIselWindow _),
    "q_slice_xy" -> (Queries.qSliceXy _),
    "q_pad_box" -> (Queries.qPadBox _),
    "q_lineitem_agg" -> (Queries.qLineitemAgg _),
    "q_join_broadcast" -> (Queries.qJoinBroadcast _),
    "q_merge_first" -> (Queries.qMerge("first") _),
    "q_merge_last" -> (Queries.qMerge("last") _),
    "q_merge_sum" -> (Queries.qMerge("sum") _),
    "q_merge_max" -> (Queries.qMerge("max") _),
    "q_merge_min" -> (Queries.qMerge("min") _),
    "q_merge_count" -> (Queries.qMerge("count") _),
    "q_merge_tiled" -> (Queries.qMergeTiled _),
    "q_merge_ds_first" -> (Queries.qMergeDatasets("first") _),
    "q_merge_ds_sum" -> (Queries.qMergeDatasets("sum") _),
    "q_reproject_nearest" -> (Queries.qReprojectNearest _),
    "q_reproject_bilinear" -> (Queries.qReprojectBilinear _),
    "q_reproject_cubic" -> (Queries.qReprojectCubic _),
    "q_reproject_cubic_spline" -> (Queries.qReprojectCubicSpline _),
    "q_reproject_rot2sq" -> (Queries.qReprojectRotToSq _),
    "q_reproject_sq2rot" -> (Queries.qReprojectSqToRot _),
    "q_reproject_match" -> (Queries.qReprojectMatch _),
    "q_reproject_tiled" -> (Queries.qReprojectTiled _),
    "q_reproject_tiled_bilinear" -> (Queries.qReprojectTiledBilinear _),
    "q_reproject_tiled_cubic" -> (Queries.qReprojectTiledCubic _),
    "q_reproject_tiled_cubic_spline" -> (Queries.qReprojectTiledCubicSpline _),
    "q_reproject_ds" -> (Queries.qReprojectDs _),
    "q_reproject_res" -> (Queries.qReprojectRes _),
    "q_reproject_shape" -> (Queries.qReprojectShape _),
    "q_merge_res" -> (Queries.qMergeRes _),
    "q_reproject_gcps" -> (Queries.qReprojectGcps _),
    "q_reproject_gcps_affine" -> (Queries.qReprojectGcpsAffine _),
    "q_reproject_gcps_poly2" -> (Queries.qReprojectGcpsPoly2 _),
    "q_reproject_gcps_poly3" -> (Queries.qReprojectGcpsPoly3 _),
    "q_reproject_rpcs" -> (Queries.qReprojectRpcs _),
    "q_reproject_geoloc" -> (Queries.qReprojectGeoloc _),
    "q_resample_average" -> (Queries.qResampleAverage _),
    "q_resample_min" -> (Queries.qResampleDown("min") _),
    "q_resample_max" -> (Queries.qResampleDown("max") _),
    "q_resample_sum" -> (Queries.qResampleDown("sum") _),
    "q_resample_rms" -> (Queries.qResampleDown("rms") _),
    "q_resample_med" -> (Queries.qResampleDown("med") _),
    "q_resample_q1" -> (Queries.qResampleDown("q1") _),
    "q_resample_q3" -> (Queries.qResampleDown("q3") _),
    "q_resample_mode" -> (Queries.qResampleMode _),
    "q_resample_lanczos" -> (Queries.qResampleLanczos _),
    "q_resample_gauss" -> (Queries.qResampleGauss _),
    "q_mask_scale" -> (Queries.qMaskScale _),
    "q_clip_box_crs" -> (Queries.qClipBoxCrs _),
    "q_clip_geom" -> (Queries.qClipGeom _),
    "q_clip_geom_invert" -> (Queries.qClipGeomInvert _),
    "q_clip_geom_all_touched" -> (Queries.qClipGeomAllTouched _),
    "q_clip_geom_500" -> (Queries.qClipGeom500 _),
    "q_zonal_stats" -> (Queries.qZonalStats _),
    "q_interpolate_na" -> (Queries.qInterpolateNa _),
    "q_interpolate_na_linear" -> (Queries.qInterpolateNaLinear _),
    "q_complex_abs" -> (Queries.qComplexAbs _),
    "q_complex_cross_power" -> (Queries.qComplexCrossPower _),
    "q_band_pivot" -> (Queries.qBandPivot _),
    "q_cell_index" -> (Queries.qCellIndex _),
    "q_cell_index_s2" -> (Queries.qCellIndexS2 _),
    "q_knn" -> (Queries.qKnn _),
    "q_knn_kdtree" -> (Queries.qKnnKdtree _),
    "q_knn_kdtree_qs" -> (Queries.qKnnKdtreeQs _),
    "q_knn_hexring" -> (Queries.qKnnHexRing _),
    "q_text_quality" -> (Queries.qTextQuality _),
    "q_lang_id" -> (Queries.qLangId _),
    "q_token_count" -> (Queries.qTokenCount _),
    "q_fingerprint" -> (Queries.qFingerprint _),
    "q_dedup_exact" -> (Queries.qDedupExact _),
    "q_dedup_substring" -> (Queries.qDedupSubstring _),
    "q_dedup_jaccard" -> (Queries.qDedupJaccard _),
    "q_dedup_minhash_lsh" -> (Queries.qDedupMinhashLsh _),
    "q_dedup_simhash" -> (Queries.qDedupSimhash _),
    "q_dedup_clusters" -> (Queries.qDedupClusters _),
    "q_decontaminate" -> (Queries.qDecontaminate _),
    "q_sample_stratified" -> (Queries.qSampleStratified _),
    "q_pack_sequences" -> (Queries.qPackSequences _),
    "q_ann_topk" -> (Queries.qAnnTopk _),
    "q_ann_lsh" -> (Queries.qAnnLsh _),
    "q_ann_ivf" -> (Queries.qAnnIvf _),
    "q_emb_pairs" -> (Queries.qEmbPairs _),
    "q_emb_pairs_banded" -> (Queries.qEmbPairsBanded _),
    "q_doc_spans" -> (Queries.qDocSpans _),
    "q_doc_tile_assign" -> (Queries.qDocTileAssign _),
    "q_doc_geom_cells" -> (Queries.qDocGeomCells _),
    "q_doc_geom_cells_s2" -> (Queries.qDocGeomCellsS2 _),
    "q_doc_geom_cells_s2_rect" -> (Queries.qDocGeomCellsS2Rect _),
    "q_doc_geom_cells_s2_multiface" -> (Queries.qDocGeomCellsS2Multiface _),
    "q_cell_index_hex" -> (Queries.qCellIndexHex _),
    "q_doc_geom_cells_hex" -> (Queries.qDocGeomCellsHex _),
    "q_doc_tile_spatial_hex" -> (Queries.qDocTileSpatialHex _),
    "q_doc_tile_spatial_s2" -> (Queries.qDocTileSpatialS2 _),
    "q_doc_tile_spatial" -> (Queries.qDocTileSpatial _),
    "q_media_features" -> (Queries.qMediaFeatures _),
  )

  def oracleSql: Map[String, String] = {
    import Queries._
    // pad oracle parameters derived from the same pure grid math the Spark
    // side uses (clip window + numpy-arange pad counts)
    val clipWin = modis.windowFromBounds(largeClip)
    val clippedGrid = modis.windowed(clipWin)
    val padB = {
      val b = modis.bounds
      val rx = math.abs(modis.resX) / 2.0; val ry = math.abs(modis.resY) / 2.0
      Bounds(b.minx - rx, b.miny - ry, b.maxx + rx, b.maxy + ry)
    }
    val pc = WindowOps.padCounts(clippedGrid, padB)
    val padGrid = WindowOps.paddedGrid(clippedGrid, pc)

    // slice_xy window (same pure math as WindowOps.sliceXy)
    val sg = modis
    val sc0 = math.max(0, math.ceil((sliceBounds.minx - sg.transform.c) / sg.transform.a - 0.5).toInt)
    val sc1 = math.min(sg.width, math.floor((sliceBounds.maxx - sg.transform.c) / sg.transform.a - 0.5).toInt + 1)
    val sr0 = math.max(0, math.ceil((sliceBounds.maxy - sg.transform.f) / sg.transform.e - 0.5).toInt)
    val sr1 = math.min(sg.height, math.floor((sliceBounds.miny - sg.transform.f) / sg.transform.e - 0.5).toInt + 1)

    Map(
      "q_clip_box" -> Oracles.clipBox(goldenClip),
      "q_clip_box_large" -> Oracles.clipBox(largeClip),
      "q_isel_window" -> Oracles.iselWindow(iselWin),
      "q_slice_xy" -> Oracles.iselWindow(PixelWindow(sr0, sr1, sc0, sc1)),
      "q_pad_box" -> Oracles.padBox(padGrid, pc.rowsBefore, pc.colsBefore,
        clippedGrid.height, clippedGrid.width, clipWin.rowStart, clipWin.colStart),
      "q_lineitem_agg" -> Oracles.lineitemAgg,
      "q_join_broadcast" -> Oracles.joinBroadcast,
      "q_merge_first" -> Oracles.merge("first"),
      "q_merge_last" -> Oracles.merge("last"),
      "q_merge_sum" -> Oracles.merge("sum"),
      "q_merge_max" -> Oracles.merge("max"),
      "q_merge_min" -> Oracles.merge("min"),
      "q_merge_count" -> Oracles.merge("count"),
      "q_merge_tiled" -> Oracles.merge("first"),
      "q_merge_ds_first" -> Oracles.mergeDatasets("first"),
      "q_merge_ds_sum" -> Oracles.mergeDatasets("sum"),
      "q_reproject_nearest" -> Oracles.reprojectNearest,
      "q_reproject_bilinear" -> Oracles.reprojectBilinear,
      "q_reproject_cubic" -> Oracles.reprojectCubic,
      "q_reproject_cubic_spline" -> Oracles.reprojectCubicSpline,
      "q_reproject_rot2sq" -> Oracles.reprojectRotToSq,
      "q_reproject_sq2rot" -> Oracles.reprojectSqToRot,
      "q_reproject_match" -> Oracles.reprojectMatch,
      // tile-native kernel answers to the SAME oracle as the pixel path
      "q_reproject_tiled" -> Oracles.reprojectNearest,
      "q_reproject_tiled_bilinear" -> Oracles.reprojectBilinear,
      "q_reproject_tiled_cubic" -> Oracles.reprojectCubic,
      "q_reproject_tiled_cubic_spline" -> Oracles.reprojectCubicSpline,
      "q_reproject_ds" -> Oracles.reprojectDs,
      "q_reproject_res" -> Oracles.reprojectRes,
      "q_reproject_shape" -> Oracles.reprojectShape,
      "q_merge_res" -> Oracles.mergeRes,
      "q_reproject_gcps" -> Oracles.reprojectGcps,
      "q_reproject_gcps_affine" -> Oracles.reprojectGcpsAffine,
      "q_reproject_gcps_poly2" -> Oracles.reprojectGcpsPoly(2),
      "q_reproject_gcps_poly3" -> Oracles.reprojectGcpsPoly(3),
      "q_reproject_rpcs" -> Oracles.reprojectRpcs,
      "q_reproject_geoloc" -> Oracles.reprojectGeoloc,
      "q_resample_average" -> Oracles.resampleAverage,
      "q_resample_min" -> Oracles.resampleDown("min"),
      "q_resample_max" -> Oracles.resampleDown("max"),
      "q_resample_sum" -> Oracles.resampleDown("sum"),
      "q_resample_rms" -> Oracles.resampleDown("rms"),
      "q_resample_med" -> Oracles.resampleDown("med"),
      "q_resample_q1" -> Oracles.resampleDown("q1"),
      "q_resample_q3" -> Oracles.resampleDown("q3"),
      "q_resample_mode" -> Oracles.resampleMode,
      "q_resample_lanczos" -> Oracles.resampleLanczos,
      "q_resample_gauss" -> Oracles.resampleGauss,
      "q_mask_scale" -> Oracles.maskScale,
      "q_clip_box_crs" -> Oracles.clipBox(
        GridRef.transformBounds(clipCrsWgsBounds, Crs.WGS84, Crs.MODIS_SINU)),
      "q_clip_geom" -> Oracles.clipGeomDrop,
      "q_clip_geom_invert" -> Oracles.clipGeomInvert,
      "q_clip_geom_all_touched" -> Oracles.clipGeomAllTouched,
      "q_clip_geom_500" -> Oracles.clipGeom500,
      "q_zonal_stats" -> Oracles.zonalStats,
      "q_interpolate_na" -> Oracles.interpolateNa,
      "q_interpolate_na_linear" -> Oracles.interpolateNaLinear,
      "q_complex_abs" -> Oracles.complexAbs,
      "q_complex_cross_power" -> Oracles.complexCrossPower,
      "q_band_pivot" -> Oracles.bandPivot,
      "q_cell_index" -> Oracles.cellIndex,
      "q_cell_index_s2" -> Oracles.cellIndexS2,
      "q_knn" -> Oracles.knn,
      "q_knn_kdtree" -> Oracles.knn,
      "q_knn_kdtree_qs" -> Oracles.knn,
      "q_knn_hexring" -> Oracles.knn,
      "q_text_quality" -> Oracles.textQuality,
      "q_lang_id" -> Oracles.langId,
      "q_token_count" -> Oracles.tokenCount,
      "q_fingerprint" -> Oracles.fingerprint,
      "q_dedup_exact" -> Oracles.dedupExact,
      "q_dedup_substring" -> Oracles.dedupSubstring,
      "q_dedup_jaccard" -> Oracles.dedupJaccard,
      "q_dedup_minhash_lsh" -> Oracles.dedupMinhashLsh,
      "q_dedup_simhash" -> Oracles.dedupSimhash,
      "q_dedup_clusters" -> Oracles.dedupClusters,
      "q_decontaminate" -> Oracles.decontaminate,
      "q_sample_stratified" -> Oracles.sampleStratified,
      "q_pack_sequences" -> Oracles.packSequences,
      "q_ann_topk" -> Oracles.annTopk,
      "q_ann_lsh" -> Oracles.annLsh,
      "q_ann_ivf" -> Oracles.annIvf,
      "q_emb_pairs" -> Oracles.embPairs,
      "q_emb_pairs_banded" -> Oracles.embPairsBanded,
      "q_doc_spans" -> Oracles.docSpans,
      "q_doc_tile_assign" -> Oracles.docTileAssign,
      "q_doc_geom_cells" -> Oracles.docGeomCells,
      "q_doc_geom_cells_s2" -> Oracles.docGeomCellsS2,
      "q_doc_geom_cells_s2_rect" -> Oracles.docGeomCellsS2Rect,
      "q_doc_geom_cells_s2_multiface" -> Oracles.docGeomCellsS2Multiface,
      "q_cell_index_hex" -> Oracles.cellIndexHex,
      "q_doc_geom_cells_hex" -> Oracles.docGeomCellsHex,
      "q_doc_tile_spatial_hex" -> Oracles.docTileSpatialHex,
      "q_doc_tile_spatial_s2" -> Oracles.docTileSpatialS2,
      "q_doc_tile_spatial" -> Oracles.docTileSpatial,
      // media: the oracle recomputes features from the synthesis formulas,
      // gating the real binary encode->parse pipeline against arithmetic
      "q_media_features" -> Oracles.mediaFeatures,
    )
  }
}
