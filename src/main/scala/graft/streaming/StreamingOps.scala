package graft.streaming

import graft.core.Cells
import graft.ops.WarpOps
import graft.core.Crs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming ingest path: incremental interleaved-document
  * arrival -> span-preserving transform -> watermarked windowed aggregation
  * of tile/cell assignments. The reference has no streaming surface (dask
  * laziness is its only async mechanism, SURVEY §2.7); this is the
  * engine-native incremental-ingest extension. Works identically over any
  * streaming DataFrame (rate/kafka/memory) with schema
  * (ts: timestamp, doc_id: long, spans: array<struct<...>>). */
object StreamingOps {

  /** Per-window cell-assignment counts with a watermark: each arriving doc
    * contributes its geometry-span cell cover; output is append-mode
    * (window, cell_id, n_docs). Spans stay opaque through the pipeline. */
  def windowedCellCounts(docs: DataFrame, level: Int,
                         watermark: String = "10 seconds",
                         window: String = "30 seconds"): DataFrame = {
    // derive the geometry key columns without touching the spans column
    val geomSpan = element_at(filter(col("spans"),
      s => s.getField("text").startsWith("geom:")), 1).getField("text")
    val c0 = regexp_extract(geomSpan, "PXPOLY\\((\\d+) (\\d+)", 1).cast("double")
    val r0 = regexp_extract(geomSpan, "PXPOLY\\((\\d+) (\\d+)", 2).cast("double")
    val g = graft.core.Synth.modisGrid
    val cx = lit(g.transform.a) * (c0 + 6.0) + lit(g.transform.c)
    val cy = lit(g.transform.e) * (r0 + 6.0) + lit(g.transform.f)
    val (lon, lat) = WarpOps.inverseColumns(g.crs, cx, cy)
    docs
      .withColumn("cell_id", Cells.cellIdColumn(lon, lat, level))
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("cell_id"))
      .agg(count(lit(1)).as("n_docs"))
  }
}
