package graft.streaming

import graft.core.Cells
import graft.ops.WarpOps
import graft.core.Crs
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /** Streaming tile assembly: incremental pixel arrivals pack into complete
    * tiles — the streaming write path of the TileIO layout (a tile emits
    * exactly once, the moment its last pixel lands; partial tiles live in
    * keyed state, sharded by tile key and checkpointed with the query).
    * Input: (row: long, col: long, value: double-castable) streaming frame;
    * output: (tile_row, tile_col, data) with the same positional
    * array_sort(local_idx) layout TileIO.writeTiles produces. Duplicate
    * deliveries after emission are dropped (emitted flag stays in state). */
  def streamingTileAssembly(px: DataFrame, tileSize: Int):
      Dataset[(Long, Long, Seq[Double])] = {
    val spark = px.sparkSession
    import spark.implicits._
    val full = tileSize * tileSize
    px.select(
        expr(s"row div $tileSize").as("tr"),
        expr(s"col div $tileSize").as("tc"),
        ((col("row") % tileSize) * tileSize + col("col") % tileSize).cast("int").as("li"),
        col("value").cast("double").as("v"))
      .as[(Long, Long, Int, Double)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: (Long, Long), rows: Iterator[(Long, Long, Int, Double)],
         state: GroupState[(Boolean, Map[Int, Double])]) => {
          val (emitted, have) = state.getOption.getOrElse((false, Map.empty[Int, Double]))
          if (emitted) Iterator.empty
          else {
            val cur = have ++ rows.map(r => r._3 -> r._4)
            if (cur.size == full) {
              state.update((true, Map.empty))
              Iterator.single((key._1, key._2,
                Seq.tabulate(full)(i => cur(i))))
            } else { state.update((false, cur)); Iterator.empty }
          }
        })
      .toDF("tile_row", "tile_col", "data").as[(Long, Long, Seq[Double])]
  }

  /** Streaming exact dedup — keyed arbitrary state via
    * flatMapGroupsWithState: the FIRST document carrying a fingerprint
    * passes (min doc_id inside a micro-batch for determinism), every later
    * duplicate — same batch or any later batch — is dropped. State is one
    * boolean per fingerprint, partitioned by the fingerprint key, so the
    * dedup set shards across executors and checkpoints with the query (the
    * streaming analog of DedupOps.exactGroups; the reference has no
    * streaming surface, SURVEY §2.7). Input: (doc_id: long, text: string)
    * streaming frame; output: (fp, doc_id) of survivors. */
  def streamingExactDedup(docs: DataFrame): Dataset[(String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), graft.text.TextOps.fingerprint(col("text")).as("fp"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (fp: String, rows: Iterator[(Long, String)], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else { state.update(true); Iterator.single((fp, rows.map(_._1).min)) })
      .toDF("fp", "doc_id").as[(String, Long)]
  }

  /** Streaming benchmark decontamination: flag arriving training documents
    * that share a verbatim 64-char window with a STATIC held-out benchmark
    * set — the batch sweep (`DedupOps.contaminatedDocs`) as a continuous
    * ingest gate. Deliberately STATELESS: explode -> hash on the stream
    * side into a stream-static equi-join against the broadcast benchmark
    * window-hash set (eval suites are MBs; the broadcast re-plans per
    * micro-batch), emitting every matched (doc_id, wh) in append mode the
    * moment it arrives. A document is contaminated iff it emits >= 1 row.
    * A per-doc streaming aggregate would pin one state-store row per
    * contaminated document FOREVER — the input (doc_id, text) carries no
    * event-time column, so no watermark could ever evict it; counting and
    * dedup belong in the downstream batch sink (foreachBatch), where they
    * are a plain groupBy. Input: streaming (doc_id, text); bench: static
    * (doc_id, text). */
  def streamingDecontaminate(docs: DataFrame, bench: DataFrame,
                             window: Int = 64, stride: Int = 16): DataFrame = {
    val benchHashes = graft.dedup.DedupOps.windowHashes(bench, window, stride)
      .select("wh").distinct()
    graft.dedup.DedupOps.windowHashes(docs, window, stride)
      .join(broadcast(benchHashes), "wh")
      .select("doc_id", "wh")
  }
}
