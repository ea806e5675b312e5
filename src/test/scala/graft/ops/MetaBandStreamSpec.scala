package graft.ops

import graft.SparkTestBase
import graft.core._
import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class MetaBandStreamSpec extends SparkTestBase {

  def modis: GridRef = Synth.modisGrid
  def px: Raster = Raster(Synth.pixels(spark, modis), modis)

  test("metadata ops: write_crs / write_transform / write_nodata / remap / recalc") {
    val utm = Crs.utm(15, north = true)
    assert(MetadataOps.writeCrs(px, utm).grid.crs == utm)
    val t2 = Affine.northUp(0, 100, 1, 1)
    assert(MetadataOps.writeTransform(px, t2).grid.transform == t2)
    assert(MetadataOps.writeNodata(px, -1).grid.nodata == -1.0)
    val remapped = MetadataOps.remapNodata(px, -99999)
    assert(remapped.grid.nodata == -99999.0)
    assert(remapped.df.filter(col("value") === -28672L).count() == 0)
    assert(remapped.df.filter(col("value") === -99999L).count() ==
           px.df.filter(col("value") === -28672L).count())
    // transform(recalc=True) re-derives the affine from coords
    val rt = MetadataOps.recalcTransform(px)
    assert(math.abs(rt.a - modis.transform.a) < 1e-6)
    assert(math.abs(rt.c - modis.transform.c) < 1e-4)
    assert(math.abs(rt.e - modis.transform.e) < 1e-6)
    assert(math.abs(rt.f - modis.transform.f) < 1e-4)
    // set_spatial_dims renames dimension columns
    val renamed = MetadataOps.setSpatialDims(px, "lon_idx", "lat_idx")
    assert(renamed.df.columns.contains("lon_idx") && renamed.df.columns.contains("lat_idx"))
  }

  test("attrs/encoding: update/drop roundtrip; stored encoding drives the decode chain") {
    val r0 = Raster(graft.core.Synth.pixels(spark, graft.core.Synth.modisGrid),
                    graft.core.Synth.modisGrid)
    val r1 = MetadataOps.updateAttrs(r0, Map("title" -> "t", "units" -> "K"))
    assert(r1.grid.attrs("title") == "t" && r1.grid.attrs("units") == "K")
    val r2 = MetadataOps.dropAttrs(r1, Seq("title"))
    assert(!r2.grid.attrs.contains("title") && r2.grid.attrs.contains("units"))

    val enc = MetadataOps.writeEncoding(r2, scale = 0.25, offset = 10.0)
    val dec = MetadataOps.decodeWithEncoding(enc)
    val direct = MetadataOps.maskAndScale(r0, 0.25, 10.0)
    val a = dec.df.orderBy("row", "col").limit(500).collect().map(_.toSeq)
    val b = direct.df.orderBy("row", "col").limit(500).collect().map(_.toSeq)
    assert(a.sameElements(b))
    // encoded fill value overrides the grid nodata before masking
    val encFill = MetadataOps.writeEncoding(r2, 1.0, 0.0, fillValue = Some(-9999.0))
    val decFill = MetadataOps.decodeWithEncoding(encFill)
    assert(decFill.grid.nodata.isNaN) // maskAndScale output marks missing as NULL/NaN
  }

  test("band_as_variable pivots 3 bands into columns") {
    val px3 = BandOps.pixels3d(spark, modis.copy(width = 40, height = 40), 3)
    assert(px3.count() == 3L * 1600)
    val piv = BandOps.bandAsVariable(px3, 3)
    assert(piv.count() == 1600)
    val r = piv.filter(col("row") === 5 && col("col") === 7).collect()(0)
    def synth(rr: Long, cc: Long): Long =
      if ((rr * 53 + cc * 97) % 101 == 0) -28672L
      else (rr * 7919L + cc * 104729L + 12345L) % 19997L - 9999L
    val base = synth(5, 7)
    assert(r.getAs[Long]("band_0") == base)
    assert(r.getAs[Long]("band_1") == base + 31)
    assert(r.getAs[Long]("band_2") == base + 62)
  }

  test("streaming exact dedup: first fingerprint wins across micro-batches") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val out = StreamingOps.streamingExactDedup(input.toDF().toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("dedupstream")
      .outputMode("append").start()
    try {
      // batch 1: two distinct texts, one in-batch duplicate
      input.addData((1L, "alpha beta"), (2L, "ALPHA   beta"), (3L, "gamma"))
      q.processAllAvailable()
      // batch 2: cross-batch duplicates + one new text
      input.addData((4L, "alpha beta"), (5L, "gamma"), (6L, "delta"))
      q.processAllAvailable()
      val rows = spark.sql("select fp, doc_id from dedupstream").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // fingerprint normalizes case+whitespace: docs 1 and 2 collide -> min id 1
      assert(rows.values.toSet == Set(1L, 3L, 6L),
        s"survivors must be first-seen ids, got $rows")
      assert(rows.size == 3)
    } finally q.stop()
  }

  test("streaming decontamination: arriving docs sharing a 64-char window " +
       "with the static benchmark set are flagged, across micro-batches") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val block = "S" * 80
    val bench = Seq((1000L, s"bench doc $block tail")).toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val out = StreamingOps.streamingDecontaminate(
      input.toDF().toDF("doc_id", "text"), bench)
    val q = out.writeStream.format("memory").queryName("decontstream")
      .outputMode("append").start()
    try {
      input.addData((1L, s"train doc carrying $block verbatim"),
                    (2L, "clean doc, entirely distinct prose with no overlap"))
      q.processAllAvailable()
      input.addData((3L, s"later batch, also contaminated: $block x"))
      q.processAllAvailable()
      val rows = spark.sql("select doc_id, wh from decontstream").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.map(_._1).toSet == Set(1L, 3L), s"got ${rows.toSeq}")
      assert(rows.nonEmpty)
      // stateless: the plan carries no streaming state operator at all
      assert(q.lastProgress.stateOperators.isEmpty,
        "decontamination gate must not accrete streaming state")
    } finally q.stop()
  }

  test("streaming tile assembly: tiles emit exactly once, on completion, packed like TileIO") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    def synth(rr: Long, cc: Long): Long =
      if ((rr * 53 + cc * 97) % 101 == 0) -28672L
      else (rr * 7919L + cc * 104729L + 12345L) % 19997L - 9999L
    val ts = 10
    // 20x20 grid = 4 tiles of 10x10, delivered shuffled across 3 batches
    val all = new scala.util.Random(42)
      .shuffle((for (r <- 0L until 20; c <- 0L until 20) yield (r, c, synth(r, c))).toVector)
    val input = MemoryStream[(Long, Long, Long)]
    val out = StreamingOps.streamingTileAssembly(
      input.toDF().toDF("row", "col", "value"), ts)
    val q = out.writeStream.format("memory").queryName("tileasm")
      .outputMode("append").start()
    try {
      input.addData(all.slice(0, 150): _*); q.processAllAvailable()
      val n1 = spark.sql("select * from tileasm").count()
      input.addData(all.slice(150, 399): _*); q.processAllAvailable()
      val n2 = spark.sql("select * from tileasm").count()
      assert(n2 < 4, "no tile may emit before its last pixel arrives")
      input.addData(all.slice(399, 400): _*); q.processAllAvailable()
      // duplicate re-delivery of a full tile must not re-emit
      input.addData(all.slice(0, 50): _*); q.processAllAvailable()
      val rows = spark.sql("select tile_row, tile_col, data from tileasm").collect()
      assert(rows.length == 4, s"expected 4 tiles once each, got ${rows.length} (n1=$n1)")
      rows.foreach { r =>
        val (tr, tc) = (r.getLong(0), r.getLong(1))
        val data = r.getSeq[Double](2)
        assert(data.length == ts * ts)
        for (i <- 0 until ts * ts) {
          val (pr, pc) = (tr * ts + i / ts, tc * ts + i % ts)
          assert(data(i) == synth(pr, pc).toDouble, s"tile ($tr,$tc) idx $i")
        }
      }
    } finally q.stop()
  }

  test("rate-limited ingest e2e: rate source -> stateful tile assembly -> sink, exact tiles") {
    // a true end-to-end run off Spark's rate-limited source: pixels arrive
    // at a bounded rows/sec, the keyed-state assembler emits each tile the
    // moment it completes, and every emitted tile is positionally exact
    val ts = 20; val w = 200
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", "30000").load()
    val pxStream = rate.select(
      expr(s"value div $w").as("row"),
      (col("value") % w).as("col"),
      (expr(s"value div $w") * 31 + (col("value") % w) * 17).as("value"))
    val q = StreamingOps.streamingTileAssembly(pxStream, ts)
      .writeStream.format("memory").queryName("rate_tiles")
      .outputMode("append").start()
    try {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      def emitted(): Long = spark.table("rate_tiles").count()
      while (emitted() < 3 && System.nanoTime() < deadline) Thread.sleep(250)
      assert(emitted() >= 3, "rate ingest produced no complete tiles in 60s")
    } finally q.stop()
    val tiles = spark.table("rate_tiles")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getSeq[Double](2)))
    assert(tiles.map(_._1).distinct.length == tiles.length, "each tile emits once")
    tiles.foreach { case ((tr, tc), data) =>
      assert(data.length == ts * ts)
      for (i <- 0 until ts * ts) {
        val row = tr * ts + i / ts; val colv = tc * ts + i % ts
        assert(data(i) == (row * 31 + colv * 17).toDouble,
          s"tile ($tr,$tc) idx $i")
      }
    }
  }

  test("streaming ingest: watermarked windowed cell counts over doc spans") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, Long, String)]
    // build streaming docs with the same interleave shape; ts passes through
    val flat = input.toDF().toDF("ts", "doc_id", "text")
      .withColumn("lang", lit("en"))
    val spans = graft.docs.DocOps.interleave(flat)
    val out = StreamingOps.windowedCellCounts(spans, level = 8)
    val q = out.writeStream.format("memory").queryName("cellcounts")
      .outputMode("complete").start()
    try {
      val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
      input.addData((0 until 200).map(i => (t0, i.toLong, s"doc text $i")): _*)
      q.processAllAvailable()
      val rows = spark.sql("select * from cellcounts").collect()
      assert(rows.nonEmpty)
      assert(rows.map(_.getAs[Long]("n_docs")).sum == 200)
    } finally q.stop()
  }
}
