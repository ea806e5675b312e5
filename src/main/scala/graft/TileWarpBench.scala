package graft

import graft.core.{Affine, Crs, GridRef, Synth}
import graft.ops.{Raster, TileWarp, WarpOps}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Measures the tile-native warp kernel against the row-per-pixel warp join
  * on the big-raster flagship: wall time and total shuffle bytes written
  * (the quantity that dominates at 100 TB). Results recorded in BASELINE.md.
  *
  * Run: SPARK_GRAFT_SIDE=2000 sbt "runMain graft.TileWarpBench" */
object TileWarpBench {

  final class ShuffleMeter extends SparkListener {
    @volatile var bytesWritten = 0L
    @volatile var recordsWritten = 0L
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        bytesWritten += m.shuffleWriteMetrics.bytesWritten
        recordsWritten += m.shuffleWriteMetrics.recordsWritten
      }
    }
    def reset(): Unit = { bytesWritten = 0L; recordsWritten = 0L }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val side = sys.env.getOrElse("SPARK_GRAFT_SIDE", "2000").toInt
    val ts = sys.env.getOrElse("SPARK_GRAFT_TILE", "200").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    val grid = Synth.modisGrid.copy(
      transform = Synth.modisGrid.transform.compose(
        Affine.scale(200.0 / side, 200.0 / side)),
      width = side, height = side)
    val dst = GridRef.suggestedWarpOutput(grid, Crs.WGS84)

    // Both paths read the SAME at-rest representation: packed tiles (the
    // TileIO layout). The pack shuffle is one-time layout cost, excluded.
    import org.apache.spark.sql.functions._
    val packed = TileWarp.pack(
      Raster(Synth.pixels(spark, grid, parallelism = cpus.toInt * 4), grid), ts).persist()
    packed.count()
    def pixelSrc = Raster(
      packed.select(col("st_row"), col("st_col"),
          posexplode(col("data")).as(Seq("i", "dval")))
        .withColumn("row", col("st_row") * ts + expr(s"i div $ts"))
        .withColumn("col", col("st_col") * ts + col("i") % ts)
        .withColumn("x", Synth.xColumn(grid, col("col")))
        .withColumn("y", Synth.yColumn(grid, col("row")))
        .withColumn("value", col("dval").cast("long"))
        .select("row", "col", "x", "y", "value"), grid)

    def measure(label: String)(f: => Long): (Double, Long, Long) = {
      meter.reset()
      val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; give the bus a moment
      Thread.sleep(500)
      System.err.println(f"[tilewarp] $label: $sec%.2f s, n=$n, " +
        f"shuffleMB=${meter.bytesWritten / 1e6}%.1f, shuffleRecords=${meter.recordsWritten}")
      (sec, meter.bytesWritten, meter.recordsWritten)
    }

    // warm-up (JIT + codegen)
    WarpOps.reprojectNearest(Raster(Synth.pixels(spark, Synth.modisGrid), Synth.modisGrid),
      GridRef.suggestedWarpOutput(Synth.modisGrid, Crs.WGS84)).df.count()
    TileWarp.reprojectNearestTiles(
      Raster(Synth.pixels(spark, Synth.modisGrid), Synth.modisGrid),
      GridRef.suggestedWarpOutput(Synth.modisGrid, Crs.WGS84), 40).count()

    def pixelRun() = measure("pixel-path")(WarpOps.reprojectNearest(pixelSrc, dst).df.count())
    def tileRun() = measure(s"tile-path(ts=$ts)")(
      TileWarp.reprojectNearestPacked(packed, grid, dst, ts).count())
    // interleaved min-of-2 (shared-host throttling)
    val p = Seq(pixelRun(), tileRun(), pixelRun(), tileRun())
    val pBest = Seq(p(0), p(2)).minBy(_._1)
    val tBest = Seq(p(1), p(3)).minBy(_._1)

    // merge-leg decomposition: the Bench tile flagship composes
    // mergeTiles -> warp; time each merge arm alone so the flagship's
    // wall-clock attributes to measured stages, not inference
    val gB = grid.copy(transform = grid.transform.windowed(side / 4.0, side / 4.0))
    val packedB = TileWarp.pack(
      Raster(Synth.pixels(spark, gB, seed = 777L, parallelism = cpus.toInt * 4), gB), ts).persist()
    packedB.count()
    def pixelMergeRun() = measure("pixel-merge")(
      graft.ops.MergeOps.merge(Seq(pixelSrc,
        Raster(packedB.select(col("st_row"), col("st_col"),
            posexplode(col("data")).as(Seq("i", "dval")))
          .withColumn("row", col("st_row") * ts + expr(s"i div $ts"))
          .withColumn("col", col("st_col") * ts + col("i") % ts)
          .withColumn("x", Synth.xColumn(gB, col("col")))
          .withColumn("y", Synth.yColumn(gB, col("row")))
          .withColumn("value", col("dval").cast("long"))
          .select("row", "col", "x", "y", "value"), gB)), "first").df.count())
    def tileMergeRun() = measure(s"tile-merge(ts=$ts)")(
      graft.ops.TileMerge.mergeTiles(
        Seq(packed -> grid, packedB -> gB), "first", ts)._1.count())
    val m = Seq(pixelMergeRun(), tileMergeRun(), pixelMergeRun(), tileMergeRun())
    val pmBest = Seq(m(0), m(2)).minBy(_._1)
    val tmBest = Seq(m(1), m(3)).minBy(_._1)

    println(
      f"""{"side":$side,"tile":$ts,"pixel_sec":${pBest._1}%.2f,"pixel_shuffle_bytes":${pBest._2},""" +
      f""""tile_sec":${tBest._1}%.2f,"tile_shuffle_bytes":${tBest._2},""" +
      f""""shuffle_reduction":${pBest._2.toDouble / math.max(1L, tBest._2)}%.2f,""" +
      f""""pixel_merge_sec":${pmBest._1}%.2f,"pixel_merge_records":${pmBest._3},""" +
      f""""tile_merge_sec":${tmBest._1}%.2f,"tile_merge_records":${tmBest._3}}""")
    spark.stop()
  }
}
