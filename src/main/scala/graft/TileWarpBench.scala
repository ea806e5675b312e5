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
    def src = Raster(Synth.pixels(spark, grid, parallelism = cpus.toInt * 4), grid)

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

    def pixelRun() = measure("pixel-path")(WarpOps.reprojectNearest(src, dst).df.count())
    def tileRun() = measure(s"tile-path(ts=$ts)")(
      TileWarp.reprojectNearestTiles(src, dst, ts).count())
    // interleaved min-of-2 (shared-host throttling)
    val p = Seq(pixelRun(), tileRun(), pixelRun(), tileRun())
    val pBest = Seq(p(0), p(2)).minBy(_._1)
    val tBest = Seq(p(1), p(3)).minBy(_._1)
    println(
      f"""{"side":$side,"tile":$ts,"pixel_sec":${pBest._1}%.2f,"pixel_shuffle_bytes":${pBest._2},""" +
      f""""tile_sec":${tBest._1}%.2f,"tile_shuffle_bytes":${tBest._2},""" +
      f""""shuffle_reduction":${pBest._2.toDouble / math.max(1L, tBest._2)}%.2f}""")
    spark.stop()
  }
}
